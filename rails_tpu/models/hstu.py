"""HSTU (Hierarchical Sequential Transduction Unit) encoder, TPU-native.

Reference: `/root/reference/modeling/sequential/hstu.py` (arXiv 2402.17152).
Semantics preserved:
  - fused uvqk projection + SiLU (`hstu.py:312-327`)
  - pointwise SiLU attention normalized by 1/n — not softmax (`hstu.py:196-204`)
  - relative position + bucketized time-delta attention bias (`hstu.py:81-138`)
  - u * LayerNorm(attention) gating, output proj + residual (`hstu.py:403-423`)

TPU shifts:
  - fbgemm jagged tensors -> fixed-shape (B, N, D) + (B, N) validity masks
    (the (B, N, N) attention mask combines causality with column validity,
    replacing dense_to_jagged / jagged_to_padded_dense round-trips);
  - everything is traced once under jit with static shapes; the N<=261
    attention fits VMEM tiles directly, XLA fuses silu+mask+scale into the
    attention matmuls.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.core.config import HSTUConfig


def _bucketize_time_delta(delta: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """log(|delta| clamped to >=1) / 0.301, truncated, clipped to [0, buckets].

    Reference bucketization_fn: `hstu.py:600-602`.
    """
    v = jnp.log(jnp.maximum(jnp.abs(delta).astype(jnp.float32), 1.0)) / 0.301
    return jnp.clip(v.astype(jnp.int32), 0, num_buckets)


class RelativeBucketedTimeAndPositionBias(nn.Module):
    """rel-position bias + bucketized time-delta bias, (B, N, N).

    Reference: `RelativeBucketedTimeAndPositionBasedBias`
    (`hstu.py:81-138`). The reference materializes the position bias with a
    pad/repeat/reshape skew trick; a direct gather `w[j - i + N - 1]` is
    equivalent and XLA-friendly.
    """

    max_seq_len: int
    num_buckets: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, timestamps: jnp.ndarray) -> jnp.ndarray:  # (B, N) int
        n = self.max_seq_len
        pos_w = self.param(
            "pos_w", nn.initializers.normal(stddev=0.02), (2 * n - 1,)
        )
        ts_w = self.param(
            "ts_w", nn.initializers.normal(stddev=0.02), (self.num_buckets + 1,)
        )
        i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        rel_pos_bias = pos_w[j - i + n - 1]  # (N, N)

        # ext[t] appends the last timestamp; bias(i, j) uses
        # ts(i+1) - ts(j): the time gap between the *next* item at the query
        # position and item j (`hstu.py:122-133`).
        ext = jnp.concatenate([timestamps, timestamps[:, n - 1 : n]], axis=1)
        delta = ext[:, 1:, None] - ext[:, None, :-1]  # (B, N, N)
        buckets = _bucketize_time_delta(delta, self.num_buckets)
        rel_ts_bias = ts_w[buckets]
        return (rel_pos_bias[None] + rel_ts_bias).astype(self.dtype)


class StackedRelativeBias(nn.Module):
    """All blocks' relative-attention biases in one pass: (num_blocks, B, N, N).

    Each HSTU block owns independent bias weights (the reference instantiates
    one `RelativeBucketedTimeAndPositionBasedBias` per block,
    `hstu.py:584-612`), but the bucketized time-delta *indices* depend only on
    the timestamps. Computing per block makes XLA re-fuse the (B, N, N)
    gather into every attention consumer (8 heads x 16 blocks on ML-20M
    shapes — measured ~8x the encode time on TPU). Here: one bucket
    computation + one row-gather from a (num_buckets+1, num_blocks) table,
    fenced with an optimization barrier so the result is materialized once.
    """

    num_blocks: int
    max_seq_len: int
    num_buckets: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.pos_w = self.param(
            "pos_w", nn.initializers.normal(stddev=0.02),
            (self.num_blocks, 2 * self.max_seq_len - 1),
        )
        self.ts_w = self.param(
            "ts_w", nn.initializers.normal(stddev=0.02),
            (self.num_blocks, self.num_buckets + 1),
        )

    def __call__(
        self,
        timestamps: jnp.ndarray,                    # (B, N) int
        penalty: Optional[jnp.ndarray] = None,      # (B, N, N) additive
    ) -> jnp.ndarray:
        # Serving may run with n < max_seq_len (shorter padded batches);
        # relative offset r indexes the trained table at its center,
        # r + max_seq_len - 1.
        n = timestamps.shape[1]
        i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        rel_pos = self.pos_w[:, j - i + self.max_seq_len - 1]    # (L, N, N)

        ext = jnp.concatenate([timestamps, timestamps[:, n - 1 : n]], axis=1)
        delta = ext[:, 1:, None] - ext[:, None, :-1]             # (B, N, N)
        buckets = _bucketize_time_delta(delta, self.num_buckets)
        # Row gather: (B, N, N) indices into (num_buckets+1, L) -> one gather
        # with an L-wide payload instead of L scalar gathers.
        rel_ts = jnp.take(self.ts_w.T, buckets, axis=0)          # (B, N, N, L)
        bias = rel_pos[:, None] + jnp.moveaxis(rel_ts, -1, 0)    # (L, B, N, N)
        if penalty is not None:
            # Mask penalty folded in BEFORE the barrier: it fuses into the
            # bias materialization instead of costing a second (L, B, N, N)
            # HBM round-trip.
            bias = bias + penalty[None].astype(bias.dtype)
        return jax.lax.optimization_barrier(bias.astype(self.dtype))

    def pos_tables(self, n: int) -> jnp.ndarray:
        """Per-layer relative-position bias slabs, (L, n, n) fp32.

        Batch-independent (the bias at (i, j) depends only on j - i), so the
        fused kernel takes the expanded slab instead of re-gathering per
        user."""
        i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return self.pos_w[:, j - i + self.max_seq_len - 1].astype(jnp.float32)

    def ts_tables128(self) -> jnp.ndarray:
        """Per-layer time-bucket tables padded/truncated to 128 lanes, fp32.

        int32 timestamps bound buckets by ln(2^31)/0.301 = 71 < 128, so
        entries at index >= 128 are unreachable and truncation is exact; the
        fused kernel gathers these with a single-vreg dynamic_gather."""
        tbl = self.ts_w.astype(jnp.float32)
        l, e = tbl.shape
        if e < 128:
            tbl = jnp.pad(tbl, ((0, 0), (0, 128 - e)))
        return tbl[:, :128]

    def row(
        self, timestamps: jnp.ndarray, position: jnp.ndarray
    ) -> jnp.ndarray:
        """Bias row for a single query position per batch row:
        (num_blocks, B, N). `position` (B,) is the 0-based query index; the
        time part uses ts[position + 1] (the next-item timestamp, which the
        feature pipeline scatters at index `length`)."""
        n = timestamps.shape[1]
        b = timestamps.shape[0]
        j = jnp.arange(n)[None, :]                               # (1, N)
        rel_idx = j - position[:, None] + self.max_seq_len - 1   # (B, N)
        rel_pos = self.pos_w[:, rel_idx]                         # (L, B, N)

        ext = jnp.concatenate([timestamps, timestamps[:, n - 1 : n]], axis=1)
        ts_next = jnp.take_along_axis(
            ext, jnp.minimum(position + 1, n)[:, None], axis=1
        )                                                        # (B, 1)
        delta = ts_next - timestamps                             # (B, N)
        buckets = _bucketize_time_delta(delta, self.num_buckets)
        rel_ts = jnp.take(self.ts_w.T, buckets, axis=0)          # (B, N, L)
        return (rel_pos + jnp.moveaxis(rel_ts, -1, 0)).astype(self.dtype)


class HSTUBlock(nn.Module):
    """One sequential transduction unit (`SequentialTransductionUnitJagged`,
    `hstu.py:218-433`)."""

    cfg: HSTUConfig
    max_seq_len: int
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        h, dqk, dv = c.num_heads, c.dqk, c.dv
        self.uvqk = self.param(
            "uvqk",
            nn.initializers.normal(stddev=0.02),
            (c.embedding_dim, h * dv * 2 + h * dqk * 2),
        )
        # Output projection as explicit params (shared with the fused Pallas
        # block kernel). With concat_ua the projection consumes
        # [u, a, u*a] (`hstu.py:261-264,408-410`).
        o_in = h * dv * (3 if c.concat_ua else 1)
        self.o_kernel = self.param(
            "o_kernel", nn.initializers.xavier_uniform(),
            (o_in, c.embedding_dim),
        )
        self.o_bias = self.param(
            "o_bias", nn.initializers.zeros_init(), (c.embedding_dim,)
        )
        self.dropout = nn.Dropout(c.linear_dropout_rate)
        # Dropout on the (normalized) attention weights. NOTE: the reference
        # threads `attn_dropout_ratio` through its STU but never applies it
        # (`/root/reference/modeling/sequential/hstu.py:240` is stored, only
        # the debug string at `:659` reads it); here the config field is
        # honored for real. Published configs use 0.0, so parity holds.
        self.attn_dropout = nn.Dropout(c.attn_dropout_rate)

    def _o(self, o_input: jnp.ndarray) -> jnp.ndarray:
        return (
            jnp.einsum(
                "...f,fd->...d", o_input, self.o_kernel.astype(self.dtype),
                preferred_element_type=self.dtype,
            )
            + self.o_bias.astype(self.dtype)
        )

    def _ln(self, y):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.var(y, axis=-1, keepdims=True)
        return (y - mu) * jax.lax.rsqrt(var + self.cfg.epsilon)

    def _uvqk_proj(self, normed_x: jnp.ndarray):
        c = self.cfg
        h, dqk, dv = c.num_heads, c.dqk, c.dv
        y = jnp.einsum(
            "...d,df->...f", normed_x, self.uvqk.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        if c.linear_activation == "silu":
            y = jax.nn.silu(y)
        elif c.linear_activation != "none":
            raise ValueError(f"Unknown linear_activation {c.linear_activation!r}")
        return jnp.split(y, [h * dv, 2 * h * dv, 2 * h * dv + h * dqk], axis=-1)

    def __call__(
        self,
        x: jnp.ndarray,                 # (B, N, D)
        attn_mask: jnp.ndarray,         # (B, N, N) float {0,1}: causal * col-valid
        rel_bias: Optional[jnp.ndarray],  # (B, N, N) precomputed bias or None
        train: bool = False,
        return_kv: bool = False,
    ):
        c = self.cfg
        b, n, d = x.shape
        h, dqk, dv = c.num_heads, c.dqk, c.dv

        u, v, q, k = self._uvqk_proj(self._ln(x))
        kv = (k, v) if return_kv else None

        if c.normalization == "softmax_rel_bias":
            # The reference's softmax path is SINGLE-map attention over the
            # full h*dqk dim shared by every value head (`hstu.py:388-399`:
            # one `bnd,bmd->bnm` einsum + one bmm over h*dv — NOT per-head
            # softmax), scaled by sqrt(dqk) and masked AFTER normalization.
            s = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=self.dtype)
            if rel_bias is not None:
                s = s + rel_bias
            attn = jax.nn.softmax(
                s / jnp.sqrt(float(dqk)).astype(s.dtype), axis=-1
            )
            attn = attn * attn_mask.astype(attn.dtype)
            attn = self.attn_dropout(attn, deterministic=not train)
            attn_out = jnp.einsum(
                "bnm,bmd->bnd", attn, v, preferred_element_type=self.dtype
            )
        elif c.normalization in ("rel_bias", "hstu_rel_bias"):
            qh = q.reshape(b, n, h, dqk)
            kh = k.reshape(b, n, h, dqk)
            vh = v.reshape(b, n, h, dv)
            qk = jnp.einsum(
                "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=self.dtype
            )
            if rel_bias is not None:
                qk = qk + rel_bias[:, None, :, :]
            # Pointwise SiLU attention, normalized by the constant
            # 1/max_seq_len (`hstu.py:203` uses the full padded length; the
            # constant is part of the trained function, so it stays pinned
            # when serving with shorter padded batches).
            attn = jax.nn.silu(qk) * (1.0 / self.max_seq_len)
            attn = attn * attn_mask[:, None, :, :].astype(attn.dtype)
            attn = self.attn_dropout(attn, deterministic=not train)
            attn_out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, vh, preferred_element_type=self.dtype
            ).reshape(b, n, h * dv)
        else:
            raise ValueError(f"Unknown normalization {c.normalization!r}")

        if c.concat_ua:
            a = self._ln(attn_out)
            o_input = jnp.concatenate([u, a, u * a], axis=-1)
        else:
            o_input = u * self._ln(attn_out)
        o_input = self.dropout(o_input, deterministic=not train)
        out = self._o(o_input) + x
        if return_kv:
            return out, kv
        return out

    def decode_step(
        self,
        x_t: jnp.ndarray,               # (B, D) input at the new position
        k_cache: jnp.ndarray,           # (B, N, h*dqk)
        v_cache: jnp.ndarray,           # (B, N, h*dv)
        position: jnp.ndarray,          # (B,) new position index
        bias_row: Optional[jnp.ndarray],  # (B, N) bias at the query row
    ):
        """Incremental decode: process one appended position against cached
        keys/values. The TPU equivalent of the reference's
        `delta_x_offsets` cache path (`hstu.py:161-187,301-332`).

        Returns (y_t (B, D), k_cache, v_cache) with caches updated in-place
        at `position`.
        """
        c = self.cfg
        b, n, _ = k_cache.shape
        h, dqk, dv = c.num_heads, c.dqk, c.dv

        u, v, q, k = self._uvqk_proj(self._ln(x_t))   # each (B, h*d)
        rows = jnp.arange(b)
        k_cache = k_cache.at[rows, position].set(k)
        v_cache = v_cache.at[rows, position].set(v)

        # Causal columns: j <= position. Note the 1/n normalizer uses the
        # full padded length, matching the dense forward.
        col_ok = (jnp.arange(n)[None, :] <= position[:, None])
        if c.normalization == "softmax_rel_bias":
            # Single-map attention over the full h*dqk dim (see __call__).
            s = jnp.einsum(
                "bd,bmd->bm", q, k_cache, preferred_element_type=self.dtype
            )                                          # (B, N)
            if bias_row is not None:
                s = s + bias_row
            attn = jax.nn.softmax(
                s / jnp.sqrt(float(dqk)).astype(s.dtype), axis=-1
            ) * col_ok.astype(s.dtype)
            attn_out = jnp.einsum(
                "bm,bmd->bd", attn, v_cache, preferred_element_type=self.dtype
            )                                          # (B, h*dv)
        elif c.normalization in ("rel_bias", "hstu_rel_bias"):
            qh = q.reshape(b, h, dqk)
            kh = k_cache.reshape(b, n, h, dqk)
            vh = v_cache.reshape(b, n, h, dv)
            qk = jnp.einsum(
                "bhd,bmhd->bhm", qh, kh, preferred_element_type=self.dtype
            )                                          # (B, h, N)
            if bias_row is not None:
                qk = qk + bias_row[:, None, :]
            attn = (
                jax.nn.silu(qk) * (1.0 / self.max_seq_len)
                * col_ok.astype(qk.dtype)[:, None, :]
            )
            attn_out = jnp.einsum(
                "bhm,bmhd->bhd", attn, vh, preferred_element_type=self.dtype
            ).reshape(b, h * dv)
        else:
            raise ValueError(f"Unknown normalization {c.normalization!r}")

        if c.concat_ua:
            a = self._ln(attn_out)
            o_input = jnp.concatenate([u, a, u * a], axis=-1)
        else:
            o_input = u * self._ln(attn_out)
        y_t = self._o(o_input) + x_t
        return y_t, k_cache, v_cache


class HSTUStack(nn.Module):
    """Stack of HSTU blocks (`HSTUJagged`, `hstu.py:436-530`)."""

    cfg: HSTUConfig
    max_seq_len: int
    dtype: Any = jnp.float32

    def setup(self):
        if self.cfg.enable_relative_attention_bias:
            self.rel_attn_bias = StackedRelativeBias(
                num_blocks=self.cfg.num_blocks,
                max_seq_len=self.max_seq_len,
                num_buckets=self.cfg.num_time_buckets,
                dtype=self.dtype,
                name="rel_attn_bias",
            )
        else:
            self.rel_attn_bias = None
        self.blocks = [
            HSTUBlock(
                cfg=self.cfg,
                max_seq_len=self.max_seq_len,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.cfg.num_blocks)
        ]

    def _bias_all(
        self,
        timestamps: Optional[jnp.ndarray],
        penalty: Optional[jnp.ndarray] = None,
    ):
        if timestamps is None or self.rel_attn_bias is None:
            return None
        return self.rel_attn_bias(timestamps, penalty)

    def __call__(
        self,
        x: jnp.ndarray,
        valid: jnp.ndarray,              # (B, N) bool
        timestamps: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        b, n, _ = x.shape
        fused_train_ok = (
            train
            and self.cfg.fused_train
            and (
                self.rel_attn_bias is None
                or (timestamps is not None and timestamps.dtype == jnp.int32)
            )
        )
        if fused_train_ok:
            from rails_tpu.ops.pallas.hstu_block_train import (
                make_fused_train_block,
            )

            colmask = valid.astype(jnp.float32)
            if self.rel_attn_bias is not None:
                pos_all = self.rel_attn_bias.pos_tables(n)      # (L, N, N)
                tsw_all = self.rel_attn_bias.ts_tables128()     # (L, 128)
                ext = jnp.concatenate(
                    [timestamps, timestamps[:, n - 1 : n]], axis=1
                )
            else:
                pos_all = tsw_all = ext = None
            rate = self.cfg.linear_dropout_rate
            if rate > 0.0 or self.cfg.attn_dropout_rate > 0.0:
                seed0 = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            else:
                seed0 = jnp.int32(0)
            blk_fn = make_fused_train_block(
                num_heads=self.cfg.num_heads, dqk=self.cfg.dqk,
                dv=self.cfg.dv, inv_n=1.0 / self.max_seq_len,
                eps=self.cfg.epsilon, dropout_rate=rate,
                num_buckets=self.cfg.num_time_buckets,
                activation=self.cfg.linear_activation,
                normalization=self.cfg.normalization,
                concat_ua=self.cfg.concat_ua,
                attn_dropout_rate=self.cfg.attn_dropout_rate,
            )
            for layer_idx, block in enumerate(self.blocks):
                x = blk_fn(
                    x, colmask,
                    pos_all[layer_idx] if pos_all is not None else None,
                    ext,
                    tsw_all[layer_idx] if tsw_all is not None else None,
                    block.uvqk.astype(self.dtype),
                    block.o_kernel.astype(self.dtype),
                    block.o_bias.astype(jnp.float32),
                    seed0 + jnp.int32(layer_idx) * jnp.int32(1013904223),
                )
            return x * valid[..., None].astype(x.dtype)
        if self.cfg.fused_inference and not train:
            from rails_tpu.ops.pallas.hstu_block import fused_hstu_block

            softmax = self.cfg.normalization == "softmax_rel_bias"
            colmask = valid.astype(jnp.float32)
            use_internal = (
                timestamps is not None
                and self.rel_attn_bias is not None
                and timestamps.dtype == jnp.int32
            )
            if use_internal:
                # Internal-bias mode: the kernel computes rel-pos + bucketized
                # time bias + causal/validity penalty per user in VMEM — the
                # (L, B, N, N) HBM bias build (the round-1 encode bottleneck,
                # ~2/3 of encode time at ML-20M geometry) disappears.
                pos_all = self.rel_attn_bias.pos_tables(n)       # (L, N, N)
                tsw_all = self.rel_attn_bias.ts_tables128()      # (L, 128)
                ext = jnp.concatenate(
                    [timestamps, timestamps[:, n - 1 : n]], axis=1
                )
                bias_all = None
            elif softmax:
                # softmax applies the mask after normalization — raw bias,
                # in-kernel mask multiply.
                bias_all = self._bias_all(timestamps)
            else:
                # Precomputed-bias fallback (e.g. int64 timestamps). Fold
                # causality + column validity into the bias as a -30000
                # additive penalty: silu's tanh-form sigmoid saturates to an
                # exact 0 there, and the kernel skips a per-head (N, N) mask
                # multiply.
                causal = jnp.tril(jnp.ones((n, n), dtype=jnp.float32))
                mask = causal[None] * colmask[:, None, :]
                bias_all = self._bias_all(timestamps, (mask - 1.0) * 30000.0)
            for layer_idx, block in enumerate(self.blocks):
                x = fused_hstu_block(
                    x,
                    bias_all[layer_idx] if bias_all is not None else None,
                    colmask,
                    block.uvqk.astype(self.dtype),
                    block.o_kernel.astype(self.dtype),
                    block.o_bias.astype(jnp.float32),
                    num_heads=self.cfg.num_heads,
                    dqk=self.cfg.dqk,
                    dv=self.cfg.dv,
                    inv_n=1.0 / self.max_seq_len,
                    eps=self.cfg.epsilon,
                    mask_in_bias=bias_all is not None and not softmax,
                    time_bias=(
                        (pos_all[layer_idx], ext, tsw_all[layer_idx])
                        if use_internal
                        else None
                    ),
                    num_buckets=self.cfg.num_time_buckets,
                    activation=self.cfg.linear_activation,
                    normalization=self.cfg.normalization,
                )
            return x * valid[..., None].astype(x.dtype)
        bias_all = self._bias_all(timestamps)
        causal = jnp.tril(jnp.ones((n, n), dtype=jnp.float32))
        attn_mask = causal[None] * valid[:, None, :].astype(jnp.float32)
        for layer_idx, block in enumerate(self.blocks):
            x = block(
                x, attn_mask,
                bias_all[layer_idx] if bias_all is not None else None,
                train=train,
            )
        # Reference round-trips through jagged_to_padded_dense at the end,
        # zeroing padded rows (`hstu.py:524-529`).
        return x * valid[..., None].astype(x.dtype)

    # ------------------------------------------------------------------ #
    # Incremental decode (KV-style cache; `hstu.py:141,161-187,301-332`).
    # ------------------------------------------------------------------ #

    def prefill(
        self,
        x: jnp.ndarray,
        valid: jnp.ndarray,
        timestamps: Optional[jnp.ndarray],
    ):
        """Full forward that also materializes per-layer (k, v) caches.

        Returns (y (B, N, D), cache) with cache a tuple of per-layer
        (k (B, N, h*dqk), v (B, N, h*dv)).
        """
        c = self.cfg
        b, n, _ = x.shape
        causal = jnp.tril(jnp.ones((n, n), dtype=jnp.float32))
        attn_mask = causal[None] * valid[:, None, :].astype(jnp.float32)
        bias_all = self._bias_all(timestamps)
        cache = []
        for layer_idx, block in enumerate(self.blocks):
            # Single uvqk projection per block: the block returns its (k, v)
            # alongside the output instead of re-projecting for the cache.
            x, (k, v) = block(
                x, attn_mask,
                bias_all[layer_idx] if bias_all is not None else None,
                train=False,
                return_kv=True,
            )
            cache.append((k, v))
        return x * valid[..., None].astype(x.dtype), tuple(cache)

    def decode_step(
        self,
        x_t: jnp.ndarray,               # (B, D)
        cache,                          # tuple of per-layer (k, v)
        position: jnp.ndarray,          # (B,)
        timestamps: Optional[jnp.ndarray],   # (B, N) incl. next-item ts
    ):
        """One appended position through all blocks with cached K/V."""
        new_cache = []
        bias_rows = (
            self.rel_attn_bias.row(timestamps, position)
            if (timestamps is not None and self.rel_attn_bias is not None)
            else None
        )
        for layer_idx, block in enumerate(self.blocks):
            k_c, v_c = cache[layer_idx]
            x_t, k_c, v_c = block.decode_step(
                x_t, k_c, v_c, position,
                bias_rows[layer_idx] if bias_rows is not None else None,
            )
            new_cache.append((k_c, v_c))
        return x_t, tuple(new_cache)
