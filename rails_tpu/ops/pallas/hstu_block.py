"""Fully-fused HSTU block forward (inference) as a Pallas kernel.

One grid step processes a GROUP of sequences through an entire HSTU block in
VMEM: LayerNorm -> fused uvqk matmul + SiLU -> per-head pointwise-SiLU
attention (+ relative bias, causal & validity masks, 1/N normalization) ->
u * LayerNorm(attn) -> output projection + residual. The XLA path
materializes the (B, N, 4hd) projection and the (B, h, N, N) attention
tensors in HBM per block; here HBM traffic per block is just x in/out, the
(B, N, N) bias slice, and the weights.

Performance notes (measured on v5e, ML-20M geometry):
  - The projection/output matmuls run on bf16 operands with fp32 MXU
    accumulation. q/k/v are cast back to bf16 *before* the attention
    matmuls — leaving them fp32 (the silu output dtype) forces multi-pass
    fp32 MXU emulation and was the round-1 kernel's main encode bottleneck.
  - Grouping `block_users` sequences per grid step turns the (N, D) x (D, F)
    projection into (G*N, D) x (D, F), amortizing weight residency and
    pipeline bubbles across users.
  - The 1/N attention normalizer is folded into v (N*dv elements) instead of
    the (h, N, N) attention tensor.
  - sigmoid/silu go through the exact tanh identity (fast HW tanh; Mosaic
    lowers jax.nn.silu via exp, which measured ~1.5x slower end-to-end).

Used for the serving/eval path (`HSTUConfig.fused_inference`); training keeps
the XLA path (autodiff + dropout).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from rails_tpu.ops.pallas.mol_scoring import _sigmoid_tanh

# fp32 bytes of the (G*N, F) projection buffer allowed per grid step; G is
# chosen as the largest divisor of B whose buffer fits. ~3.5 MB at ML-20M
# geometry (N=211, F=1024, G=4) leaves headroom in ~16 MB VMEM for the
# double-buffered x/bias/out blocks and the attention intermediates.
_PROJ_BUF_BYTES = 4 * 1024 * 1024

# Lane width of the VPU vreg: a dynamic_gather table must fit 128 lanes.
_LANES = 128


def _ln(y: jnp.ndarray, eps: float) -> jnp.ndarray:
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + eps)


def _lane_gather(tbl_row: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[r, c] = tbl_row[idx[r, c]] for a table of <= 128 entries.

    `jnp.take_along_axis(op2d, idx2d, axis=1)` with equal shapes lowers to
    `tpu.dynamic_gather` along lanes; wider index matrices run in overlapping
    128-column chunks (idx values must be < 128).
    """
    r, c = idx.shape
    tbl = jnp.broadcast_to(tbl_row[None, :], (r, _LANES))
    if c <= _LANES:
        idx_p = jnp.pad(idx, ((0, 0), (0, _LANES - c)))
        return jnp.take_along_axis(tbl, idx_p, axis=1)[:, :c]
    parts = [jnp.take_along_axis(tbl, idx[:, :_LANES], axis=1)]
    done = _LANES
    while done < c:
        # Gather each chunk at its own offset; the final chunk overlaps the
        # previous one (start backs up to c-128) and the overlap is sliced off.
        start = min(done, c - _LANES)
        chunk = jnp.take_along_axis(tbl, idx[:, start : start + _LANES], axis=1)
        parts.append(chunk[:, done - start :])
        done = start + _LANES
    return jnp.concatenate(parts, axis=1)


def _time_bucket(delta: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """trunc(log|delta| / 0.301) clipped to [0, min(num_buckets, 127)] —
    the ONE in-kernel definition of the reference's bucketization fn
    (`hstu.py:600-602`). The serving kernel, the training kernels, and the
    backward's d_tsw bucket binning must agree bit-for-bit (the gradient
    lands in the bin the forward read); int32 timestamps bound buckets by
    ln(2^31)/0.301 = 71 < 128, so the 128-lane table is exact."""
    fdelta = jnp.maximum(jnp.abs(delta), 1).astype(jnp.float32)
    return jnp.clip(
        (jnp.log(fdelta) * (1.0 / 0.301)).astype(jnp.int32),
        0,
        min(num_buckets, _LANES - 1),
    )


def _kernel(
    x_ref,        # (G, N, D)
    bias_ref,     # (G, N, N) or dummy (G, 1, 1) (decided by has_bias)
    colmask_ref,  # (G, 1, N) float {0,1}
    relpos_ref,   # (N, N) fp32 layer rel-pos bias, or dummy (1, 1)
    ext_ref,      # (G, 1, N+1) int32 extended timestamps, or dummy (G, 1, 1)
    nxt_ref,      # (G, N, 1) int32 next-item timestamps, or dummy (G, 1, 1)
    tsw_ref,      # (1, 128) fp32 time-bucket table, or dummy (1, 1)
    uvqk_ref,     # (D, F)
    ow_ref,       # (h*dv, D)
    ob_ref,       # (1, D)
    out_ref,      # (G, N, D)
    *,
    group: int,
    num_heads: int,
    dqk: int,
    dv: int,
    inv_n: float,
    eps: float,
    has_bias: bool,
    mask_in_bias: bool,
    internal_bias: bool,
    num_buckets: int,
    activation: str,
    softmax: bool,
    concat_ua: bool,
    probe_skip: tuple = (),
):
    g, n, d = x_ref.shape
    h = num_heads
    mm_dtype = uvqk_ref.dtype  # bf16 in the serving path, fp32 in fp32 tests

    # Group-batched projection when D tiles the 128-lane dim exactly (the
    # (G, N, D) -> (G*N, D) sublane collapse is only lowerable then);
    # otherwise one matmul per user — same math, smaller MXU batches.
    if d % 128 == 0:
        x2 = x_ref[...].reshape(g * n, d)             # (G*N, D)
        normed = _ln(x2.astype(jnp.float32), eps)
        y = jnp.dot(
            normed.astype(mm_dtype), uvqk_ref[...],
            preferred_element_type=jnp.float32,
        )                                             # (G*N, F) fp32
        y_of = lambda gi: y[gi * n : (gi + 1) * n]    # noqa: E731
    else:
        ys = [
            jnp.dot(
                _ln(x_ref[gi].astype(jnp.float32), eps).astype(mm_dtype),
                uvqk_ref[...],
                preferred_element_type=jnp.float32,
            )
            for gi in range(group)
        ]
        y_of = lambda gi: ys[gi]                      # noqa: E731

    if mask_in_bias:
        # The caller folded causality + column validity into the bias as a
        # -30000 additive penalty: tanh saturates exactly to -1 there, so
        # silu(qk) is an exact 0 with no per-head mask multiply.
        mask = None
        causal = None
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        causal = (col <= row).astype(jnp.float32)

    rsqrt_dqk = 1.0 / float(dqk) ** 0.5

    for gi in range(group):
        y_g = y_of(gi)                                # (N, F) fp32
        if activation == "silu" and "proj_silu" not in probe_skip:
            y_g = y_g * _sigmoid_tanh(y_g)            # silu, tanh form
        u = y_g[:, : h * dv]                          # fp32 (for gating)
        # Attention operands drop to the matmul dtype; for the pointwise-
        # SiLU attention the 1/N normalizer folds into v (softmax
        # normalizes itself).
        v = y_g[:, h * dv : 2 * h * dv]
        if not softmax:
            v = v * inv_n
        v = v.astype(mm_dtype)
        q = y_g[:, 2 * h * dv : 2 * h * dv + h * dqk].astype(mm_dtype)
        k = y_g[:, 2 * h * dv + h * dqk :].astype(mm_dtype)
        if internal_bias:
            # Bucketized time-delta bias computed entirely in VMEM: no
            # (L, B, N, N) HBM bias tensor exists anywhere. delta(i, j) =
            # ts[i+1] - ts[j] (the reference's next-item gap semantics);
            # bucket via the shared `_time_bucket`, then a 128-lane
            # dynamic_gather picks the layer's bucket weight.
            colmask_g = colmask_ref[gi, 0][None, :].astype(jnp.float32)
            if "bias" in probe_skip:        # probe: drop the bias BUILD
                bias = jnp.zeros((n, n), jnp.float32)
            else:
                delta = nxt_ref[gi] - ext_ref[gi, 0, :n].reshape(1, n)  # (N,N)
                bk = _time_bucket(delta, num_buckets)
                ts_bias = _lane_gather(tsw_ref[0], bk)
                bias = relpos_ref[...] + ts_bias
            if softmax:
                # The reference applies the mask AFTER softmax (masked
                # columns still feed the denominator), so the penalty trick
                # is out: keep the raw bias and a real mask multiply.
                mask = causal * colmask_g
            else:
                bias = bias + (causal * colmask_g - 1.0) * 30000.0
                mask = None
        elif not mask_in_bias:
            mask = causal * colmask_ref[gi, 0][None, :].astype(jnp.float32)
            bias = bias_ref[gi].astype(jnp.float32) if has_bias else None
        else:
            bias = bias_ref[gi].astype(jnp.float32) if has_bias else None
        if softmax:
            # Reference softmax semantics (`hstu.py:388-399`): ONE attention
            # map over the FULL h*dqk contraction, shared by all value
            # heads, scaled by sqrt(dqk), mask applied after normalization.
            qk = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # (N, N) fp32
            if bias is not None:
                qk = qk + bias
            p = qk * rsqrt_dqk
            p = p - jnp.max(p, axis=1, keepdims=True)
            e = jnp.exp(p)
            a = e / jnp.sum(e, axis=1, keepdims=True)
            if mask is not None:
                a = a * mask
            attn = jnp.dot(
                a.astype(mm_dtype), v, preferred_element_type=jnp.float32
            )                                         # (N, h*dv) fp32
        elif "attn" in probe_skip:           # probe: drop qk/av entirely
            attn = v.astype(jnp.float32)
        else:
            # probe: run the whole per-head gate pipeline (qk accumulate,
            # bias add, silu, av input) in bf16 — isolates the f32 VPU +
            # per-head (N, N) convert cost.
            attn_bf16 = "attn_bf16" in probe_skip
            gate_dtype = mm_dtype if attn_bf16 else jnp.float32
            bias_g = (
                bias.astype(gate_dtype) if bias is not None else None
            )
            attn_cols = []
            for head in range(h):
                qh = q[:, head * dqk : (head + 1) * dqk]
                kh = k[:, head * dqk : (head + 1) * dqk]
                vh = v[:, head * dv : (head + 1) * dv]
                qk = jax.lax.dot_general(
                    qh, kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=gate_dtype,
                )                                     # (N, N)
                # probe: skip the per-head bias add (bias BUILD kept)
                if bias_g is not None and "attn_bias_add" not in probe_skip:
                    qk = qk + bias_g
                if "attn_silu" in probe_skip:   # probe: linear gate
                    a = qk * jnp.asarray(0.25, gate_dtype)
                else:
                    a = qk * _sigmoid_tanh(qk)
                if mask is not None:
                    a = a * mask.astype(gate_dtype)
                if not attn_bf16:
                    a = a.astype(mm_dtype)
                attn_cols.append(
                    jnp.dot(a, vh, preferred_element_type=jnp.float32)
                )                                     # (N, dv); 1/N is in v
            attn = jnp.concatenate(attn_cols, axis=1)  # (N, h*dv) fp32

        if concat_ua:
            a_ln = _ln(attn, eps)
            o_input = jnp.concatenate(
                [u, a_ln, u * a_ln], axis=1
            )                                         # (N, 3*h*dv)
        else:
            o_input = u * _ln(attn, eps)
        out = (
            jnp.dot(
                o_input.astype(ow_ref.dtype), ow_ref[...],
                preferred_element_type=jnp.float32,
            )
            + ob_ref[0][None, :]
            + x_ref[gi].astype(jnp.float32)
        )
        out_ref[gi] = out.astype(out_ref.dtype)


def _pick_group(b: int, n: int, f: int, requested: Optional[int]) -> int:
    if requested is not None:
        assert b % requested == 0, (b, requested)
        return requested
    limit = max(1, _PROJ_BUF_BYTES // (n * f * 4))
    for g in (16, 8, 4, 2, 1):
        if g <= limit and b % g == 0:
            return g
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "dqk", "dv", "inv_n", "eps", "interpret", "block_users",
        "mask_in_bias", "num_buckets", "activation", "normalization",
        "probe_skip",
    ),
)
def fused_hstu_block(
    x: jnp.ndarray,               # (B, N, D)
    bias: Optional[jnp.ndarray],  # (B, N, N) or None
    colmask: jnp.ndarray,         # (B, N) float {0,1} column validity
    uvqk: jnp.ndarray,            # (D, F)
    o_kernel: jnp.ndarray,        # (h*dv, D)
    o_bias: jnp.ndarray,          # (D,)
    num_heads: int,
    dqk: int,
    dv: int,
    inv_n: float,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
    block_users: Optional[int] = None,
    mask_in_bias: bool = False,
    time_bias: Optional[tuple] = None,
    num_buckets: int = 128,
    activation: str = "silu",
    normalization: str = "rel_bias",
    probe_skip: tuple = (),
) -> jnp.ndarray:
    """One HSTU block forward; semantics of `HSTUBlock.__call__` (eval).

    `probe_skip` is MEASUREMENT-ONLY (`cli/hstu_probe.py`): a tuple of
    kernel terms to drop so their device cost can be attributed by
    difference — "proj_silu" (the (N, F) projection silu), "bias" (the
    in-VMEM time-bucket bias build), "attn_silu" (the per-head (N, N)
    gating silu, replaced by a linear scale), "attn" (the qk/av matmuls
    entirely). Results are WRONG under any non-empty value; production
    callers must leave it ().

    `mask_in_bias=True` promises that `bias` already carries a -30000
    additive penalty at masked (causal/invalid-column) positions, letting
    the kernel skip the per-head mask multiply.

    `time_bias=(rel_pos, ext, tsw128)` switches to the internal-bias mode:
    the relative-attention bias is computed inside the kernel (rel-pos slab +
    VMEM-gathered bucketized time bias + causal/validity penalty) and NO
    per-layer (B, N, N) bias tensor ever touches HBM. `rel_pos` is the
    layer's (N, N) fp32 position bias, `ext` the (B, N+1) int32 extended
    timestamps, `tsw128` the layer's (128,) fp32 bucket table (entries past
    127 are unreachable for int32 timestamps). Mutually exclusive with
    `bias`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n, d = x.shape
    f = uvqk.shape[1]
    group = _pick_group(b, n, f, block_users)
    has_bias = bias is not None
    internal = time_bias is not None
    softmax = normalization == "softmax_rel_bias"
    assert normalization in ("rel_bias", "hstu_rel_bias", "softmax_rel_bias")
    assert activation in ("silu", "none"), activation
    assert has_bias or not mask_in_bias, "mask_in_bias requires a bias"
    assert not (has_bias and internal), "bias and time_bias are exclusive"
    assert not (softmax and mask_in_bias), (
        "softmax applies the mask after normalization; fold-in changes the "
        "denominator — pass the raw bias with mask_in_bias=False"
    )
    concat_ua = o_kernel.shape[0] == 3 * num_heads * dv
    if internal:
        rel_pos, ext, tsw128 = time_bias
        assert ext.dtype == jnp.int32, "internal time bias requires int32 ts"
        assert ext.shape == (b, n + 1), ext.shape
        assert rel_pos.shape == (n, n), rel_pos.shape
        nxt = ext[:, 1:, None]                       # (B, N, 1) column layout
        ext3 = ext[:, None, :]                       # (B, 1, N+1) row layout
        relpos_spec = pl.BlockSpec(
            (n, n), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        ext_spec = pl.BlockSpec(
            (group, 1, n + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        nxt_spec = pl.BlockSpec(
            (group, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        tsw_spec = pl.BlockSpec(
            (1, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        tsw128 = tsw128.reshape(1, _LANES).astype(jnp.float32)
        rel_pos = rel_pos.astype(jnp.float32)
    else:
        rel_pos = jnp.zeros((1, 1), jnp.float32)
        ext3 = jnp.zeros((b, 1, 1), jnp.int32)
        nxt = jnp.zeros((b, 1, 1), jnp.int32)
        tsw128 = jnp.zeros((1, 1), jnp.float32)
        relpos_spec = pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        ext_spec = pl.BlockSpec(
            (group, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        nxt_spec = pl.BlockSpec(
            (group, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        tsw_spec = pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    if not has_bias:
        # Fixed kernel arity: dummy per-row zero bias block (never read).
        bias = jnp.zeros((b, 1, 1), dtype=x.dtype)
    bias_block = (group, n, n) if has_bias else (group, 1, 1)
    kernel = functools.partial(
        _kernel,
        group=group, num_heads=num_heads, dqk=dqk, dv=dv,
        inv_n=inv_n, eps=eps, has_bias=has_bias, mask_in_bias=mask_in_bias,
        internal_bias=internal, num_buckets=num_buckets,
        activation=activation, softmax=softmax, concat_ua=concat_ua,
        probe_skip=probe_skip,
    )
    in_specs = [
        pl.BlockSpec(
            (group, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(bias_block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (group, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        relpos_spec,
        ext_spec,
        nxt_spec,
        tsw_spec,
        pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (o_kernel.shape[0], d), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        x, bias, colmask[:, None, :], rel_pos, ext3, nxt, tsw128,
        uvqk, o_kernel, o_bias[None, :],
    ]

    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (group, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # Disjoint output block per grid step; "parallel" lets the
            # megacore partitioner split the grid (v4/v5p).
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * f + 4 * b * num_heads * n * n * dqk,
            bytes_accessed=(
                2 * x.size * x.dtype.itemsize
                + (bias.size * bias.dtype.itemsize if has_bias else 0)
                + uvqk.size * uvqk.dtype.itemsize * (b // group)
            ),
            transcendentals=b * n * (f + num_heads * n + (n if internal else 0)),
        ),
        interpret=interpret,
    )(*operands)
