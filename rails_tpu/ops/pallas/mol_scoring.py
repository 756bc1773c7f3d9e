"""Fused MoL corpus-scoring Pallas kernel.

The serving hot loop of RAILS is scoring B queries against X corpus items with
the Mixture-of-Logits similarity (`/root/reference/rails/similarities/mol/
similarity_fn.py:341-413` + the qi gating MLP). The XLA path materializes the
(B, X, L) component logits and the (B, X, H) gating hidden layer in HBM —
several hundred MB of traffic per batch at ML-20M scale. This kernel runs the
whole pipeline per corpus block in VMEM:

    logits[l=(n,m)] = <q_n, x_m> / T            (P_Q x P_X component matmuls)
    qi      = W2' silu(W1' logits + b1) + b2    (gating qi MLP)
    gi      = qp (x) ip + qi ; gw = gi*sigmoid(gi)   ("glu_silu" combination)
    out     = sum_l softmax_l(gw) * logits

laid out "logit-major" (L, B, TX): component logits write as full rows, the
gating MLP contracts over the sublane dimension, and the softmax reduces over
L — no transposes anywhere. HBM traffic drops to reading the item tables once
and writing (B, X) scores.

Supported config: gating_combination_type="glu_silu" with query+item gating
partials and a hidden qi MLP — the configuration every published RAILS
experiment uses. Other combinations fall back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Lane width of the emitted per-corpus-block maxima window: the maxima
# output revisits one (block_b, 128) block per 128 consecutive corpus grid
# steps (a 1-lane output block cannot lower on TPU — last block dim must be
# 128-divisible or span the array, and the array spans X/block_x tiles).
_BLOCKMAX_LANES = 128


def _sigmoid_tanh(x):
    """sigmoid via the exact identity 0.5*(1 + tanh(x/2)).

    Mosaic lowers `jax.nn.sigmoid`/`silu` through exp, which dominates this
    kernel's runtime (measured: exp-form silu+sigmoid cost ~22 ms of a
    64 ms batch at 2M items; the tanh form runs ~3x faster on the v5e
    vector unit). The identity is exact — differences are ulp-level."""
    return 0.5 * (1.0 + jnp.tanh(0.5 * x))


def _kernel(
    q_ref,        # (P_Q, B, d_P)        query component embeddings
    qp_ref,       # (B, L)               query gating partial
    item_ref,     # (P_X, d_P, TX)       item component block (transposed)
    ip_ref,       # (L, TX)              item gating partial block
    w1_ref,       # (L, H)
    b1_ref,       # (1, H)
    w2_ref,       # (H, L)
    b2_ref,       # (1, L)
    *refs,        # [comp_scale (P_X, TX), ip_scale (1, TX)]? out[s], scratch
    p_q: int,
    p_x: int,
    inv_temperature: float,
    mlp_dtype,
    quantized: bool = False,
    emit_blockmax: bool = False,
):
    if quantized:
        cs_ref, ips_ref, *refs = refs
    else:
        cs_ref = ips_ref = None
    if emit_blockmax:
        valid_ref, out_ref, out_max_ref, logits_ref = refs
    else:
        out_ref, logits_ref = refs
        out_max_ref = valid_ref = None
    b = q_ref.shape[1]
    d_p = q_ref.shape[2]
    tx = item_ref.shape[2]
    l = p_q * p_x

    # Component logits: one (P_Q*B, d_P) x (d_P, TX) matmul per ITEM group —
    # batching the query groups quadruples MXU row utilization at serving
    # batch sizes (B=32 alone fills only a quarter of the systolic rows).
    # The logit axis is M-MAJOR (l' = m*P_Q + n): each group's (P_Q, B, TX)
    # result stores as ONE contiguous scratch slice instead of P_Q strided
    # row writes (the strided relayout measured ~20 ms/batch at 2M items —
    # most of the logits-stage cost). The gating weights / partials arrive
    # permuted to match (see `m_major_perm`); the final sum over l is
    # order-invariant, so scores are unchanged.
    #
    # int8 tables: the block dequantizes to the matmul dtype in VMEM and the
    # per-(component, item) scale folds in AFTER the matmul (mathematically
    # identical to scaling the table; table bytes halve, which doubles the
    # corpus a chip can hold — measured throughput-neutral at B=32, where
    # the step is VPU/select-bound, not table-read-bound: docs/STATUS.md).
    q_flat = q_ref[:].reshape(p_q * b, d_p)
    for m in range(p_x):
        im = item_ref[m]                       # (d_P, TX)
        if quantized:
            im = im.astype(mlp_dtype)
        raw = jnp.dot(q_flat, im, preferred_element_type=jnp.float32)
        if quantized:
            raw = raw * cs_ref[m][None, :].astype(jnp.float32)
        logits_ref[m * p_q : (m + 1) * p_q] = (
            raw * inv_temperature
        ).reshape(p_q, b, tx)

    logits = logits_ref[:].reshape(l, b * tx)              # (L, B*TX) f32

    # qi gating MLP, contracting over the logit (sublane) axis. With bf16
    # tables the MLP inputs run in bf16 (f32 accumulate): the v5e MXU
    # executes f32 matmuls at ~1/4 the bf16 rate, and this MLP carries 2/3
    # of the kernel's FLOPs — bf16 here matches the reference's MoL bf16
    # autocast (`similarity_fn.py:360-362`). Scores still combine in f32.
    h = jax.lax.dot_general(
        w1_ref[:].astype(mlp_dtype), logits.astype(mlp_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (H, B*TX)
    h = h + b1_ref[0][:, None]
    h = h * _sigmoid_tanh(h)                                # silu, tanh form
    qi = jax.lax.dot_general(
        w2_ref[:].astype(mlp_dtype), h.astype(mlp_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (L, B*TX)
    qi = (qi + b2_ref[0][:, None]).reshape(l, b, tx)

    # glu_silu combination: gi = qp*ip + qi; gw = gi * sigmoid(gi).
    ip = ip_ref[:].astype(jnp.float32)
    if quantized:
        ip = ip * ips_ref[0][None, :].astype(jnp.float32)
    gi = (
        qp_ref[:].astype(jnp.float32).T[:, :, None]
        * ip[:, None, :]
        + qi
    )
    gw = gi * _sigmoid_tanh(gi)

    # Softmax over the logit axis and the weighted combine. Reuse the
    # already-loaded logits value rather than re-reading the scratch ref,
    # and normalize AFTER the weighted sum: sum(e*logit)/sum(e) replaces a
    # per-element (L, B, TX) division with one (B, TX) division.
    gw_max = jnp.max(gw, axis=0, keepdims=True)
    e = jnp.exp(gw - gw_max)
    s1 = jnp.sum(e * logits.reshape(l, b, tx), axis=0)
    s0 = jnp.sum(e, axis=0)
    vals = s1 / s0
    if out_max_ref is not None:
        # Pad columns (id 0 — kernel padding or mid-corpus pad rows) mask
        # IN-kernel on this path, so the emitted block maxima are
        # post-mask exact and the caller skips its (B, X) masking pass.
        vals = jnp.where(valid_ref[0][None, :] != 0, vals, -1.0e30)
        out_ref[:] = vals
        # Per-(query, corpus-block) max of the FINAL scores — free here (the
        # scores are live in VMEM), and it lets the exact top-k skip the
        # hierarchical select's stage-1 streaming pass over the (B, X) row
        # (measured 5.2 ms per M items, docs/STATUS.md r5 decomposition).
        #
        # The maxima block is a 128-lane WINDOW revisited across 128
        # consecutive corpus steps (Mosaic cannot lower a 1-lane output
        # block; r5 on-chip 8M repro): step i owns lane i % 128 and blends
        # it in with a one-hot select. Lanes beyond the final window (and
        # any step the window doesn't reach) stay at the -1e30 fill written
        # when the window first becomes resident.
        i = pl.program_id(1)
        lane = i % _BLOCKMAX_LANES
        m = jnp.max(vals, axis=1, keepdims=True)          # (block_b, 1)

        @pl.when(lane == 0)
        def _init_window():
            out_max_ref[:] = jnp.full_like(out_max_ref, -1.0e30)

        lane_ids = jax.lax.broadcasted_iota(
            jnp.int32, out_max_ref.shape, 1
        )
        out_max_ref[:] = jnp.where(lane_ids == lane, m, out_max_ref[:])
    else:
        out_ref[:] = vals


def _ub_kernel(
    q_ref,        # (P_Q, B, d_P)
    item_ref,     # (P_X, d_P, TX)
    *refs,        # [comp_scale (P_X, TX)]? out
    p_q: int,
    p_x: int,
    inv_temperature: float,
    mlp_dtype,
    quantized: bool = False,
):
    """max_l <q_n, x_m>/T per (query, item) — a sound upper bound on the MoL
    score: the mixture weights are a softmax (positive, sum 1), so
    score = sum_l w_l * logits_l <= max_l logits_l. No gating MLP, no
    transcendentals — MXU matmuls + a max reduce, so the bound pass runs at
    a fraction of the full scoring kernel's (VPU-bound) cost."""
    if quantized:
        cs_ref, out_ref = refs
    else:
        (out_ref,) = refs
        cs_ref = None
    b = q_ref.shape[1]
    d_p = q_ref.shape[2]
    tx = item_ref.shape[2]
    q_flat = q_ref[:].reshape(p_q * b, d_p)
    ub = None
    for m in range(p_x):
        im = item_ref[m]
        if quantized:
            im = im.astype(mlp_dtype)
        raw = jnp.dot(q_flat, im, preferred_element_type=jnp.float32)
        if quantized:
            raw = raw * cs_ref[m][None, :].astype(jnp.float32)
        g = jnp.max(raw.reshape(p_q, b, tx), axis=0)    # (B, TX)
        ub = g if ub is None else jnp.maximum(ub, g)
    out_ref[:] = ub * inv_temperature


def _group_block_max_kernel(
    q_ref,        # (P_Q, B, d_P)
    item_ref,     # (P_X, d_P, TX)
    *refs,        # [comp_scale (P_X, TX)]? out (1, L, B)
    p_q: int,
    p_x: int,
    inv_temperature: float,
    mlp_dtype,
    quantized: bool = False,
):
    """Per-(query, component-group) max logit over one corpus block:
    out[0, l, b] = max_{x in block} <q_n(l), x_m(l)> / T, rows in the
    kernel's m-major logit order (l = m*P_Q + n). Component matmuls only —
    none of the gating chain's VPU/transcendental cost — so the pass runs
    at the MXU roofline while exposing PER-GROUP structure the scalar UB
    kernel (`_ub_kernel`) collapses away."""
    if quantized:
        cs_ref, out_ref = refs
    else:
        (out_ref,) = refs
        cs_ref = None
    b = q_ref.shape[1]
    d_p = q_ref.shape[2]
    tx = item_ref.shape[2]
    q_flat = q_ref[:].reshape(p_q * b, d_p)
    for m in range(p_x):
        im = item_ref[m]
        if quantized:
            im = im.astype(mlp_dtype)
        raw = jnp.dot(q_flat, im, preferred_element_type=jnp.float32)
        if quantized:
            raw = raw * cs_ref[m][None, :].astype(jnp.float32)
        out_ref[0, m * p_q : (m + 1) * p_q, :] = (
            jnp.max(raw.reshape(p_q, b, tx), axis=2) * inv_temperature
        )


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "block_x", "block_b", "interpret"),
)
def fused_mol_group_block_max(
    q_comp: jnp.ndarray,          # (B, P_Q, d_P)
    item_comp_t: jnp.ndarray,     # (P_X, d_P, X) — kernel layout, X padded
    temperature: float,
    block_x: int = 256,
    block_b: int = 32,
    interpret: Optional[bool] = None,
    comp_scale: Optional[jnp.ndarray] = None,      # (P_X, X), int8 tables
) -> jnp.ndarray:
    """(B, L, X/block_x) per-group per-corpus-block logit maxima.

    The tile-granular Naive statistic (`rails_tpu/index/top_k.py
    mol_tile_top_k`): for every component group l and every block of
    `block_x` items, the maximum logit_l/T in that block. Unlike the
    (B, X) UB row this is X/block_x * L values — 8x smaller at L=32,
    block_x=256 — and it carries the per-group thresholds that make
    Naive-grade certificates possible at fused-kernel speed (the global
    max-logit bound provably reduces to the UB spill — per-group bounds
    need per-group lists; see mol_tile_top_k's soundness argument).

    Output rows are in the kernel's m-major order; consumers only reduce
    or select over l, so the order is an internal detail.

    The whole (padded) batch rides one grid step — the out block is
    (1, L, B) (Mosaic requires trailing block dims divisible by (8, 128)
    OR equal to the array dims, and per-corpus-block maxima are far
    smaller than either threshold); batches beyond `_MAX_B` (VMEM-bounded)
    process in chunks outside the kernel."""
    assert temperature > 0, "requires a positive MoL temperature"
    del block_b   # kept for API compatibility; the batch is one block
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, p_q, d_p = q_comp.shape
    p_x, _, x = item_comp_t.shape
    l = p_q * p_x
    _MAX_B = 256   # raw (P_Q*B, block_x) f32 VMEM slab ~2 MB per group
    if b > _MAX_B:
        return jnp.concatenate(
            [
                fused_mol_group_block_max(
                    q_comp[s : s + _MAX_B], item_comp_t, temperature,
                    block_x=block_x, interpret=interpret,
                    comp_scale=comp_scale,
                )
                for s in range(0, b, _MAX_B)
            ],
            axis=0,
        )
    quantized = item_comp_t.dtype == jnp.int8
    if quantized:
        assert comp_scale is not None, "int8 tables need comp_scale"
    mlp_dtype = (
        jnp.bfloat16
        if item_comp_t.dtype in (jnp.bfloat16, jnp.int8)
        else jnp.float32
    )
    assert x % block_x == 0, f"X={x} not a multiple of block_x={block_x}"
    assert l % 8 == 0, f"L={l} must be a sublane multiple"
    pad_b = (-b) % 8
    qT = jnp.transpose(q_comp, (1, 0, 2))
    if pad_b:
        qT = jnp.pad(qT, ((0, 0), (0, pad_b), (0, 0)))
    bp = b + pad_b
    nb = x // block_x
    grid = (nb,)
    kernel = functools.partial(
        _group_block_max_kernel, p_q=p_q, p_x=p_x,
        inv_temperature=1.0 / temperature,
        mlp_dtype=mlp_dtype, quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((p_q, bp, d_p), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_x, d_p, block_x), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [qT, item_comp_t]
    if quantized:
        in_specs.append(
            pl.BlockSpec((p_x, block_x), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        )
        args.append(comp_scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, l, bp), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, l, bp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * x * p_q * p_x * d_p,
            bytes_accessed=(
                item_comp_t.size * item_comp_t.dtype.itemsize
                + nb * l * bp * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return jnp.transpose(out, (2, 1, 0))[:b]   # (B, L, NB)


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "block_x", "block_b", "interpret"),
)
def fused_mol_ub_t(
    q_comp: jnp.ndarray,          # (B, P_Q, d_P)
    item_comp_t: jnp.ndarray,     # (P_X, d_P, X) — kernel layout, X padded
    temperature: float,
    block_x: int = 512,
    block_b: int = 32,
    interpret: Optional[bool] = None,
    comp_scale: Optional[jnp.ndarray] = None,      # (P_X, X), int8 tables
) -> jnp.ndarray:
    """(B, X) upper bounds max_l <q_n, x_m>/T against kernel-layout tables.

    Requires temperature > 0 (all shipped configs; a negative T would flip
    the max/min duality). Shares the fused scorer's table layout, so a
    serving state built for `fused_mol_scores_t` feeds this directly."""
    assert temperature > 0, "UB requires a positive MoL temperature"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, p_q, d_p = q_comp.shape
    p_x, _, x = item_comp_t.shape
    quantized = item_comp_t.dtype == jnp.int8
    if quantized:
        assert comp_scale is not None, "int8 tables need comp_scale"
    mlp_dtype = (
        jnp.bfloat16
        if item_comp_t.dtype in (jnp.bfloat16, jnp.int8)
        else jnp.float32
    )
    assert x % block_x == 0, f"X={x} not a multiple of block_x={block_x}"
    block_b = min(block_b, b)
    pad_b = (-b) % block_b
    qT = jnp.transpose(q_comp, (1, 0, 2))
    if pad_b:
        qT = jnp.pad(qT, ((0, 0), (0, pad_b), (0, 0)))
    bp = b + pad_b
    grid = (bp // block_b, x // block_x)
    kernel = functools.partial(
        _ub_kernel, p_q=p_q, p_x=p_x, inv_temperature=1.0 / temperature,
        mlp_dtype=mlp_dtype, quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((p_q, block_b, d_p), lambda j, i: (0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_x, d_p, block_x), lambda j, i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [qT, item_comp_t]
    if quantized:
        in_specs.append(
            pl.BlockSpec((p_x, block_x), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM)
        )
        args.append(comp_scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, block_x), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, x), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * x * p_q * p_x * d_p,
            bytes_accessed=(
                item_comp_t.size * item_comp_t.dtype.itemsize
                * (bp // block_b)
                + b * x * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:b]


def m_major_perm(p_q: int, p_x: int):
    """Permutation from the model's n-major logit order (l = n*P_X + m,
    `similarity_fn.py:389-402`) to the kernel's m-major order
    (l' = m*P_Q + n). item_partial_t tables are stored permuted (build
    time); query-side weights/partials permute per call (tiny)."""
    import numpy as np

    return np.asarray(
        [n * p_x + m for m in range(p_x) for n in range(p_q)], dtype=np.int32
    )


class MoLKernelWeights(NamedTuple):
    """Gating-MLP weights extracted from the flax param tree."""

    w1: jnp.ndarray   # (L, H)
    b1: jnp.ndarray   # (1, H)
    w2: jnp.ndarray   # (H, L)
    b2: jnp.ndarray   # (1, L)


def extract_gating_qi_weights(params) -> MoLKernelWeights:
    """Pull the qi gating MLP weights out of a SequentialRecommender tree
    (under 'mol') or a bare MoLSimilarity tree."""
    p = params["params"]
    if "mol" in p:
        p = p["mol"]
    p = p["gating_qi"]
    return MoLKernelWeights(
        w1=p["hidden"]["kernel"],
        b1=p["hidden"]["bias"][None, :],
        w2=p["out"]["kernel"],
        b2=p["out"]["bias"][None, :],
    )


class FusedCorpusTables(NamedTuple):
    """Kernel-layout corpus tables, padded to a block multiple.

    Registered as a pytree with `num_items` as static aux data so the
    unpadded corpus size stays a Python int (it bounds a static slice) when
    the tables travel through jit as runtime arguments.

    int8 tables (`quantize_fused_tables`) carry per-(component, item) /
    per-item symmetric scales; the kernel dequantizes in VMEM. Table bytes
    halve, doubling corpus-per-chip (throughput measured neutral at B=32 —
    the step is VPU/select-bound there; docs/STATUS.md)."""

    item_comp_t: jnp.ndarray      # (P_X, d_P, X_padded) bf16/f32 or int8
    item_partial_t: jnp.ndarray   # (L, X_padded)        bf16/f32 or int8
    num_items: int                # original (unpadded) X
    comp_scale: Optional[jnp.ndarray] = None      # (P_X, X_padded) f32
    partial_scale: Optional[jnp.ndarray] = None   # (1, X_padded) f32


jax.tree_util.register_pytree_node(
    FusedCorpusTables,
    lambda t: (
        (t.item_comp_t, t.item_partial_t, t.comp_scale, t.partial_scale),
        t.num_items,
    ),
    lambda aux, ch: FusedCorpusTables(ch[0], ch[1], aux, ch[2], ch[3]),
)


def quantize_fused_tables(tables: FusedCorpusTables) -> FusedCorpusTables:
    """Symmetric int8 quantization of kernel-layout tables.

    Scales are per-(component, item) for the component table (max|.| over
    the d_P axis / 127) and per-item for the gating partial (max over L).
    Zero rows (corpus padding) get scale ~0 clamped to 1e-12, so
    dequantized values stay exactly 0."""
    comp = tables.item_comp_t.astype(jnp.float32)      # (P_X, d_P, X)
    part = tables.item_partial_t.astype(jnp.float32)   # (L, X)
    cs = jnp.maximum(jnp.max(jnp.abs(comp), axis=1), 1e-12) / 127.0
    ps = jnp.maximum(jnp.max(jnp.abs(part), axis=0, keepdims=True), 1e-12) / 127.0
    comp_q = jnp.clip(
        jnp.round(comp / cs[:, None, :]), -127, 127
    ).astype(jnp.int8)
    part_q = jnp.clip(jnp.round(part / ps), -127, 127).astype(jnp.int8)
    return FusedCorpusTables(
        item_comp_t=comp_q,
        item_partial_t=part_q,
        num_items=tables.num_items,
        comp_scale=cs.astype(jnp.float32),
        partial_scale=ps.astype(jnp.float32),
    )


def quantize_fused_tables_np(tables: FusedCorpusTables) -> FusedCorpusTables:
    """Host-side (numpy) mirror of `quantize_fused_tables`, for
    `keep_on_host` chunked builds where the bf16 tables must never make an
    unsharded device round trip."""
    import numpy as np
    import ml_dtypes  # noqa: F401  (numpy bf16 view support)

    comp = np.asarray(tables.item_comp_t, dtype=np.float32)
    part = np.asarray(tables.item_partial_t, dtype=np.float32)
    cs = np.maximum(np.max(np.abs(comp), axis=1), 1e-12) / 127.0
    ps = np.maximum(np.max(np.abs(part), axis=0, keepdims=True), 1e-12) / 127.0
    comp_q = np.clip(np.round(comp / cs[:, None, :]), -127, 127).astype(np.int8)
    part_q = np.clip(np.round(part / ps), -127, 127).astype(np.int8)
    return FusedCorpusTables(
        item_comp_t=comp_q,
        item_partial_t=part_q,
        num_items=tables.num_items,
        comp_scale=cs.astype(np.float32),
        partial_scale=ps.astype(np.float32),
    )


def prepare_fused_tables(
    item_comp: jnp.ndarray,       # (X, P_X, d_P)
    item_partial: jnp.ndarray,    # (X, L)
    block_x: int = 256,
) -> FusedCorpusTables:
    """One-time per-corpus transpose + pad into kernel layout.

    item_partial_t rows are stored in the kernel's m-major logit order."""
    item_comp, item_partial, x = pad_corpus_tables(
        item_comp, item_partial, block_x
    )
    p_x = item_comp.shape[1]
    perm = m_major_perm(item_partial.shape[1] // p_x, p_x)
    return FusedCorpusTables(
        item_comp_t=jnp.transpose(item_comp, (1, 2, 0)),
        item_partial_t=item_partial.T[perm],
        num_items=x,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "temperature", "block_x", "block_b", "interpret", "emit_blockmax",
    ),
)
def fused_mol_scores_t(
    q_comp: jnp.ndarray,          # (B, P_Q, d_P)
    query_partial: jnp.ndarray,   # (B, L)
    item_comp_t: jnp.ndarray,     # (P_X, d_P, X) — kernel layout, X padded
    item_partial_t: jnp.ndarray,  # (L, X)
    weights: MoLKernelWeights,
    temperature: float,
    block_x: int = 256,
    block_b: int = 32,
    interpret: Optional[bool] = None,
    comp_scale: Optional[jnp.ndarray] = None,      # (P_X, X), int8 tables
    partial_scale: Optional[jnp.ndarray] = None,   # (1, X), int8 tables
    emit_blockmax: bool = False,
    valid: Optional[jnp.ndarray] = None,           # (X,) nonzero = real row
) -> jnp.ndarray:
    """(B, X) MoL scores against pre-transposed corpus tables.

    `emit_blockmax=True` additionally returns the per-(query, block) max of
    the scores, (B, X/block_x) — computed in VMEM while the scores are
    live, so the exact select can skip its tile-max streaming pass
    (`hierarchical_top_k(tile_max=...)`). Requires `valid` (nonzero for
    real corpus columns): pad columns mask to -1e30 IN-kernel, making both
    the returned scores and the maxima post-mask exact. Returns
    (scores, blockmax).

    The grid tiles both the corpus (block_x) and the query batch (block_b);
    per-step VMEM peaks at ~ block_b * block_x * 4 * (H + 3L) bytes, so large
    batches stay within the ~16 MB VMEM budget.

    int8 tables (with `comp_scale`/`partial_scale` from
    `quantize_fused_tables`) dequantize in VMEM — half the table bytes.

    `interpret=None` auto-selects interpreter mode on CPU (tests / virtual
    meshes run the same code path; the 'axon'-tunneled TPU compiles)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, p_q, d_p = q_comp.shape
    p_x, _, x = item_comp_t.shape
    l = p_q * p_x
    h = weights.w1.shape[1]
    quantized = item_comp_t.dtype == jnp.int8
    if quantized:
        assert comp_scale is not None and partial_scale is not None, (
            "int8 tables need comp_scale/partial_scale "
            "(quantize_fused_tables)"
        )
    # Gating-MLP compute dtype follows the table dtype: bf16 tables (the
    # serving default) take the fast bf16 MXU path, f32 tables keep full
    # precision (the exactness tests use f32). int8 tables dequantize to
    # bf16 for the matmuls.
    mlp_dtype = (
        jnp.bfloat16
        if item_comp_t.dtype in (jnp.bfloat16, jnp.int8)
        else jnp.float32
    )
    assert x % block_x == 0, f"X={x} not a multiple of block_x={block_x}"
    assert weights.w1.shape[0] == l and weights.w2.shape == (h, l)
    block_b = min(block_b, b)
    pad_b = (-b) % block_b

    # Query-side operands permute into the kernel's m-major logit order
    # (item_partial_t is already stored m-major by the table builders).
    perm = m_major_perm(p_q, p_x)
    qT = jnp.transpose(q_comp, (1, 0, 2))                  # (P_Q, B, d_P)
    qpT = query_partial[:, perm]                           # (B, L)
    w1p = weights.w1[perm]
    w2p = weights.w2[:, perm]
    b2p = weights.b2[:, perm]
    if pad_b:
        qT = jnp.pad(qT, ((0, 0), (0, pad_b), (0, 0)))
        qpT = jnp.pad(qpT, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    itemT = item_comp_t
    ipT = item_partial_t

    grid = (bp // block_b, x // block_x)
    kernel = functools.partial(
        _kernel, p_q=p_q, p_x=p_x, inv_temperature=1.0 / temperature,
        mlp_dtype=mlp_dtype, quantized=quantized,
        emit_blockmax=emit_blockmax,
    )
    in_specs = [
        pl.BlockSpec((p_q, block_b, d_p), lambda j, i: (0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, l), lambda j, i: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_x, d_p, block_x), lambda j, i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((l, block_x), lambda j, i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((l, h), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, l), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qT, qpT, itemT, ipT, w1p, weights.b1, w2p, b2p]
    if quantized:
        in_specs += [
            pl.BlockSpec((p_x, block_x), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_x), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args += [comp_scale, partial_scale]
    if emit_blockmax:
        assert valid is not None, "emit_blockmax requires the valid vector"
        v = valid.reshape(-1).astype(jnp.float32)
        if v.shape[0] < x:
            v = jnp.pad(v, (0, x - v.shape[0]))       # kernel pads invalid
        in_specs += [
            pl.BlockSpec((1, block_x), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args += [v[None, :]]
    out_specs = pl.BlockSpec((block_b, block_x), lambda j, i: (j, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bp, x), jnp.float32)
    if emit_blockmax:
        # The maxima output is a (block_b, 128) window revisited across 128
        # consecutive corpus steps (see `_BLOCKMAX_LANES`); the tiles axis
        # pads up to a window multiple, with unreached lanes left at the
        # kernel's -1e30 window fill (callers slice back to X/block_x).
        nt = x // block_x
        nt_pad = -(-nt // _BLOCKMAX_LANES) * _BLOCKMAX_LANES
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (block_b, _BLOCKMAX_LANES),
                lambda j, i: (j, i // _BLOCKMAX_LANES),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((bp, nt_pad), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((l, block_b, block_x), jnp.float32)],
        # Both grid dims are embarrassingly parallel (each step owns its
        # output block) — lets the pipeliner overlap freely. The blockmax
        # window REVISITS its output block across corpus steps, so that
        # variant declares the corpus dim "arbitrary" (sequential) to keep
        # the read-modify-write of the resident window sound.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "arbitrary") if emit_blockmax
                else ("parallel", "parallel")
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * x * l * (d_p + 2 * h),
            bytes_accessed=(
                (itemT.size * itemT.dtype.itemsize
                 + ipT.size * ipT.dtype.itemsize
                 + (
                     (comp_scale.size + partial_scale.size) * 4
                     if quantized else 0
                 )) * (bp // block_b)
                + b * x * 4
            ),
            transcendentals=b * x * l * 2,
        ),
        interpret=interpret,
    )(*args)
    if emit_blockmax:
        return out[0][:b], out[1][:b]
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "block_x", "block_b", "interpret"),
)
def fused_mol_scores_tiles(
    q_comp: jnp.ndarray,          # (B, P_Q, d_P)
    query_partial: jnp.ndarray,   # (B, L)
    tile_ids: jnp.ndarray,        # (T,) int32 — block indices into X/block_x
    item_comp_t: jnp.ndarray,     # (P_X, d_P, X) — kernel layout, X padded
    item_partial_t: jnp.ndarray,  # (L, X)
    weights: MoLKernelWeights,
    temperature: float,
    block_x: int = 256,
    block_b: int = 32,
    interpret: Optional[bool] = None,
    comp_scale: Optional[jnp.ndarray] = None,      # (P_X, X), int8 tables
    partial_scale: Optional[jnp.ndarray] = None,   # (1, X), int8 tables
) -> jnp.ndarray:
    """(B, T*block_x) MoL scores of the selected corpus tiles only.

    Same kernel body as `fused_mol_scores_t`, but the corpus grid dimension
    walks `tile_ids` instead of 0..X/block_x: the item-table BlockSpec index
    maps read the tile id from a scalar-prefetch ref, so the kernel DMAs
    exactly the selected (p_x, d_p, block_x) blocks straight out of the
    NATIVE kernel-layout table. Nothing is gathered in HBM — the gathered
    sub-corpus never exists as a tensor.

    This is the scale-robust rerank primitive: a scattered `jnp.take` along
    the item axis of the kernel layout makes XLA materialize a full X-major
    layout copy of the table (measured: `copy.43`, 7.63 GB at 8M items —
    the r4 frontier's 12/14-method OOM), while block-granular prefetched
    DMAs read the original bytes. Duplicate tile ids are allowed (the block
    is simply fetched again); callers mask duplicate slots in the result.

    Output column s*block_x + j is corpus column tile_ids[s]*block_x + j.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, p_q, d_p = q_comp.shape
    p_x, _, x = item_comp_t.shape
    (t,) = tile_ids.shape
    l = p_q * p_x
    h = weights.w1.shape[1]
    quantized = item_comp_t.dtype == jnp.int8
    if quantized:
        assert comp_scale is not None and partial_scale is not None, (
            "int8 tables need comp_scale/partial_scale"
        )
    mlp_dtype = (
        jnp.bfloat16
        if item_comp_t.dtype in (jnp.bfloat16, jnp.int8)
        else jnp.float32
    )
    assert x % block_x == 0, f"X={x} not a multiple of block_x={block_x}"
    assert weights.w1.shape[0] == l and weights.w2.shape == (h, l)
    block_b = min(block_b, b)
    pad_b = (-b) % block_b
    perm = m_major_perm(p_q, p_x)
    qT = jnp.transpose(q_comp, (1, 0, 2))
    qpT = query_partial[:, perm]
    w1p = weights.w1[perm]
    w2p = weights.w2[:, perm]
    b2p = weights.b2[:, perm]
    if pad_b:
        qT = jnp.pad(qT, ((0, 0), (0, pad_b), (0, 0)))
        qpT = jnp.pad(qpT, ((0, pad_b), (0, 0)))
    bp = b + pad_b

    grid = (bp // block_b, t)
    base_kernel = functools.partial(
        _kernel, p_q=p_q, p_x=p_x, inv_temperature=1.0 / temperature,
        mlp_dtype=mlp_dtype, quantized=quantized,
    )

    def kernel(tile_ref, *refs):   # leading scalar-prefetch ref, unused here
        del tile_ref
        base_kernel(*refs)

    in_specs = [
        pl.BlockSpec((p_q, block_b, d_p), lambda j, i, tr: (0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, l), lambda j, i, tr: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_x, d_p, block_x), lambda j, i, tr: (0, 0, tr[i]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((l, block_x), lambda j, i, tr: (0, tr[i]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((l, h), lambda j, i, tr: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda j, i, tr: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, l), lambda j, i, tr: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l), lambda j, i, tr: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qT, qpT, item_comp_t, item_partial_t, w1p, weights.b1, w2p, b2p]
    if quantized:
        in_specs += [
            pl.BlockSpec((p_x, block_x), lambda j, i, tr: (0, tr[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_x), lambda j, i, tr: (0, tr[i]),
                         memory_space=pltpu.VMEM),
        ]
        args += [comp_scale, partial_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, block_x), lambda j, i, tr: (j, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((l, block_b, block_x), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, t * block_x), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * block_x * l * (d_p + 2 * h),
            bytes_accessed=(
                (p_x * d_p + l) * t * block_x
                * item_comp_t.dtype.itemsize * (bp // block_b)
                + b * t * block_x * 4
            ),
            transcendentals=b * t * block_x * l * 2,
        ),
        interpret=interpret,
    )(tile_ids.astype(jnp.int32), *args)
    return out[:b]


def fused_mol_scores(
    q_comp: jnp.ndarray,          # (B, P_Q, d_P)
    query_partial: jnp.ndarray,   # (B, L)
    item_comp: jnp.ndarray,       # (X, P_X, d_P) — X padded to block_x
    item_partial: jnp.ndarray,    # (X, L)
    weights: MoLKernelWeights,
    temperature: float,
    block_x: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """(B, X) scores from standard-layout tables (transposes per call;
    prefer `prepare_fused_tables` + `fused_mol_scores_t` for serving)."""
    perm = m_major_perm(q_comp.shape[1], item_comp.shape[1])
    return fused_mol_scores_t(
        q_comp, query_partial,
        jnp.transpose(item_comp, (1, 2, 0)), item_partial.T[perm],
        weights, temperature, block_x=block_x, interpret=interpret,
    )


def pad_corpus_tables(
    item_comp: jnp.ndarray, item_partial: jnp.ndarray, block_x: int
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Zero-pad the corpus axis to a multiple of block_x; returns padded
    tables + the original X (callers slice scores back to X)."""
    x = item_comp.shape[0]
    pad = (-x) % block_x
    if pad:
        item_comp = jnp.pad(item_comp, ((0, pad), (0, 0), (0, 0)))
        item_partial = jnp.pad(item_partial, ((0, pad), (0, 0)))
    return item_comp, item_partial, x
