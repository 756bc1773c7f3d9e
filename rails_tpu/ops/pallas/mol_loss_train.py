"""Fused MoL scoring for the TRAINING loss (custom VJP, shared negatives).

The sampled-softmax loss scores M = B*(N-1) queries against R shared sampled
negatives through the full MoL pipeline. The XLA path materializes the
(M, R, L) component logits, the (M, R, H) gating hidden layer, and their
backward counterparts in HBM — several GB of traffic per step at the
published geometries (measured: the Books config spends 17 ms/step forward
and ~43 ms backward on this path at B=128, vs a ~1 ms matmul roofline).
This kernel runs the whole pipeline — component logits, qi gating MLP,
glu_silu combination, softmax + dropout-renormalized combiner — per query
block in VMEM, for BOTH directions; only the (M, R) scores and the
parameter/operand gradients touch HBM.

Semantics mirror `MoLSimilarity._combine` (`rails_tpu/similarity/mol.py`,
reference `similarity_fn.py:31-96,148-201`) for the published
configuration: `glu_silu` combination, query+item gating partials, hidden
qi MLP. Two dropouts are realized IN-KERNEL as counter-hash streams (same
scheme as `hstu_block_train._hash_keep`: murmur3-finalizer over a global
(l, m, r) index, identical bits regenerated in the backward — no mask in
HBM): the qi-MLP input dropout (`gating_qi_dropout_rate`) and the
softmax-dropout combiner (`softmax_dropout_rate`). These are valid dropout
realizations but DIFFERENT streams than the flax PRNG the XLA path draws —
the same trade the fused HSTU training kernels make (A/B'd in
docs/STATUS.md). `hash_keep_global` exposes the exact mask bits so tests
can hold an XLA replica to bit-identical masks.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rails_tpu.ops.pallas.mol_scoring import (
    MoLKernelWeights,
    _sigmoid_tanh,
    m_major_perm,
)

# Disjoint stream salts (arbitrary odd constants, int32 range).
_QI_SALT = np.int32(-1498392781)                          # 0xA6AC5333
_PI_SALT = np.int32(-1789569707)                          # 0x95555555


# Shared counter-hash stream: ONE definition for every fused kernel (the
# backward regenerates the forward's exact bits, so a diverging copy would
# silently corrupt gradients).
from rails_tpu.ops.pallas.hash_dropout import i32 as _i32              # noqa: E402
from rails_tpu.ops.pallas.hash_dropout import keep_from_idx as _keep_from_idx  # noqa: E402


def hash_keep_global(seed, salt, l, m, r, rate):
    """(L, M, R) scaled keep mask — the XLA-side replica of the kernel's
    in-VMEM mask stream (used by parity tests; small shapes only)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (l, m, r), 0)
    mi = jax.lax.broadcasted_iota(jnp.int32, (l, m, r), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (l, m, r), 2)
    idx = row * _i32(m * r) + mi * _i32(r) + ci
    return _keep_from_idx(idx, seed.astype(jnp.int32), salt, rate)


def _block_mask(seed_ref, pid, rows, g, r, m_total, salt, rate):
    """In-kernel (rows, G*R) mask slice of the global (rows, M, R) stream."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, g * r), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, g * r), 1)
    idx = row * _i32(m_total * r) + pid * _i32(g * r) + col
    return _keep_from_idx(idx, seed_ref[0, 0], salt, rate)


def _forward_core(
    seed_ref, q_ref, qp_ref, item_ref, ip_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, logits_ref, pid, *, p_q, p_x, inv_temperature, mlp_dtype,
    m_total, qi_rate, pi_rate, eps,
):
    """Shared fwd pipeline; returns (t, t_in, h, gi, p, q_w, s) all f32/mm.

    t    (L, G, R) f32   1/T-scaled component logits
    t_in (L, G*R) mm     qi-MLP input (qi dropout applied)
    h    (H, G*R) mm     silu hidden
    gi   (L, G, R) f32   gating inputs
    p    (L, G, R) f32   softmax weights (pre-dropout)
    q_w  (L, G, R) f32   dropout-masked weights (q = p * mask)
    s    (G, R) f32      max(sum_l q, eps)
    """
    g = q_ref.shape[1]
    d_p = q_ref.shape[2]
    r = item_ref.shape[2]
    l = p_q * p_x

    q_flat = q_ref[:].reshape(p_q * g, d_p)
    for m in range(p_x):
        logits_ref[m * p_q : (m + 1) * p_q] = (
            jnp.dot(q_flat, item_ref[m], preferred_element_type=jnp.float32)
            * inv_temperature
        ).reshape(p_q, g, r)
    t = logits_ref[:]                                      # (L, G, R) f32

    t2 = t.reshape(l, g * r)
    if qi_rate > 0.0:
        qi_mask = _block_mask(seed_ref, pid, l, g, r, m_total,
                              _QI_SALT, qi_rate)
        t_in = (t2 * qi_mask).astype(mlp_dtype)
    else:
        t_in = t2.astype(mlp_dtype)
    h = jax.lax.dot_general(
        w1_ref[:].astype(mlp_dtype), t_in,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0][:, None]                                 # (H, G*R) f32
    h = (h * _sigmoid_tanh(h)).astype(mlp_dtype)
    qi = jax.lax.dot_general(
        w2_ref[:].astype(mlp_dtype), h,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qi = (qi + b2_ref[0][:, None]).reshape(l, g, r)

    gi = (
        qp_ref[:].astype(jnp.float32).T[:, :, None]
        * ip_ref[:].astype(jnp.float32)[:, None, :]
        + qi
    )                                                      # (L, G, R) f32
    gw = gi * _sigmoid_tanh(gi)
    gw_max = jnp.max(gw, axis=0, keepdims=True)
    e = jnp.exp(gw - gw_max)
    p = e / jnp.sum(e, axis=0, keepdims=True)              # softmax, f32
    if pi_rate > 0.0:
        pi_mask = _block_mask(seed_ref, pid, l, g, r, m_total,
                              _PI_SALT, pi_rate).reshape(l, g, r)
        q_w = p * pi_mask
        s = jnp.maximum(jnp.sum(q_w, axis=0), eps)         # (G, R)
    else:
        q_w = p
        s = jnp.ones((g, r), jnp.float32)                  # sums to 1 exactly
    return t, t_in, h, gi, p, q_w, s


def _fwd_kernel(
    seed_ref, q_ref, qp_ref, item_ref, ip_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, out_ref, logits_ref, *, p_q, p_x, inv_temperature, mlp_dtype,
    m_total, qi_rate, pi_rate, eps,
):
    pid = pl.program_id(0)
    t, _, _, _, _, q_w, s = _forward_core(
        seed_ref, q_ref, qp_ref, item_ref, ip_ref, w1_ref, b1_ref, w2_ref,
        b2_ref, logits_ref, pid, p_q=p_q, p_x=p_x,
        inv_temperature=inv_temperature,
        mlp_dtype=mlp_dtype, m_total=m_total, qi_rate=qi_rate,
        pi_rate=pi_rate, eps=eps,
    )
    out_ref[:] = jnp.sum(q_w * t, axis=0) / s              # (G, R)


def _bwd_kernel(
    seed_ref, q_ref, qp_ref, item_ref, ip_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, dout_ref,
    dq_ref, dqp_ref, ditem_ref, dip_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    logits_ref,
    *, p_q, p_x, inv_temperature, mlp_dtype, m_total, qi_rate, pi_rate, eps,
):
    """Backward: recompute the forward in VMEM, emit per-block d_q/d_qp and
    accumulate item-side + gating-weight grads across the grid (constant
    output index, 'arbitrary' semantics)."""
    pid = pl.program_id(0)
    g = q_ref.shape[1]
    d_p = q_ref.shape[2]
    r = item_ref.shape[2]
    l = p_q * p_x

    t, t_in, h, gi, p, q_w, s = _forward_core(
        seed_ref, q_ref, qp_ref, item_ref, ip_ref, w1_ref, b1_ref, w2_ref,
        b2_ref, logits_ref, pid, p_q=p_q, p_x=p_x,
        inv_temperature=inv_temperature,
        mlp_dtype=mlp_dtype, m_total=m_total, qi_rate=qi_rate,
        pi_rate=pi_rate, eps=eps,
    )
    d_out = dout_ref[:].astype(jnp.float32)                # (G, R)

    # out = sum_l q_w * t / s
    inv_s = 1.0 / s
    d_pi = (d_out * inv_s)[None] * t                       # d wrt q_w/s pre-sum
    d_t = (d_out * inv_s)[None] * q_w                      # direct term
    if pi_rate > 0.0:
        # q_w = p * mask; s = max(sum q_w, eps). pi = q_w / s.
        out_v = jnp.sum(q_w * t, axis=0) * inv_s
        s_live = (s > eps).astype(jnp.float32)
        d_qw = d_pi - (d_out * out_v * inv_s * s_live)[None]
        pi_mask = _block_mask(seed_ref, pid, l, g, r, m_total,
                              _PI_SALT, pi_rate).reshape(l, g, r)
        d_p_soft = d_qw * pi_mask
    else:
        d_p_soft = d_pi
    # softmax backward
    dot = jnp.sum(d_p_soft * p, axis=0, keepdims=True)
    d_gw = p * (d_p_soft - dot)
    # glu_silu backward
    sig = _sigmoid_tanh(gi)
    d_gi = d_gw * (sig * (1.0 + gi * (1.0 - sig)))         # (L, G, R) f32

    qp_f = qp_ref[:].astype(jnp.float32)                   # (G, L)
    ip_f = ip_ref[:].astype(jnp.float32)                   # (L, R)
    dqp_ref[:] = jnp.sum(d_gi * ip_f[:, None, :], axis=2).T
    dip_local = jnp.sum(d_gi * qp_f.T[:, :, None], axis=1)  # (L, R)

    # qi MLP backward (input dropout): qi = W2^T h + b2, h = silu(z),
    # z = W1^T t_in + b1.
    d_qi = d_gi.reshape(l, g * r).astype(mlp_dtype)
    d_h = jax.lax.dot_general(
        w2_ref[:].astype(mlp_dtype), d_qi,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (H, G*R)
    # silu'(z) from h_pre: recompute z cheaply via its silu pieces — we kept
    # only h (= silu(z) cast to mm); recompute z = W1^T t_in + b1 instead.
    z = jax.lax.dot_general(
        w1_ref[:].astype(mlp_dtype), t_in,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0][:, None]
    sig_z = _sigmoid_tanh(z)
    d_z = d_h * (sig_z * (1.0 + z * (1.0 - sig_z)))        # (H, G*R) f32
    db1_local = jnp.sum(d_z, axis=1, keepdims=True)        # (H, 1)
    d_z_mm = d_z.astype(mlp_dtype)
    dw1_local = jax.lax.dot_general(
        t_in, d_z_mm, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (L, H)
    dw2_local = jax.lax.dot_general(
        h, d_qi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (H, L)
    db2_local = jnp.sum(
        d_gi.reshape(l, g * r), axis=1, keepdims=True
    )                                                      # (L, 1)
    d_t_mlp = jax.lax.dot_general(
        w1_ref[:].astype(mlp_dtype), d_z_mm,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (L, G*R)
    if qi_rate > 0.0:
        qi_mask = _block_mask(seed_ref, pid, l, g, r, m_total,
                              _QI_SALT, qi_rate)
        d_t_mlp = d_t_mlp * qi_mask
    d_t = d_t + d_t_mlp.reshape(l, g, r)

    # component grads: t[(m,n),g,r] = invT * <q[n,g,:], item[m,:,r]>
    q_flat = q_ref[:].reshape(p_q * g, d_p)
    dq_cols = []
    for m in range(p_x):
        d_t_m = (d_t[m * p_q : (m + 1) * p_q] * inv_temperature).reshape(
            p_q * g, r
        ).astype(mlp_dtype)
        dq_cols.append(jax.lax.dot_general(
            d_t_m, item_ref[m].astype(mlp_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))                                                 # (p_q*g, d_P)
        ditem_m = jax.lax.dot_general(
            q_flat.astype(mlp_dtype), d_t_m,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (d_P, R)
        @pl.when(pid == 0)
        def _init():                                       # noqa: ANN001
            ditem_ref[m] = ditem_m
        @pl.when(pid != 0)
        def _acc():                                        # noqa: ANN001
            ditem_ref[m] += ditem_m
    dq_ref[:] = sum(dq_cols).reshape(p_q, g, d_p)

    @pl.when(pid == 0)
    def _init_small():                                     # noqa: ANN001
        dip_ref[:] = dip_local
        dw1_ref[:] = dw1_local
        db1_ref[:] = db1_local
        dw2_ref[:] = dw2_local
        db2_ref[:] = db2_local

    @pl.when(pid != 0)
    def _acc_small():                                      # noqa: ANN001
        dip_ref[:] += dip_local
        dw1_ref[:] += dw1_local
        db1_ref[:] += db1_local
        dw2_ref[:] += dw2_local
        db2_ref[:] += db2_local


def make_fused_mol_loss(
    p_q: int,
    p_x: int,
    temperature: float,
    softmax_dropout_rate: float,
    qi_dropout_rate: float,
    eps: float,
    block_q: int = 8,
    interpret: Optional[bool] = None,
):
    """Returns fn(q_comp (M,P_Q,d_P), query_partial (M,L), item_comp
    (R,P_X,d_P), item_partial (R,L), weights: MoLKernelWeights, seed int32)
    -> (M, R) f32 scores, differentiable w.r.t. every array input.

    Layout transforms (m-major permutation, transposes, padding) happen
    OUTSIDE the custom-VJP boundary in plain jnp ops, so their gradients
    come from autodiff; the custom VJP wraps only the kernel-layout core."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    l = p_q * p_x
    inv_t = 1.0 / temperature

    def _core_call(kernel, specs_extra, out_specs, out_shapes, args, grid,
                   scratch_shapes):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=specs_extra,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)

    @jax.custom_vjp
    def core(qT, qpT, itemT, ipT, w1p, b1, w2p, b2p, seed):
        return _core_fwd(qT, qpT, itemT, ipT, w1p, b1, w2p, b2p, seed)[0]

    def _specs(g, d_p, r, h, blocked_dout=False):
        specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((p_q, g, d_p), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_x, d_p, r), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        if blocked_dout:
            specs.append(
                pl.BlockSpec((g, r), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
        return specs

    def _core_fwd(qT, qpT, itemT, ipT, w1p, b1, w2p, b2p, seed):
        p_q_, m, d_p = qT.shape
        p_x_, _, r = itemT.shape
        h = w1p.shape[1]
        g = min(block_q, m)
        assert m % g == 0, (m, g)
        mlp_dtype = (
            jnp.bfloat16 if itemT.dtype == jnp.bfloat16 else jnp.float32
        )
        kernel = functools.partial(
            _fwd_kernel, p_q=p_q, p_x=p_x, inv_temperature=inv_t,
            mlp_dtype=mlp_dtype, m_total=m,
            qi_rate=qi_dropout_rate, pi_rate=softmax_dropout_rate, eps=eps,
        )
        out = _core_call(
            kernel,
            _specs(g, d_p, r, h),
            pl.BlockSpec((g, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((m, r), jnp.float32),
            (seed.reshape(1, 1).astype(jnp.int32), qT, qpT, itemT, ipT,
             w1p, b1, w2p, b2p),
            (m // g,),
            [pltpu.VMEM((l, g, r), jnp.float32)],
        )
        return out, (qT, qpT, itemT, ipT, w1p, b1, w2p, b2p, seed)

    def _core_bwd(res, d_out):
        qT, qpT, itemT, ipT, w1p, b1, w2p, b2p, seed = res
        p_q_, m, d_p = qT.shape
        p_x_, _, r = itemT.shape
        h = w1p.shape[1]
        g = min(block_q, m)
        mlp_dtype = (
            jnp.bfloat16 if itemT.dtype == jnp.bfloat16 else jnp.float32
        )
        kernel = functools.partial(
            _bwd_kernel, p_q=p_q, p_x=p_x, inv_temperature=inv_t,
            mlp_dtype=mlp_dtype, m_total=m,
            qi_rate=qi_dropout_rate, pi_rate=softmax_dropout_rate, eps=eps,
        )
        out_specs = [
            pl.BlockSpec((p_q, g, d_p), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_x, d_p, r), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((p_q, m, d_p), jnp.float32),
            jax.ShapeDtypeStruct((m, l), jnp.float32),
            jax.ShapeDtypeStruct((p_x, d_p, r), jnp.float32),
            jax.ShapeDtypeStruct((l, r), jnp.float32),
            jax.ShapeDtypeStruct((l, h), jnp.float32),
            jax.ShapeDtypeStruct((h, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, l), jnp.float32),
            jax.ShapeDtypeStruct((l, 1), jnp.float32),
        ]
        dq, dqp, ditem, dip, dw1, db1, dw2, db2 = _core_call(
            kernel,
            _specs(g, d_p, r, h, blocked_dout=True),
            out_specs,
            out_shapes,
            (seed.reshape(1, 1).astype(jnp.int32), qT, qpT, itemT, ipT,
             w1p, b1, w2p, b2p, d_out.astype(jnp.float32)),
            (m // g,),
            [pltpu.VMEM((l, g, r), jnp.float32)],
        )
        return (
            dq.astype(qT.dtype), dqp.astype(qpT.dtype),
            ditem.astype(itemT.dtype), dip.astype(ipT.dtype),
            dw1.astype(w1p.dtype), db1.T.astype(b1.dtype),
            dw2.astype(w2p.dtype), db2.T.astype(b2p.dtype),
            np.zeros(np.shape(seed), jax.dtypes.float0),
        )

    core.defvjp(_core_fwd, _core_bwd)

    perm = m_major_perm(p_q, p_x)

    def fused(q_comp, query_partial, item_comp, item_partial,
              weights: MoLKernelWeights, seed):
        m, p_q_, d_p = q_comp.shape
        r = item_comp.shape[0]
        g = min(block_q, m)
        pad_m = (-m) % g
        pad_r = (-r) % 128
        qT = jnp.transpose(q_comp, (1, 0, 2))
        qpT = query_partial[:, perm]
        itemT = jnp.transpose(item_comp, (1, 2, 0))
        ipT = item_partial.T[perm]
        if pad_m:
            qT = jnp.pad(qT, ((0, 0), (0, pad_m), (0, 0)))
            qpT = jnp.pad(qpT, ((0, pad_m), (0, 0)))
        if pad_r:
            itemT = jnp.pad(itemT, ((0, 0), (0, 0), (0, pad_r)))
            ipT = jnp.pad(ipT, ((0, 0), (0, pad_r)))
        out = core(
            qT, qpT, itemT, ipT,
            weights.w1[perm], weights.b1, weights.w2[:, perm],
            weights.b2[:, perm], seed,
        )
        return out[:m, :r]

    return fused
