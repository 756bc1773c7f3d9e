"""Fully-fused HSTU block forward (inference) as a Pallas kernel.

One grid step processes one sequence through an entire HSTU block in VMEM:
LayerNorm -> fused uvqk matmul + SiLU -> per-head pointwise-SiLU attention
(+ relative bias, causal & validity masks, 1/N normalization) ->
u * LayerNorm(attn) -> output projection + residual. The XLA path
materializes the (B, N, 4hd) projection and the (B, h, N, N) attention
tensors in HBM per block; here HBM traffic per block is just x in/out, the
(B, N, N) bias slice, and the weights.

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


def _ln(y: jnp.ndarray, eps: float) -> jnp.ndarray:
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + eps)


def _kernel(
    x_ref,        # (1, N, D)
    bias_ref,     # (1, N, N) or None (decided by has_bias)
    colmask_ref,  # (1, 1, N) float {0,1}
    uvqk_ref,     # (D, F)
    ow_ref,       # (h*dv, D)
    ob_ref,       # (1, D)
    out_ref,      # (1, N, D)
    *,
    num_heads: int,
    dqk: int,
    dv: int,
    inv_n: float,
    eps: float,
    has_bias: bool,
):
    x = x_ref[0]                                   # (N, D)
    n = x.shape[0]
    h = num_heads

    normed = _ln(x.astype(jnp.float32), eps)
    y = jnp.dot(
        normed.astype(uvqk_ref.dtype), uvqk_ref[:],
        preferred_element_type=jnp.float32,
    )
    y = y * _sigmoid_tanh(y)                       # silu, tanh form
    u = y[:, : h * dv]
    v = y[:, h * dv : 2 * h * dv]
    q = y[:, 2 * h * dv : 2 * h * dv + h * dqk]
    k = y[:, 2 * h * dv + h * dqk :]

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    causal = (col <= row).astype(jnp.float32)
    mask = causal * colmask_ref[0, 0][None, :].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32) if has_bias else None

    attn_cols = []
    for head in range(h):
        qh = q[:, head * dqk : (head + 1) * dqk]
        kh = k[:, head * dqk : (head + 1) * dqk]
        vh = v[:, head * dv : (head + 1) * dv]
        qk = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (N, N)
        if bias is not None:
            qk = qk + bias
        a = qk * _sigmoid_tanh(qk) * inv_n * mask  # silu, tanh form
        attn_cols.append(
            jnp.dot(a, vh, preferred_element_type=jnp.float32)
        )                                           # (N, dv)
    attn = jnp.concatenate(attn_cols, axis=1)       # (N, h*dv)

    o_input = u * _ln(attn, eps)
    out = (
        jnp.dot(
            o_input.astype(ow_ref.dtype), ow_ref[:],
            preferred_element_type=jnp.float32,
        )
        + ob_ref[0][None, :]
        + x.astype(jnp.float32)
    )
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "dqk", "dv", "inv_n", "eps", "interpret"),
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
) -> jnp.ndarray:
    """One HSTU block forward; semantics of `HSTUBlock.__call__` (eval)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n, d = x.shape
    f = uvqk.shape[1]
    has_bias = bias is not None
    if not has_bias:
        # Fixed kernel arity: dummy per-row zero bias block (never read).
        bias = jnp.zeros((b, 1, 1), dtype=x.dtype)
    bias_block = (1, n, n) if has_bias else (1, 1, 1)
    kernel = functools.partial(
        _kernel,
        num_heads=num_heads, dqk=dqk, dv=dv,
        inv_n=inv_n, eps=eps, has_bias=has_bias,
    )
    in_specs = [
        pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bias_block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (num_heads * dv, d), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, bias, colmask[:, None, :], uvqk, o_kernel, o_bias[None, :]]

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * f + 4 * b * num_heads * n * n * dqk,
            bytes_accessed=(
                2 * x.size * x.dtype.itemsize
                + (bias.size * bias.dtype.itemsize if has_bias else 0)
                + uvqk.size * uvqk.dtype.itemsize * b
            ),
            transcendentals=b * n * (f + num_heads * n),
        ),
        interpret=interpret,
    )(*operands)
