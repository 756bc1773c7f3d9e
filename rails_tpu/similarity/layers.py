"""Shared MLP building blocks for the MoL similarity stack.

TPU-first reimplementation of the GLU layers and gin-built MLPs the reference
assembles in `/root/reference/rails/similarities/layers.py:19-74` and
`/root/reference/modeling/similarity_utils.py:82-207`. Everything is a flax
linen module; matmuls run through `nn.Dense` so XLA fuses bias + activation
into the MXU matmul.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

xavier_normal = nn.initializers.xavier_normal()


def l2_normalize(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """x / max(||x||_2, eps) along the last axis.

    Matches the clamp-based normalization used throughout the reference
    (e.g. `/root/reference/rails/similarities/mol/item_embeddings_fns.py:173-182`).
    """
    # sqrt(max(sq, eps^2)) == max(||x||, eps) in the forward pass, but keeps
    # the backward pass finite at x == 0 (d sqrt/d sq at 0 is inf; padding
    # rows of the item table are exactly zero and 0 * inf = NaN would poison
    # every gradient).
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


class GLU(nn.Module):
    """Fused gated linear unit: one 2x-wide matmul, split, act(lhs) * rhs.

    `activation="gelu"` reproduces GeGLU, `"silu"` reproduces SwiGLU
    (`/root/reference/rails/similarities/layers.py:19-74`).
    """

    features: int
    activation: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(
            self.features * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02),
            bias_init=nn.initializers.zeros_init(),
            name="w",
        )(x)
        lhs, rhs = jnp.split(y, 2, axis=-1)
        if self.activation == "gelu":
            # Exact (erf) gelu: torch's F.gelu default, used by the
            # reference GeGLU (`layers.py:43`); jax defaults to tanh-approx.
            lhs = jax.nn.gelu(lhs, approximate=False)
        elif self.activation == "silu":
            lhs = jax.nn.silu(lhs)
        else:
            raise ValueError(f"Unknown GLU activation {self.activation!r}")
        return lhs * rhs


class ProjMLP(nn.Module):
    """Dropout -> [GLU(hidden)] -> Dense(out).

    The query/item component-embedding projection
    (`/root/reference/modeling/similarity_utils.py:87-149`). With
    `hidden_dim <= 0` it degenerates to Dropout -> Dense(out).
    """

    out_features: int
    hidden_dim: int = -1
    dropout_rate: float = 0.0
    nonlinearity: str = "swiglu"   # "geglu" | "swiglu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.hidden_dim > 0:
            act = "gelu" if self.nonlinearity == "geglu" else "silu"
            x = GLU(self.hidden_dim, activation=act, dtype=self.dtype, name="glu")(x)
        return nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=xavier_normal,
            bias_init=nn.initializers.zeros_init(),
            name="out",
        )(x)


class GatingPartialMLP(nn.Module):
    """Dropout -> Dense(hidden) -> SiLU -> Dense(out).

    The three gating partial networks
    (`/root/reference/modeling/similarity_utils.py:153-207`). The query/item
    partials use `use_output_bias=False`; the qi partial keeps its bias. With
    `hidden_dim <= 0` it degenerates to Dropout -> Dense(out).
    """

    out_features: int
    hidden_dim: int = 128
    dropout_rate: float = 0.0
    use_output_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.hidden_dim > 0:
            x = nn.Dense(
                self.hidden_dim,
                dtype=self.dtype,
                kernel_init=xavier_normal,
                bias_init=nn.initializers.zeros_init(),
                name="hidden",
            )(x)
            x = jax.nn.silu(x)
        return nn.Dense(
            self.out_features,
            use_bias=self.use_output_bias,
            dtype=self.dtype,
            kernel_init=xavier_normal,
            bias_init=nn.initializers.zeros_init(),
            name="out",
        )(x)
