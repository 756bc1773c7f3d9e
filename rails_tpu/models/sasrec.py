"""SASRec encoder (Self-Attentive Sequential Recommendation), TPU-native.

Reference: `/root/reference/modeling/sequential/sasrec.py:42-290`.
Block structure preserved exactly:
  Q = LN(x); y = MHA(Q, x, x, causal); x = FFN(LN(Q + y)) * valid
where FFN is two pointwise (kernel-size-1 conv = Dense) layers with its own
residual, and the attention softmax uses the causal mask only — padded key
positions hold zero vectors (the reference's known quirk; replicated so the
math matches).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.core.config import SASRecConfig


def _ln(y: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + eps)


class PointwiseFFN(nn.Module):
    """Dense(hidden) -> act -> dropout -> Dense(D) -> dropout, + residual.

    Reference `StandardAttentionFF` (`sasrec.py:42-74`; Conv1d with kernel
    size 1 is a position-wise Dense).
    """

    hidden_dim: int
    out_dim: int
    activation: str = "relu"
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.Dense(
            self.hidden_dim, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_normal(), name="fc1",
        )(x)
        # torch.nn.GELU() (the reference, `sasrec.py:62`) is exact erf gelu.
        y = (
            jax.nn.relu(y)
            if self.activation == "relu"
            else jax.nn.gelu(y, approximate=False)
        )
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Dense(
            self.out_dim, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_normal(), name="fc2",
        )(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y + x


class SASRecBlock(nn.Module):
    cfg: SASRecConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,              # (B, N, D)
        valid: jnp.ndarray,          # (B, N) bool
        train: bool = False,
    ) -> jnp.ndarray:
        c = self.cfg
        b, n, d = x.shape
        h = c.num_heads
        dh = d // h
        q_in = _ln(x)
        # Packed in-projection like torch.nn.MultiheadAttention.
        qkv_q = nn.Dense(
            d, dtype=self.dtype, kernel_init=nn.initializers.xavier_normal(),
            name="q_proj",
        )(q_in)
        qkv_k = nn.Dense(
            d, dtype=self.dtype, kernel_init=nn.initializers.xavier_normal(),
            name="k_proj",
        )(x)
        qkv_v = nn.Dense(
            d, dtype=self.dtype, kernel_init=nn.initializers.xavier_normal(),
            name="v_proj",
        )(x)
        qh = qkv_q.reshape(b, n, h, dh)
        kh = qkv_k.reshape(b, n, h, dh)
        vh = qkv_v.reshape(b, n, h, dh)
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=self.dtype
        ) / jnp.sqrt(jnp.asarray(dh, dtype=self.dtype))
        causal = jnp.tril(jnp.ones((n, n), dtype=bool))
        logits = jnp.where(causal[None, None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(c.ffn_dropout_rate, deterministic=not train)(attn)
        mha = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, vh, preferred_element_type=self.dtype
        ).reshape(b, n, d)
        mha = nn.Dense(
            d, dtype=self.dtype, kernel_init=nn.initializers.xavier_normal(),
            name="out_proj",
        )(mha)
        y = PointwiseFFN(
            hidden_dim=c.ffn_hidden_dim,
            out_dim=d,
            activation=c.ffn_activation_fn,
            dropout_rate=c.ffn_dropout_rate,
            dtype=self.dtype,
            name="ffn",
        )(_ln(q_in + mha), train=train)
        return y * valid[..., None].astype(y.dtype)


class SASRecStack(nn.Module):
    cfg: SASRecConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        valid: jnp.ndarray,
        timestamps=None,             # unused; uniform stack interface
        train: bool = False,
    ) -> jnp.ndarray:
        del timestamps
        for i in range(self.cfg.num_blocks):
            x = SASRecBlock(cfg=self.cfg, dtype=self.dtype, name=f"block_{i}")(
                x, valid, train=train
            )
        return x
