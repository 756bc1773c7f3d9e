"""Input feature preprocessors and output postprocessors.

Reference:
  - `/root/reference/modeling/sequential/input_features_preprocessors.py:43-91`
    (learnable positional embedding + dropout + valid-position masking)
  - `/root/reference/modeling/sequential/output_postprocessors.py:37-85`
    (parameter-free l2 / layer norm on encoder outputs)

TPU shift: jagged validity becomes a dense `(B, N)` bool mask derived from the
per-row lengths (positions >= length are dropped by the reference's
dense_to_jagged; here they are zeroed and excluded from attention / loss).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.similarity.layers import l2_normalize, xavier_normal


def length_mask(lengths: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B,) lengths -> (B, N) bool, True for positions < length."""
    return jnp.arange(n)[None, :] < lengths[:, None]


class LearnablePositionalEmbeddingInputPreprocessor(nn.Module):
    """emb * sqrt(D) + pos_emb, dropout, zero invalid positions."""

    max_sequence_len: int
    embedding_dim: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        past_lengths: jnp.ndarray,       # (B,)
        past_embeddings: jnp.ndarray,    # (B, N, D)
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, d = past_embeddings.shape
        pos_emb = self.param(
            "pos_emb", xavier_normal, (self.max_sequence_len, self.embedding_dim)
        )
        x = past_embeddings * (self.embedding_dim ** 0.5) + pos_emb[None, :n, :]
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        valid = length_mask(past_lengths, n)
        x = x * valid[..., None].astype(x.dtype)
        return x.astype(self.dtype), valid


def postprocess_output(
    x: jnp.ndarray, mode: str, embedding_dim: int, eps: float = 1e-6
) -> jnp.ndarray:
    """Parameter-free output postprocessing ('l2_norm' | 'layer_norm')."""
    x = x[..., :embedding_dim]
    if mode == "l2_norm":
        return l2_normalize(x, eps)
    if mode == "layer_norm":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps)
    raise ValueError(f"Unknown user_embedding_norm {mode!r}")
