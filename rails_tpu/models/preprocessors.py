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

    def setup(self):
        self.pos_emb = self.param(
            "pos_emb", xavier_normal, (self.max_sequence_len, self.embedding_dim)
        )
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(
        self,
        past_lengths: jnp.ndarray,       # (B,)
        past_embeddings: jnp.ndarray,    # (B, N, D)
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, d = past_embeddings.shape
        x = past_embeddings * (self.embedding_dim ** 0.5) + self.pos_emb[None, :n, :]
        x = self.dropout(x, deterministic=not train)
        valid = length_mask(past_lengths, n)
        x = x * valid[..., None].astype(x.dtype)
        return x.astype(self.dtype), valid

    def at_position(
        self, embedding_t: jnp.ndarray, position: jnp.ndarray
    ) -> jnp.ndarray:
        """Single-position preprocessing for incremental decode:
        emb * sqrt(D) + pos_emb[position]. (B, D), (B,) -> (B, D)."""
        x = embedding_t * (self.embedding_dim ** 0.5) + self.pos_emb[position]
        return x.astype(self.dtype)


class LearnablePositionalEmbeddingRatedInputPreprocessor(nn.Module):
    """Concat [item_emb, rating_emb], scale, add pos emb, dropout, mask.

    Reference: `LearnablePositionalEmbeddingRatedInputFeaturesPreprocessor`
    (`input_features_preprocessors.py:94-155`). The combined embedding dim is
    item_embedding_dim + rating_embedding_dim.
    """

    max_sequence_len: int
    item_embedding_dim: int
    rating_embedding_dim: int
    num_ratings: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        past_lengths: jnp.ndarray,       # (B,)
        past_embeddings: jnp.ndarray,    # (B, N, D_item)
        ratings: jnp.ndarray,            # (B, N) int
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.item_embedding_dim + self.rating_embedding_dim
        b, n, _ = past_embeddings.shape
        pos_emb = self.param(
            "pos_emb",
            nn.initializers.truncated_normal(stddev=(1.0 / d) ** 0.5),
            (self.max_sequence_len, d),
        )
        rating_table = self.param(
            "rating_emb",
            nn.initializers.truncated_normal(stddev=(1.0 / d) ** 0.5),
            (self.num_ratings, self.rating_embedding_dim),
        )
        rating_emb = rating_table[jnp.clip(ratings, 0, self.num_ratings - 1)]
        x = jnp.concatenate([past_embeddings, rating_emb], axis=-1)
        x = x * (d ** 0.5) + pos_emb[None, :n, :]
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        valid = length_mask(past_lengths, n)
        x = x * valid[..., None].astype(x.dtype)
        return x.astype(self.dtype), valid


class CombinedItemAndRatingInputPreprocessor(nn.Module):
    """Interleave [item_0, rating_0, item_1, rating_1, ...] -> length 2N.

    Reference: `CombinedItemAndRatingInputFeaturesPreprocessor`
    (`input_features_preprocessors.py:158-267`); effective sequence lengths
    double.
    """

    max_sequence_len: int               # already counts the 2x interleave
    embedding_dim: int
    rating_embedding_dim: int
    num_ratings: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        past_lengths: jnp.ndarray,
        past_embeddings: jnp.ndarray,    # (B, N, D)
        ratings: jnp.ndarray,            # (B, N)
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, n, d = past_embeddings.shape
        pos_emb = self.param(
            "pos_emb",
            nn.initializers.truncated_normal(stddev=(1.0 / d) ** 0.5),
            (self.max_sequence_len, d),
        )
        rating_table = self.param(
            "rating_emb",
            nn.initializers.truncated_normal(stddev=(1.0 / d) ** 0.5),
            (self.num_ratings, self.rating_embedding_dim),
        )
        rating_emb = rating_table[jnp.clip(ratings, 0, self.num_ratings - 1)]
        # Pad rating embeddings up to D so the interleave is homogeneous
        # (the reference reshapes (B, N, D + D_r) -> (B, 2N, D), which
        # requires D_r == D; assert the same constraint).
        assert rating_emb.shape[-1] == d, (
            "CombinedItemAndRating requires rating_embedding_dim == "
            "item embedding_dim"
        )
        x = jnp.stack([past_embeddings, rating_emb], axis=2).reshape(b, 2 * n, d)
        x = x * (d ** 0.5) + pos_emb[None, : 2 * n, :]
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        valid = jnp.repeat(length_mask(past_lengths, n), 2, axis=1)
        x = x * valid[..., None].astype(x.dtype)
        return x.astype(self.dtype), valid, past_lengths * 2


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
