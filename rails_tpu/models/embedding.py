"""Item embedding modules.

Reference: `/root/reference/modeling/sequential/embedding_modules.py:24-112`.
`SequentialRecommender` inlines the local table; `CategoricalEmbeddingModule`
is provided for id->category remapped corpora.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.ops.pallas.scatter_add import gather_rows


def item_emb_init(stddev: float = 0.02):
    """Truncated-normal with the padding row (id 0) zeroed
    (`embedding_modules.py:40-73`, torch `padding_idx=0`)."""

    def init(key, shape, dtype=jnp.float32):
        x = jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev
        return x.at[0].set(0.0)

    return init


class LocalEmbeddingModule(nn.Module):
    """Plain (num_items + 1, D) table."""

    num_items: int
    item_embedding_dim: int
    # Backward of the gather through the binned Pallas scatter-add
    # (`ops/pallas/scatter_add.py`) instead of XLA's serialized row
    # scatter. Identical dense cotangent (fp32 accumulation).
    scatter_grad_kernel: bool = False

    @nn.compact
    def __call__(self, item_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", item_emb_init(),
            (self.num_items + 1, self.item_embedding_dim),
        )
        if self.scatter_grad_kernel:
            return gather_rows(table, item_ids)
        return table[item_ids]


class CategoricalEmbeddingModule(nn.Module):
    """Items share embeddings through an id->category remap
    (`embedding_modules.py:76-112`): lookup row is
    category_of[(id - 1).clip(0)] + 1. Unlike the reference, padding id 0
    maps to the zero padding row instead of item 1's category (the reference
    would hand padding a real category embedding — a latent bug in its
    unused-by-default module)."""

    num_categories: int
    item_embedding_dim: int
    item_id_to_category_id: Any        # (max_item_id,) int array
    scatter_grad_kernel: bool = False

    @nn.compact
    def __call__(self, item_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", item_emb_init(),
            (self.num_categories + 1, self.item_embedding_dim),
        )
        remap = jnp.asarray(self.item_id_to_category_id)
        cat_ids = remap[jnp.maximum(item_ids - 1, 0)] + 1
        cat_ids = jnp.where(item_ids == 0, 0, cat_ids)
        if self.scatter_grad_kernel:
            return gather_rows(table, cat_ids)
        return table[cat_ids]
