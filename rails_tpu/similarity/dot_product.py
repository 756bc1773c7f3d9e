"""Plain dot-product (MIPS) similarity.

Reference: `/root/reference/rails/similarities/dot_product_similarity_fn.py:24-68`.
All three broadcast cases (shared corpus, rowwise, and r-queries-per-row)
are supported; each lowers to one einsum under XLA.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class DotProductSimilarity(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_embeddings: jnp.ndarray,    # (B, D) or (B * r, D)
        item_embeddings: jnp.ndarray,     # (1, X, D) or (B, X, D)
        user_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        weights: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        del user_ids, train, weights
        q = query_embeddings.astype(self.dtype)
        i = item_embeddings.astype(self.dtype)
        b_i, x, d = i.shape
        if b_i == 1:
            scores = jnp.einsum("bd,xd->bx", q, i[0], preferred_element_type=self.dtype)
        elif q.shape[0] != b_i:
            # r queries per item-batch row (`dot_product_similarity_fn.py:55-60`):
            # (B * r, D) x (B, X, D) -> (B * r, X).
            assert q.shape[0] % b_i == 0, (q.shape, i.shape)
            scores = jnp.einsum(
                "brd,bxd->brx", q.reshape(b_i, -1, d), i,
                preferred_element_type=self.dtype,
            ).reshape(-1, x)
        else:
            scores = jnp.einsum("bd,bxd->bx", q, i, preferred_element_type=self.dtype)
        return scores, {}
