"""Plain dot-product (MIPS) similarity.

Reference: `/root/reference/rails/similarities/dot_product_similarity_fn.py:24-68`.
All three broadcast cases collapse to a single einsum under XLA.
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
        query_embeddings: jnp.ndarray,    # (B, D)
        item_embeddings: jnp.ndarray,     # (1, X, D) or (B, X, D)
        user_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        weights: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        del user_ids, train, weights
        q = query_embeddings.astype(self.dtype)
        i = item_embeddings.astype(self.dtype)
        if i.shape[0] == 1:
            scores = jnp.einsum("bd,xd->bx", q, i[0], preferred_element_type=self.dtype)
        else:
            scores = jnp.einsum("bd,bxd->bx", q, i, preferred_element_type=self.dtype)
        return scores, {}
