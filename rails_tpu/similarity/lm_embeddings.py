"""Language-model MoL component-embedding functions.

Reference:
  - `mask_mixing_weights_fn` (`/root/reference/rails/similarities/mol/
    embeddings_fn.py:26-54`): masked softmax over sequence positions;
  - `LMMoLQueryEmbeddingsFn` / `LMMoLItemEmbeddingsFn`
    (`query_embeddings_fns.py:35-126`, `item_embeddings_fns.py:33-119`):
    position-mixing variants producing P component embeddings from a
    (B, N, D) token-embedding sequence, for the QA / language-model use of
    MoL (unused by the recommendation pipeline but part of the rails library
    surface).

Both query and item sides share the same math; `LMMoLEmbeddingsFn` covers the
two reference classes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.similarity.layers import l2_normalize, xavier_normal


def mask_mixing_weights(
    mixing_weights: jnp.ndarray,    # (B, N, P)
    input_ids: jnp.ndarray,         # (B, N') with N' <= N; 0 = padding
    input_max_length: int,
) -> jnp.ndarray:
    """Masked softmax over the position axis (`embeddings_fn.py:26-54`)."""
    n = mixing_weights.shape[1]
    if input_ids.shape[1] < input_max_length:
        input_ids = jnp.pad(
            input_ids, ((0, 0), (0, input_max_length - input_ids.shape[1]))
        )
    valid = (input_ids[:, :n] != 0)[:, :, None]
    masked = jnp.where(valid, mixing_weights, -1e3)
    return jax.nn.softmax(masked, axis=1)


class LMMoLEmbeddingsFn(nn.Module):
    """P component embeddings from a token sequence.

    With mixing weights enabled (v2/v4): a small MLP on one anchor token
    produces per-position mixing logits, softmaxed over valid positions, and
    components are position-weighted sums of the token embeddings. Otherwise
    the first P token embeddings are taken directly.
    """

    input_max_length: int
    input_embedding_dim: int
    dot_product_groups: int
    dot_product_l2_norm: bool = True
    eps: float = 1e-6
    apply_mixing_weights_v2: bool = False
    apply_mixing_weights_v4: bool = False
    mixing_weights_hidden_dim: int = 256
    filter_invalid_positions: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_embeddings: jnp.ndarray,        # (B, N, D)
        input_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        del train
        assert not (self.apply_mixing_weights_v2 and self.apply_mixing_weights_v4)
        b, n, d = input_embeddings.shape
        if self.apply_mixing_weights_v2 or self.apply_mixing_weights_v4:
            if n < self.input_max_length:
                input_embeddings = jnp.pad(
                    input_embeddings,
                    ((0, 0), (0, self.input_max_length - n), (0, 0)),
                )
            # Anchor token: position P for v4, position 0 for v2
            # (`query_embeddings_fns.py:99-104`).
            anchor = input_embeddings[
                :, self.dot_product_groups if self.apply_mixing_weights_v4 else 0, :
            ]
            h = nn.Dense(
                self.mixing_weights_hidden_dim, dtype=self.dtype,
                kernel_init=xavier_normal,
                bias_init=nn.initializers.zeros_init(), name="mix_fc1",
            )(anchor)
            # torch nn.LayerNorm default eps (the reference uses the
            # default, `query_embeddings_fns.py:68`).
            h = jax.nn.silu(nn.LayerNorm(epsilon=1e-5, name="mix_ln")(h))
            logits = nn.Dense(
                self.input_max_length * self.dot_product_groups,
                dtype=self.dtype, kernel_init=xavier_normal,
                bias_init=nn.initializers.zeros_init(), name="mix_fc2",
            )(h).reshape(b, self.input_max_length, self.dot_product_groups)
            if self.filter_invalid_positions:
                if input_ids is None:
                    raise ValueError(
                        "filter_invalid_positions requires input_ids"
                    )
                weights = mask_mixing_weights(
                    logits, input_ids, self.input_max_length
                )
            else:
                weights = jax.nn.softmax(logits, axis=1)
            comps = jnp.einsum(
                "bnd,bnm->bmd", input_embeddings, weights,
                preferred_element_type=self.dtype,
            )
        else:
            comps = input_embeddings[:, : self.dot_product_groups, :]
        if self.dot_product_l2_norm:
            comps = l2_normalize(comps, self.eps)
        return comps, {}
