"""Negative samplers.

Reference: `/root/reference/modeling/sequential/autoregressive_losses.py:26-201`.

TPU shifts:
  - `LocalNegativesSampler` keeps the corpus id list as a device array and
    samples uniform offsets with `jax.random.randint` — a pure function of the
    rng key, shape-static, no host round-trip;
  - `InBatchNegativesSampler`'s `torch.unique` dedup (dynamic shape) becomes a
    sort + first-occurrence mask + inverse-CDF draw over the (traced) unique
    count, keeping every shape static under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rails_tpu.similarity.layers import l2_normalize


def maybe_l2_norm(x: jnp.ndarray, l2_norm: bool, eps: float) -> jnp.ndarray:
    """`NegativesSampler.normalize_embeddings` (`autoregressive_losses.py:34-43`)."""
    return l2_normalize(x, eps) if l2_norm else x


class LocalNegativesSampler(NamedTuple):
    """Uniform sampling over the full corpus id list
    (`autoregressive_losses.py:71-120`). Embeddings are re-looked-up from the
    live (tied) item table by the caller.

    Registered as a pytree whose id table is a child (runtime device buffer)
    and whose l2 config is static aux data — so the sampler can be a jit
    argument without tracing the booleans or baking the table in as a
    constant."""

    all_item_ids: jnp.ndarray    # (num_items,) int32, actual item ids
    l2_norm: bool = False
    l2_norm_eps: float = 1e-6

    def sample(
        self, rng: jax.Array, shape: Tuple[int, ...]
    ) -> jnp.ndarray:
        offsets = jax.random.randint(
            rng, shape, 0, self.all_item_ids.shape[0], dtype=jnp.int32
        )
        return self.all_item_ids[offsets]


jax.tree_util.register_pytree_node(
    LocalNegativesSampler,
    lambda s: ((s.all_item_ids,), (s.l2_norm, s.l2_norm_eps)),
    lambda aux, ch: LocalNegativesSampler(ch[0], aux[0], aux[1]),
)


class InBatchState(NamedTuple):
    """Processed batch state for in-batch sampling: ids sorted ascending with a
    first-occurrence mask; `num_unique` is a traced scalar."""

    sorted_ids: jnp.ndarray        # (M,) int32 (invalid rows pushed to the end)
    sorted_embeddings: jnp.ndarray  # (M, D)
    cum_unique: jnp.ndarray        # (M,) int32 inclusive count of uniques
    num_unique: jnp.ndarray        # () int32


class InBatchNegativesSampler(NamedTuple):
    """Dedup in-batch sampler (`autoregressive_losses.py:123-201`).
    All fields are static config (registered as pytree aux data)."""

    l2_norm: bool = False
    l2_norm_eps: float = 1e-6
    dedup_embeddings: bool = True

    def process_batch(
        self,
        ids: jnp.ndarray,          # (M,) int32
        presences: jnp.ndarray,    # (M,) bool
        embeddings: jnp.ndarray,   # (M, D)
    ) -> InBatchState:
        m = ids.shape[0]
        # Push invalid entries to the end by sorting on (invalid, id).
        key = jnp.where(presences, ids, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key)
        sorted_ids = ids[order]
        sorted_valid = presences[order]
        sorted_emb = maybe_l2_norm(embeddings[order], self.l2_norm, self.l2_norm_eps)
        if self.dedup_embeddings:
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
            )
            first = first & sorted_valid
        else:
            first = sorted_valid
        cum = jnp.cumsum(first.astype(jnp.int32))
        return InBatchState(
            sorted_ids=sorted_ids,
            sorted_embeddings=sorted_emb,
            cum_unique=cum,
            num_unique=cum[-1],
        )

    def sample(
        self, state: InBatchState, rng: jax.Array, shape: Tuple[int, ...]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Uniform draw over the unique (or multiset) pool via inverse CDF on
        the first-occurrence cumsum; returns (ids, embeddings)."""
        u = jax.random.uniform(rng, shape)
        # Target unique rank in [1, num_unique].
        rank = jnp.floor(u * state.num_unique).astype(jnp.int32) + 1
        pos = jnp.searchsorted(state.cum_unique, rank, side="left")
        pos = jnp.clip(pos, 0, state.sorted_ids.shape[0] - 1)
        return state.sorted_ids[pos], state.sorted_embeddings[pos]


jax.tree_util.register_pytree_node(
    InBatchNegativesSampler,
    lambda s: ((), (s.l2_norm, s.l2_norm_eps, s.dedup_embeddings)),
    lambda aux, ch: InBatchNegativesSampler(*aux),
)
