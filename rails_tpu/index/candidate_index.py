"""Candidate index: top-k retrieval with seen-id filtering.

Reference: `/root/reference/indexing/candidate_index.py:30-191`.

The reference requests k' = k + max_invalid candidates, masks ids the user has
already seen, caps the selection at k with a cumsum, and backfills from masked
entries when fewer than k valid remain (`candidate_index.py:152-175`). All of
that is reproduced here with static shapes: the final per-row selection uses a
stable argsort on the keep-mask instead of `torch.nonzero`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rails_tpu.index.top_k import TopKResult


def select_top_k_with_invalid_filter(
    result: TopKResult,
    invalid_ids: Optional[jnp.ndarray],    # (B, N0) int; 0 entries never match
    k: int,
) -> TopKResult:
    """Filter seen ids rowwise and return exactly k results per row.

    Reference: `CandidateIndex.get_top_k_outputs` (`candidate_index.py:144-178`).
    """
    scores, ids = result.scores, result.ids
    if invalid_ids is None:
        return TopKResult(scores=scores[:, :k], ids=ids[:, :k])
    k_prime = ids.shape[1]
    assert k_prime >= k, f"top-k pool {k_prime} smaller than requested k {k}"

    is_seen = (ids[:, :, None] == invalid_ids[:, None, :]).any(axis=2)  # (B, K')
    id_is_valid = ~is_seen
    id_is_valid = id_is_valid & (jnp.cumsum(id_is_valid, axis=1) <= k)
    # Backfill from masked entries so each row has exactly k selections
    # (`candidate_index.py:161-170`).
    gap = k - id_is_valid.sum(axis=1, keepdims=True)
    masked = ~id_is_valid
    backfill = masked & (jnp.cumsum(masked, axis=1) <= gap)
    keep = id_is_valid | backfill

    order = jnp.argsort(~keep, axis=1, stable=True)[:, :k]
    return TopKResult(
        scores=jnp.take_along_axis(scores, order, axis=1),
        ids=jnp.take_along_axis(ids, order, axis=1),
    )


def k_prime_for(
    k: int,
    num_objects: int,
    max_num_invalid: int,
    truncate_k_prime_to: Optional[int] = None,
) -> int:
    """k' sizing rule (`candidate_index.py:149-151`)."""
    k_prime = min(k + max_num_invalid, num_objects)
    if truncate_k_prime_to is not None:
        k_prime = min(k_prime, truncate_k_prime_to)
    return max(k_prime, k)
