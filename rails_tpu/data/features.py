"""Sequential batch features as a JAX pytree.

Reference: `SequentialFeatures` + `movielens_seq_features_from_row`
(`/root/reference/modeling/sequential/features.py:26-108`). Fixed shapes, int32
everywhere (TPU-friendly); the generative-output padding slots and the
target-timestamp scatter are applied on the host before the batch is donated
to the device.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


class SequentialFeatures(NamedTuple):
    lengths: jnp.ndarray       # (B,) int32, > 0
    ids: jnp.ndarray           # (B, N) int32, 0 = padding
    timestamps: jnp.ndarray    # (B, N) int32
    ratings: jnp.ndarray       # (B, N) int32
    user_ids: jnp.ndarray      # (B,) int32


class Batch(NamedTuple):
    features: SequentialFeatures
    target_ids: jnp.ndarray       # (B,) int32
    target_ratings: jnp.ndarray   # (B,) int32


def truncate_features(features: SequentialFeatures, n: int) -> SequentialFeatures:
    """Serve-time truncation of the padded sequence axis to n columns.

    Valid when every row satisfies length + 1 <= n (the +1 keeps the
    next-item timestamp slot read by the HSTU time bias). The HSTU modules
    are length-agnostic: bias tables index by relative offset against the
    trained center and the attention normalizer stays 1/max_seq_len, so
    shorter padded batches produce identical outputs with ~ (n/N)^2 less
    attention work — the dense-layout counterpart of the reference's jagged
    skipping of padding.
    """
    return features._replace(
        ids=features.ids[:, :n],
        timestamps=features.timestamps[:, :n],
        ratings=features.ratings[:, :n],
    )


def serving_pad_length(max_length: int, multiple: int = 64) -> int:
    """Smallest TPU-friendly padded length covering max_length + 1."""
    need = max_length + 1
    return ((need + multiple - 1) // multiple) * multiple


def batch_from_rows(
    historical_lengths: np.ndarray,     # (B,)
    historical_ids: np.ndarray,         # (B, max_seq_len)
    historical_ratings: np.ndarray,
    historical_timestamps: np.ndarray,
    target_ids: np.ndarray,             # (B,)
    target_ratings: np.ndarray,
    target_timestamps: np.ndarray,
    user_ids: np.ndarray,
    max_output_length: int,
) -> Batch:
    """Pads +max_output_length slots and scatters the target timestamp at
    position `length` (`features.py:56-87`)."""
    b, n = historical_ids.shape
    pad = np.zeros((b, max_output_length), dtype=historical_ids.dtype)
    ids = np.concatenate([historical_ids, pad], axis=1)
    ratings = np.concatenate([historical_ratings, pad], axis=1)
    ts = np.concatenate(
        [historical_timestamps.astype(np.int64), pad.astype(np.int64)], axis=1
    )
    ts[np.arange(b), historical_lengths] = target_timestamps
    # Rebase to the batch minimum before narrowing to int32: only bucketized
    # within-sequence deltas reach the model (HSTU time bias), and raw Unix
    # seconds overflow int32 after 2038-01-19 (the reference keeps them
    # int64; JAX default config has no int64). Padding slots stay 0.
    valid = ts > 0
    if valid.any():
        base = ts[valid].min() - 1
        ts = np.where(valid, ts - base, 0)
    feats = SequentialFeatures(
        lengths=jnp.asarray(historical_lengths, dtype=jnp.int32),
        ids=jnp.asarray(ids, dtype=jnp.int32),
        timestamps=jnp.asarray(ts, dtype=jnp.int32),
        ratings=jnp.asarray(ratings, dtype=jnp.int32),
        user_ids=jnp.asarray(user_ids, dtype=jnp.int32),
    )
    return Batch(
        features=feats,
        target_ids=jnp.asarray(target_ids, dtype=jnp.int32),
        target_ratings=jnp.asarray(target_ratings, dtype=jnp.int32),
    )
