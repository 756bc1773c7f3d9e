"""Jagged categorical item side-feature container.

Reference: `/root/reference/data/item_features.py:23-29` — built by the
dataset registry for MovieLens genres/years but not consumed by the models.
Stored host-side as the standard (offsets, values) ragged layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class ItemFeatures:
    """Per-item jagged categorical features.

    `offsets[f]` / `values[f]` describe feature f over items [0, max_item_id]:
    item i's values are values[f][offsets[f][i]:offsets[f][i+1]].
    """

    max_item_id: int
    num_features: int
    offsets: List[np.ndarray]
    values: List[np.ndarray]

    def lengths(self, f: int) -> np.ndarray:
        return np.diff(self.offsets[f])

    def to_padded_dense(self, f: int, max_len: int) -> np.ndarray:
        """(max_item_id + 1, max_len) int32, zero padded — the TPU-friendly
        fixed-shape view."""
        out = np.zeros((self.max_item_id + 1, max_len), dtype=np.int32)
        offs, vals = self.offsets[f], self.values[f]
        for i in range(self.max_item_id + 1):
            row = vals[offs[i]: offs[i + 1]][:max_len]
            out[i, : len(row)] = row
        return out


def load_movielens_item_features(
    movies_csv: str,
    max_item_id: int,
    max_ind_range=(63, 16383, 511),
    max_jagged_dimension: int = 16,
) -> ItemFeatures:
    """Hashed MovieLens side features: genres, title words, year.

    Reference: `get_reco_dataset` (`/root/reference/data/reco_dataset.py:94-146`).
    One divergence: the reference hashes with Python `hash()` (which varies
    per process via PYTHONHASHSEED); a stable crc32 is used here so features
    are reproducible.
    """
    import zlib

    import pandas as pd

    def h(s: str, mod: int) -> int:
        return zlib.crc32(str(s).encode()) % mod

    items = pd.read_csv(movies_csv, delimiter=",")
    per_feature = [
        [np.asarray([], dtype=np.int64)] * (max_item_id + 1) for _ in range(3)
    ]
    for _, row in items.iterrows():
        movie_id = int(row["movie_id"])
        if movie_id > max_item_id:
            continue
        genres = str(row["genres"]).split("|")
        titles = str(row.get("cleaned_title", row.get("title", ""))).split(" ")
        per_feature[0][movie_id] = np.asarray(
            [h(x, max_ind_range[0]) for x in genres[:max_jagged_dimension]],
            dtype=np.int64,
        )
        per_feature[1][movie_id] = np.asarray(
            [h(x, max_ind_range[1]) for x in titles[:max_jagged_dimension]],
            dtype=np.int64,
        )
        per_feature[2][movie_id] = np.asarray(
            [h(row["year"], max_ind_range[2])], dtype=np.int64
        )
    offsets, values = [], []
    for f in range(3):
        lens = np.array([len(v) for v in per_feature[f]], dtype=np.int64)
        offs = np.zeros(max_item_id + 2, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        offsets.append(offs)
        values.append(np.concatenate(per_feature[f]))
    return ItemFeatures(
        max_item_id=max_item_id, num_features=3, offsets=offsets, values=values
    )


def build_item_features(
    item_ids: np.ndarray, feature_lists: List[List[np.ndarray]], max_item_id: int
) -> ItemFeatures:
    """Assemble from per-item value lists (one inner list per feature)."""
    num_features = len(feature_lists)
    offsets, values = [], []
    for f in range(num_features):
        per_item = [np.asarray([], dtype=np.int64)] * (max_item_id + 1)
        for i, iid in enumerate(item_ids):
            per_item[int(iid)] = np.asarray(feature_lists[f][i], dtype=np.int64)
        lens = np.array([len(v) for v in per_item], dtype=np.int64)
        offs = np.zeros(max_item_id + 2, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        offsets.append(offs)
        values.append(
            np.concatenate(per_item) if len(per_item) else np.asarray([], np.int64)
        )
    return ItemFeatures(
        max_item_id=max_item_id,
        num_features=num_features,
        offsets=offsets,
        values=values,
    )
