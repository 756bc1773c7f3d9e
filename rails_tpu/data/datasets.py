"""Host-side datasets: ragged user sequences -> fixed-shape device batches.

Reference:
  - `DatasetV2` (`/root/reference/data/dataset.py:23-181`): per-user
    chronological sequences from sasrec_format.csv, leave-one-out split via
    `ignore_last_n`, truncate-to-last-N / zero-pad.
  - `get_reco_dataset` (`/root/reference/data/reco_dataset.py:39-160`).

TPU shifts: sequences live in a flat (offsets, values) ragged store — the
host-side mirror of the jagged layout — and batches are materialized as fixed
shape int32 arrays. A synthetic clustered-preference generator stands in for
the MovieLens/Amazon data when the raw files are unavailable (the mounted
reference ships only git-LFS pointer stubs) and for scale benchmarks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from rails_tpu.core.config import DataConfig
from rails_tpu.data.features import Batch, batch_from_rows


@dataclass
class RaggedSequences:
    """Flat ragged storage of chronological per-user event sequences."""

    user_ids: np.ndarray     # (U,) int32
    offsets: np.ndarray      # (U+1,) int64
    item_ids: np.ndarray     # (total,) int32
    ratings: np.ndarray      # (total,) int32
    timestamps: np.ndarray   # (total,) int64

    @property
    def num_users(self) -> int:
        return len(self.user_ids)

    def sequence(self, u: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        s, e = self.offsets[u], self.offsets[u + 1]
        return self.item_ids[s:e], self.ratings[s:e], self.timestamps[s:e]


class SequenceDataset:
    """Leave-one-out view over RaggedSequences (`dataset.py:63-181`)."""

    def __init__(
        self,
        sequences: RaggedSequences,
        max_sequence_length: int,
        ignore_last_n: int,
        sample_ratio: float = 1.0,
    ) -> None:
        """`sample_ratio` < 1 randomly keeps that fraction of each user's
        events, sampled once per user (the reference's
        `positional_sampling_ratio`, `dataset.py:91-97`, cached per worker).
        """
        self._seqs = sequences
        self._max_seq_len = max_sequence_length
        self._ignore_last_n = ignore_last_n
        self._sample_ratio = sample_ratio
        if sample_ratio < 1.0:
            # The reference trims ignore_last_n FIRST, then samples over the
            # trimmed events (`dataset.py:67-84`): the held-out tail is
            # never subject to sampling. Equivalent here: protect the last
            # ignore_last_n events of each user from the drop mask (they
            # are removed by the trim regardless).
            self._seqs = _subsample_events(
                sequences, sample_ratio, seed=0, protect_last_n=ignore_last_n
            )
        # Users must retain >= 2 events (1 history + 1 target) after trimming.
        lens = np.diff(self._seqs.offsets) - ignore_last_n
        self._valid_users = np.nonzero(lens >= 2)[0]

    def __len__(self) -> int:
        return len(self._valid_users)

    def lengths_of(self, indices: np.ndarray) -> np.ndarray:
        """History lengths (post-trim, pre-padding) for example indices —
        cheap (offset arithmetic only), used for length-sorted batching."""
        u = self._valid_users[np.asarray(indices)]
        raw = np.diff(self._seqs.offsets)[u] - self._ignore_last_n - 1
        return np.minimum(raw, self._max_seq_len).astype(np.int32)

    def rows(self, indices: np.ndarray):
        """Materialize fixed-shape host arrays for a batch of example indices.

        Uses the native C++ assembler (`native/sequence_loader.cpp`) when
        built; otherwise the NumPy loop below.
        """
        from rails_tpu.data import native

        if native.available():
            out = native.assemble_batch_native(
                self._seqs,
                self._valid_users[np.asarray(indices)],
                self._max_seq_len,
                self._ignore_last_n,
            )
            if out is not None:
                return out
        return self._rows_numpy(indices)

    def _rows_numpy(self, indices: np.ndarray):
        n = self._max_seq_len
        b = len(indices)
        hist_ids = np.zeros((b, n), dtype=np.int32)
        hist_ratings = np.zeros((b, n), dtype=np.int32)
        hist_ts = np.zeros((b, n), dtype=np.int64)
        lengths = np.zeros((b,), dtype=np.int32)
        tgt_ids = np.zeros((b,), dtype=np.int32)
        tgt_ratings = np.zeros((b,), dtype=np.int32)
        tgt_ts = np.zeros((b,), dtype=np.int64)
        user_ids = np.zeros((b,), dtype=np.int32)
        for row, idx in enumerate(indices):
            u = self._valid_users[idx]
            ids, ratings, ts = self._seqs.sequence(u)
            if self._ignore_last_n > 0:
                ids = ids[: -self._ignore_last_n]
                ratings = ratings[: -self._ignore_last_n]
                ts = ts[: -self._ignore_last_n]
            # Target is the final event; history is everything before it,
            # truncated to the most recent max_seq_len events.
            tgt_ids[row] = ids[-1]
            tgt_ratings[row] = ratings[-1]
            tgt_ts[row] = ts[-1]
            h = ids[:-1][-n:]
            lengths[row] = len(h)
            hist_ids[row, : len(h)] = h
            hist_ratings[row, : len(h)] = ratings[:-1][-n:]
            hist_ts[row, : len(h)] = ts[:-1][-n:]
            user_ids[row] = self._seqs.user_ids[u]
        return (
            lengths, hist_ids, hist_ratings, hist_ts,
            tgt_ids, tgt_ratings, tgt_ts, user_ids,
        )

    def batches(
        self,
        batch_size: int,
        max_output_length: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        num_shards: int = 1,
        shard_index: int = 0,
        sort_by_length: bool = False,
    ) -> Iterator[Batch]:
        """One epoch of device-ready batches.

        `num_shards`/`shard_index` mirror DistributedSampler
        (`/root/reference/trainer/data_loader.py:39-47`) for per-host sharding.

        `sort_by_length` orders examples by sequence length (stable) so
        batches are length-homogeneous — serve-time batches can then be
        truncated to their own max length (`truncate_features`), the dense
        counterpart of the reference's jagged skipping of padding. Mutually
        exclusive with `shuffle`; every example still appears exactly once.
        """
        order = np.arange(len(self))
        if sort_by_length:
            assert not shuffle, "sort_by_length requires shuffle=False"
            order = order[
                np.argsort(self.lengths_of(order), kind="stable")
            ]
        elif shuffle:
            np.random.default_rng(seed).shuffle(order)
        order = order[shard_index::num_shards]
        n_batches = len(order) // batch_size
        rem = len(order) % batch_size
        for i in range(n_batches):
            idx = order[i * batch_size : (i + 1) * batch_size]
            yield self._make_batch(idx, max_output_length)
        if rem and not drop_last:
            # Fixed-shape tail: wrap around to fill the batch (extra rows are
            # duplicates; callers that care filter by example count). np.resize
            # cycles, so the batch fills even when the epoch shard holds fewer
            # than batch_size examples.
            idx = np.resize(
                np.concatenate([order[n_batches * batch_size :], order]),
                batch_size,
            )
            yield self._make_batch(idx, max_output_length)

    def _make_batch(self, idx: np.ndarray, max_output_length: int) -> Batch:
        (lengths, hist_ids, hist_ratings, hist_ts,
         tgt_ids, tgt_ratings, tgt_ts, user_ids) = self.rows(idx)
        return batch_from_rows(
            lengths, hist_ids, hist_ratings, hist_ts,
            tgt_ids, tgt_ratings, tgt_ts, user_ids,
            max_output_length=max_output_length,
        )


def prefetch_batches(batch_iter: Iterator[Batch], depth: int = 2) -> Iterator[Batch]:
    """Background-thread batch prefetcher.

    The reference overlaps host batch assembly with device compute via
    DataLoader worker processes + prefetch_factor
    (`/root/reference/trainer/data_loader.py:48-57`); here a single daemon
    thread keeps `depth` ready batches ahead (assembly is already native via
    the C++ loader, so one thread suffices to hide it behind a train step).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for b in batch_iter:
                q.put(b)
            q.put(_END)
        except BaseException as e:    # noqa: BLE001 — re-raised in consumer
            # Propagate worker failures to the training loop instead of
            # silently presenting a truncated epoch as a clean end.
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is _END:
            return
        if isinstance(b, BaseException):
            raise b
        yield b


@dataclass
class RecoDataset:
    """`RecoDataset` (`/root/reference/data/reco_dataset.py:29-38`)."""

    max_sequence_length: int
    num_unique_items: int
    max_item_id: int
    all_item_ids: np.ndarray     # (num_unique_items,) int32, ids > 0
    train_dataset: SequenceDataset
    eval_dataset: SequenceDataset
    # Hashed categorical side features (built for the MovieLens datasets when
    # the processed movies.csv is present; not consumed by the models —
    # matching the reference, `reco_dataset.py:94-146`).
    item_features: object = None


def _subsample_events(
    seqs: RaggedSequences, ratio: float, seed: int, protect_last_n: int = 0
) -> RaggedSequences:
    """Keep ~ratio of each user's events (sampled once, deterministic).

    `protect_last_n` exempts each user's final events from the drop mask
    (the leave-one-out tail the trim removes anyway — reference order is
    trim-then-sample, `dataset.py:67-84`)."""
    rng = np.random.default_rng(seed)
    total = len(seqs.item_ids)
    keep = rng.random(total) < ratio
    for j in range(1, protect_last_n + 1):
        tails = seqs.offsets[1:] - j
        tails = tails[tails >= seqs.offsets[:-1]]      # users with >= j events
        keep[tails] = True
    # Per-user kept counts via prefix sums — exact for empty users too
    # (np.add.reduceat raises on an index == total and miscounts around
    # repeated indices).
    csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
    lens = csum[seqs.offsets[1:]] - csum[seqs.offsets[:-1]]
    offsets = np.zeros(len(seqs.user_ids) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return RaggedSequences(
        user_ids=seqs.user_ids,
        offsets=offsets,
        item_ids=seqs.item_ids[keep],
        ratings=seqs.ratings[keep],
        timestamps=seqs.timestamps[keep],
    )


def ml20m_like_lengths(
    rng: np.random.Generator, num_users: int, cap: int
) -> np.ndarray:
    """Sequence lengths shaped like ML-20M's ratings-per-user distribution.

    Public facts (GroupLens ML-20M README): 20,000,263 ratings over 138,493
    users -> uncapped mean 144.4, minimum 20 ratings/user; the per-user count
    is heavy-tailed with median ~68. A lognormal with median 68 and mean
    144.4 (sigma = sqrt(2 ln(mean/median)) = 1.227) reproduces those two
    moments; clamped to [20, cap] like the dataset pipeline's
    max_sequence_length truncation it yields mean ~92, ~19% of users at the
    cap — i.e. the real data is SHORTER on average than a uniform 4..cap
    draw (mean ~102), because the heavy tail sits above the cap while the
    median sits well below it.
    """
    mu = np.log(68.0)
    sigma = float(np.sqrt(2.0 * (np.log(144.4) - np.log(68.0))))
    x = rng.lognormal(mu, sigma, size=num_users)
    return np.clip(x, 20, cap).astype(np.int64)


def generate_synthetic_sequences(
    num_users: int,
    num_items: int,
    max_len: int,
    seed: int = 0,
    num_clusters: int = 16,
    min_len: int = 4,
    length_distribution: str = "uniform",
) -> RaggedSequences:
    """Clustered-preference Markov sequences with learnable structure.

    Each user has a home cluster; each item belongs to one cluster. Sequences
    random-walk within the home cluster with occasional jumps, so both
    sequence context and the user id are predictive — exercising the HSTU
    encoder and the MoL uid components.

    `length_distribution`: "uniform" draws min_len..max_len uniformly;
    "ml20m" draws from the ML-20M-shaped capped lognormal
    (`ml20m_like_lengths`).
    """
    rng = np.random.default_rng(seed)
    item_cluster = rng.integers(0, num_clusters, size=num_items)
    cluster_items = [np.nonzero(item_cluster == c)[0] + 1 for c in range(num_clusters)]
    if length_distribution == "ml20m":
        lengths = ml20m_like_lengths(rng, num_users, max_len)
    elif length_distribution == "uniform":
        lengths = rng.integers(min_len, max_len + 1, size=num_users)
    else:
        raise ValueError(f"Unknown length_distribution {length_distribution!r}")
    offsets = np.zeros(num_users + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    item_ids = np.zeros(total, dtype=np.int32)
    ratings = rng.integers(1, 6, size=total).astype(np.int32)
    timestamps = np.zeros(total, dtype=np.int64)
    base_time = 1_000_000_000
    for u in range(num_users):
        home = u % num_clusters
        pool = cluster_items[home]
        if len(pool) == 0:
            pool = np.arange(1, num_items + 1)
        L = lengths[u]
        jumps = rng.random(L) < 0.1
        picks = pool[rng.integers(0, len(pool), size=L)]
        noise = rng.integers(1, num_items + 1, size=L).astype(np.int32)
        seq = np.where(jumps, noise, picks).astype(np.int32)
        s = offsets[u]
        item_ids[s : s + L] = seq
        timestamps[s : s + L] = base_time + u + np.cumsum(
            rng.integers(60, 600_000, size=L)
        )
    return RaggedSequences(
        user_ids=np.arange(num_users, dtype=np.int32),
        offsets=offsets,
        item_ids=item_ids,
        ratings=ratings,
        timestamps=timestamps,
    )


def load_sasrec_format_csv(path: str, shift_id_by: int = 0) -> RaggedSequences:
    """Parse the reference's sasrec_format.csv
    (user_id, sequence_item_ids, sequence_ratings, sequence_timestamps —
    each a stringified int list; `preprocessor.py:254-275`)."""
    import csv

    if _is_lfs_stub(path):
        raise FileNotFoundError(
            f"{path} is a git-LFS pointer stub, not real data; run "
            "`python -m rails_tpu.cli.preprocess` with network access or "
            "use the synthetic dataset."
        )
    from rails_tpu.data import native

    if native.available():
        seqs = native.parse_sasrec_csv_native(path)
        if seqs is not None:
            if shift_id_by:
                seqs.item_ids += shift_id_by
            return seqs
    user_ids: List[int] = []
    flat_ids: List[np.ndarray] = []
    flat_ratings: List[np.ndarray] = []
    flat_ts: List[np.ndarray] = []
    lengths: List[int] = []
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        for rec in reader:
            ids = np.fromstring(
                rec["sequence_item_ids"].strip("[]()"), dtype=np.int64, sep=","
            )
            # Ratings are floats in the raw ML-20M/Amazon data ("4.0",
            # "3.5"); floor-cast is exact for the integer-threshold
            # comparisons downstream (floor(r) >= t <=> r >= t, t int).
            rts = np.fromstring(
                rec["sequence_ratings"].strip("[]()"), dtype=np.float64, sep=","
            ).astype(np.int64)
            ts = np.fromstring(
                rec["sequence_timestamps"].strip("[]()"), dtype=np.int64, sep=","
            )
            user_ids.append(int(rec["user_id"]))
            flat_ids.append(ids + shift_id_by)
            flat_ratings.append(rts)
            flat_ts.append(ts)
            lengths.append(len(ids))
    offsets = np.zeros(len(user_ids) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return RaggedSequences(
        user_ids=np.asarray(user_ids, dtype=np.int32),
        offsets=offsets,
        item_ids=np.concatenate(flat_ids).astype(np.int32),
        ratings=np.concatenate(flat_ratings).astype(np.int32),
        timestamps=np.concatenate(flat_ts).astype(np.int64),
    )


def _is_lfs_stub(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(64).startswith(b"version https://git-lfs")
    except OSError:
        return True


_DATASET_FILES = {
    # name -> (csv relpath, shift_id_by, expected_max_item_id or None)
    "ml-1m": ("tmp/ml-1m/sasrec_format.csv", 0, 3952),
    "ml-20m": ("tmp/ml-20m/sasrec_format.csv", 0, 131262),
    "amzn-books": ("tmp/amzn_books/sasrec_format.csv", 1, None),
}


def get_reco_dataset(
    cfg: DataConfig, data_root: str = "."
) -> RecoDataset:
    """Build train (ignore_last_n=1) / eval (ignore_last_n=0) datasets.

    Reference: `get_reco_dataset` (`reco_dataset.py:39-160`); amzn-books ids
    are shifted +1 so 0 stays the padding id (`reco_dataset.py:81-89`).
    """
    if cfg.dataset_name == "synthetic":
        max_len = (
            cfg.synthetic_max_len
            if getattr(cfg, "synthetic_max_len", 0)
            else cfg.max_sequence_length + 2
        )
        seqs = generate_synthetic_sequences(
            num_users=cfg.synthetic_num_users,
            num_items=cfg.synthetic_num_items,
            max_len=max_len,
            seed=cfg.synthetic_seed,
            length_distribution=getattr(
                cfg, "synthetic_length_distribution", "uniform"
            ),
        )
        max_item_id = cfg.synthetic_num_items
    elif cfg.dataset_name in _DATASET_FILES:
        rel, shift, expected_max = _DATASET_FILES[cfg.dataset_name]
        seqs = load_sasrec_format_csv(os.path.join(data_root, rel), shift_id_by=shift)
        max_item_id = int(seqs.item_ids.max())
        if expected_max is not None:
            max_item_id = max(max_item_id, expected_max)
    else:
        raise ValueError(f"Unknown dataset {cfg.dataset_name!r}")

    item_features = None
    if cfg.dataset_name in ("ml-1m", "ml-20m"):
        movies_csv = os.path.join(
            data_root, f"tmp/processed/{cfg.dataset_name}/movies.csv"
        )
        if os.path.exists(movies_csv) and not _is_lfs_stub(movies_csv):
            from rails_tpu.data.item_features import load_movielens_item_features

            item_features = load_movielens_item_features(movies_csv, max_item_id)

    all_item_ids = np.unique(seqs.item_ids)
    all_item_ids = all_item_ids[all_item_ids > 0].astype(np.int32)
    assert int(all_item_ids.min()) > 0
    return RecoDataset(
        max_sequence_length=cfg.max_sequence_length,
        num_unique_items=len(all_item_ids),
        max_item_id=max_item_id,
        all_item_ids=all_item_ids,
        # Positional subsampling applies to train only (`reco_dataset.py:52,59`).
        train_dataset=SequenceDataset(
            seqs, cfg.max_sequence_length, ignore_last_n=1,
            sample_ratio=cfg.positional_sampling_ratio,
        ),
        eval_dataset=SequenceDataset(seqs, cfg.max_sequence_length, ignore_last_n=0),
        item_features=item_features,
    )
