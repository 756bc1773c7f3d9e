"""Preprocessing-pipeline tests on realistic fixture raw files.

The real datasets cannot be downloaded here (no network egress) and the
reference mount ships only LFS stubs, so these fixtures replicate the RAW
FILE FORMATS exactly — ml-1m `ratings.dat` (`user::item::rating::ts`), zip
archive layout, ml-20m `ratings.csv` (header `userId,movieId,...`), Amazon
headerless csv — and, for ml-1m, the TRUE cardinality (3706 unique items,
max id 3952) so the reference's hard data-integrity asserts
(`/root/reference/data/preprocessor.py:301-305`) execute unmodified. With
real downloads present, the identical code path runs; only the bytes differ.
"""

import os
import zipfile

import numpy as np
import pandas as pd
import pytest

from rails_tpu.data.preprocessor import (
    AmazonDataProcessor,
    MovielensDataProcessor,
    get_common_preprocessors,
)

ML1M_UNIQUE, ML1M_MAX_ID = 3706, 3952


def _ml1m_fixture_rows(seed=0):
    """(user, item, rating, ts) rows with exactly ML1M_UNIQUE distinct item
    ids, max id ML1M_MAX_ID, 10 interactions per user."""
    rng = np.random.default_rng(seed)
    items = np.sort(
        np.concatenate([
            rng.choice(np.arange(1, ML1M_MAX_ID), ML1M_UNIQUE - 1, replace=False),
            [ML1M_MAX_ID],
        ])
    )
    per_user = 10
    n_users = -(-len(items) // per_user)          # 371
    slots = np.resize(items, n_users * per_user)  # wraps the tail (dups OK
    #                                               across users, not within:
    #                                               the wrap reuses the FIRST
    #                                               items, which belong to
    #                                               user 0)
    users = np.repeat(np.arange(1, n_users + 1), per_user)
    ratings = rng.integers(1, 6, len(slots))
    ts = 978300000 + np.arange(len(slots))        # globally increasing
    order = rng.permutation(len(slots))           # file order is shuffled;
    #                                               preprocessing must sort
    return users[order], slots[order], ratings[order], ts[order]


def _write_ml1m_dat(path, rows):
    users, items, ratings, ts = rows
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for u, i, r, t in zip(users, items, ratings, ts):
            f.write(f"{u}::{i}::{r}::{t}\n")


def _check_sequences_chronological(csv_path, expected_users):
    from rails_tpu.data.datasets import load_sasrec_format_csv

    seqs = load_sasrec_format_csv(csv_path)
    assert seqs.num_users == expected_users
    for row in range(seqs.num_users):
        s, e = seqs.offsets[row], seqs.offsets[row + 1]
        t = seqs.timestamps[s:e]
        assert (np.diff(t) > 0).all(), "per-user timestamps must be sorted"


class TestMovielens1M:
    def test_dat_parse_with_true_cardinality_asserts(self, tmp_path):
        rows = _ml1m_fixture_rows()
        _write_ml1m_dat(str(tmp_path / "tmp/ml-1m/ratings.dat"), rows)
        # The REAL registry entry, hard asserts included.
        proc = get_common_preprocessors(str(tmp_path))["ml-1m"]
        n = proc.preprocess_rating()
        assert n == ML1M_UNIQUE
        _check_sequences_chronological(
            proc.output_format_csv(), expected_users=371
        )

    def test_zip_extraction_path(self, tmp_path):
        """No extracted ratings.dat: preprocess falls back to download(),
        which finds the archive already saved and extracts it — the exact
        flow after `urlretrieve` on a real machine."""
        rows = _ml1m_fixture_rows()
        dat = str(tmp_path / "stage/ratings.dat")
        _write_ml1m_dat(dat, rows)
        zpath = tmp_path / "tmp/movielens1m.zip"
        os.makedirs(zpath.parent, exist_ok=True)
        with zipfile.ZipFile(zpath, "w") as z:
            z.write(dat, arcname="ml-1m/ratings.dat")

        proc = get_common_preprocessors(str(tmp_path))["ml-1m"]
        assert not os.path.exists(tmp_path / "tmp/ml-1m/ratings.dat")
        n = proc.preprocess_rating()
        assert n == ML1M_UNIQUE
        assert os.path.exists(proc.output_format_csv())

    def test_wrong_cardinality_trips_integrity_assert(self, tmp_path):
        users, items, ratings, ts = _ml1m_fixture_rows()
        _write_ml1m_dat(
            str(tmp_path / "tmp/ml-1m/ratings.dat"),
            (users[:100], items[:100], ratings[:100], ts[:100]),
        )
        with pytest.raises(AssertionError, match="unique items"):
            get_common_preprocessors(str(tmp_path))["ml-1m"].preprocess_rating()


class TestMovielens20M:
    def test_csv_header_branch(self, tmp_path):
        rng = np.random.default_rng(1)
        n = 200
        df = pd.DataFrame({
            "userId": rng.integers(1, 21, n),
            "movieId": rng.integers(1, 90, n),
            "rating": rng.integers(1, 6, n).astype(float),
            "timestamp": 1e9 + rng.permutation(n),
        })
        path = tmp_path / "tmp/ml-20m/ratings.csv"
        os.makedirs(path.parent, exist_ok=True)
        df.to_csv(path, index=False)
        proc = MovielensDataProcessor(
            prefix="ml-20m",
            download_url="unused",
            saved_name="unused",
            expected_num_unique_items=int(df["movieId"].nunique()),
            expected_max_item_id=int(df["movieId"].max()),
            root=str(tmp_path),
        )
        n_unique = proc.preprocess_rating()
        assert n_unique == df["movieId"].nunique()
        _check_sequences_chronological(
            proc.output_format_csv(), expected_users=df["userId"].nunique()
        )


class TestAmazonBooks:
    def test_single_pass_5core_matches_reference_semantics(self, tmp_path):
        """The reference filters ONCE against the pre-filter counts
        (`/root/reference/data/preprocessor.py:346-362`), then drops
        short (< 5 event) user sequences AFTER grouping (`:391-393`) —
        NOT an iterate-to-stable core. Pinned by an item whose count is
        >= 5 only before its (light) raters are removed: single-pass keeps
        it in the vocabulary, an iterative filter would not. Columns are
        read user-first, exactly as the reference parses the raw csv."""
        rows = []
        ts = 0
        # 6 heavy users x 6 heavy items = fully crossed (all counts 6).
        for u in range(6):
            for i in range(6):
                ts += 1
                rows.append((f"U{u}", f"I{i}", 5.0, ts))
        # I_x: rated by heavy U0 + four LIGHT users -> original item count 5
        # (survives the single-pass item filter), but the light users'
        # rows are removed by the user filter, leaving I_x with one event.
        ts += 1
        rows.append(("U0", "I_x", 3.0, ts))
        for j in range(4):
            ts += 1
            rows.append((f"L{j}", "I_x", 2.0, ts))     # light: 1 rating each
        path = tmp_path / "tmp/amzn_books/ratings.csv"
        os.makedirs(path.parent, exist_ok=True)
        pd.DataFrame(rows).to_csv(path, index=False, header=False)

        proc = AmazonDataProcessor(
            root=str(tmp_path), expected_num_unique_items=7
        )
        n = proc.preprocess_rating()
        assert n == 7              # I_x stays in the vocab (single pass)
        out = pd.read_csv(proc.output_format_csv())
        assert len(out) == 6       # light users' rows all filtered
        import ast

        seqs = {
            int(u): ast.literal_eval(s)
            for u, s in zip(out["user_id"], out["sequence_item_ids"])
        }
        lengths = sorted(len(v) for v in seqs.values())
        assert lengths == [6, 6, 6, 6, 6, 7]    # U0 keeps its I_x event
        all_items = sorted({i for v in seqs.values() for i in v})
        assert all_items == list(range(7))      # contiguous, 0-based

    def test_post_group_sequence_filter_drops_short_users(self, tmp_path):
        """A user whose events drop below 5 after the row filter is removed
        by the post-group sequence-length filter (`preprocessor.py:391-393`)
        while their surviving items stay in the vocabulary."""
        rows = []
        ts = 0
        for u in range(6):
            for i in range(6):
                ts += 1
                rows.append((f"U{u}", f"I{i}", 5.0, ts))
        # U_mid rates 5 items: 4 heavy + 1 light item (count 1 -> item
        # filtered). Original user count 5 -> survives the user filter,
        # but the grouped sequence has 4 events -> dropped by the final
        # length filter.
        for i in range(4):
            ts += 1
            rows.append(("U_mid", f"I{i}", 4.0, ts))
        ts += 1
        rows.append(("U_mid", "I_rare", 4.0, ts))
        path = tmp_path / "tmp/amzn_books/ratings.csv"
        os.makedirs(path.parent, exist_ok=True)
        pd.DataFrame(rows).to_csv(path, index=False, header=False)

        proc = AmazonDataProcessor(
            root=str(tmp_path), expected_num_unique_items=6
        )
        assert proc.preprocess_rating() == 6
        out = pd.read_csv(proc.output_format_csv())
        assert len(out) == 6       # U_mid's 4-event sequence dropped


class TestPreprocessToTrainEndToEnd:
    def test_cli_preprocess_then_train_on_ml1m_fixture(self, tmp_path):
        """The full reproduction command path at fixture scale:
        `cli/preprocess --datasets ml-1m` -> `cli/train` with
        `data.dataset_name=ml-1m` reading the produced csv (tiny model
        geometry so the run takes seconds on CPU)."""
        rows = _ml1m_fixture_rows()
        _write_ml1m_dat(str(tmp_path / "tmp/ml-1m/ratings.dat"), rows)

        from rails_tpu.cli.preprocess import main as preprocess_main

        preprocess_main(["--datasets", "ml-1m", "--root", str(tmp_path)])
        assert os.path.exists(tmp_path / "tmp/ml-1m/sasrec_format.csv")

        from rails_tpu.cli.train import main as train_main

        workdir = tmp_path / "runs"
        train_main([
            "--config", "synthetic-small",
            "--workdir", str(workdir),
            "--data-root", str(tmp_path),
            "--set", "data.dataset_name=ml-1m",
            "--set", "data.max_sequence_length=8",
            "--set", "train.local_batch_size=32",
            "--set", "train.eval_batch_size=32",
            "--set", "train.num_negatives=8",
            "--set", "train.num_epochs=1",
            "--set", "train.eval_interval=100",
            "--set", "train.partial_eval_num_iters=1",
            "--set", "train.gr_output_length=0",
            "--set", "mol.uid_embedding_hash_sizes=(128,)",
        ])
        assert len(os.listdir(workdir)) == 1
