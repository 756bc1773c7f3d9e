"""Public-dataset preprocessing: MovieLens-1M/20M and Amazon Books.

Reference: `/root/reference/data/preprocessor.py:35-454`. Pipeline:
download/extract -> per-user chronological group-by -> `sasrec_format.csv`
(stringified per-user id/rating/timestamp lists); Amazon additionally gets
5-core filtering and a categorical id remap (+1 shift happens at load time,
`reco_dataset.py:81-89`). Data-integrity asserts on unique-item counts are
kept (`preprocessor.py:301-305,411-415`).

Network access is required only for `download()`; preprocessing runs offline
on already-present raw files.
"""

from __future__ import annotations

import os
import tarfile
from dataclasses import dataclass
from typing import Dict, Optional
from zipfile import ZipFile

import numpy as np
import pandas as pd


def _group_to_sasrec_csv(
    ratings: pd.DataFrame, out_csv: str, shuffle_seed: int = 0,
    min_sequence_length: int = 0,
) -> pd.DataFrame:
    """Sort by timestamp, group by user, write stringified sequence lists
    (`preprocessor.py:254-275`). `min_sequence_length` drops shorter users
    AFTER grouping (the Amazon pipeline's final >= 5 filter,
    `preprocessor.py:391-393`)."""
    group = ratings.sort_values(by=["unix_timestamp"]).groupby("user_id")
    seq = pd.DataFrame(
        data={
            "user_id": list(group.groups.keys()),
            "sequence_item_ids": list(group.item_id.apply(list)),
            "sequence_ratings": list(group.rating.apply(list)),
            "sequence_timestamps": list(group.unix_timestamp.apply(list)),
        }
    )
    if min_sequence_length > 0:
        seq = seq[
            seq["sequence_item_ids"].apply(len) >= min_sequence_length
        ]
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    seq.sample(frac=1, random_state=shuffle_seed).reset_index(drop=True).to_csv(
        out_csv, index=False, sep=","
    )
    return seq


@dataclass
class MovielensDataProcessor:
    """`MovielensDataProcessor` (`preprocessor.py:100-298`)."""

    prefix: str                        # "ml-1m" | "ml-20m"
    download_url: str
    saved_name: str
    expected_num_unique_items: Optional[int] = None
    expected_max_item_id: Optional[int] = None
    root: str = "."

    def output_format_csv(self) -> str:
        return os.path.join(self.root, f"tmp/{self.prefix}/sasrec_format.csv")

    def download(self) -> None:
        from urllib.request import urlretrieve

        path = os.path.join(self.root, self.saved_name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if not os.path.exists(path):
            urlretrieve(self.download_url, path)
        tmp = os.path.join(self.root, "tmp")
        if path.endswith(".zip"):
            ZipFile(path, "r").extractall(path=tmp)
        else:
            with tarfile.open(path, "r:*") as tar:
                tar.extractall(tmp)

    def preprocess_rating(self) -> int:
        d = os.path.join(self.root, f"tmp/{self.prefix}")
        if self.prefix == "ml-1m":
            if not os.path.exists(os.path.join(d, "ratings.dat")):
                self.download()
            ratings = pd.read_csv(
                os.path.join(d, "ratings.dat"),
                sep="::",
                names=["user_id", "item_id", "rating", "unix_timestamp"],
                engine="python",
            )
        else:
            if not os.path.exists(os.path.join(d, "ratings.csv")):
                self.download()
            ratings = pd.read_csv(os.path.join(d, "ratings.csv"), sep=",")
            ratings.rename(
                columns={
                    "userId": "user_id",
                    "movieId": "item_id",
                    "timestamp": "unix_timestamp",
                },
                inplace=True,
            )
        num_unique = ratings["item_id"].nunique()
        max_id = int(ratings["item_id"].max())
        if self.expected_num_unique_items is not None:
            assert num_unique == self.expected_num_unique_items, (
                f"{self.prefix}: {num_unique} unique items, expected "
                f"{self.expected_num_unique_items}"
            )
        if self.expected_max_item_id is not None:
            assert max_id == self.expected_max_item_id
        _group_to_sasrec_csv(ratings, self.output_format_csv())
        return num_unique


@dataclass
class AmazonDataProcessor:
    """`AmazonDataProcessor` (`preprocessor.py:308-417`): 5-core filter +
    contiguous categorical item-id remap (0-based; the loader shifts +1)."""

    prefix: str = "amzn_books"
    download_url: str = (
        "https://jmcauley.ucsd.edu/data/amazon_v2/categoryFilesSmall/"
        "Books.csv"
    )
    expected_num_unique_items: Optional[int] = 695762
    root: str = "."

    def output_format_csv(self) -> str:
        return os.path.join(self.root, f"tmp/{self.prefix}/sasrec_format.csv")

    def download(self) -> None:
        from urllib.request import urlretrieve

        path = os.path.join(self.root, f"tmp/{self.prefix}/ratings.csv")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if not os.path.exists(path):
            urlretrieve(self.download_url, path)

    def preprocess_rating(self) -> int:
        path = os.path.join(self.root, f"tmp/{self.prefix}/ratings.csv")
        if not os.path.exists(path):
            self.download()
        # Column order follows the reference EXACTLY (`preprocessor.py:
        # 333-337` reads user_id first) — the published 695762-item corpus
        # is defined by that parse, whatever the raw file's own semantics.
        ratings = pd.read_csv(
            path, names=["user_id", "item_id", "rating", "unix_timestamp"]
        )
        # SINGLE-pass 5-core filter on the ORIGINAL counts (`preprocessor.py:
        # 346-362`): items with >= 5 interactions, then users with >= 5 —
        # both thresholds against pre-filter counts, NOT iterated to a
        # stable core. A final per-user sequence-length >= 5 filter runs
        # after grouping (`:391-393`), exactly as the reference does.
        item_counts = ratings["item_id"].map(ratings["item_id"].value_counts())
        user_counts = ratings["user_id"].map(ratings["user_id"].value_counts())
        ratings = ratings[(item_counts >= 5) & (user_counts >= 5)].copy()
        ratings["item_id"] = pd.Categorical(ratings["item_id"]).codes
        ratings["user_id"] = pd.Categorical(ratings["user_id"]).codes
        num_unique = ratings["item_id"].nunique()
        if self.expected_num_unique_items is not None:
            assert num_unique == self.expected_num_unique_items, (
                f"amzn-books: {num_unique} unique items, expected "
                f"{self.expected_num_unique_items}"
            )
        _group_to_sasrec_csv(
            ratings, self.output_format_csv(), min_sequence_length=5
        )
        return num_unique


def get_common_preprocessors(root: str = ".") -> Dict[str, object]:
    """`get_common_preprocessors` (`preprocessor.py:420-454`)."""
    return {
        "ml-1m": MovielensDataProcessor(
            prefix="ml-1m",
            download_url="https://files.grouplens.org/datasets/movielens/ml-1m.zip",
            saved_name="tmp/movielens1m.zip",
            expected_num_unique_items=3706,
            expected_max_item_id=3952,
            root=root,
        ),
        "ml-20m": MovielensDataProcessor(
            prefix="ml-20m",
            download_url="https://files.grouplens.org/datasets/movielens/ml-20m.zip",
            saved_name="tmp/movielens20m.zip",
            expected_num_unique_items=26744,
            expected_max_item_id=131262,
            root=root,
        ),
        "amzn-books": AmazonDataProcessor(root=root),
        # ml-1b ("ml-20mx16x32"): the reference ships only a stub reading
        # pre-downloaded npz shards with placeholder ratings/timestamps
        # (`preprocessor.py:180-198`); kept as an explicit stub here too.
        "ml-20mx16x32": _ML1BStub(),
    }


class _ML1BStub:
    output_format_csv = staticmethod(lambda: "tmp/ml-20mx16x32/sasrec_format.csv")

    def preprocess_rating(self) -> int:
        raise NotImplementedError(
            "ml-1b (ml-20mx16x32) preprocessing requires the MLPerf npz "
            "shards; the reference implements only a placeholder reader "
            "(`/root/reference/data/preprocessor.py:180-198`)."
        )
