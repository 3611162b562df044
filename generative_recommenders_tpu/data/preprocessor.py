"""Public-dataset download + preprocessing into sasrec_format.csv.

TPU twin of `research/data/preprocessor.py:35-480`: the same output schema —
one row per user with comma-joined sequences

    user_id, sequence_item_ids, sequence_ratings, sequence_timestamps
    [+ sex, age_group, occupation, zip_code for ml-1m]

sorted by time, shuffled across users — so datasets and metric tables are
directly comparable with the reference. Registry mirrors
`get_common_preprocessors` (:433-480) incl. expected unique-item counts.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import tarfile
from typing import Dict, Optional
from urllib.request import urlretrieve
from zipfile import ZipFile

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DataProcessor:
    prefix: str
    data_root: str = "tmp"
    expected_num_unique_items: Optional[int] = None
    expected_max_item_id: Optional[int] = None

    def output_format_csv(self) -> str:
        return f"{self.data_root}/{self.prefix}/sasrec_format.csv"

    def _write_seq_csv(
        self, ratings: pd.DataFrame, users: Optional[pd.DataFrame],
        time_col: str, item_col: str, seed: int = 0,
    ) -> int:
        """groupby-user → comma-joined per-user sequences, user-shuffled."""
        grouped = ratings.sort_values(by=[time_col]).groupby("user_id")
        seq = pd.DataFrame(
            data={
                "user_id": list(grouped.groups.keys()),
                "sequence_item_ids": list(
                    grouped[item_col].apply(
                        lambda xs: ",".join(str(v) for v in xs)
                    )
                ),
                "sequence_ratings": list(
                    grouped["rating"].apply(
                        lambda xs: ",".join(str(v) for v in xs)
                    )
                ),
                "sequence_timestamps": list(
                    grouped[time_col].apply(
                        lambda xs: ",".join(str(v) for v in xs)
                    )
                ),
            }
        )
        if users is not None:
            seq = seq.join(users.set_index("user_id"), on="user_id")
        os.makedirs(f"{self.data_root}/{self.prefix}", exist_ok=True)
        seq.sample(frac=1, random_state=seed).reset_index().to_csv(
            self.output_format_csv(), index=False, sep=","
        )
        num_unique_items = ratings[item_col].nunique()
        if self.expected_num_unique_items is not None:
            assert num_unique_items == self.expected_num_unique_items, (
                f"expected {self.expected_num_unique_items} items, "
                f"got {num_unique_items}"
            )
        logger.info(
            "%s: %d users, %d items -> %s",
            self.prefix, seq.shape[0], num_unique_items,
            self.output_format_csv(),
        )
        return num_unique_items

    def preprocess_rating(self) -> Optional[int]:
        raise NotImplementedError


@dataclasses.dataclass
class MovielensDataProcessor(DataProcessor):
    """ml-1m / ml-20m / ml-1b (`preprocessor.py:113-320`)."""

    download_url: str = ""
    saved_name: str = ""

    def download(self) -> None:
        if not os.path.exists(self.saved_name):
            os.makedirs(os.path.dirname(self.saved_name) or ".", exist_ok=True)
            urlretrieve(self.download_url, self.saved_name)
        if self.saved_name.endswith(".zip"):
            ZipFile(self.saved_name, "r").extractall(path=f"{self.data_root}/")
        else:
            with tarfile.open(self.saved_name, "r:*") as tar:
                tar.extractall(f"{self.data_root}/")

    def preprocess_rating(self) -> int:
        self.download()
        root = f"{self.data_root}/{self.prefix}"
        users = None
        if self.prefix == "ml-1m":
            users = pd.read_csv(
                f"{root}/users.dat", sep="::", engine="python",
                names=["user_id", "sex", "age_group", "occupation", "zip_code"],
            )
            for col in ("sex", "age_group", "occupation", "zip_code"):
                users[col] = pd.Categorical(users[col]).codes
            ratings = pd.read_csv(
                f"{root}/ratings.dat", sep="::", engine="python",
                names=["user_id", "movie_id", "rating", "unix_timestamp"],
            )
        elif self.prefix == "ml-20m":
            ratings = pd.read_csv(f"{root}/ratings.csv", sep=",").rename(
                columns={
                    "userId": "user_id",
                    "movieId": "movie_id",
                    "timestamp": "unix_timestamp",
                }
            )
        else:  # ml-20mx16x32 (ml-1b)
            user_ids, movie_ids = [], []
            for i in range(16):
                with np.load(f"{root}/trainx16x32_{i}.npz") as data:
                    user_ids.append(data["arr_0"][:, 0])
                    movie_ids.append(data["arr_0"][:, 1])
            u = np.concatenate(user_ids)
            m = np.concatenate(movie_ids)
            ratings = pd.DataFrame(
                {
                    "user_id": u, "movie_id": m,
                    "rating": u, "unix_timestamp": m,  # placeholders (:206-208)
                }
            )
        if self.prefix in ("ml-1m", "ml-20m"):
            movies_path = (
                f"{self.data_root}/{self.prefix}/movies.dat"
                if self.prefix == "ml-1m"
                else f"{self.data_root}/{self.prefix}/movies.csv"
            )
            if os.path.exists(movies_path):
                if self.prefix == "ml-1m":
                    movies = pd.read_csv(
                        movies_path, sep="::", engine="python",
                        names=["movie_id", "title", "genres"],
                        encoding="iso-8859-1",
                    )
                else:
                    movies = pd.read_csv(
                        movies_path, sep=",", encoding="iso-8859-1"
                    ).rename(columns={"movieId": "movie_id"})
                out_dir = f"{self.data_root}/processed/{self.prefix}"
                os.makedirs(out_dir, exist_ok=True)
                movies.to_csv(f"{out_dir}/movies.csv", index=False)
        return self._write_seq_csv(
            ratings, users, time_col="unix_timestamp", item_col="movie_id"
        )


@dataclasses.dataclass
class AmazonDataProcessor(DataProcessor):
    """amzn-books (`preprocessor.py:322-430`): 5-core filtering + remap."""

    download_url: str = ""
    saved_name: str = ""

    def download(self) -> None:
        if not os.path.exists(self.saved_name):
            os.makedirs(os.path.dirname(self.saved_name) or ".", exist_ok=True)
            urlretrieve(self.download_url, self.saved_name)

    def preprocess_rating(self) -> int:
        self.download()
        ratings = pd.read_csv(
            self.saved_name, sep=",",
            names=["user_id", "item_id", "rating", "timestamp"],
        )
        # 5-core filter on both sides (:361-374)
        ratings = ratings[
            ratings.groupby("item_id")["item_id"].transform("size") >= 5
        ]
        ratings = ratings[
            ratings.groupby("user_id")["user_id"].transform("size") >= 5
        ]
        ratings["item_id"] = pd.Categorical(ratings["item_id"]).codes
        ratings["user_id"] = pd.Categorical(ratings["user_id"]).codes
        # drop users whose post-filter sequence is still < 5 (:399-401)
        ratings = ratings[
            ratings.groupby("user_id")["user_id"].transform("size") >= 5
        ]
        return self._write_seq_csv(
            ratings, None, time_col="timestamp", item_col="item_id"
        )


@dataclasses.dataclass
class MovielensSyntheticDataProcessor(DataProcessor):
    """ml-3b / ml-13b fractal-expansion outputs — generated by
    `run_fractal_expansion` (no download; `preprocessor.py:100-110`)."""

    def preprocess_rating(self) -> None:
        return None


def get_common_preprocessors(
    data_root: str = "tmp",
) -> Dict[str, DataProcessor]:
    """`preprocessor.py:433-480` registry."""
    return {
        "ml-1m": MovielensDataProcessor(
            prefix="ml-1m",
            data_root=data_root,
            download_url=(
                "http://files.grouplens.org/datasets/movielens/ml-1m.zip"
            ),
            saved_name=f"{data_root}/movielens1m.zip",
            expected_num_unique_items=3706,
            expected_max_item_id=3952,
        ),
        "ml-20m": MovielensDataProcessor(
            prefix="ml-20m",
            data_root=data_root,
            download_url=(
                "http://files.grouplens.org/datasets/movielens/ml-20m.zip"
            ),
            saved_name=f"{data_root}/movielens20m.zip",
            expected_num_unique_items=26744,
            expected_max_item_id=131262,
        ),
        "ml-1b": MovielensDataProcessor(
            prefix="ml-20mx16x32",
            data_root=data_root,
            download_url=(
                "https://files.grouplens.org/datasets/movielens/"
                "ml-20mx16x32.tar"
            ),
            saved_name=f"{data_root}/movielens1b.tar",
        ),
        "ml-3b": MovielensSyntheticDataProcessor(
            prefix="ml-3b",
            data_root=data_root,
            expected_num_unique_items=26743 * 32,
            expected_max_item_id=26743 * 32,
        ),
        "amzn-books": AmazonDataProcessor(
            prefix="amzn_books",
            data_root=data_root,
            download_url=(
                "http://snap.stanford.edu/data/amazon/productGraph/"
                "categoryFiles/ratings_Books.csv"
            ),
            saved_name=f"{data_root}/ratings_Books.csv",
            expected_num_unique_items=695762,
        ),
    }
