"""Data-layer tests: preprocessor output schema round-trip, fractal
expansion on a tiny corpus, multi-file dataset consumption."""

import os

import numpy as np
import pandas as pd
import pytest

from generative_recommenders_tpu.cli.run_fractal_expansion import (
    run_expansion,
)
from generative_recommenders_tpu.data.dataset import (
    MultiFileSequenceDataset,
    SequenceDataset,
    batch_iterator,
    load_sasrec_format_csv,
)
from generative_recommenders_tpu.data.preprocessor import (
    MovielensDataProcessor,
)


def _write_ml1m_fixture(root):
    os.makedirs(f"{root}/ml-1m", exist_ok=True)
    with open(f"{root}/ml-1m/users.dat", "w") as f:
        f.write("1::F::1::10::48067\n2::M::56::16::70072\n")
    rows = [
        (1, 11, 5, 100), (1, 12, 3, 200), (1, 13, 4, 50),
        (2, 12, 1, 10), (2, 14, 5, 20), (2, 11, 2, 30), (2, 13, 4, 40),
    ]
    with open(f"{root}/ml-1m/ratings.dat", "w") as f:
        for u, m, r, t in rows:
            f.write(f"{u}::{m}::{r}::{t}\n")
    with open(f"{root}/ml-1m/movies.dat", "w") as f:
        for m in (11, 12, 13, 14):
            f.write(f"{m}::Movie {m} (1999)::Drama\n")


def test_movielens_preprocessor_schema(tmp_path):
    root = str(tmp_path)
    _write_ml1m_fixture(root)
    dp = MovielensDataProcessor(
        prefix="ml-1m", data_root=root,
        download_url="", saved_name=f"{root}/nonexistent.zip",
        expected_num_unique_items=4,
    )
    # skip download: data already in place
    dp.download = lambda: None
    n = dp.preprocess_rating()
    assert n == 4
    seqs = load_sasrec_format_csv(dp.output_format_csv())
    assert len(seqs) == 2
    # chronological order per user
    u1 = list(seqs.user_ids).index(1)
    np.testing.assert_array_equal(seqs.item_ids[u1], [13, 11, 12])
    # user features joined (ml-1m)
    df = pd.read_csv(dp.output_format_csv())
    for col in ("sex", "age_group", "occupation", "zip_code"):
        assert col in df.columns
    ds = SequenceDataset(seqs, max_sequence_length=4, ignore_last_n=0)
    row = ds.get_row(u1)
    assert row["target_ids"] == 12 and row["history_lengths"] == 2


def test_fractal_expansion_and_multifile_dataset(tmp_path):
    rng = np.random.default_rng(0)
    U, I = 30, 20
    rows = []
    for u in range(U):
        for i in rng.choice(I, size=rng.integers(5, 12), replace=False):
            rows.append((u, int(i), int(rng.integers(1, 6))))
    df = pd.DataFrame(rows, columns=["userId", "movieId", "rating"])
    csv_in = str(tmp_path / "ratings.csv")
    df.to_csv(csv_in, index=False)

    meta = run_expansion(
        input_csv_file=csv_in,
        output_prefix=str(tmp_path) + "/syn/",
        num_row_multiplier=3,
        num_col_multiplier=2,
        write_dataset=True,
        seed=0,
    )
    assert meta.num_rows > 0 and meta.num_interactions > 0
    assert meta.num_cols == 2 * I
    prefix = str(tmp_path / "syn/3x2")
    assert os.path.exists(f"{prefix}_users.csv")

    ds = MultiFileSequenceDataset(
        prefix, max_sequence_length=8, ignore_last_n=0,
        shift_id_by=1,  # ids in shards are 0-based columns
        num_items_hint=2 * I,
    )
    assert len(ds) == meta.num_rows
    batch = next(batch_iterator(ds, 4, shuffle=True, seed=0))
    assert batch["historical_ids"].shape == (4, 8)
    assert (batch["target_ids"] >= 1).all()
    assert (batch["target_ids"] <= 2 * I).all()


def test_prefetched_batch_iterator_matches_sync():
    """Threaded prefetcher must yield identical batches in identical order."""
    from generative_recommenders_tpu.data.dataset import (
        SequenceDataset,
        batch_iterator,
        prefetched_batch_iterator,
        synthetic_user_sequences,
    )

    seqs = synthetic_user_sequences(num_users=40, num_items=30, max_len=12, seed=3)
    ds = SequenceDataset(seqs, max_sequence_length=12, ignore_last_n=1)
    sync = list(batch_iterator(ds, 8, shuffle=True, seed=11))
    pre = list(
        prefetched_batch_iterator(
            ds, 8, shuffle=True, seed=11, num_workers=4, prefetch_factor=3
        )
    )
    assert len(sync) == len(pre) > 0
    for a, b in zip(sync, pre):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_background_prefetch_passthrough():
    from generative_recommenders_tpu.data.dataset import background_prefetch

    items = [{"x": np.full((2,), i)} for i in range(17)]
    out = list(background_prefetch(iter(items), size=4))
    assert len(out) == 17
    for a, b in zip(items, out):
        np.testing.assert_array_equal(a["x"], b["x"])


def test_multifile_prefetch_threads(tmp_path):
    """MultiFile loader: thread-local handles, no per-row open; prefetcher
    over it returns the same rows as the sync path."""
    from generative_recommenders_tpu.data.dataset import (
        MultiFileSequenceDataset,
        batch_iterator,
        prefetched_batch_iterator,
    )

    prefix = str(tmp_path / "frac")
    rows_per_shard = [6, 5]
    rng = np.random.default_rng(0)
    with open(f"{prefix}_users.csv", "w") as f:
        for i, c in enumerate(rows_per_shard):
            f.write(f"{i},{c}\n")
    uid = 0
    for i, c in enumerate(rows_per_shard):
        with open(f"{prefix}_{i}.csv", "w") as f:
            for _ in range(c):
                n = int(rng.integers(3, 9))
                items = ",".join(str(x) for x in rng.integers(1, 40, n))
                rts = ",".join(str(x) for x in rng.integers(1, 6, n))
                f.write(f'{uid},"{items}","{rts}"\n')
                uid += 1
    ds = MultiFileSequenceDataset(
        prefix, max_sequence_length=8, ignore_last_n=0, num_items_hint=40
    )
    assert len(ds) == 11
    sync = list(batch_iterator(ds, 4, shuffle=False))
    pre = list(
        prefetched_batch_iterator(ds, 4, shuffle=False, num_workers=3)
    )
    for a, b in zip(sync, pre):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_native_reader_matches_python(tmp_path):
    """csrc/csv_reader.cpp must parse identically to the python CSV path,
    including float ratings and multi-shard row addressing."""
    from generative_recommenders_tpu.data.dataset import (
        MultiFileSequenceDataset,
    )

    prefix = str(tmp_path / "c")
    rng = np.random.default_rng(7)
    counts = [5, 7, 3]
    with open(f"{prefix}_users.csv", "w") as f:
        for i, c in enumerate(counts):
            f.write(f"{i},{c}\n")
    uid = 100
    for i, c in enumerate(counts):
        with open(f"{prefix}_{i}.csv", "w") as f:
            for _ in range(c):
                n = int(rng.integers(2, 12))
                items = ",".join(str(x) for x in rng.integers(1, 10**7, n))
                rts = ",".join(f"{x}.0" for x in rng.integers(1, 6, n))
                f.write(f'{uid},"{items}","{rts}"\n')
                uid += 1
    ds = MultiFileSequenceDataset(
        prefix, max_sequence_length=16, ignore_last_n=0, num_items_hint=10**7
    )
    assert ds._native is not None, "native reader should have built"
    for idx in range(sum(counts)):
        native_row = ds.get_row(idx)
        ds_py = object.__new__(MultiFileSequenceDataset)
        ds_py.__dict__ = {**ds.__dict__, "_native": None}
        py_row = ds_py.get_row(idx)
        for k in native_row:
            np.testing.assert_array_equal(
                native_row[k], py_row[k], err_msg=f"row {idx} field {k}"
            )


def test_native_reader_unquoted_single_event_rows(tmp_path):
    """csv.QUOTE_MINIMAL leaves single-element fields unquoted — the native
    parser must handle `uid,5,3.0` rows (regression: returned -1)."""
    import csv as _csv

    from generative_recommenders_tpu.data.dataset import (
        MultiFileSequenceDataset,
    )

    prefix = str(tmp_path / "m")
    with open(f"{prefix}_users.csv", "w") as f:
        f.write("0,3\n")
    with open(f"{prefix}_0.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow([1, "5", "3.0"])  # single event -> unquoted
        w.writerow([2, "7,9,11", "1.0,2.0,3.0"])
        w.writerow([3, "13", "4.0"])
    ds = MultiFileSequenceDataset(
        prefix, max_sequence_length=8, ignore_last_n=0, num_items_hint=20
    )
    assert ds._native is not None
    r0 = ds.get_row(0)
    assert r0["target_ids"] == 5 and r0["history_lengths"] == 0
    r1 = ds.get_row(1)
    np.testing.assert_array_equal(r1["historical_ids"][:2], [7, 9])
    assert r1["target_ids"] == 11
    assert ds.get_row(2)["target_ids"] == 13
