"""Host data-pipeline throughput: can the loader feed the device?

Measures batches/s (and examples/s) of the synchronous `batch_iterator` vs
the threaded `prefetched_batch_iterator` at the flagship research shape
(B=128, N=200), on an in-memory corpus and on a sharded-CSV MultiFile
corpus. Compare against the device step rate (train_bench.py): the VERDICT
round-1 target is host rate >= 2x device rate.

    python benchmarks/data_pipeline_bench.py [--users 20000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _rate(it, max_batches, batch_size):
    t0 = time.perf_counter()
    n = 0
    for _ in it:
        n += 1
        if n >= max_batches:
            break
    dt = time.perf_counter() - t0
    return n / dt, n * batch_size / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--max_len", type=int, default=200)
    p.add_argument("--max_batches", type=int, default=100)
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args()

    from generative_recommenders_tpu.data.dataset import (
        MultiFileSequenceDataset,
        SequenceDataset,
        batch_iterator,
        prefetched_batch_iterator,
        synthetic_user_sequences_vectorized,
    )

    seqs = synthetic_user_sequences_vectorized(
        num_users=args.users, num_items=10000, max_len=args.max_len,
        min_len=20, seed=0,
    )
    ds = SequenceDataset(seqs, args.max_len, ignore_last_n=1)

    for name, it in [
        ("in-memory sync", batch_iterator(ds, args.batch_size, shuffle=True)),
        (
            "in-memory prefetched",
            prefetched_batch_iterator(
                ds, args.batch_size, shuffle=True,
                num_workers=args.num_workers,
            ),
        ),
    ]:
        bps, eps = _rate(it, args.max_batches, args.batch_size)
        print(f"{name:22s}: {bps:7.1f} batches/s  {eps:9.0f} ex/s", flush=True)

    # sharded-CSV corpus (the ML-3B MultiFile path)
    with tempfile.TemporaryDirectory() as tmp:
        prefix = os.path.join(tmp, "shard")
        n_shards = 8
        per = args.users // n_shards
        with open(f"{prefix}_users.csv", "w") as f:
            for i in range(n_shards):
                f.write(f"{i},{per}\n")
        uid = 0
        for i in range(n_shards):
            with open(f"{prefix}_{i}.csv", "w") as f:
                for j in range(per):
                    arr = seqs.item_ids[uid % len(seqs.item_ids)]
                    items = ",".join(str(x) for x in arr)
                    rts = ",".join("3" for _ in arr)
                    f.write(f'{uid},"{items}","{rts}"\n')
                    uid += 1
        mf = MultiFileSequenceDataset(
            prefix, args.max_len, ignore_last_n=0, num_items_hint=10000
        )
        for name, it in [
            (
                "multifile sync",
                batch_iterator(mf, args.batch_size, shuffle=True),
            ),
            (
                "multifile prefetched",
                prefetched_batch_iterator(
                    mf, args.batch_size, shuffle=True,
                    num_workers=args.num_workers,
                ),
            ),
        ]:
            bps, eps = _rate(it, args.max_batches, args.batch_size)
            print(
                f"{name:22s}: {bps:7.1f} batches/s  {eps:9.0f} ex/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
