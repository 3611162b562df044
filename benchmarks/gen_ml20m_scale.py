"""ML-20M-shaped synthetic ratings.csv for the fractal-expansion rehearsal.

The real ML-20M tables need downloads this environment cannot make
(zero egress), so the ML-3B-rehearsal chain (`run_fractal_expansion` ->
`MultiFileSequenceDataset` -> research trainer) runs on a corpus with the
real dataset's shape: 138,493 users x 26,744 items x ~20M ratings with a
heavy-tailed per-user length distribution (median ~120, p99 ~2k, max 8k —
matching ML-20M's 20..9254 range). Popularity is zipf-like. Output columns
are exactly what `run_expansion` reads (userId, movieId, rating).

Usage: python benchmarks/gen_ml20m_scale.py [out_csv] [scale]
  scale in (0, 1] shrinks users+nnz proportionally for smoke runs.
"""

import os
import sys

import numpy as np
import pandas as pd


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "build/ml20m_syn/ratings.csv"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    U = max(100, int(138_493 * scale))
    I = max(200, int(26_744 * min(1.0, scale * 4)))
    NNZ = int(20_000_263 * scale)
    rng = np.random.default_rng(0)

    lens = np.clip(rng.lognormal(np.log(120.0), 1.0, size=U), 20, 8000)
    lens = np.maximum((lens * (NNZ / lens.sum())).astype(np.int64), 5)
    total = int(lens.sum())

    # zipf-ish popularity over a shuffled item index
    ranks = np.arange(1, I + 1, dtype=np.float64)
    pop = 1.0 / (ranks + 25.0) ** 0.9
    pop /= pop.sum()
    item_perm = rng.permutation(I)

    uid = np.repeat(np.arange(U, dtype=np.int64), lens)
    iid = item_perm[rng.choice(I, size=total, p=pop)]
    # dedup (u, i) pairs — duplicate entries would sum ratings in the
    # expansion's csr_matrix build
    key = uid * I + iid
    _, keep = np.unique(key, return_index=True)
    uid, iid = uid[keep], iid[keep]
    rating = rng.choice(
        [1, 2, 3, 4, 5], size=uid.shape[0], p=[0.05, 0.08, 0.22, 0.35, 0.30]
    )

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pd.DataFrame(
        {"userId": uid, "movieId": iid, "rating": rating}
    ).to_csv(out, index=False)
    ulen = np.bincount(uid, minlength=U)
    print(
        f"wrote {out}: {uid.shape[0]} ratings, {U} users, {I} items, "
        f"seqlen median {np.median(ulen):.0f} p95 {np.percentile(ulen, 95):.0f} "
        f"p99 {np.percentile(ulen, 99):.0f} max {ulen.max()}",
        flush=True,
    )


if __name__ == "__main__":
    main()
