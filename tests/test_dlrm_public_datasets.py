"""DLRMv3 public-dataset loader tests (movielens + kuairand fixtures) and
end-to-end: the padded batches feed DlrmHSTU."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from generative_recommenders_tpu.configs.dlrm import (
    get_embedding_table_config,
    get_hstu_configs,
)
from generative_recommenders_tpu.data.dlrm_public_datasets import (
    DLRMv3KuaiRandDataset,
    DLRMv3MovieLensDataset,
    separate_uih_candidates,
)
from generative_recommenders_tpu.modules.dlrm_hstu import DlrmHSTU


def test_separate_uih_candidates():
    uih, cand = separate_uih_candidates("1,2,3,4,5", 2)
    assert uih == [1, 2, 3] and cand == [4, 5]
    uih, cand = separate_uih_candidates([7, 8, 9], 2)
    assert uih == [7] and cand == [8, 9]


def _tiny(dataset):
    cfg = get_hstu_configs(dataset, max_uih_len=8, max_num_candidates=2)
    return cfg.__class__(
        **{
            **cfg.__dict__,
            "hstu_attn_num_layers": 1,
            "hstu_embedding_table_dim": 16,
            "hstu_transducer_embedding_dim": 32,
            "hstu_attn_linear_dim": 16,
            "hstu_attn_qk_dim": 16,
            "hstu_num_heads": 2,
            "contextual_feature_to_min_uih_length": (),
        }
    )


def test_movielens_dataset_feeds_model(tmp_path):
    cfg = _tiny("movielens-1m")
    rows = []
    rng = np.random.default_rng(0)
    for u in range(6):
        n = rng.integers(4, 12)
        rows.append(
            {
                "user_id": u + 1,
                "sequence_item_ids": ",".join(
                    str(x) for x in rng.integers(1, 50, n)
                ),
                "sequence_ratings": ",".join(
                    str(x) for x in rng.integers(1, 6, n)
                ),
                "sequence_timestamps": ",".join(
                    str(x) for x in np.sort(rng.integers(1, 10000, n))
                ),
                "sex": 1, "age_group": 2, "occupation": 3, "zip_code": 4,
                "user_id_dup": u + 1,
            }
        )
    df = pd.DataFrame(rows)
    df["user_id"] = df["user_id_dup"]
    path = str(tmp_path / "sasrec_format.csv")
    df.to_csv(path, index=False)
    ds = DLRMv3MovieLensDataset(cfg, path)
    batch = next(ds.batches(4))
    uih, ul, cands, nc = batch
    assert uih["movie_id"].shape == (4, 8)
    assert cands["item_movie_id"].shape == (4, 2)
    assert (nc == 2).all()
    # feeds the real model
    tables = get_embedding_table_config("movielens-1m", hash_size=64, dim=16)
    model = DlrmHSTU(cfg, tables)
    uih_j = {k: jnp.asarray(v % 64) for k, v in uih.items()}
    cands_j = {
        k: jnp.asarray(v % 64 if "movie" in k else v)
        for k, v in cands.items()
    }
    params = model.init(
        jax.random.PRNGKey(0), uih_j, jnp.asarray(ul), cands_j,
        jnp.asarray(nc), True,
    )
    _, _, aux, *_ = model.apply(
        params, uih_j, jnp.asarray(ul), cands_j, jnp.asarray(nc), True
    )
    assert all(np.isfinite(float(v)) for v in aux.values())


def test_kuairand_dataset(tmp_path):
    cfg = _tiny("kuairand-1k")
    rng = np.random.default_rng(0)
    rows = []
    for u in range(5):
        n = rng.integers(4, 10)
        rows.append(
            {
                "user_id": u,
                "video_id": "[" + ",".join(str(x) for x in rng.integers(0, 99, n)) + "]",
                "action_weights": "[" + ",".join(str(x) for x in rng.integers(0, 255, n)) + "]",
                "time_ms": "[" + ",".join(str(x) for x in np.sort(rng.integers(1, 10**6, n))) + "]",
                "play_time_ms": "[" + ",".join(str(x) for x in rng.integers(0, 600, n)) + "]",
                "user_active_degree": 3,
                "follow_user_num_range": 1,
                "fans_user_num_range": 2,
                "friend_user_num_range": 0,
                "register_days_range": 4,
            }
        )
    path = str(tmp_path / "seq.csv")
    pd.DataFrame(rows).to_csv(path, index=False)
    ds = DLRMv3KuaiRandDataset(
        cfg, path, hash_sizes={"video_id": 64, "user_id": 64}
    )
    batch = next(ds.batches(5))
    uih, ul, cands, nc = batch
    assert uih["video_id"].shape == (5, 8)
    assert (uih["video_id"] < 64).all()
    assert cands["item_action_weight"].shape == (5, 2)
    assert (nc == 2).all()
