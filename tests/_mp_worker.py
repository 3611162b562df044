"""Worker for the multi-host CPU integration test (tests/test_multihost.py).

Runs a tiny research training over a global mesh: single-process (4 local
virtual devices) or 2-process (2 virtual devices each, Gloo collectives),
and writes the final loss to a file. Invoked as:

    python tests/_mp_worker.py <out_file> <num_processes> <process_id> <port>
"""

import os
import sys

out_file, num_proc, proc_id, port = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
local_devices = 4 // num_proc
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}"
)

import jax  # noqa: E402

if num_proc > 1:
    from generative_recommenders_tpu.parallel.distributed import (
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_proc,
        process_id=proc_id,
    )

import numpy as np  # noqa: E402

from generative_recommenders_tpu.data.dataset import (  # noqa: E402
    SequenceDataset,
    batch_iterator,
    synthetic_user_sequences,
)
from generative_recommenders_tpu.models.sequential import ModelConfig  # noqa: E402
from generative_recommenders_tpu.parallel import (  # noqa: E402
    DistributedTrainer,
    make_mesh,
)
from generative_recommenders_tpu.parallel.distributed import (  # noqa: E402
    host_batch_shard,
)
from generative_recommenders_tpu.train.train_loop import TrainConfig  # noqa: E402

GLOBAL_BATCH = 8

seqs = synthetic_user_sequences(num_users=64, num_items=40, max_len=12, seed=0)
ds = SequenceDataset(seqs, max_sequence_length=12, ignore_last_n=1)
cfg = TrainConfig(
    model=ModelConfig(
        num_items=40, max_sequence_len=12, gr_output_length=1,
        item_embedding_dim=16, num_blocks=2, num_heads=2, dqk=8, dv=8,
        attn_kernel="xla",
    ),
    local_batch_size=GLOBAL_BATCH,
    num_negatives=8,
)
mesh = make_mesh(shape=(4, 1), devices=jax.devices())
trainer = DistributedTrainer(cfg, ds.all_item_ids(), mesh)
rng = jax.random.PRNGKey(0)
params, opt_state = trainer.init_sharded(rng)
num_shards, shard_index = host_batch_shard()
local_bs = GLOBAL_BATCH // num_shards
losses = []
for step, batch in enumerate(
    batch_iterator(
        ds, local_bs, shuffle=False,
        num_shards=num_shards, shard_index=shard_index,
        shard_contiguous=True,
    )
):
    gbatch = trainer.to_global_batch(batch)
    params, opt_state, loss = trainer.train_step(
        params, opt_state, gbatch, jax.random.fold_in(rng, step)
    )
    losses.append(float(jax.device_get(loss)))
    if step >= 2:
        break

with open(out_file, "w") as f:
    f.write(",".join(f"{x:.8f}" for x in losses))
