"""Multi-process DP training worker (spawned by tests/test_distributed.py).

Each process drives 4 virtual CPU devices; together N processes form one
global 4N-device mesh and train the same tiny model with per-process data
feeding (`parallel.distributed.stage_local_dataset`): this is the TPU-pod
execution shape (one process per host) exercised without a pod, with REAL
cross-process collectives (Gloo on CPU).

Usage: python _distributed_worker.py <process_id> <num_processes> <port> <outdir>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

from building_detection_tpu.parallel import distributed as dist

dist.init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

import numpy as np

from building_detection_tpu.core.config import TrainConfig
from building_detection_tpu.nn import layers as L
from building_detection_tpu.train import checkpoint as ckpt
from building_detection_tpu.train.trainer import Trainer


def tiny_model(s, x):
    x = L.conv2d(s, x, 8, 3, activation="relu")
    x = L.batch_norm(s, x)
    return L.conv2d(s, x, 2, 1, activation="softmax")


# identical synthetic dataset on every process; each feeds only its shard
rng = np.random.RandomState(0)
imgs = rng.randint(0, 256, (32, 16, 16, 3), np.uint8)
labs = np.where(rng.rand(32, 16, 16) < 0.3, 255, 0).astype(np.uint8)

cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=16)
tr = Trainer(tiny_model, cfg, steps_per_epoch=4)

idx = dist.local_sample_indices(len(imgs), cfg.batch_size, tr.mesh)
assert len(idx) == len(imgs) // nproc, (len(idx), nproc)
assert dist.is_primary() == (pid == 0)
staged = dist.stage_local_dataset(tr, imgs[idx], labs[idx])
# per-process checkpoint dir: a single-writer regression (every process
# writing) would show up as files in a non-primary dir instead of being
# masked by same-name overwrites in a shared dir
ckpt_dir = os.path.join(outdir, f"ckpt_p{pid}")
history = tr.fit_arrays(
    *staged, val_images=imgs[:8], val_labels=labs[:8],
    checkpoint_dir=ckpt_dir, log_fn=lambda m: None,
)

# every process dumps its (replicated) final variables for bit-comparison
ckpt.save_variables(
    os.path.join(outdir, f"params_p{pid}.npz"),
    jax.device_get(tr.params), jax.device_get(tr.state),
    jax.device_get(tr.opt_state), tr.step,
)

# streamed multi-host path: fresh trainer, per-process batch generator
# (each process yields only its rows of every global batch)
tr2 = Trainer(tiny_model, cfg, steps_per_epoch=4)
b_local = len(idx) // 4


def local_stream():
    while True:
        for k in range(4):
            sl = idx[k * b_local : (k + 1) * b_local]
            yield imgs[sl], labs[sl]


tr2.fit(local_stream(), log_fn=lambda m: None, from_process_local=True)
ckpt.save_variables(
    os.path.join(outdir, f"params_p{pid}_stream.npz"),
    jax.device_get(tr2.params), jax.device_get(tr2.state),
    jax.device_get(tr2.opt_state), tr2.step,
)
if dist.is_primary():
    import json

    with open(os.path.join(outdir, "history_p0.json"), "w") as f:
        json.dump(history, f)
print(f"worker {pid}: done", flush=True)
