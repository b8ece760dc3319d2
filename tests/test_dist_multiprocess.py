"""True 2-process jax.distributed correctness (VERDICT r1 item 8).

Spawns two CPU processes connected through a localhost coordinator (Gloo
collectives) and exercises the real multi-host path end-to-end: ``init_dist``,
``get_dist_info`` ranks, per-host ``EnlargedSampler`` slicing (disjoint +
covering, reference data_sampler.py:30-43), cross-process
``reduce_loss_dict`` averaging (reference base_model.py:432-457), global-mesh
psum of a sharded array, and rank-0-only I/O via ``master_only``.
"""

import pytest

pytestmark = pytest.mark.slow  # true 2-process jax.distributed group

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
sys.path.insert(0, sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from dcpt_tpu.utils.dist_util import init_dist, get_dist_info, master_only

init_dist("jax", coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
rank, world = get_dist_info()
assert (rank, world) == (pid, 2), (rank, world)

# per-host sampler slicing: disjoint, covering
from dcpt_tpu.data.data_sampler import EnlargedSampler

class _DS:
    def __len__(self):
        return 8

sampler = EnlargedSampler(_DS(), num_replicas=world, rank=rank, ratio=2)
local_idx = np.array(sorted(sampler), np.int32)
assert len(local_idx) == 8  # ceil(8*2/2)

from jax.experimental import multihost_utils
all_idx = multihost_utils.process_allgather(local_idx)
if rank == 0:
    merged = np.sort(np.asarray(all_idx).ravel()) % 8
    # the enlarged (ratio=2) epoch-0 permutation covers every index
    assert set(merged.tolist()) == set(range(8)), merged

# cross-process loss averaging — DEFAULT under dist, like the reference
# (base_model.py:440-451); reduce_losses: false is the explicit opt-out
from dcpt_tpu.models.base_model import BaseModel

bm = BaseModel({"is_train": False, "rank": rank, "dist": True, "train": {}})
reduced = bm.reduce_loss_dict({"l_pix": float(rank + 1), "l_cls": float(10 * (rank + 1))})
assert abs(reduced["l_pix"] - 1.5) < 1e-6, reduced
assert abs(reduced["l_cls"] - 15.0) < 1e-6, reduced

bm_off = BaseModel({"is_train": False, "rank": rank, "dist": True, "train": {"reduce_losses": False}})
local = bm_off.reduce_loss_dict({"l_pix": float(rank + 1)})
assert abs(local["l_pix"] - float(rank + 1)) < 1e-6, local

# global-mesh collective: psum over both processes' devices
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("data",))
garr = multihost_utils.host_local_array_to_global_array(
    np.full((1, 2), float(rank + 1), np.float32), mesh, P("data")
)
total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == 6.0, float(total)

# striped distributed validation (val.dist_eval): each host evaluates its
# idx % world == rank slice; metric sums allgathered -> identical GLOBAL
# average on every host (SURVEY §2.9 TPU design target)
from dcpt_tpu.models import build_model

opt_v = {
    "name": "distval", "model_type": "SRModel", "scale": 1, "num_gpu": 1, "manual_seed": 0,
    "is_train": False, "dist": True, "rank": rank, "world_size": world,
    "network_g": {"type": "NAFNetBaseline", "width": 4, "enc_blk_nums": (1,),
                  "middle_blk_num": 1, "dec_blk_nums": (1,), "window_size": 4},
    "init_size": 8,
    "path": {},
    "val": {
        "dist_eval": True,
        "metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 0, "image_range": 255.0}},
    },
}
model = build_model(opt_v)

class _ValDS:
    opt = {"name": "synthval"}

class _Loader:
    dataset = _ValDS()

    def __iter__(self):
        r = np.random.default_rng(7)  # same data on both ranks
        for i in range(4):
            img = r.random((1, 8, 8, 3)).astype(np.float32)
            yield {"lq": img, "gt": np.clip(img + 0.01 * (i + 1), 0, 1).astype(np.float32),
                   "lq_path": [f"im{i}.png"]}

model.validation(_Loader(), current_iter=1, tb_logger=None, save_img=False)
global_psnr = model.metric_results["psnr"]
gathered_psnr = np.asarray(multihost_utils.process_allgather(
    np.asarray([global_psnr], np.float32)))
assert np.allclose(gathered_psnr, gathered_psnr.ravel()[0], atol=1e-4), gathered_psnr

# ZeRO-1 under TRUE multi-process: train.zero_sharding shards the Adam
# moments across BOTH hosts' devices (1/world per process), params stay
# replicated, and the step runs the real cross-process schedule
opt_z = {
    "name": "distzero", "model_type": "SRModel", "scale": 1, "num_gpu": 1,
    "manual_seed": 0, "is_train": True, "dist": True, "rank": rank,
    "world_size": world,
    "network_g": {"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": (1,),
                  "middle_blk_num": 1, "dec_blk_nums": (1,), "window_size": 4, "h": 8},
    "init_size": 8, "path": {},
    "train": {
        "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4},
        "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
        "pixel_opt": {"type": "L1Loss"},
        "zero_sharding": True, "zero_min_bytes": 128,
        "total_iter": 4,
    },
    "val": {"metrics": {}},
}
model_z = build_model(opt_z)
rz = np.random.default_rng(9)  # same stream on both ranks
for it in (1, 2):
    model_z.update_learning_rate(it)
    lq = rz.random((2, 8, 8, 3)).astype(np.float32)  # global batch, rank slice
    glq = multihost_utils.host_local_array_to_global_array(lq[rank:rank + 1], mesh, P("data"))
    ggt = multihost_utils.host_local_array_to_global_array(
        (lq * 0.9)[rank:rank + 1].astype(np.float32), mesh, P("data"))
    model_z.feed_data({"lq": glq, "gt": ggt})
    model_z.optimize_parameters(it)
import jax.tree_util as jtu
z_sharded = [x for x in jtu.tree_leaves(model_z.opt_state_g)
             if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
assert z_sharded, "zero_sharding left every moment replicated under 2-process dist"
assert all(len(x.sharding.device_set) == 2 for x in z_sharded), "moment not spanning both hosts"
assert all(p.sharding.is_fully_replicated for p in jtu.tree_leaves(model_z.params_g))
assert all(np.isfinite(float(v)) for v in model_z.log_dict.values()), model_z.log_dict

# rank-0-only I/O
@master_only
def _write():
    with open(os.path.join(tmp, f"wrote_by_{rank}.txt"), "w") as f:
        f.write("x")

_write()
multihost_utils.sync_global_devices("io_done")
print(f"WORKER_OK rank={rank} loss={reduced['l_pix']}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one device per process — real multi-host shape
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), str(port), str(tmp_path), REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"WORKER_OK rank={i} loss=1.5" in out, out
    assert (tmp_path / "wrote_by_0.txt").exists()
    assert not (tmp_path / "wrote_by_1.txt").exists()
