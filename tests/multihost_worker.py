"""Worker for tests/test_multihost.py: one of N jax.distributed processes.

Covers the true multi-controller paths the 8-virtual-device single-process
tests cannot (VERDICT r2 #4): `jax.distributed.initialize` rendezvous
(main.py --multihost), a GSPMD DP x TP train step over a mesh spanning two
processes with per-process batch feeding
(jax.make_array_from_process_local_data, main.py:291), the REAL validate()
with its cross-process `multihost_utils.process_allgather`
(train/validate.py:87-95), and an Orbax save/restore of mesh-sharded
arrays (utils/ckpt.py:94-124). Reference equivalents: torch DDP spawn +
NCCL all_gather (main.py:204-237, validate.py:94-155).

Usage: python multihost_worker.py <pid> <world> <port> <out_dir>
"""

import json
import os
import re
import sys

pid, world = int(sys.argv[1]), int(sys.argv[2])
port, out_dir = sys.argv[3], sys.argv[4]

flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (flags +
                           " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Gloo's cross-process key-value rendezvous defaults to a 30s deadline;
# on this 1-core host a parallel pytest/bench can starve a worker past it
# (observed as "GetKeyValue() timed out" collective failures under load).
os.environ.setdefault("GLOO_TIMEOUT_SECONDS", "300")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=world, process_id=pid,
                           initialization_timeout=600)
assert jax.process_count() == world, jax.process_count()
assert jax.device_count() == 4 * world, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from test_train_step import make_batch, make_core  # noqa: E402

from gill_tpu.config import TrainConfig  # noqa: E402
from gill_tpu.parallel import create_mesh, param_shardings  # noqa: E402
from gill_tpu.parallel.partition import batch_sharding, replicated  # noqa: E402
from gill_tpu.train.trainer import init_state, make_train_step  # noqa: E402
from gill_tpu.train.validate import validate  # noqa: E402
from gill_tpu.utils import ckpt as ckpt_utils  # noqa: E402


def put_global(tree, shardings):
    """Host-identical numpy tree -> global sharded arrays (works for any
    spec: each process serves the index slices it owns)."""
    def one(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(one, tree, shardings)


# ---- build identical model state on every process (same PRNG keys) ----
core = make_core()
tc = TrainConfig(lr=1e-3, lr_warmup_steps=2, steps_per_epoch=10)
params = core.init_params(jax.random.PRNGKey(0))
frozen = {"lm": params["lm"], "vision": params["vision"]}

mesh = create_mesh(dp_size=2 * world, tp_size=2)
frozen_g = put_global(jax.device_get(frozen), param_shardings(mesh, frozen))
state = init_state(core, tc, params["adapters"])
state = put_global(
    jax.device_get(state),
    jax.tree_util.tree_map(lambda _: replicated(mesh), jax.device_get(state)))

# ---- per-process batch shard -> one global array (main.py:291) ----
global_batch = {k: np.asarray(v) for k, v in make_batch(b=8, t=12).items()}
per = 8 // world
b_sh = batch_sharding(mesh)
batch = {k: jax.make_array_from_process_local_data(
            b_sh, v[pid * per:(pid + 1) * per])
         for k, v in global_batch.items()}
for v in batch.values():
    assert v.shape[0] == 8, v.shape  # global batch reassembled

# ---- two train steps under the cross-process mesh ----
step = make_train_step(core, tc)
losses = []
with jax.sharding.set_mesh(mesh):
    for _ in range(2):
        state, metrics = step(state, frozen_g, batch, concat=False)
        losses.append(float(metrics["loss"]))
assert np.isfinite(losses).all(), losses

# every process must agree on the (replicated) loss
from jax.experimental import multihost_utils  # noqa: E402

all_losses = np.asarray(multihost_utils.process_allgather(
    np.asarray(losses, np.float32)))
assert all_losses.shape == (world, 2), all_losses.shape
np.testing.assert_allclose(all_losses, all_losses[:1].repeat(world, 0),
                           rtol=1e-6)

# ---- REAL validate(): host-local batches globalized via put_batch, then
# cross-process process_allgather of features (main.py feeds validate the
# same put_batch it trains with) ----
local_batch = {k: v[pid * per:(pid + 1) * per]
               for k, v in global_batch.items()}


def put_batch(b):
    return {k: jax.make_array_from_process_local_data(b_sh, np.asarray(v))
            for k, v in b.items()}


val_loader = [dict(local_batch), dict(local_batch)]  # 2 "batches"
with jax.sharding.set_mesh(mesh):
    top1 = validate(core, tc, state.adapters, frozen_g, val_loader,
                    tokenizer=None, epoch=0, writer=None, max_steps=2,
                    decode_captions=False, put_batch=put_batch)
assert np.isfinite(top1), top1

# ---- Orbax save/restore of the mesh-sharded train state ----
tree = {"adapters": state.adapters}
ckpt_utils.save_checkpoint_orbax(tree, out_dir, step=7,
                                 meta={"loss": losses[-1]})
multihost_utils.sync_global_devices("after_orbax_save")
restored, meta = ckpt_utils.load_checkpoint_orbax(out_dir)
assert meta["step"] == 7 and abs(meta["loss"] - losses[-1]) < 1e-9
want = jax.device_get(state.adapters)
got = restored["adapters"]
jax.tree_util.tree_map(
    lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                            rtol=1e-6),
    want, got)

with open(os.path.join(out_dir, f"ok_{pid}.json"), "w") as f:
    json.dump({"pid": pid, "losses": losses, "top1": float(top1),
               "devices": jax.device_count()}, f)
print(f"worker {pid}/{world} OK losses={losses}")
