"""Worker for tests/test_multihost.py::test_two_process_cli_orbax_resume:
drives the REAL training CLI (main.py) under a 2-process
jax.distributed runtime with --ckpt-backend orbax, then proves the
VERDICT-r3 resume contract: a run interrupted after epoch 0 and resumed
from its CLI-written Orbax checkpoint reaches EXACTLY the same final
train state (bitwise adapters + optimizer moments) as an uninterrupted
run — i.e. the loss trajectory continues bit-consistently (reference
resume semantics, /root/reference/main.py:347-367).

Usage: python multihost_cli_worker.py <pid> <world> <port> <out_dir>
"""

import json
import os
import re
import sys
import time

pid, world = int(sys.argv[1]), int(sys.argv[2])
port, out_dir = sys.argv[3], sys.argv[4]

flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (flags +
                           " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
os.environ.setdefault("GLOO_TIMEOUT_SECONDS", "300")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=world, process_id=pid,
                           initialization_timeout=600)
assert jax.process_count() == world
assert jax.device_count() == 4 * world

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# ---- stub dataset: rank 0 writes, the rest wait on a sentinel ----
data_dir = os.path.join(out_dir, "data")
sentinel = os.path.join(out_dir, "data_ready")
if pid == 0:
    from gill_tpu.data.dataset import make_stub_dataset

    make_stub_dataset(data_dir, n=16, image_size=16, num_clip_tokens=6,
                      gen_emb_dim=12, split="train")
    make_stub_dataset(data_dir, n=8, image_size=16, num_clip_tokens=6,
                      gen_emb_dim=12, split="val")
    open(sentinel, "w").write("ok")
else:
    t0 = time.time()
    while not os.path.exists(sentinel):
        assert time.time() - t0 < 300, "dataset sentinel never appeared"
        time.sleep(0.2)

import main as train_main  # noqa: E402

BASE = [
    "--opt-version", "test/opt-tiny",
    "--visual-model", "test/clip-tiny",
    "--dataset", "cc3m", "--val-dataset", "cc3m",
    "--dataset-dir", os.path.join(data_dir, "datasets"),
    "--image-dir", data_dir,
    "--log-base-dir", os.path.join(out_dir, "runs"),
    "--precision", "fp32",
    "--batch-size", "8", "--val-batch-size", "8",
    "--steps-per-epoch", "2", "--val-steps-per-epoch", "1",
    "--num-tokens", "4", "--num-clip-tokens", "6",
    "--gen-emb-dim", "12", "--ret-emb-dim", "8",
    "--n-visual-tokens", "2", "--max-len", "16", "--image-size", "16",
    "--lr-warmup-steps", "2", "--print-freq", "1",
    "--seed", "42", "--workers", "1",
    "--concat-captions-prob", "0.5",
    "--ckpt-backend", "orbax",
]

# uninterrupted 2-epoch run; interrupted 1-epoch run; resumed completion
train_main.main(BASE + ["--exp-name", "cont", "--epochs", "2"])
train_main.main(BASE + ["--exp-name", "part", "--epochs", "1"])
part_dir = os.path.join(out_dir, "runs", "part")
train_main.main(BASE + ["--exp-name", "res", "--epochs", "2",
                        "--resume", part_dir])

from jax.experimental import multihost_utils  # noqa: E402

from gill_tpu.utils.ckpt import load_checkpoint_orbax  # noqa: E402

multihost_utils.sync_global_devices("cli_runs_done")
cont, meta_c = load_checkpoint_orbax(os.path.join(out_dir, "runs", "cont"))
res, meta_r = load_checkpoint_orbax(os.path.join(out_dir, "runs", "res"))
assert meta_c["step"] == meta_r["step"] == 4, (meta_c, meta_r)

flat_c = jax.tree_util.tree_leaves_with_path(cont)
flat_r = dict(jax.tree_util.tree_leaves_with_path(res))
assert flat_c and len(flat_c) == len(flat_r)
for path, leaf in flat_c:
    np.testing.assert_array_equal(np.asarray(leaf),
                                  np.asarray(flat_r[path]),
                                  err_msg=jax.tree_util.keystr(path))

with open(os.path.join(out_dir, f"cli_ok_{pid}.json"), "w") as f:
    json.dump({"pid": pid, "step": meta_c["step"]}, f)
print(f"cli worker {pid}/{world} OK")
