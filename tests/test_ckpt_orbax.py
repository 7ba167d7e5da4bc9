"""--ckpt-backend orbax through the real training CLI: a run interrupted
after epoch 0 and resumed from its Orbax checkpoint must land on EXACTLY
the same final train state (bitwise adapters + optimizer moments) as an
uninterrupted run — the reference's resume semantics
(/root/reference/main.py:347-367) with sharding-aware storage
(utils/ckpt.py save/load_checkpoint_orbax)."""

import glob
import json
import os

import jax
import numpy as np
import pytest


def _base_argv(tmp_path):
    from gill_tpu.data.dataset import make_stub_dataset

    make_stub_dataset(str(tmp_path), n=6, image_size=16, num_clip_tokens=6,
                      gen_emb_dim=12, split="train")
    make_stub_dataset(str(tmp_path), n=4, image_size=16, num_clip_tokens=6,
                      gen_emb_dim=12, split="val")
    return [
        "--opt-version", "test/opt-tiny",
        "--visual-model", "test/clip-tiny",
        "--dataset", "cc3m", "--val-dataset", "cc3m",
        "--dataset-dir", os.path.join(str(tmp_path), "datasets"),
        "--image-dir", str(tmp_path),
        "--log-base-dir", str(tmp_path / "runs"),
        "--precision", "fp32",
        "--batch-size", "2", "--val-batch-size", "2",
        "--steps-per-epoch", "2", "--val-steps-per-epoch", "1",
        "--num-tokens", "4", "--num-clip-tokens", "6",
        "--gen-emb-dim", "12", "--ret-emb-dim", "8",
        "--n-visual-tokens", "2", "--max-len", "16",
        "--image-size", "16",
        "--lr-warmup-steps", "2", "--print-freq", "1",
        "--seed", "42", "--workers", "1",
        "--concat-captions-prob", "0.5",
        "--ckpt-backend", "orbax",
    ]


def test_orbax_cli_resume_bit_consistent(tmp_path):
    import main as train_main

    from gill_tpu.utils.ckpt import load_checkpoint_orbax

    base = _base_argv(tmp_path)

    # uninterrupted 2-epoch run
    train_main.main(base + ["--exp-name", "cont", "--epochs", "2"])
    cont_dir = str(tmp_path / "runs" / "cont")
    assert glob.glob(os.path.join(cont_dir, "orbax_*")), \
        "orbax backend produced no orbax_<step> checkpoints"

    # same run interrupted after epoch 0...
    train_main.main(base + ["--exp-name", "part", "--epochs", "1"])
    part_dir = str(tmp_path / "runs" / "part")
    mid, mid_meta = load_checkpoint_orbax(part_dir)
    assert mid_meta["epoch"] == 1

    # ...and resumed to completion from the Orbax checkpoint
    train_main.main(base + ["--exp-name", "resumed", "--epochs", "2",
                            "--resume", part_dir])
    res_dir = str(tmp_path / "runs" / "resumed")

    final_cont, meta_cont = load_checkpoint_orbax(cont_dir)
    final_res, meta_res = load_checkpoint_orbax(res_dir)
    assert meta_cont["step"] == meta_res["step"]
    assert meta_cont["epoch"] == meta_res["epoch"] == 2

    # bit-consistent trajectory: adapters AND optimizer moments identical
    flat_c = jax.tree_util.tree_leaves_with_path(final_cont)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_res))
    assert flat_r, "resumed checkpoint is empty"
    for path, leaf in flat_c:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_r[path]),
            err_msg=jax.tree_util.keystr(path))
    # and the trajectory actually moved past the mid checkpoint
    mid_ad = jax.tree_util.tree_leaves(mid["adapters"])
    fin_ad = jax.tree_util.tree_leaves(final_cont["adapters"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(mid_ad, fin_ad)), \
        "epoch 1 did not change the adapters"

    # best-marker written by the orbax branch
    assert os.path.exists(os.path.join(cont_dir, "orbax_best.json"))
    with open(os.path.join(cont_dir, "orbax_best.json")) as f:
        assert "step" in json.load(f)


def test_orbax_roundtrip_latest_step(tmp_path):
    from gill_tpu.utils.ckpt import (latest_orbax_step,
                                     load_checkpoint_orbax,
                                     save_checkpoint_orbax)

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones((4,), np.int32)}}
    save_checkpoint_orbax(tree, str(tmp_path), step=3, meta={"x": 1})
    tree2 = {"a": tree["a"] * 2, "b": {"c": tree["b"]["c"] + 5}}
    save_checkpoint_orbax(tree2, str(tmp_path), step=10)
    assert latest_orbax_step(str(tmp_path)) == 10
    got, meta = load_checkpoint_orbax(str(tmp_path))
    assert meta["step"] == 10
    np.testing.assert_array_equal(got["a"], tree2["a"])
    # explicit step + pointing straight at the orbax_<step> dir
    got3, meta3 = load_checkpoint_orbax(str(tmp_path), step=3)
    assert meta3 == {"step": 3, "x": 1}
    np.testing.assert_array_equal(got3["b"]["c"], tree["b"]["c"])
    got3b, _ = load_checkpoint_orbax(os.path.join(str(tmp_path), "orbax_3"))
    np.testing.assert_array_equal(got3b["a"], tree["a"])
    assert latest_orbax_step(str(tmp_path / "empty")) is None
