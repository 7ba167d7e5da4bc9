"""End-to-end smoke: the CPU smoke config (reference README.md:107-115 —
opt-125m + small ViT, tiny batch, 1 epoch x 2 steps) through the real CLI:
dataset -> loader -> SPMD train step -> validate -> checkpoint."""

import json
import os

import numpy as np
import pytest


def test_main_cli_smoke(tmp_path):
    from gill_tpu.data.dataset import make_stub_dataset

    root = make_stub_dataset(str(tmp_path), n=6, image_size=32,
                             num_clip_tokens=8, gen_emb_dim=12, split="train")
    make_stub_dataset(str(tmp_path), n=4, image_size=32, num_clip_tokens=8,
                      gen_emb_dim=12, split="val")

    import main as train_main

    argv = [
        "--opt-version", "facebook/opt-125m",
        "--visual-model", "openai/clip-vit-base-patch32",
        "--dataset", "cc3m", "--val-dataset", "cc3m",
        "--dataset-dir", os.path.join(str(tmp_path), "datasets"),
        "--image-dir", str(tmp_path),
        "--log-base-dir", str(tmp_path / "runs"),
        "--exp-name", "smoke",
        "--precision", "fp32",
        "--batch-size", "2", "--val-batch-size", "2",
        "--epochs", "1", "--steps-per-epoch", "2",
        "--val-steps-per-epoch", "1",
        "--num-tokens", "4", "--num-clip-tokens", "8",
        "--gen-emb-dim", "12", "--ret-emb-dim", "8",
        "--n-visual-tokens", "2", "--max-len", "16",
        "--lr-warmup-steps", "2", "--print-freq", "1",
        "--seed", "42", "--workers", "1",
        "--concat-captions-prob", "0.5",
    ]
    train_main.main(argv)

    run_dir = tmp_path / "runs" / "smoke"
    assert (run_dir / "args.json").exists()
    assert (run_dir / "model_args.json").exists()
    assert (run_dir / "param_count.txt").exists()
    assert (run_dir / "ckpt" / "state.npz").exists()
    # best ckpt saved on first epoch
    assert (run_dir / "ckpt_best" / "state.npz").exists()
    margs = json.loads((run_dir / "model_args.json").read_text())
    assert margs["num_tokens"] == 4
    assert len(margs["retrieval_token_idx"]) == 4


def test_checkpoint_roundtrip(tmp_path):
    from gill_tpu.utils.ckpt import load_checkpoint, save_checkpoint

    tree = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
            "c": (np.ones(2), {"d": np.zeros(1)}),
            "scalar": np.float32(3.5)}
    save_checkpoint(tree, str(tmp_path), step=7, is_best=True,
                    meta={"epoch": 1, "best_acc1": 0.5})
    loaded, meta = load_checkpoint(str(tmp_path))
    assert meta["step"] == 7 and meta["epoch"] == 1
    np.testing.assert_array_equal(loaded["a"]["b"], tree["a"]["b"])
    assert isinstance(loaded["c"], tuple)
    np.testing.assert_array_equal(loaded["c"][0], tree["c"][0])
    np.testing.assert_array_equal(loaded["c"][1]["d"], tree["c"][1]["d"])
    best, _ = load_checkpoint(str(tmp_path / "ckpt_best"))
    np.testing.assert_array_equal(best["a"]["b"], tree["a"]["b"])


def test_orbax_checkpoint_roundtrip(tmp_path):
    import pytest

    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax not installed")
    from gill_tpu.utils.ckpt import load_checkpoint_orbax, save_checkpoint_orbax

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones(4, np.int32)}}
    save_checkpoint_orbax(tree, str(tmp_path), step=3, meta={"epoch": 1})
    loaded, meta = load_checkpoint_orbax(str(tmp_path))
    assert meta["step"] == 3
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["b"]["c"], tree["b"]["c"])


def test_bleu():
    from gill_tpu.train.bleu import bleu_score

    b = bleu_score(["the cat sat on the mat"], ["the cat sat on the mat"])
    assert all(abs(x - 1.0) < 1e-9 for x in b)
    b = bleu_score(["a b c d"], ["e f g h"])
    assert b[0] == 0.0
    b1, b2, b3, b4 = bleu_score(["the cat the cat"], ["the cat sat down"])
    assert 0 < b2 <= b1 <= 1.0


def test_dataloader_prefetch(tmp_path):
    from gill_tpu.data.dataset import DataLoader, TsvDataset, make_stub_dataset
    from gill_tpu.tokenizer import GPT2BPETokenizer, setup_gill_tokenizer

    make_stub_dataset(str(tmp_path), n=7, image_size=16, num_clip_tokens=4,
                      gen_emb_dim=8, split="train")
    tok = GPT2BPETokenizer.tiny()
    img_ids = setup_gill_tokenizer(tok, 4)
    ds = TsvDataset(os.path.join(str(tmp_path), "datasets/cc3m_train.tsv"),
                    os.path.join(str(tmp_path), "cc3m/training"),
                    tok, img_ids, max_len=16, image_size=16,
                    num_clip_tokens=4)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
    batches = list(dl)
    assert len(batches) == 3  # drop_last
    b = batches[0]
    assert b["pixels"].shape == (2, 16, 16, 3)
    assert b["ret_tokens"].shape == (2, 16)
    assert b["clip_emb"].shape == (2, 4, 8)
    # tokens end with the [IMG] run before padding
    row = b["ret_tokens"][0]
    ln = int(b["ret_len"][0])
    assert row[ln - 4:ln].tolist() == img_ids
    # epoch reshuffles
    dl.set_epoch(1)
    batches2 = list(dl)
    assert len(batches2) == 3


def test_main_cli_w8_frozen_lm(tmp_path):
    """--frozen-lm-precision w8 (the single-chip OPT-6.7B training mode)
    runs the CLI end to end with an int8 frozen decoder."""
    import os

    from gill_tpu.data.dataset import make_stub_dataset

    make_stub_dataset(str(tmp_path), n=4, image_size=32, num_clip_tokens=8,
                      gen_emb_dim=12, split="train")
    make_stub_dataset(str(tmp_path), n=2, image_size=32, num_clip_tokens=8,
                      gen_emb_dim=12, split="val")

    import main as train_main

    train_main.main([
        "--opt-version", "facebook/opt-125m",
        "--visual-model", "openai/clip-vit-base-patch32",
        "--dataset", "cc3m", "--val-dataset", "cc3m",
        "--dataset-dir", os.path.join(str(tmp_path), "datasets"),
        "--image-dir", str(tmp_path),
        "--log-base-dir", str(tmp_path / "runs"),
        "--exp-name", "w8smoke",
        "--precision", "fp32", "--frozen-lm-precision", "w8",
        "--batch-size", "2", "--val-batch-size", "2",
        "--epochs", "1", "--steps-per-epoch", "1",
        "--val-steps-per-epoch", "1",
        "--num-tokens", "4", "--num-clip-tokens", "8",
        "--gen-emb-dim", "12", "--ret-emb-dim", "8",
        "--n-visual-tokens", "2", "--max-len", "16",
        "--lr-warmup-steps", "1", "--print-freq", "1",
        "--seed", "42", "--workers", "1",
    ])
    assert (tmp_path / "runs" / "w8smoke" / "ckpt" / "state.npz").exists()
