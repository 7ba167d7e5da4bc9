"""End-to-end smoke of the VIST eval protocol: stub VIST data -> forced-
[IMG] generation through a tiny GILL+SD -> CLIP-similarity scoring."""

import json
import os
import sys

import jax
import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "evals"))

from test_load_gill import ckpt_dir  # noqa: F401  (fixture reuse)


@pytest.fixture()
def vist_dir(tmp_path):
    img_dir = tmp_path / "val_images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    story = []
    for i in range(3):
        iid = f"im{i}"
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            img_dir / f"{iid}.png")
        story.append({"caption": f"step {i} of the story", "image_id": iid,
                      "sequence_index": i})
    data = {"annotations": {"story1": story}}
    with open(tmp_path / "val_formatted.json", "w") as f:
        json.dump(data, f)
    return str(tmp_path)


def test_generate_vist_images_e2e(ckpt_dir, vist_dir, tmp_path, monkeypatch):  # noqa: F811
    monkeypatch.setenv("GILL_TPU_TINY_SD", "1")
    import generate_vist_images as gv

    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "generate_vist_images.py", out_dir, "--model-dir", ckpt_dir,
        "--vist-dir", vist_dir, "--num-inference-steps", "2", "--limit", "1"])
    gv.main()
    # the story's last image id is im2
    out_path = os.path.join(out_dir, "im2.png")
    assert os.path.exists(out_path)
    img = Image.open(out_path)
    assert img.size[0] > 0

    # score it with the (random-weight) CLIP scorer -> finite score in [-1,1]
    import compute_clip_similarity as ccs

    score_file = str(tmp_path / "score.txt")
    monkeypatch.setattr(sys, "argv", [
        "compute_clip_similarity.py", "--dataset", "vist",
        "--gen-dir", out_dir, "--gt-dir", os.path.join(vist_dir, "val_images"),
        "--data-path", os.path.join(vist_dir, "val_formatted.json"),
        "--clip-model", "test/clip-tiny", "--out", score_file])
    ccs.main()
    score = float(open(score_file).read())
    assert -1.0 <= score <= 1.0


def test_generate_vist_images_batched_matches_sequential(
        ckpt_dir, vist_dir, tmp_path, monkeypatch):  # noqa: F811
    """--batch routes stories through the continuous-batching engine.

    Greedy TOKENS are exactly equal to the sequential path (test_api);
    the tapped [IMG] hiddens differ in float accumulation order (the
    engine runs the LM at batch=slots, the sequential path at batch=1),
    so after SD amplification the pixels match only to a tight tolerance.
    """
    monkeypatch.setenv("GILL_TPU_TINY_SD", "1")
    import generate_vist_images as gv

    seq_dir, bat_dir = str(tmp_path / "seq"), str(tmp_path / "bat")
    monkeypatch.setattr(sys, "argv", [
        "generate_vist_images.py", seq_dir, "--model-dir", ckpt_dir,
        "--vist-dir", vist_dir, "--num-inference-steps", "2"])
    gv.main()
    monkeypatch.setattr(sys, "argv", [
        "generate_vist_images.py", bat_dir, "--model-dir", ckpt_dir,
        "--vist-dir", vist_dir, "--num-inference-steps", "2",
        "--batch", "4"])
    gv.main()
    assert os.path.exists(os.path.join(bat_dir, "im2.png"))
    a = np.asarray(Image.open(os.path.join(seq_dir, "im2.png"))).astype(np.int32)
    b = np.asarray(Image.open(os.path.join(bat_dir, "im2.png"))).astype(np.int32)
    assert np.abs(a - b).max() <= 12, np.abs(a - b).max()
    assert np.abs(a - b).mean() <= 3.0, np.abs(a - b).mean()
