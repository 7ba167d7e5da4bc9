"""CLIP ViT-L/14 cosine similarity between generated and groundtruth images.

Protocol parity: reference evals/compute_clip_similarity_vist.py (gen vs GT
last story image) and evals/compute_clip_similarity_visdial.py (gen vs the
dialogue's image) — cosine of CLIPModel.get_image_features, mean over
examples. Runs our JAX CLIP tower; only scalar scores leave the device.

Example:
  python evals/compute_clip_similarity.py --dataset vist \
      --gen-dir gill_vist_outputs --gt-dir sis/val_images \
      --data-path sis/val_formatted.json --weights-dir /weights
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pairs_vist(data_path, gt_dir, gen_dir):
    with open(data_path) as f:
        vist = json.load(f)
    for story_id, story in vist["annotations"].items():
        gt_id = story[-1]["image_id"]
        yield (os.path.join(gt_dir, gt_id + ".png"),
               os.path.join(gen_dir, gt_id + ".png"))


def pairs_visdial(data_path, gt_dir, gen_dir):
    with open(data_path) as f:
        visdial = json.load(f)
    for dialog in visdial["data"]["dialogs"]:
        image_id = str(dialog["image_id"]).rjust(12, "0")
        yield (os.path.join(gt_dir, f"VisualDialog_val2018_{image_id}.jpg"),
               os.path.join(gen_dir, f"{image_id}.png"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["vist", "visdial"], required=True)
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--clip-model", default="openai/clip-vit-large-patch14")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gill_tpu.config import CLIPVisionConfig
    from gill_tpu.models import clip as clip_mod
    from gill_tpu.utils.image import clip_preprocess
    from gill_tpu.weights import loader as wloader
    from gill_tpu.weights.convert import clip_vision_from_torch

    cfg = CLIPVisionConfig.from_name(args.clip_model)
    d = wloader._model_dir(args.clip_model, args.weights_dir)
    if d is None:
        print("WARNING: CLIP weights unavailable; scores will be meaningless "
              "(random init).")
        params = clip_mod.init_vision(jax.random.PRNGKey(0), cfg)
        params["visual_projection"] = {
            "w": jnp.eye(cfg.hidden_size, 768, dtype=jnp.float32)}
    else:
        params = jax.tree_util.tree_map(
            jnp.asarray,
            clip_vision_from_torch(wloader.load_state_dict_dir(d), cfg))

    @jax.jit
    def cos_sim(px_a, px_b):
        fa = clip_mod.get_image_features(params, cfg, px_a)
        fb = clip_mod.get_image_features(params, cfg, px_b)
        fa = fa / jnp.linalg.norm(fa, axis=-1, keepdims=True)
        fb = fb / jnp.linalg.norm(fb, axis=-1, keepdims=True)
        return (fa * fb).sum(-1)

    pair_fn = pairs_vist if args.dataset == "vist" else pairs_visdial
    scores = []
    for gt_path, gen_path in pair_fn(args.data_path, args.gt_dir,
                                     args.gen_dir):
        if not (os.path.exists(gt_path) and os.path.exists(gen_path)):
            print(f"Skipping missing pair {gt_path} / {gen_path}")
            continue
        gt = clip_preprocess(Image.open(gt_path), cfg.image_size)[None]
        gen = clip_preprocess(Image.open(gen_path), cfg.image_size)[None]
        scores.append(float(cos_sim(jnp.asarray(gen), jnp.asarray(gt))[0]))

    score = float(np.mean(scores)) if scores else float("nan")
    print("CLIP similarity:", score)
    out = args.out or f"{args.dataset}_clip_similarity.txt"
    with open(out, "w") as wf:
        wf.write(str(score))


if __name__ == "__main__":
    main()
