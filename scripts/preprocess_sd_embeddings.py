"""Precompute SD text-conditioning embeddings for training captions.

Protocol parity: reference scripts/preprocess_sd_embeddings.py — for every
(caption, image) row of the TSV, encode the caption with the SD pipeline's
return_prompts_only path and save a (77, 768) fp16 .npy at
<image_dir>/clip_embs/<image>.npy, skipping existing files.

Example:
  python scripts/preprocess_sd_embeddings.py \
      --tsv datasets/cc3m_val.tsv --image-dir data/cc3m/validation \
      --sd-dir /weights/stable-diffusion-v1-5
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--sd-dir", default=None,
                   help="diffusers-layout SD dir with text_encoder/ and "
                        "tokenizer/")
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gill_tpu.models import clip as clip_mod
    from gill_tpu.models.sd.pipeline import SDPipelineConfig, \
        StableDiffusionPipeline
    from gill_tpu.tokenizer import CLIPBPETokenizer
    from gill_tpu.weights.convert import clip_text_from_torch
    from gill_tpu.weights.loader import load_state_dict_dir

    cfg = SDPipelineConfig()
    sd_dir = args.sd_dir or os.path.join(
        os.environ.get("GILL_TPU_WEIGHTS_DIR", ""), "stable-diffusion-v1-5")
    if os.path.isdir(os.path.join(sd_dir, "text_encoder")):
        text = jax.tree_util.tree_map(jnp.asarray, clip_text_from_torch(
            load_state_dict_dir(os.path.join(sd_dir, "text_encoder")),
            cfg.text))
        tok = CLIPBPETokenizer.from_files(
            os.path.join(sd_dir, "tokenizer", "vocab.json"),
            os.path.join(sd_dir, "tokenizer", "merges.txt"))
    else:
        print("WARNING: SD text encoder weights not found; using random "
              "weights + tiny tokenizer (smoke mode).")
        text = clip_mod.init_text(jax.random.PRNGKey(0), cfg.text)
        tok = CLIPBPETokenizer.tiny()

    pipe = StableDiffusionPipeline(cfg, {"unet": None, "vae_decoder": None,
                                         "text_encoder": text}, tokenizer=tok)

    out_dir = os.path.join(args.image_dir, "clip_embs")
    os.makedirs(out_dir, exist_ok=True)

    rows = []
    with open(args.tsv, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            out_path = os.path.join(out_dir, row["image"] + ".npy")
            if not os.path.exists(out_path):  # skip existing (ref :48)
                rows.append((row["caption"], out_path))

    for i in range(0, len(rows), args.batch_size):
        chunk = rows[i:i + args.batch_size]
        caps = [c for c, _ in chunk]
        embs = pipe(prompt=caps, return_prompts_only=True)
        embs = np.asarray(embs, np.float16)
        for (c, out_path), e in zip(chunk, embs):
            np.save(out_path, e)
        print(f"{min(i + args.batch_size, len(rows))}/{len(rows)}",
              flush=True)


if __name__ == "__main__":
    main()
