"""Generate plain SD v1.5 images for PartiPrompts (decision-annotation
pairs).

Protocol parity: reference scripts/generate_sd_p2_images.py — batch 16,
seed 1337, one image per prompt saved as <row_idx>.png.

Example:
  python scripts/generate_sd_p2_images.py data/PartiPromptsAllDecisions.tsv \
      p2_sd_outputs --sd-dir /weights/stable-diffusion-v1-5
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("p2_fn")
    p.add_argument("output_dir")
    p.add_argument("--sd-dir", default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-inference-steps", type=int, default=50)
    args = p.parse_args()

    import jax
    from PIL import Image

    from gill_tpu.api import wloader_sd
    from gill_tpu.models.sd.pipeline import (SDPipelineConfig,
                                             StableDiffusionPipeline)
    from gill_tpu.tokenizer import CLIPBPETokenizer

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = SDPipelineConfig()
    sd_dir = args.sd_dir or os.path.join(
        os.environ.get("GILL_TPU_WEIGHTS_DIR", ""), "stable-diffusion-v1-5")
    params = wloader_sd(sd_dir, cfg)
    tok = CLIPBPETokenizer.from_files(
        os.path.join(sd_dir, "tokenizer", "vocab.json"),
        os.path.join(sd_dir, "tokenizer", "merges.txt"))
    pipe = StableDiffusionPipeline(cfg, params, tokenizer=tok)

    captions, filenames = [], []
    with open(args.p2_fn) as f:
        for i, line in enumerate(f.readlines()[1:]):
            captions.append(line.strip().split("\t")[0])
            filenames.append(f"{i}.png")

    rng = jax.random.PRNGKey(1337)
    for i in range(0, len(captions), args.batch_size):
        rng, sub = jax.random.split(rng)
        arr = np.asarray(pipe(prompt=captions[i:i + args.batch_size],
                              num_inference_steps=args.num_inference_steps,
                              rng=sub))
        for j, img in enumerate(arr):
            Image.fromarray((img * 255).round().astype(np.uint8)).save(
                os.path.join(args.output_dir, filenames[i + j]))
        print(f"{min(i + args.batch_size, len(captions))}/{len(captions)}",
              flush=True)


if __name__ == "__main__":
    main()
