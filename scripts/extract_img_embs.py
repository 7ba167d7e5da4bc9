"""Extract retrieval embeddings for a list of image urls/paths.

Protocol parity: reference scripts/extract_img_embs.py — each image runs
through get_visual_embs(mode='retrieval') and the (path, 256-d embedding)
pairs are pickled in the cc3m*.npy blob format read by load_gill.

Example:
  python scripts/extract_img_embs.py --out cc3m_embeddings.pkl \
      --model-dir checkpoints/gill_opt img1.jpg img2.jpg ...
"""

import argparse
import io
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("images", nargs="+", help="image urls or local paths")
    p.add_argument("--out", default="cc3m_embeddings.pkl")
    p.add_argument("--model-dir", default="checkpoints/gill_opt")
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gill_tpu.api import load_gill
    from gill_tpu.retrieval import save_embeddings
    from gill_tpu.utils.image import clip_preprocess

    model = load_gill(args.model_dir, load_ret_embs=False, load_sd=False,
                      weights_dir=args.weights_dir)

    def load(src):
        if src.startswith("http"):
            import requests

            return Image.open(io.BytesIO(requests.get(src, timeout=10).content))
        with open(src, "rb") as f:
            img = Image.open(f)
            img.load()
            return img

    paths, embs = [], []
    for i in range(0, len(args.images), args.batch_size):
        batch = args.images[i:i + args.batch_size]
        px = np.stack([clip_preprocess(load(s), model.core.cfg.image_size)
                       for s in batch])
        v = model._ret_vis_fn(model.params, jnp.asarray(px))[:, 0, :]
        embs.extend(np.asarray(v, np.float32))
        paths.extend(batch)

    save_embeddings(args.out, paths, np.stack(embs))
    print(f"Wrote {len(paths)} embeddings to {args.out}")


if __name__ == "__main__":
    main()
