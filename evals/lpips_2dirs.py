"""LPIPS (AlexNet) perceptual distance between two image directories.

Protocol parity: reference evals/lpips_2dirs.py — images resized to 256x256,
LPIPS(net='alex', version 0.1), per-file scores + average written to --out.

The AlexNet backbone + LPIPS linear calibration weights are pretrained
artifacts; supply them via --lpips-weights (a .npz produced by
scripts/convert_lpips_weights.py from the torch lpips package, or the torch
.pth files directly). Without weights this script exits with instructions —
there is no meaningful weight-free LPIPS.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# AlexNet feature config: (out_channels, kernel, stride, padding) per conv,
# with ReLU after each and MaxPool(3,2) after convs 0, 1, 4.
ALEX_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
              (256, 3, 1, 1), (256, 3, 1, 1)]
# LPIPS taps the ReLU outputs of all five conv stages.
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def alexnet_features(params, x):
    import jax
    import jax.numpy as jnp

    from gill_tpu.nn import core as nn

    feats = []
    h = x
    for i in range(5):
        h = nn.conv2d(params[f"conv{i}"], h,
                      stride=ALEX_CONVS[i][2], padding=ALEX_CONVS[i][3])
        h = jax.nn.relu(h)
        feats.append(h)
        if i in (0, 1):
            h = -jax.lax.reduce_window(-h, jnp.inf, jax.lax.min,
                                       (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return feats


def lpips_distance(params, img0, img1):
    """img0/img1: (1, H, W, 3) in [-1, 1]."""
    import jax.numpy as jnp

    x0 = (img0 - SHIFT) / SCALE
    x1 = (img1 - SHIFT) / SCALE
    f0s = alexnet_features(params, x0)
    f1s = alexnet_features(params, x1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(f0s, f1s)):
        n0 = f0 / jnp.sqrt((f0 ** 2).sum(-1, keepdims=True) + 1e-10)
        n1 = f1 / jnp.sqrt((f1 ** 2).sum(-1, keepdims=True) + 1e-10)
        diff = (n0 - n1) ** 2
        w = params[f"lin{i}"]["w"]  # (C,) calibration weights
        total = total + (diff * w[None, None, None, :]).sum(-1).mean()
    return total


def load_lpips_weights(path):
    import jax.numpy as jnp

    if path.endswith(".npz"):
        z = np.load(path)
        params = {}
        for i in range(5):
            params[f"conv{i}"] = {"w": jnp.asarray(z[f"conv{i}_w"]),
                                  "b": jnp.asarray(z[f"conv{i}_b"])}
            params[f"lin{i}"] = {"w": jnp.asarray(z[f"lin{i}_w"])}
        return params
    raise ValueError(f"unsupported weights file {path}; see "
                     f"scripts/convert_lpips_weights.py")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d0", "--dir0", required=True)
    p.add_argument("-d1", "--dir1", required=True)
    p.add_argument("-o", "--out", default="lpips_dists.txt")
    p.add_argument("--lpips-weights", default=os.environ.get(
        "GILL_TPU_LPIPS_WEIGHTS", ""))
    args = p.parse_args()

    if not args.lpips_weights or not os.path.exists(args.lpips_weights):
        print("ERROR: LPIPS requires pretrained AlexNet+calibration weights. "
              "Convert them once with scripts/convert_lpips_weights.py and "
              "pass --lpips-weights (or set GILL_TPU_LPIPS_WEIGHTS).")
        sys.exit(2)

    import jax
    import jax.numpy as jnp

    params = load_lpips_weights(args.lpips_weights)
    dist_fn = jax.jit(lambda a, b: lpips_distance(params, a, b))

    def load(path):
        img = Image.open(path).convert("RGB").resize((256, 256),
                                                     Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0
        return jnp.asarray(arr[None])

    scores = []
    with open(args.out, "w") as f:
        for fn in sorted(os.listdir(args.dir0)):
            other = os.path.join(args.dir1, fn)
            if not os.path.exists(other):
                continue
            d = float(dist_fn(load(os.path.join(args.dir0, fn)), load(other)))
            scores.append(d)
            f.write(f"{fn}: {d:.6f}\n")
        f.write(f"Average: {np.mean(scores)}")
    print("Average LPIPS:", np.mean(scores))


if __name__ == "__main__":
    main()
