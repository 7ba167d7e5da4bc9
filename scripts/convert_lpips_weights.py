"""One-time conversion of torch LPIPS (net='alex', v0.1) weights to .npz.

Run in any environment that has the `lpips` pip package + torchvision
AlexNet weights, then copy the .npz here:

  python scripts/convert_lpips_weights.py lpips_alex.npz
"""

import sys

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz"
    import lpips  # requires the lpips pip package (not in this image)

    m = lpips.LPIPS(net="alex", version="0.1")
    blobs = {}
    convs = [0, 3, 6, 8, 10]  # torchvision AlexNet features conv indices
    for i, ci in enumerate(convs):
        conv = m.net.slice1  # placeholder; we walk the flat module list below
    feats = []
    for name, mod in m.net.named_modules():
        if mod.__class__.__name__ == "Conv2d":
            feats.append(mod)
    assert len(feats) == 5, len(feats)
    for i, conv in enumerate(feats):
        blobs[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        blobs[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i in range(5):
        lin = getattr(m, f"lin{i}")
        w = lin.model[1].weight.detach().numpy()  # (1, C, 1, 1)
        blobs[f"lin{i}_w"] = w[0, :, 0, 0]
    np.savez(out, **blobs)
    print("wrote", out)


if __name__ == "__main__":
    main()
