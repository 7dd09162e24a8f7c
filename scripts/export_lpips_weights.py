"""Export AlexNet-LPIPS weights to the npz schema models/metrics.py consumes.

Run this on any machine that has the `lpips` pip package (and network access
for the one-time torchvision download), then copy the npz into this
environment:

    python scripts/export_lpips_weights.py --out lpips_alex.npz
    scp lpips_alex.npz <target>:~/.cache/freegaussian/lpips_alex.npz

Schema: conv{i}_w (O,I,Kh,Kw) float32, conv{i}_b (O,), lin{i} (C,) for
i in 0..4 — the five AlexNet feature convs and the five learned per-channel
LPIPS calibration weights (lpips v0.1 'alex').
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    args = ap.parse_args()

    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="alex", verbose=False)
    out = {}
    convs = [m for m in net.net.modules() if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 alexnet convs, got {len(convs)}"
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().numpy().astype(np.float32)
        out[f"conv{i}_b"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}"] = w.reshape(-1).astype(np.float32)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()
