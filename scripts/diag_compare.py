"""Compare stage-1 training trajectories across diagnostic arms (VERDICT r4
#3: root-cause the late-training PSNR slide). Reads each arm's
metrics.jsonl and tabulates eval PSNR/SSIM + gaussian count over steps,
plus peak-vs-final deltas.

Usage:
    python scripts/diag_compare.py LABEL=PATH [LABEL=PATH ...] \
        [--report docs/QUALITY_R5_DIAG.md]

PATH is the run's output dir containing freegaussian/metrics.jsonl.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load(path: Path):
    rows = [
        json.loads(l)
        for l in (path / "freegaussian/metrics.jsonl").read_text().splitlines()
    ]
    train = [r for r in rows if "eval" not in r]
    evals = [r for r in rows if r.get("eval") == "all"]
    return train, evals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arms", nargs="+", help="LABEL=PATH pairs")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    arms = {}
    for a in args.arms:
        label, path = a.split("=", 1)
        arms[label] = load(Path(path))

    lines = [
        "# Stage-1 late-training diagnostics (round 5)",
        "",
        "Controlled arms on the same generated articulated scene: the "
        "baseline schedule vs `continue_cull_post_densification=False` vs "
        "flow losses off — isolating what drives the post-peak eval-PSNR "
        "slide and the monotone Gaussian-count decline (VERDICT r4 #3/#4).",
        "",
    ]

    # eval trajectory table at shared steps
    steps = sorted(
        set.intersection(
            *[{r["step"] for r in ev} for _, ev in arms.values()]
        )
    )
    hdr = "| step | " + " | ".join(
        f"{k} psnr | {k} G" for k in arms
    ) + " |"
    lines += [hdr, "|---" * (1 + 2 * len(arms)) + "|"]
    for s in steps[:: max(len(steps) // 25, 1)]:
        cells = [str(s)]
        for k, (train, ev) in arms.items():
            r = next(r for r in ev if r["step"] == s)
            g = next(
                (t["gaussian_count"] for t in reversed(train) if t["step"] <= s),
                float("nan"),
            )
            cells.append(f"{r['psnr']:.2f}")
            cells.append(f"{int(g)}")
        lines.append("| " + " | ".join(cells) + " |")

    lines += ["", "## Peak vs final", ""]
    lines += [
        "| arm | peak psnr (step) | final psnr | slide | final gaussians |",
        "|---|---|---|---|---|",
    ]
    summary = {}
    for k, (train, ev) in arms.items():
        best = max(ev, key=lambda r: r["psnr"])
        last = ev[-1]
        gfinal = int(train[-1]["gaussian_count"]) if train else -1
        summary[k] = (best, last, gfinal)
        lines.append(
            f"| {k} | {best['psnr']:.2f} ({best['step']}) | "
            f"{last['psnr']:.2f} | {best['psnr'] - last['psnr']:+.2f} | "
            f"{gfinal} |"
        )
        print(
            f"{k}: peak {best['psnr']:.2f}@{best['step']} final "
            f"{last['psnr']:.2f} (slide {best['psnr'] - last['psnr']:+.2f}), "
            f"G final {gfinal}"
        )

    if args.report:
        Path(args.report).write_text("\n".join(lines) + "\n")
        print("wrote", args.report)


if __name__ == "__main__":
    main()
