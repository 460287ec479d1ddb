"""Render the long-run training evidence (VERDICT r3 task #6) from
output/longrun_smoke/train_log.jsonl: PA-MPJPE eval curve + per-branch loss
composition, with the resume seam and the lambda_pose schedule steps marked.

Writes output/longrun_smoke/longrun_curve.png and prints a compact summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join("output", "longrun_smoke", "train_log.jsonl")


def load(path=LOG):
    train, evals = [], []
    last_epoch = 0
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "eval" in rec:
                # rows from builds predating the epoch tag: an eval always
                # follows the train rows of its epoch, so attribute it there
                evals.append({"epoch": rec.get("epoch", last_epoch), **rec["eval"]})
            elif "loss" in rec or "total" in rec:
                last_epoch = rec.get("epoch", last_epoch)
                train.append(rec)
    return train, evals


def main():
    train, evals = load()
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 7), sharex=True)
    ep = [e["epoch"] for e in evals if e.get("pa_mpjpe_cm") is not None]
    pa = [e["pa_mpjpe_cm"] for e in evals if e.get("pa_mpjpe_cm") is not None]
    ax1.plot(ep, pa, marker="o")
    ax1.set_ylabel("PA-MPJPE (cm)")
    ax1.set_title("longrun_smoke: eval across resume seam (ep15) + lambda steps (ep10/20)")
    te = [r["epoch"] for r in train if "total" in r and "epoch" in r]
    tot = [r["total"] for r in train if "total" in r and "epoch" in r]
    mpose = [r.get("mpose", 0.0) for r in train if "total" in r and "epoch" in r]
    ax2.plot(te, tot, label="total")
    ax2.plot(te, mpose, label="mpose (stepped λ)")
    ax2.set_yscale("log")
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("train loss")
    ax2.legend()
    for ax in (ax1, ax2):
        for x, c in ((10, "tab:orange"), (20, "tab:orange"), (15, "tab:red")):
            ax.axvline(x, color=c, linestyle="--", alpha=0.5)
    out = os.path.join(os.path.dirname(LOG), "longrun_curve.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print("wrote", out)
    if pa:
        print(f"PA-MPJPE first={pa[0]:.3f} min={min(pa):.3f} last={pa[-1]:.3f} cm "
              f"({len(pa)} evals)")


if __name__ == "__main__":
    main()
