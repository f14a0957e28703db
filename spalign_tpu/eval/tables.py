"""Cross-round experiment tables and plots.

Reference: utils/make_table.py — scans results/train_*/log training logs,
takes each round's latest entries, emits a CSV of the best road IoU per
round and PDF plots of IoU/precision/recall across rounds.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, List, Optional


def load_round_logs(result_base_dir: str, pattern: str = "train_round*") \
        -> Dict[int, List[dict]]:
    """round number -> parsed log entries (training JSONL 'log' files)."""
    rounds = {}
    for d in sorted(glob.glob(os.path.join(result_base_dir, pattern))):
        m = re.search(r"round(\d+)", os.path.basename(d))
        if not m:
            continue
        log_fn = os.path.join(d, "log")
        if not os.path.exists(log_fn):
            continue
        with open(log_fn) as f:
            entries = json.load(f)
        rounds[int(m.group(1))] = entries
    return rounds


def best_metric_per_round(rounds: Dict[int, List[dict]],
                          key: str = "val/main/iou/road") -> Dict[int, float]:
    out = {}
    for n, entries in rounds.items():
        vals = [e[key] for e in entries if key in e]
        if vals:
            out[n] = max(vals)
    return out


def write_rounds_csv(result_base_dir: str, out_csv: Optional[str] = None,
                     keys=("val/main/iou/road", "val/main/precision",
                           "val/main/recall")) -> str:
    rounds = load_round_logs(result_base_dir)
    out_csv = out_csv or os.path.join(result_base_dir, "rounds.csv")
    cols = {k: best_metric_per_round(rounds, k) for k in keys}
    with open(out_csv, "w") as f:
        f.write("round," + ",".join(keys) + "\n")
        for n in sorted(rounds):
            row = [str(n)] + [f"{cols[k].get(n, float('nan'))}"
                              for k in keys]
            f.write(",".join(row) + "\n")
    return out_csv


def plot_rounds(result_base_dir: str, out_pdf: Optional[str] = None,
                key: str = "val/main/iou/road") -> Optional[str]:
    rounds = load_round_logs(result_base_dir)
    best = best_metric_per_round(rounds, key)
    if not best:
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = sorted(best)
    fig, ax = plt.subplots()
    ax.plot(xs, [best[x] for x in xs], marker="o")
    ax.set_xlabel("self-training round")
    ax.set_ylabel(key)
    ax.grid(True, alpha=0.3)
    out_pdf = out_pdf or os.path.join(result_base_dir, "rounds_iou.pdf")
    fig.savefig(out_pdf, bbox_inches="tight")
    plt.close(fig)
    return out_pdf
