"""Offline loss-curve analysis — the Loss_Analysis.ipynb equivalent
(SURVEY.md §2.18): globs ``<log_dir>/*/model_*_metrics.ckpt`` (or a single
run dir), reads per-epoch train_loss lists, and prints/plots per-epoch
mean/std curves per run.

Usage:
    python tools/loss_analysis.py <log_dir> [--plot out.png]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import re

import numpy as np


def load_run(run_dir: str):
    """epoch -> train_loss list, from model_<N>_metrics.ckpt files."""
    losses = {}
    for path in glob.glob(os.path.join(run_dir, "model_*_metrics.ckpt")):
        m = re.search(r"model_(\d+)_metrics\.ckpt$", path)
        if not m:
            continue
        with open(path, "rb") as f:
            try:
                data = pickle.load(f)
            except Exception:
                continue  # torch-format metrics need torch.load
        key = "train_loss" if "train_loss" in data else "losses_train"
        if key in data:
            losses[int(m.group(1))] = list(map(float, data[key]))
    return dict(sorted(losses.items()))


def summarize(run_dir: str):
    losses = load_run(run_dir)
    rows = []
    for epoch, vals in losses.items():
        rows.append((epoch, float(np.mean(vals)), float(np.std(vals)), len(vals)))
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", help="directory of runs (or a single run dir)")
    parser.add_argument("--plot", default=None, help="write a PNG of the curves")
    args = parser.parse_args()

    def has_metrics(d):
        return bool(glob.glob(os.path.join(d, "model_*_metrics.ckpt")))

    # Subdirectories that actually contain metrics are runs; a log_dir
    # holding metrics directly is itself a run (even when it also has
    # unrelated subdirs — model_N.orbax/ checkpoints, caches, plots).
    run_dirs = [
        d for d in glob.glob(os.path.join(args.log_dir, "*"))
        if os.path.isdir(d) and has_metrics(d)
    ]
    if has_metrics(args.log_dir):
        run_dirs.append(args.log_dir)
    if not run_dirs:
        run_dirs = [args.log_dir]

    curves = {}
    for run in sorted(run_dirs):
        rows = summarize(run)
        if not rows:
            continue
        name = os.path.basename(os.path.normpath(run))
        curves[name] = rows
        print(f"== {name} ==")
        for epoch, mean, std, n in rows:
            print(f"  epoch {epoch:3d}: loss {mean:.4f} +- {std:.4f} ({n} steps)")

    if args.plot and curves:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        for name, rows in curves.items():
            epochs = [r[0] for r in rows]
            means = np.array([r[1] for r in rows])
            stds = np.array([r[2] for r in rows])
            ax.plot(epochs, means, label=name)
            ax.fill_between(epochs, means - stds, means + stds, alpha=0.2)
        ax.set_xlabel("epoch")
        ax.set_ylabel("train loss")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print("wrote", args.plot)


if __name__ == "__main__":
    main()
