"""Runtime boxplot from benchmark CSVs.

Consumes the benchmark CSV schema (columns
``N, trial_index, status, time_sec, K, T, h, error``) produced by both the
reference harness and ours — the compatibility surface called out in
SURVEY.md section 6 — and renders the same presentation: time vs N, log-y,
success-only, orange median / green dashed mean
(``/root/reference/src/path_planning/viz/plot_runtime_boxplot.py``).
"""

from __future__ import annotations

import csv
import glob
from pathlib import Path

import numpy as np


def load_rows_from_dir(data_dir: str) -> list[dict]:
    p = Path(data_dir)
    if not p.exists():
        raise FileNotFoundError(f"Directory does not exist: {data_dir}")
    files = sorted(glob.glob(str(p / "scp_benchmark_*.csv")))
    if not files:
        raise FileNotFoundError(f"No 'scp_benchmark_*.csv' files in {data_dir}")
    rows: list[dict] = []
    for fp in files:
        with open(fp, encoding="utf-8") as f:
            rows.extend(csv.DictReader(f))
    if not rows:
        raise RuntimeError("No rows loaded.")
    return rows


def group_times_by_N(rows: list[dict]) -> dict[int, list[float]]:
    """{N: sorted success times}; skips malformed rows."""
    by_n: dict[int, list[float]] = {}
    for r in rows:
        try:
            if r.get("status", "").strip().lower() != "success":
                continue
            n = int(r["N"])
            t = float(r["time_sec"])
            if np.isfinite(t):
                by_n.setdefault(n, []).append(t)
        except (KeyError, TypeError, ValueError):
            continue
    if not by_n:
        raise RuntimeError("No successful runs found.")
    return {n: sorted(v) for n, v in sorted(by_n.items())}


def plot_runtime_boxplot(times_by_n: dict[int, list[float]],
                         out_path: str) -> str:
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.lines import Line2D

    ns = list(times_by_n.keys())
    data = [np.asarray(times_by_n[n], float) for n in ns]

    fig, ax = plt.subplots(figsize=(12, 7))
    ax.boxplot(
        data, vert=True, patch_artist=True, showmeans=True, meanline=True,
        widths=0.6, whis=1.5,
        boxprops=dict(edgecolor="black", linewidth=1.2, facecolor="white"),
        whiskerprops=dict(color="black", linewidth=1.0),
        capprops=dict(color="black", linewidth=1.0),
        medianprops=dict(color="#E67E22", linewidth=1.5),
        meanprops=dict(color="#2ECC71", linewidth=1.5, linestyle="--"),
        flierprops=dict(marker="o", markerfacecolor="none",
                        markeredgecolor="black", alpha=0.35, markersize=5),
    )
    ax.set_xticks(range(1, len(ns) + 1))
    ax.set_xticklabels([str(n) for n in ns])
    ax.set_xlabel("Number of robots N")
    ax.set_ylabel("Computation time per run [s] (log scale)")
    ax.set_title("SCP Computation Time vs Number of Robots")
    ax.set_yscale("log")
    ax.grid(True, which="both", axis="both", linestyle="--", alpha=0.4)
    ax.set_axisbelow(True)
    ax.legend(handles=[
        Line2D([0], [0], color="#E67E22", lw=1.5, label="Median"),
        Line2D([0], [0], color="#2ECC71", lw=1.5, ls="--", label="Mean"),
    ], loc="upper left")

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=400)
    plt.close(fig)
    return out_path


def make_boxplot(data_dir: str, out_path: str) -> str:
    """One-call utility: load -> group -> plot (reference
    plot_runtime_boxplot.py:113-117)."""
    rows = load_rows_from_dir(data_dir)
    return plot_runtime_boxplot(group_times_by_N(rows), out_path)
