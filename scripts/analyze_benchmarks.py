#!/usr/bin/env python
"""Benchmark analysis + comparison plots — the analog of the reference's
``viz_nbody.ipynb`` (single cell: load ';' CSVs, emit log-log comparison
plots into performance_plots_comparison/).

Reads any number of CSVs in the shared schema (ours from
scripts/perf_benchmark.py, or the reference's committed combined_*.csv) and
writes elapsed-time / steps-per-second / time-per-point / GFLOPS comparison
plots.

Example (compare this framework against the reference's committed results):
    python scripts/analyze_benchmarks.py results.csv \
        /root/reference/combined_nbody_man_opt.csv \
        --names tpu manual-bh --out plots/
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

COLUMNS = [
    "file_name", "cpu_count", "num_points", "measurement", "unit",
    "task_name", "percentage", "run_time", "variance", "metric",
    "metric_unit",
]


def load_csv(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, sep=";", header=None, names=COLUMNS,
                     na_values=["<not counted>", "<not supported>"])
    df["num_points"] = pd.to_numeric(df["num_points"], errors="coerce")
    df["cpu_count"] = pd.to_numeric(df["cpu_count"], errors="coerce")
    df["measurement"] = pd.to_numeric(df["measurement"], errors="coerce")
    df["run_time"] = pd.to_numeric(df["run_time"], errors="coerce")
    return df


def wall_times(df: pd.DataFrame) -> pd.DataFrame:
    """Per (cpu_count, num_points): wall seconds from the task-clock rows
    (task-clock msec / CPUs-utilized metric when present)."""
    tc = df[df["task_name"] == "task-clock"].copy()
    util = pd.to_numeric(tc["metric"], errors="coerce").fillna(1.0)
    tc["wall_s"] = tc["measurement"] / 1e3 / util.clip(lower=1e-9)
    return tc.groupby(["cpu_count", "num_points"])["wall_s"].mean().reset_index()


def best_wall(df: pd.DataFrame) -> pd.DataFrame:
    """Best (min) wall time over cpu_count per N."""
    w = wall_times(df)
    return w.groupby("num_points")["wall_s"].min().reset_index()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=1000,
                    help="steps per run (1000 in both harnesses)")
    ap.add_argument("--out", default="performance_plots_comparison")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = args.names or [os.path.splitext(os.path.basename(c))[0] for c in args.csvs]
    series = {}
    for name, path in zip(names, args.csvs):
        series[name] = best_wall(load_csv(path))

    os.makedirs(args.out, exist_ok=True)

    def plot(y_fn, ylabel, fname, logy=True):
        fig, ax = plt.subplots(figsize=(7, 5))
        for name, w in series.items():
            x = w["num_points"].to_numpy()
            y = y_fn(w)
            ax.plot(x, y, "o-", label=name)
        ax.set_xscale("log")
        if logy:
            ax.set_yscale("log")
        ax.set_xlabel("N particles")
        ax.set_ylabel(ylabel)
        ax.grid(True, which="both", alpha=0.3)
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, fname), dpi=120)
        plt.close(fig)

    plot(lambda w: w["wall_s"], "elapsed time (s, 1000 steps)", "elapsed_time.png")
    plot(lambda w: args.steps / w["wall_s"], "steps / second", "steps_per_second.png")
    plot(lambda w: w["wall_s"] / w["num_points"] * 1e6,
         "time per point (µs per step·point... per run)", "time_per_point.png")
    print(f"wrote plots to {args.out}/")


if __name__ == "__main__":
    main()
