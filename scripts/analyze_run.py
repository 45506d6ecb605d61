"""Summarize a training run's metrics.jsonl for the BENCH_NOTES stability
section: dice trajectory, NaN scan, GradSim score bounds, wall rate.

Usage: python scripts/analyze_run.py <run_dir>
"""
import json
import sys

import numpy as np


def main(run_dir):
    rows = [json.loads(l) for l in open(f"{run_dir}/metrics.jsonl")]
    nan_rows = [r for r in rows
                if any(isinstance(v, float) and not np.isfinite(v)
                       for v in r.values())]
    dice = [(r["step"], r["val_mean_dice"]) for r in rows
            if "val_mean_dice" in r]
    sims = [(r.get("sim_score_mean"), r.get("sim_score_std"),
             r.get("sim_score_absmax")) for r in rows
            if "sim_score_absmax" in r]
    rates = [r["steps_per_sec"] for r in rows if "steps_per_sec" in r]
    print(f"rows: {len(rows)}  non-finite rows: {len(nan_rows)}")
    if dice:
        steps, vals = zip(*dice)
        best_i = int(np.argmax(vals))
        print(f"val evals: {len(dice)}; first {steps[0]}:{vals[0]:.4f}  "
              f"best {steps[best_i]}:{vals[best_i]:.4f}  "
              f"last {steps[-1]}:{vals[-1]:.4f}")
        k = max(1, len(vals) // 5)
        print("trajectory (5 buckets, mean dice):",
              [round(float(np.mean(vals[i:i + k])), 4)
               for i in range(0, len(vals), k)])
    if sims:
        mean, std, mx = map(np.array, zip(*sims))
        print(f"sim_score mean drift {mean[0]:.3f} -> {mean[-1]:.3f}; "
              f"std range [{std.min():.3f},{std.max():.3f}]; "
              f"absmax peak {mx.max():.3f}")
    if rates:
        print(f"steps/s: median {np.median(rates):.2f}  last {rates[-1]:.2f}")


if __name__ == "__main__":
    main(sys.argv[1])
