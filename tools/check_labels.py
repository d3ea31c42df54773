#!/usr/bin/env python
"""NPZ structure inspector: keys, dtypes, value ranges, label histograms,
plus a text report. Equivalent of reference ``check_lables.py``."""

import argparse
import os

import numpy as np


def inspect_npz(path):
    data = np.load(path)
    lines = [f"=== {os.path.basename(path)} ==="]
    for key in data.files:
        arr = data[key]
        lines.append(
            f"  {key}: shape={arr.shape} dtype={arr.dtype} "
            f"min={arr.min():.4f} max={arr.max():.4f}"
        )
        if key in ("label", "segmentation"):
            vals, counts = np.unique(arr, return_counts=True)
            hist = ", ".join(f"{int(v)}: {c}" for v, c in zip(vals, counts))
            lines.append(f"    label histogram: {hist}")
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", default="./datasets/Synapse/train_npz")
    p.add_argument("--num_files", type=int, default=10)
    p.add_argument("--report", default="label_report.txt")
    args = p.parse_args()

    files = sorted(f for f in os.listdir(args.input_dir) if f.endswith(".npz"))
    report = []
    for fname in files[: args.num_files]:
        text = inspect_npz(os.path.join(args.input_dir, fname))
        print(text)
        report.append(text)
    with open(args.report, "w") as f:
        f.write("\n\n".join(report) + "\n")
    print(f"report written to {args.report}")


if __name__ == "__main__":
    main()
