"""Compare two reference-format result dumps (or a dump vs GT annotations).

Computes the per-frame mean/max 3D joint errors and the threshold curve
between aligned files, e.g. our predictions vs the reference's golden dumps
(/root/reference/exp/result/{icvl,nyu}.txt) — the fidelity check from
BASELINE.md (target <= 0.05 mm mean-joint-error delta once real datasets and
migrated pretrained weights are available).

Usage: python tools/compare_results.py ours.txt theirs.txt
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from densereg_tpu.eval.metrics import summarize_percentages, threshold_curve
from densereg_tpu.eval.writer import read_result_file


def compare(path_a: str, path_b: str, strict_names: bool = True):
    names_a, xyz_a = read_result_file(path_a)
    names_b, xyz_b = read_result_file(path_b)
    if strict_names:
        index_b = {n: i for i, n in enumerate(names_b)}
        missing = [n for n in names_a if n not in index_b]
        if missing:
            raise ValueError(f"{len(missing)} frames of {path_a} absent from "
                             f"{path_b} (first: {missing[0]!r})")
        xyz_b = xyz_b[[index_b[n] for n in names_a]]
    if xyz_a.shape != xyz_b.shape:
        raise ValueError(f"shape mismatch {xyz_a.shape} vs {xyz_b.shape}")

    d = (xyz_a - xyz_b).reshape(len(xyz_a), -1, 3)
    dist = np.linalg.norm(d, axis=-1)
    return {
        "frames": len(xyz_a),
        "mean_joint_error_mm": float(dist.mean()),
        "max_joint_error_mm": float(dist.max()),
        "per_frame_max": dist.max(axis=1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--curve_out", default=None)
    ap.add_argument("--max_mean_delta", type=float, default=None,
                    help="exit nonzero when the mean joint error exceeds "
                         "this many mm (the golden-parity gate: 0.05)")
    args = ap.parse_args()
    rep = compare(args.ours, args.theirs)
    print(f"frames: {rep['frames']}")
    print(f"mean 3D joint error: {rep['mean_joint_error_mm']:.4f} mm")
    print(f"max  3D joint error: {rep['max_joint_error_mm']:.4f} mm")
    print("fraction within tau:", summarize_percentages(rep["per_frame_max"]))
    if args.curve_out:
        from densereg_tpu.eval.writer import write_error_curve
        write_error_curve(rep["per_frame_max"].tolist(), args.curve_out)
        print(f"curve -> {args.curve_out}")
    if (args.max_mean_delta is not None
            and rep["mean_joint_error_mm"] > args.max_mean_delta):
        print(f"FAIL: {rep['mean_joint_error_mm']:.4f} mm > "
              f"{args.max_mean_delta} mm gate")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
