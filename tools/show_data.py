#!/usr/bin/env python
"""Offline analysis of per-frame JSONL diagnostics — the replacement for the
reference's ``showData.py`` histogram plots of .dat dumps
(ref: showData.py:1-23, dump hook include/odomEstimationClass.h:96-109).

Reads the *_frames.jsonl written by tools/run_kitti.py / checkpoint.save_trajectory
and prints text histograms + summary stats for any numeric field
(frame time, correspondence counts, map sizes).

  python tools/show_data.py runs/07_run_frames.jsonl --field ms
  python tools/show_data.py runs/07_run_frames.jsonl --field n_surf_corr --bins 30
"""

import argparse
import json

import numpy as np


def text_hist(values: np.ndarray, bins: int = 20, width: int = 60) -> str:
    hist, edges = np.histogram(values, bins=bins)
    top = hist.max() if hist.max() > 0 else 1
    lines = []
    for h, lo, hi in zip(hist, edges[:-1], edges[1:]):
        bar = "#" * int(round(width * h / top))
        lines.append(f"{lo:>12.3f} - {hi:<12.3f} |{bar} {h}")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--field", default="ms")
    ap.add_argument("--bins", type=int, default=20)
    args = ap.parse_args()

    vals = []
    with open(args.jsonl) as f:
        for line in f:
            rec = json.loads(line)
            v = rec.get(args.field)
            if v is None:
                continue
            if isinstance(v, list):
                vals.append(float(np.sum(v)))
            else:
                vals.append(float(v))
    if not vals:
        fields = sorted(json.loads(open(args.jsonl).readline()).keys())
        raise SystemExit(f"field {args.field!r} not found; available: {fields}")
    a = np.asarray(vals)
    print(f"{args.field}: n={len(a)} mean={a.mean():.3f} p50={np.percentile(a, 50):.3f} "
          f"p95={np.percentile(a, 95):.3f} min={a.min():.3f} max={a.max():.3f}")
    print(text_hist(a, bins=args.bins))


if __name__ == "__main__":
    main()
