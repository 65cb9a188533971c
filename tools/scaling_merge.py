#!/usr/bin/env python3
"""Merge two graft.Bench JSON lines (small SF, big SF) into the
cross-SF scaling artifact: per-query small/big seconds + ratio, suite
totals, median ratio, and both runs' calibration probes. Usage:
    python3 tools/scaling_merge.py <small.json> <big.json>
Writes the merged JSON to stdout — check it in as SCALING_r{N}.json so
rounds can diff per-query scaling instead of re-deriving it from
prose.
"""
import json
import sys

from bench_compare import load  # same loader: raw bench lines AND driver files


def median(xs):
    """Averaged even-count median — same definition Bench.scala uses
    for spread_med, so the two artifacts' medians are comparable."""
    n = len(xs)
    return xs[n // 2] if n % 2 == 1 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    small, big = load(sys.argv[1]), load(sys.argv[2])
    qs, qb = small["queries"], big["queries"]
    # totals over the SHARED successful pairs only — a query present in
    # one run but not the other (suite growth, or a failure) must not
    # skew the headline ratio
    queries, ratios = {}, []
    ts = tb = 0.0
    for k in sorted(set(qs) & set(qb)):
        s, b = qs[k], qb[k]
        if s <= 0 or b < 0:
            queries[k] = {"small": s, "big": b, "ratio": None}
            continue
        r = round(b / s, 3)
        queries[k] = {"small": s, "big": b, "ratio": r}
        ratios.append(r)
        ts += s
        tb += b
    ratios.sort()
    out = {
        "sf_small": small.get("sf"), "sf_big": big.get("sf"),
        "total_small": round(ts, 3), "total_big": round(tb, 3),
        "total_ratio": round(tb / ts, 3) if ts > 0 else None,
        "median_ratio": round(median(ratios), 3) if ratios else None,
        "n_queries": len(queries),
        "spread_med_small": small.get("spread_med"),
        "spread_med_big": big.get("spread_med"),
        "calib_small": small.get("calib"), "calib_big": big.get("calib"),
        "queries": queries,
    }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
