#!/usr/bin/env python3
"""Spread-aware round-over-round bench diff (dev only). Usage:
    python3 tools/bench_compare.py <old> <new> [--threshold 2.0]
Each arg is either a BENCH_r*.json driver file ({"parsed": {...}}) or a
raw one-line bench JSON ({"metric": "total", ...}) as printed by
graft.Bench. Classifies every per-query move against the threshold,
using the NEW run's spread_hi dispersion to tag noisy windows — the
same triage the bench's interleaved min-of-3 protocol is designed for:
a genuine plan regression moves the min with a small spread; a
co-tenant spike shows up in the spread instead.

Exit 1 iff any query slowed past the threshold WITHOUT being
spread-flagged (the "investigate before believing" set).
"""
import json, sys


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # driver file (possibly pretty-printed, wraps the line under
    # "parsed") or a raw single-line bench print
    try:
        doc = json.loads(txt)
        return doc.get("parsed", doc)
    except json.JSONDecodeError:
        pass
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"'):
            doc = json.loads(line)
            return doc.get("parsed", doc)
    raise SystemExit(f"no JSON object found in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 2.0
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    qo, qn = old["queries"], new["queries"]
    spread = new.get("spread_hi", {})
    both = sorted(set(qo) & set(qn))
    slower, noisy, faster = [], [], []
    for k in both:
        if qo[k] <= 0 or qn[k] < 0:
            continue
        r = qn[k] / qo[k] if qo[k] else float("inf")
        row = (k, qo[k], qn[k], r, spread.get(k))
        if r > thr:
            (noisy if k in spread else slower).append(row)
        elif r < 1 / thr:
            faster.append(row)
    to = sum(v for v in qo.values() if v > 0)
    tn = sum(v for v in qn.values() if v > 0)
    print(f"total {to:.2f}s -> {tn:.2f}s ({tn / to:.3f}x); "
          f"spread_med {old.get('spread_med', -1):.3f} -> {new.get('spread_med', -1):.3f}")
    for title, rows in [(f">{thr}x slower, NOT spread-flagged — investigate", slower),
                        (f">{thr}x slower but spread-flagged — likely noise", noisy),
                        (f">{thr}x faster — recovered or improved", faster)]:
        print(f"{title}:" + ("" if rows else " none"))
        for k, a, b, r, s in rows:
            tag = f" spread={s:.2f}" if s is not None else ""
            print(f"  {k}: {a:.2f} -> {b:.2f} ({r:.2f}x){tag}")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print("new queries: " + ", ".join(f"{k}={qn[k]:.2f}s" for k in only_new))
    sys.exit(1 if slower else 0)


if __name__ == "__main__":
    main()
