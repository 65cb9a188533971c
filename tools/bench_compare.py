#!/usr/bin/env python3
"""Spread-aware round-over-round bench diff (dev only). Usage:
    python3 tools/bench_compare.py <old> <new> [--threshold 2.0]
Each arg is either a BENCH_r*.json driver file ({"parsed": {...}}) or a
raw one-line bench JSON ({"metric": "total", ...}) as printed by
graft.Bench. Classifies every per-query move against the threshold —
the triage the bench's interleaved min-of-3 protocol is designed for:
a genuine plan regression moves the min with a small spread; a
co-tenant spike shows up in the spread instead. A slowdown is excused
as noise only when the NEW run's spread can COVER it (spread >= ratio
- 1, i.e. min*(1+spread) reaches the old time); a >threshold speedup
whose OLD-run spread covers it is labeled old-window noise (recovery,
not improvement). Totals are computed over the shared-query
intersection only, so suite growth never masquerades as perf drift.

Exit 1 iff any query slowed past the threshold WITHOUT its spread
covering the move (the "investigate before believing" set).
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
    nspread, ospread = new.get("spread_hi", {}), old.get("spread_hi", {})
    both = sorted(set(qo) & set(qn))
    slower, noisy, faster = [], [], []
    to = tn = 0.0
    for k in both:
        if qo[k] <= 0 or qn[k] < 0:
            continue  # failed in either run: no ratio, and not in totals
        to += qo[k]
        tn += qn[k]
        r = qn[k] / qo[k]
        if r > thr:
            # noise only when the new run's own dispersion can plausibly
            # cover the move: the relative swing across the three passes
            # (spread = (max-min)/min) must be at least as large as the
            # move itself (r-1). spread_hi is truncated to the noisiest
            # 8, so when the query has no per-query entry, fall back to
            # the new run's MEDIAN spread — same fallback the faster
            # path uses for the old run.
            s = nspread.get(k)
            nmed = new.get("spread_med") or 0
            if s is not None and s >= r - 1:
                row = (k, qo[k], qn[k], r, s, "")
                noisy.append(row)
            elif s is None and nmed >= r - 1:
                noisy.append((k, qo[k], qn[k], r, None,
                              f" (new run broadly noisy: spread_med={nmed:.2f})"))
            else:
                slower.append((k, qo[k], qn[k], r, s, ""))
        elif r < 1 / thr:
            # a big speedup whose OLD window's spread covers it is the
            # r8->r9 q02 shape: old-run co-tenant spike + recovery.
            # spread_hi is truncated to the 8 noisiest, so when the
            # query has no per-query entry, a high old-run MEDIAN spread
            # is the remaining (weaker) noise signal.
            s = ospread.get(k)
            omed = old.get("spread_med") or 0
            if s is not None and s >= qo[k] / qn[k] - 1:
                note = " (old-window noise)"
            elif s is None and omed >= 0.3:
                note = f" (old run broadly noisy: spread_med={omed:.2f})"
            else:
                note = ""
            faster.append((k, qo[k], qn[k], r, s, note))
    if to > 0:
        print(f"total {to:.2f}s -> {tn:.2f}s ({tn / to:.3f}x) over {len(both)} shared queries; "
              f"spread_med {old.get('spread_med', -1):.3f} -> {new.get('spread_med', -1):.3f}")
    else:
        print("no shared successful queries — totals skipped")
    # per-pass calibration probe (fixed work, so pure machine-state
    # signal): a loaded window shows up here directly, making co-tenant
    # noise attributable from the artifacts alone
    co, cn = old.get("calib"), new.get("calib")
    if co or cn:
        fmt = lambda c: "[" + ",".join(f"{v:.2f}" for v in c) + "]" if c else "n/a"
        med = lambda c: sorted(c)[len(c) // 2] if c else None
        line = f"calib per pass: {fmt(co)} -> {fmt(cn)}"
        if co and cn and min(med(co), med(cn)) > 0:
            ratio = med(cn) / med(co)
            if ratio > 1.5:
                line += f" — NEW run's machine ~{ratio:.1f}x more loaded; treat its slowdowns skeptically"
            elif ratio < 1 / 1.5:
                line += f" — OLD run's machine ~{1 / ratio:.1f}x more loaded; treat recoveries as noise"
        print(line)
    for title, rows, lbl in [
            (f">{thr}x slower, spread does NOT cover it — investigate", slower, "spread"),
            (f">{thr}x slower, within the new run's spread — likely noise", noisy, "spread"),
            (f">{thr}x faster — recovered or improved", faster, "old_spread")]:
        print(f"{title}:" + ("" if rows else " none"))
        for k, a, b, r, s, note in rows:
            tag = f" {lbl}={s:.2f}" if s is not None else ""
            print(f"  {k}: {a:.2f} -> {b:.2f} ({r:.2f}x){tag}{note}")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print("new queries: " + ", ".join(f"{k}={qn[k]:.2f}s" for k in only_new))
    sys.exit(1 if slower else 0)


if __name__ == "__main__":
    main()
