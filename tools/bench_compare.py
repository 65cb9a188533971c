#!/usr/bin/env python3
"""Spread-aware round-over-round bench diff (dev only). Usage:
    python3 tools/bench_compare.py <old> <new> [--threshold 2.0]
Each arg is either a BENCH_r*.json driver file ({"parsed": {...}}) or a
raw one-line bench JSON ({"metric": "total", ...}) as printed by
graft.Bench. Classifies every per-query move against the threshold —
the triage the bench's interleaved min-of-3 protocol is designed for:
a genuine plan regression moves the min with a small spread; a
co-tenant spike shows up in the spread instead.

Dispersion evidence, in order of strength:
  - a per-query spread in spread_hi (noisiest-first, as many as fit the
    line budget): the move is noise iff spread >= |move|, i.e.
    min*(1+spread) reaches the other run's time;
  - spread_floor (new format): a query ABSENT from spread_hi is proven
    to have spread <= floor, so floor < |move| rules noise OUT
    definitively, while floor >= |move| leaves it open (noted, but the
    query stays in the investigate set — ambiguity is not an excuse);
  - the suite-wide spread_med (old format only): LABEL-ONLY. It
    annotates a move as plausibly noise but never removes it from the
    exit-affecting set in either direction's classification.
The same coverage rule applies symmetrically: a slowdown is judged
against the NEW run's dispersion, a speedup against the OLD run's
(old-window spike + recovery, not improvement). Totals run over the
shared-query intersection only, so suite growth never masquerades as
perf drift.

Exit 1 iff any query slowed past the threshold without a per-query
spread that covers the move.
"""
import json, sys


def _expand_qspec(spec):
    """Expand the round-14 range-compressed id spec: "b01-b43 d80 q01-q38"
    -> ["b01", ..., "b43", "d80", "q01", ..., "q38"]. A token without a
    dash is a literal id; zero-padding width follows the range start."""
    import re
    ids = []
    for tok in spec.split():
        m = re.fullmatch(r"([a-z]+)(\d+)-\1(\d+)", tok)
        if m:
            fam, a, b = m.group(1), m.group(2), m.group(3)
            for n in range(int(a), int(b) + 1):
                ids.append(f"{fam}{n:0{len(a)}d}")
        else:
            ids.append(tok)
    return ids


def _normalize(doc):
    """Accept all three bench line formats: the legacy "queries" seconds
    map, the compact round-12 form (qk = space-joined short ids,
    qv_cs = centisecond ints; -100 marks a failed query, the old -1.0s),
    and the round-14 form (qspec = range-compressed ids, qv36 =
    concatenated fixed-width 3-char base36 centiseconds; "___" marks a
    failed query, "zzz" a CLAMPED time — genuinely >= 466.55s, exact
    value lost; genuine encodes stop at "zzy"). Always returns a doc
    with a "queries" seconds map plus a "clamped" id set."""
    if "queries" not in doc and "qspec" in doc and "qv36" in doc:
        ids = _expand_qspec(doc["qspec"])
        raw = doc["qv36"]
        assert len(raw) == 3 * len(ids), \
            f"qv36 length {len(raw)} != 3 x {len(ids)} ids"
        vals = [raw[i * 3:i * 3 + 3] for i in range(len(ids))]
        doc = dict(doc)
        doc["queries"] = {
            k: (-1.0 if v == "___" else int(v, 36) / 100.0)
            for k, v in zip(ids, vals)}
        doc["clamped"] = {k for k, v in zip(ids, vals) if v == "zzz"}
    elif "queries" not in doc and "qk" in doc and "qv_cs" in doc:
        ids = doc["qk"].split()
        doc = dict(doc)
        doc["queries"] = {k: v / 100.0 for k, v in zip(ids, doc["qv_cs"])}
    return doc


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # driver file (possibly pretty-printed, wraps the line under
    # "parsed") or a raw single-line bench print
    try:
        doc = json.loads(txt)
        return _normalize(doc.get("parsed", doc))
    except json.JSONDecodeError:
        pass
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"'):
            doc = json.loads(line)
            return _normalize(doc.get("parsed", doc))
    raise SystemExit(f"no JSON object found in {path}")


def dispersion_note(run, k, move, which):
    """Can `run`'s dispersion cover a relative `move` (= ratio - 1) for
    query `k`? `which` is "new" (a slowdown judged against the new
    run's window) or "old" (a speedup judged against the old run's —
    where coverage means recovery, not improvement). Returns
    (covered, (tag, note)). `covered` is definitive only when a
    per-query spread exists; floor/median evidence is label-only
    (covered=False) so it never excuses a move from the exit gate."""
    lbl = "spread" if which == "new" else "old_spread"
    s = run.get("spread_hi", {}).get(k)
    if s is not None:
        return s >= move, (f" {lbl}={s:.2f}", "")
    floor = run.get("spread_floor")
    if floor is not None:
        if floor < move:
            return False, ("", "")  # spread <= floor < move: definitively not dispersion
        hint = ("could cover; investigate" if which == "new"
                else "could be old-window noise")
        return False, ("", f" ({lbl} unknown <= floor={floor:.2f} — {hint})")
    med = run.get("spread_med") or 0
    if med >= move:
        return False, ("", f" ({which} run broadly noisy: spread_med={med:.2f} — label only)")
    return False, ("", "")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 2.0
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    qo, qn = old["queries"], new["queries"]
    both = sorted(set(qo) & set(qn))
    slower, noisy, faster = [], [], []
    to = tn = 0.0
    clamped_old = old.get("clamped", set())
    clamped_new = new.get("clamped", set())
    for k in both:
        if qo[k] <= 0 or qn[k] < 0:
            continue  # failed in either run: no ratio, and not in totals
        to += qo[k]
        tn += qn[k]
        r = qn[k] / qo[k]
        if k in clamped_new:
            # a clamped new time is a lower bound: the regression is AT
            # LEAST r, dispersion can never excuse it
            slower.append((k, qo[k], qn[k], r,
                           " CLAMPED>=466.55s (ratio is a lower bound)", ""))
            continue
        if k in clamped_old and r < 1 / thr:
            faster.append((k, qo[k], qn[k], r,
                           " (old value clamped: true speedup is larger)", ""))
            continue
        if k in clamped_old and r > thr:
            # symmetric to the faster branch: a clamped OLD time means
            # the true old value is >= the clamp, so the computed ratio
            # only UPPER-bounds the regression — annotate rather than
            # report it as an exact slowdown. Dispersion still gets
            # first say (same as the unclamped r > thr path below): a
            # move the new run's own spread covers is noise whether or
            # not the old value was clamped.
            covered, (tag, note) = dispersion_note(new, k, r - 1, "new")
            tag += " (old value clamped: ratio is an upper bound)"
            (noisy if covered else slower).append((k, qo[k], qn[k], r, tag, note))
            continue
        if r > thr:
            covered, (tag, note) = dispersion_note(new, k, r - 1, "new")
            (noisy if covered else slower).append((k, qo[k], qn[k], r, tag, note))
        elif r < 1 / thr:
            covered, (tag, note) = dispersion_note(old, k, qo[k] / qn[k] - 1, "old")
            if covered:
                note = " (old-window noise)"
            faster.append((k, qo[k], qn[k], r, tag, note))
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
        # WITHIN-run dispersion: the probe's work never changes, so
        # uneven per-pass times mean some passes ran loaded — min-of-3
        # floors are inflated for every query whose fast pass missed the
        # quiet window, which shows up as a broad low-amplitude drift
        # cohort (the r10 shape: calib [0.10,0.29,0.30]).
        for label, c in (("OLD", co), ("NEW", cn)):
            if c and min(c) > 0 and max(c) / min(c) > 1.5:
                print(f"  {label} run's passes unevenly loaded "
                      f"(calib max/min {max(c) / min(c):.1f}x): "
                      f"min-of-3 floors inflated; expect broad small drifts")
    for title, rows in [
            (f">{thr}x slower, spread does NOT cover it — investigate", slower),
            (f">{thr}x slower, within the new run's spread — likely noise", noisy),
            (f">{thr}x faster — recovered or improved", faster)]:
        print(f"{title}:" + ("" if rows else " none"))
        for k, a, b, r, tag, note in rows:
            print(f"  {k}: {a:.2f} -> {b:.2f} ({r:.2f}x){tag}{note}")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print("new queries: " + ", ".join(f"{k}={qn[k]:.2f}s" for k in only_new))
    sys.exit(1 if slower else 0)


if __name__ == "__main__":
    main()
