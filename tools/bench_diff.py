#!/usr/bin/env python3
"""Per-query bench regression diff.

Usage: python3 tools/bench_diff.py OLD NEW [--threshold 0.3]

OLD/NEW are either a raw graft.Bench JSON line (file or path containing
one) or a driver BENCH_r{N}.json wrapper (whose "tail" embeds the line).
Prints per-query deltas, flagging |delta| > threshold (default 30% — the
box swings ~±20% with load, so compare medians of repeated runs before
believing a flag). Exit code 1 if any regression exceeds the threshold.
"""
import json
import re
import sys


def load(path):
    text = open(path, encoding="utf-8", errors="replace").read()
    # driver wrapper: {"n":..,"tail":"...{json line}\n..."}
    try:
        obj = json.loads(text)
        if "queries" in obj:
            return obj
        text = obj.get("tail", text)
    except json.JSONDecodeError:
        pass
    # find the last {"metric":...} line embedded in the text
    best = None
    for m in re.finditer(r'\{"metric".*?"cpus":\d+\}', text, re.S):
        best = m.group(0)
    if best is not None:
        return json.loads(best)
    # driver tails truncate the FRONT of the line; recover whatever
    # per-query pairs survive before the "errors" map
    head = text.split('"errors"')[0]
    pairs = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"([a-z]\w+)":([0-9.]+)', head)
    )
    if not pairs:
        raise SystemExit(f"{path}: no bench JSON line found")
    sys.stderr.write(
        f"{path}: truncated tail — recovered {len(pairs)} queries, "
        "missing ones report as GONE/NEW\n")
    return {"queries": pairs}


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    old, new = load(argv[0]), load(argv[1])
    oq, nq = old["queries"], new["queries"]
    rows, flagged = [], []
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None or n is None:
            rows.append((name, o, n, None, "NEW" if o is None else "GONE"))
            continue
        delta = (n - o) / o if o > 0 else 0.0
        mark = ""
        if delta > thr:
            mark = "REGRESSED"
            flagged.append(name)
        elif delta < -thr:
            mark = "improved"
        rows.append((name, o, n, delta, mark))
    w = max(len(r[0]) for r in rows)
    for name, o, n, delta, mark in rows:
        os = f"{o:8.3f}" if o is not None else "       -"
        ns = f"{n:8.3f}" if n is not None else "       -"
        ds = f"{delta:+7.1%}" if delta is not None else "       "
        print(f"{name:<{w}}  {os}  {ns}  {ds}  {mark}")
    to = sum(v for v in oq.values())
    tn = sum(v for v in nq.values())
    print(f"{'TOTAL':<{w}}  {to:8.3f}  {tn:8.3f}  {(tn - to) / to:+7.1%}")
    if flagged:
        print(f"\n{len(flagged)} regression(s) over {thr:.0%}: {', '.join(flagged)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
