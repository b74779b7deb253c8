#!/usr/bin/env python3
"""Regenerate PLANS.md from `runMain graft.Explain all` output.

Usage: sbt -batch "runMain graft.Explain all" > /tmp/explain.txt 2>&1
       python3 tools/gen_plans.py /tmp/explain.txt > PLANS.md

Keeps only the plan TREE of each query's formatted explain (the shape a
reviewer needs to judge shuffle/broadcast/pushdown structure); run
Explain for per-node detail (PushedFilters, ReadSchema).
"""
import re
import sys

HEADER = """# PLANS — physical plan trees at sf0.001

Auto-generated (`runMain graft.Explain all` | `tools/gen_plans.py`).
Tree section only — the shape a reviewer needs to judge shuffle/
broadcast/pushdown structure; run Explain for per-node detail
(PushedFilters, ReadSchema).
"""


def main(path):
    raw = open(path, encoding="utf-8", errors="replace").read()
    # strip sbt's [info] prefixes; drop [error]-routed log noise
    lines = []
    for ln in raw.splitlines():
        if ln.startswith("[info] "):
            lines.append(ln[7:])
        elif ln.startswith("[info]"):
            lines.append(ln[6:])
        elif not ln.startswith(("[error]", "[warn]", "[success]")):
            lines.append(ln)
    text = "\n".join(lines)
    sections = re.split(r"={6,} (\S+) ={6,}\n", text)
    out = [HEADER]
    # sections: [prefix, name1, body1, name2, body2, ...]
    for name, body in sorted(zip(sections[1::2], sections[2::2])):
        m = re.search(r"== Physical Plan ==\n(.*?)(?:\n\n|\n\(1\) )", body, re.S)
        if not m:
            continue
        tree = m.group(1).rstrip()
        out.append(f"\n## {name}\n\n```\n{tree}\n```\n")
    sys.stdout.write("".join(out))


if __name__ == "__main__":
    main(sys.argv[1])
