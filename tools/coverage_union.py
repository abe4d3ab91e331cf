"""Union all three coverage sources and report surviving misses.

Sources: tools/coverage_lines.json (pytest trace + corpus sweep) and
one or more executor-hit files from tools/trace_site (path:line per
record).  Surviving misses are lines no test, no in-process sweep,
and no oracle-gate worker ever executed — true dead-branch candidates.

Usage: python tools/coverage_union.py /tmp/trace_hits_full.txt [...]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.line_coverage import OUT, executable_lines, report  # noqa: E402


def main() -> None:
    with open(OUT) as f:
        data = json.load(f)
    extra: dict[str, set[int]] = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                fn, _, ln = line.rpartition(":")
                extra.setdefault(fn, set()).add(int(ln))
    for fn, hits in extra.items():
        rel = os.path.relpath(fn, ROOT)
        ex = executable_lines(fn) if os.path.exists(fn) else set()
        d = data.setdefault(rel, {"hit": [], "exec": sorted(ex)})
        d["hit"] = sorted(set(d["hit"]) | (hits & set(d["exec"])))
    with open(OUT, "w") as f:
        json.dump(data, f)
    report(data)


if __name__ == "__main__":
    main()
