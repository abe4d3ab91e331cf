"""Driver-side line coverage for ragflow_spark via sys.settrace.

No coverage.py in this environment, so this installs a minimal trace
collector filtered to ragflow_spark/ and runs pytest in-process, then
reports executable-but-never-hit lines per module.  Executor-side code
(functions shipped into Spark python workers) is NOT traced — treat
its lines as "unknown", not dead; the report marks files whose names
suggest worker-side entry points.

Usage:
    python tools/line_coverage.py [pytest-args...]   # default: tests/ -q
    python tools/line_coverage.py --report cov.json  # re-report only

Output: tools/coverage_lines.json  {file: {"hit": [...], "exec": [...]}}
and a per-file summary of missed runs on stdout.
"""

from __future__ import annotations

import dis
import json
import os
import sys
import types

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "ragflow_spark")
OUT = os.path.join(ROOT, "tools", "coverage_lines.json")

_hits: dict[str, set[int]] = {}


def _local_trace(frame, event, arg):
    if event == "line":
        _hits[frame.f_code.co_filename].add(frame.f_lineno)
    return _local_trace


def _global_trace(frame, event, arg):
    fn = frame.f_code.co_filename
    if not fn.startswith(PKG):
        return None
    _hits.setdefault(fn, set())
    if event == "call":
        return _local_trace
    return None


def executable_lines(path: str) -> set[int]:
    with open(path, "r", encoding="utf-8") as f:
        src = f.read()
    try:
        code = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _off, ln in dis.findlinestarts(co):
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return lines


def run(pytest_args: list[str]) -> None:
    import pytest

    sys.settrace(_global_trace)
    try:
        pytest.main(pytest_args or ["tests/", "-q", "-p", "no:cacheprovider"])
    finally:
        sys.settrace(None)

    data = {}
    for dirpath, _dirs, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            ex = executable_lines(path)
            hit = _hits.get(path, set()) & ex
            data[os.path.relpath(path, ROOT)] = {
                "hit": sorted(hit), "exec": sorted(ex)}
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(data, f)
    report(data)


def report(data: dict) -> None:
    print("\n== missed executable lines (runs) ==")
    for rel in sorted(data):
        d = data[rel]
        ex, hit = set(d["exec"]), set(d["hit"])
        missed = sorted(ex - hit)
        if not ex:
            continue
        pct = 100.0 * len(hit) / len(ex)
        runs = []
        for ln in missed:
            if runs and ln - runs[-1][1] <= 1:
                runs[-1][1] = ln
            else:
                runs.append([ln, ln])
        spans = ",".join(f"{a}" if a == b else f"{a}-{b}" for a, b in runs)
        print(f"{pct:5.1f}%  {rel}  missed[{len(missed)}]: {spans[:400]}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--report":
        with open(sys.argv[2]) as f:
            report(json.load(f))
    else:
        run(sys.argv[1:])
