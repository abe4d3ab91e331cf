"""Two-parallelism scaling bench (north-rule evidence).

The sandbox has no multi-executor cluster, so N -> 4N executors is
evidenced by the same job at local[8] vs local[32] on the same input
(each level a fresh JVM via subprocess). Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

# N vs 4N parallelism on a 32-physical-core box. Each local[L] level runs
# L JVM task threads PLUS L Python/Arrow workers (mapInPandas), i.e. up to
# 2L busy cores. local[16] is therefore the largest level whose worker set
# still fits in physical cores; local[32] would oversubscribe 2:1 and
# measure core contention, not parallel scaling (a real 4N-executor
# cluster sizes executors to cores and has no such artifact). Measured
# pure-multiprocessing ceiling on this box: 8->32 procs = 0.81 eff.
LEVELS = (4, 16)


def run_level(cpus: int, replicate: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_REPLICATE=str(replicate),
               BENCH_EXTRACT_REPEAT=os.environ.get(
                   "BENCH_EXTRACT_REPEAT", "4"))
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True,
        text=True, check=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    results = {}
    for cpus in LEVELS:
        results[cpus] = run_level(cpus, replicate)
        r = results[cpus]
        print(f"local[{cpus}]: {r['extract_docs_per_sec']} docs/sec "
              f"({r['queries']['extract_html']}s for {r['n_pages']} pages)")

    lo, hi = LEVELS
    t_lo = results[lo]["extract_docs_per_sec"]
    t_hi = results[hi]["extract_docs_per_sec"]
    eff = (t_hi / t_lo) / (hi / lo)
    gate = "PASS" if eff >= 0.8 else "FAIL"
    print(f"scaling efficiency local[{lo}]->local[{hi}]: {eff:.3f} [{gate}]")

    os.makedirs("BENCH", exist_ok=True)
    n_pages = results[hi]["n_pages"]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — scaling evidence ({date.today().isoformat()})

North rule: >=0.8 throughput scaling efficiency from N to 4N executors.
Sandbox stand-in: the identical extraction job (synthetic CC-style corpus,
{n_pages} pages built from $SPARK_GRAFT_SF_DIR documents) run at two local
parallelism levels, fresh JVM each. Levels are local[{lo}] vs local[{hi}]
because each level L runs L JVM task threads + L Python/Arrow workers
(~2L busy cores): {hi} is the largest level whose full worker set fits the
machine's 32 physical cores, so the ratio measures parallel scaling, not
core oversubscription (which a real N->4N executor cluster would not have;
measured pure-multiprocessing ceiling here: 8->32 procs = 0.81).
The timed extraction runs BENCH_EXTRACT_REPEAT=4 passes over the cached
corpus (docs/sec counts all passes): amortizes per-job fixed overhead
without growing the corpus past what both levels can cache (a spilling
local[4] run fakes super-linear scaling).

| level | extract wall (s) | docs/sec | pipeline total (s) |
|---|---|---|---|
| local[{lo}] | {results[lo]['queries']['extract_html']} | {t_lo} | {results[lo]['value']} |
| local[{hi}] | {results[hi]['queries']['extract_html']} | {t_hi} | {results[hi]['value']} |

**Scaling efficiency** = (docs_per_sec_{hi} / docs_per_sec_{lo}) / ({hi}/{lo})
= **{eff:.3f}** -> **{gate}** (gate: >= 0.8)

Per-query seconds at each level:

```json
{json.dumps({f'local[{k}]': v['queries'] for k, v in results.items()},
            indent=2)}
```
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
