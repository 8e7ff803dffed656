"""Two-parallelism scaling benchmark (north rule evidence): run the
identical bench suite at local[N] and local[4N] on the same input and
report throughput at both plus scaling efficiency → BENCH/BASELINE.md.

Each level runs in its own subprocess (fresh JVM — no warm-cache
bleed between levels).

Usage: python scripts/scaling_bench.py [sf_dir] [N]   (default N=8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    lo = run_level(sf_dir, n)
    hi = run_level(sf_dir, 4 * n)

    # efficiency on the parallelizable work: suite wall time ratio.
    # throughput(cpus) = docs / suite_seconds
    thr_lo = lo["docs"] / lo["value"]
    thr_hi = hi["docs"] / hi["value"]
    eff = thr_hi / (4 * thr_lo)

    kg_lo = lo["docs"] / lo["queries"]["kg_spo"]
    kg_hi = hi["docs"] / hi["queries"]["kg_spo"]
    kg_eff = kg_hi / (4 * kg_lo)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write(
            f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Same job, same input ({sf_dir}), two parallelism levels (fresh JVM per
level), per the north rule's N → 4N criterion evidenced via local[K].

| level | cpus | suite sec | suite docs/s | kg_spo sec | kg docs/s | kg triples/h |
|---|---|---|---|---|---|---|
| N  | {n} | {lo['value']} | {thr_lo:.1f} | {lo['queries']['kg_spo']} | {kg_lo:.1f} | {lo['kg_triples_per_hour']:.0f} |
| 4N | {4 * n} | {hi['value']} | {thr_hi:.1f} | {hi['queries']['kg_spo']} | {kg_hi:.1f} | {hi['kg_triples_per_hour']:.0f} |

- **suite scaling efficiency (N→4N)** = throughput(4N) / (4 × throughput(N)) = **{eff:.3f}**
- **kg pipeline scaling efficiency** = **{kg_eff:.3f}**

Caveats: local[K] shares one JVM/heap and the OS page cache, and the
sandbox box has {os.cpu_count()} physical cores — at N={n}, 4N={4 * n}
saturates the machine, so these numbers UNDER-state multi-executor
scaling (per-stage fixed overheads — Python worker fork, query
planning, small-file scan setup — do not shrink with K). Per-query
timings:

```json
{json.dumps({"N": lo, "4N": hi}, indent=2)}
```
"""
        )
    print(json.dumps({"eff_suite": round(eff, 3), "eff_kg": round(kg_eff, 3),
                      "N_sec": lo["value"], "4N_sec": hi["value"], "out": path}))


if __name__ == "__main__":
    main()
