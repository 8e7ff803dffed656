"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the KG-construction pipeline (extract → filter → group →
SPO) over the documents table treated as pages — the engine's reason
to exist — plus the heavier analytics operators (minhash-LSH dedup,
brute-force ANN, grouped agg, windowed cap). ``value`` is total wall
seconds across the suite; throughput derivatives (docs/sec,
triples/hour) ride alongside for BASELINE.md's scaling comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time


def tree_cpu_seconds() -> float:
    """user+sys CPU seconds of this process and ALL live descendants
    (the local-mode JVM and its forked pyspark worker daemons), read
    from /proc. Per-query deltas give a bandwidth-insensitive
    complement to wall time: co-tenant storms inflate wall but not
    this tree's CPU, and CPython NLP cost shows up here even though
    it runs outside Spark's JVM task metrics."""
    clk = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, float]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            # utime+stime of the process PLUS cutime/cstime of its
            # reaped children: when Spark recycles an idle python
            # worker between two samples, its accumulated CPU migrates
            # into the daemon's cutime instead of vanishing — without
            # this, a query's delta could go NEGATIVE by the dead
            # worker's whole lifetime CPU
            procs[int(pid)] = (
                int(parts[1]),
                (int(parts[11]) + int(parts[12])
                 + int(parts[13]) + int(parts[14])) / clk,
            )
        except (OSError, IndexError, ValueError):
            continue
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack, seen = 0.0, [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += procs.get(p, (0, 0.0))[1]
        stack.extend(children.get(p, []))
    return total


_CGROUP_CPU_FILES = (
    ("/sys/fs/cgroup/cpuacct/cpuacct.usage", 1e9),       # v1: nanoseconds
    ("/sys/fs/cgroup/cpu.stat", 1e6),                    # v2: usage_usec
    ("/sys/fs/cgroup/unified/cpu.stat", 1e6),            # hybrid mount
)


def cgroup_cpu_seconds() -> float | None:
    """Container-wide CPU seconds from the cgroup controller — the
    monotonic complement to `tree_cpu_seconds`: dead/orphaned pyspark
    workers stay counted (the tree walk can LOSE a live worker's CPU
    when its daemon dies before reaping it → negative deltas), at the
    cost of including the VM's background processes (~2 % here)."""
    for path, scale in _CGROUP_CPU_FILES:
        try:
            with open(path) as fh:
                txt = fh.read()
        except OSError:
            continue
        if path.endswith("cpu.stat"):
            for line in txt.splitlines():
                if line.startswith("usage_usec"):
                    return int(line.split()[1]) / scale
            continue
        return int(txt.strip()) / scale
    return None


def _tagger_label() -> str:
    from openie_backend_spark.nlp import perceptron

    return "perceptron" if perceptron.get_tagger() is not None else "rule"


def run(sf_dir: str | None = None, cpus: int | None = None, quiet: bool = True) -> dict:
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from openie_backend_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cpus}", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs_count = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    # g1_group_agg lives in extra_queries() (outside the driver's
    # 50-row correctness window) but stays a bench tell for round-over-
    # round comparability
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    suite = [
        "kg_spo",              # full pipeline: extract+filter+group+materialize
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "ann_bruteforce",
        "g1_group_agg",
        "t9_per_key_cap",
        "j3_broadcast_dim",
        "txt_quality",
    ]
    timings: dict[str, float] = {}
    cpu: dict[str, float] = {}
    cg: dict[str, float] = {}
    extras: dict[str, float] = {}
    for name in suite:
        t0 = time.time()
        c0 = tree_cpu_seconds()
        g0 = cgroup_cpu_seconds()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        # floored at 0: the tree walk loses a worker's lifetime CPU if
        # its daemon dies unreaped mid-query; cgroup_cpu carries the
        # monotonic truth alongside
        cpu[name] = round(max(tree_cpu_seconds() - c0, 0.0), 3)
        if g0 is not None:
            cg[name] = round(cgroup_cpu_seconds() - g0, 3)
        timings[name] = round(dt, 3)
        if name == "kg_spo":
            extras["kg_triples"] = n
            extras["kg_docs_per_sec"] = round(docs_count / dt, 1)
            extras["kg_triples_per_hour"] = round(n / dt * 3600, 0)
        if not quiet:
            print(f"  {name}: {n} rows in {dt:.1f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline suite wall time (KG pipeline + dedup/ANN/agg operators)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cpu_seconds": cpu,
        "cpu_total": round(sum(cpu.values()), 3),
        **({"cgroup_cpu_seconds": cg,
            "cgroup_cpu_total": round(sum(cg.values()), 3)} if cg else {}),
        # derived from what actually loads, not the env var: with model
        # files absent get_tagger() falls back to the rule path and the
        # record must say so (ADVICE r4)
        "tagger": _tagger_label(),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "docs": docs_count,
        **extras,
    }
    return result


if __name__ == "__main__":
    print(json.dumps(run(quiet="-v" not in sys.argv)))
