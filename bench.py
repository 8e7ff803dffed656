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


def run(sf_dir: str | None = None, cpus: int | None = None, quiet: bool = True) -> dict:
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from openie_backend_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cpus}", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs_count = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    qs = entrymod.queries()
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
    extras: dict[str, float] = {}
    for name in suite:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
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
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "docs": docs_count,
        **extras,
    }
    return result


if __name__ == "__main__":
    print(json.dumps(run(quiet="-v" not in sys.argv)))
