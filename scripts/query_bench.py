"""Serving-path latency benchmark — the analog of the reference's
``IndexBenchmarker`` (``backend/.../benchmark/IndexBenchmarker.scala:
27-118``): random conjunctive queries over the six field-mask shapes
(arg1 / rel / arg2 / arg1+rel / rel+arg2 / arg1+arg2), reporting total
and average latency against the materialized group table.

Usage: python scripts/query_bench.py [work_dir] [n_queries]
(work_dir defaults to a synthetic corpus pipeline run under /tmp).
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")

from openie_backend_spark.operators.query import QuerySpec, fetch_groups
from openie_backend_spark.session import get_spark


def main():
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark(app_name="query-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if len(sys.argv) > 1:
        groups = spark.read.parquet(sys.argv[1])
    else:
        import glob

        from openie_backend_spark import synth
        from openie_backend_spark.operators.extract import extract_pages
        from openie_backend_spark.operators.group import group_extractions
        from openie_backend_spark.operators.link import link_groups

        synth.write_corpus("/tmp/qbench_corpus", n_pages=400)
        pages = spark.read.parquet("/tmp/qbench_corpus/pages.parquet")
        dims = {p.split("/")[-1][:-8]: spark.read.parquet(p)
                for p in glob.glob("/tmp/qbench_corpus/dim_*.parquet")}
        groups = link_groups(group_extractions(extract_pages(pages)), dims)
        groups = groups.cache()
        groups.count()

    vocab_rows = groups.select("arg1_norm", "rel_norm", "arg2_norm").collect()
    rng = random.Random(42)
    shapes = ["arg1", "rel", "arg2", "arg1+rel", "rel+arg2", "arg1+arg2"]
    lat: dict[str, list[float]] = {s: [] for s in shapes}
    for i in range(n_queries):
        row = vocab_rows[rng.randrange(len(vocab_rows))]
        shape = shapes[i % len(shapes)]
        spec = QuerySpec(
            arg1=row["arg1_norm"] if "arg1" in shape else None,
            rel=row["rel_norm"] if "rel" in shape else None,
            arg2=row["arg2_norm"] if "arg2" in shape.replace("arg1", "") else None,
            stem=False,
        )
        t0 = time.time()
        fetch_groups(groups, spec).collect()
        lat[shape].append(time.time() - t0)

    out = {
        "n_queries": n_queries,
        "avg_ms": round(1000 * sum(sum(v) for v in lat.values()) / n_queries, 1),
        "per_shape_avg_ms": {
            s: round(1000 * sum(v) / max(len(v), 1), 1) for s, v in lat.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
