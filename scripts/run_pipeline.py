"""spark-submit entry point for the KG-construction pipeline.

    zip -r openie_backend_spark.zip openie_backend_spark/
    spark-submit --master local[32] \\
        --py-files openie_backend_spark.zip \\
        scripts/run_pipeline.py \\
        --pages /path/pages.parquet --dims /path/dims_dir \\
        --out /path/workdir [--typer] [--corpus cc]

On a cluster, swap --master and add executor confs; the session
factory's AQE/Arrow settings apply via --conf spark.* as usual. The
run is resumable: re-submitting with the same --out skips completed
stages (per-stage manifest with per-partition counters).
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet path")
    ap.add_argument("--dims", default=None, help="dir with dim_*.parquet")
    ap.add_argument("--out", required=True, help="work/output dir")
    ap.add_argument("--corpus", default="cc")
    ap.add_argument("--typer", action="store_true", help="run the G6-G9 typer")
    ap.add_argument("--dedup-sentences", action="store_true",
                    help="NLP once per distinct sentence (SCALE.md \u00a72)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from openie_backend_spark.plans.pipeline import Pipeline

    # under spark-submit the session already exists; standalone use
    # falls back to the factory
    spark = SparkSession.getActiveSession()
    if spark is None:
        from openie_backend_spark.session import get_spark

        spark = get_spark(app_name="kg-pipeline")

    pages = spark.read.parquet(args.pages)
    dims = None
    if args.dims:
        dims = {
            os.path.basename(p)[:-8]: spark.read.parquet(p)
            for p in glob.glob(os.path.join(args.dims, "dim_*.parquet"))
        }
    pipe = Pipeline(spark, args.out)
    out = pipe.run(pages, dims, corpus=args.corpus, run_typer=args.typer,
                   dedup_sentences=args.dedup_sentences)
    summary = {
        "stages": [
            {"name": r.name, "rows": r.rows, "partitions": r.partitions,
             "seconds": round(r.seconds, 2), "resumed": r.resumed}
            for r in pipe.results
        ],
        "spo_rows": out["spo"].count(),
        "edges": out["edges"].count(),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
