"""spark-submit entry for the KG-construction pipeline (the north
rule's deployment shape: ``spark-submit --py-files openie.zip
scripts/submit_pipeline.py <pages_parquet> <out_dir>``). The driver
ships the package as a zip, so executors import it without a repo
checkout — exactly how the job reaches a real multi-executor cluster.

Build the zip + run the two-level smoke locally:

    python scripts/submit_pipeline.py --package   # writes /tmp/openie_pkg.zip
    spark-submit --master local[8] --py-files /tmp/openie_pkg.zip \
        scripts/submit_pipeline.py /root/testdata/sf0.001/documents.parquet /tmp/submit_out
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "openie_backend_spark")
ZIP = "/tmp/openie_pkg.zip"


def build_zip(path: str = ZIP) -> str:
    """Package openie_backend_spark (code + model artifacts) for
    --py-files distribution."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith((".py", ".json.gz")):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def main() -> None:
    if "--package" in sys.argv:
        print(build_zip())
        return
    pages_path, out_dir = sys.argv[1], sys.argv[2]
    # NO sys.path hack here: the package must come from --py-files
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.getOrCreate()
    from openie_backend_spark.plans.pipeline import Pipeline

    pages = spark.read.parquet(pages_path)
    if "url" not in pages.columns:  # documents table -> pages shape
        pages = pages.select(
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
            "text", "lang",
        )
    tables = Pipeline(spark, out_dir).run(pages)
    print("SUBMIT_OK",
          {k: v.count() for k, v in tables.items() if k in ("spo", "nodes")})


if __name__ == "__main__":
    main()
