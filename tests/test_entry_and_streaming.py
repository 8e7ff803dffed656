"""Driver-contract smoke (entry/queries/oracle_sql shape) and the
Structured-Streaming incremental ingest end-to-end."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == [
        "subject_id", "subject", "predicate", "object_id", "object", "group_size"
    ]
    assert len(rows) >= 0  # driver checks runs + stable schema
    qs = m.queries()
    oracles = m.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unknown query"
    assert len(qs) >= 30


def test_streaming_incremental_ingest(spark, tmp_path):
    from openie_backend_spark.streaming.ingest import run_incremental

    landing = tmp_path / "landing"
    groups_dir = str(tmp_path / "groups")
    ckpt = str(tmp_path / "ckpt")
    landing.mkdir()

    schema = "url string, text string, lang string"
    batch1 = spark.createDataFrame(
        [("u1", "Acme Corp acquired Globex Inc. .", "en")], schema
    )
    batch1.write.parquet(str(landing / "b1"))
    run_incremental(spark, str(landing) + "/*", groups_dir, ckpt, batch1.schema)
    g1 = spark.read.parquet(groups_dir)
    assert g1.filter(F.col("rel_norm") == "acquire").first()["size"] == 1

    # second landing file: same triple again + a new one → merge grows
    batch2 = spark.createDataFrame(
        [
            ("u2", "Acme Corp acquired Globex Inc. .", "en"),
            ("u3", "Initech was founded by Grace Hopper .", "en"),
        ],
        schema,
    )
    batch2.write.parquet(str(landing / "b2"))
    run_incremental(spark, str(landing) + "/*", groups_dir, ckpt, batch2.schema)
    g2 = spark.read.parquet(groups_dir)
    acq = g2.filter(F.col("rel_norm") == "acquire").first()
    assert acq["size"] == 2 and acq["needs_relink"]
    assert g2.filter(F.col("rel_norm") == "be found by").count() == 1

    # idempotence: re-running with no new files changes nothing
    run_incremental(spark, str(landing) + "/*", groups_dir, ckpt, batch2.schema)
    g3 = spark.read.parquet(groups_dir)
    assert g3.filter(F.col("rel_norm") == "acquire").first()["size"] == 2
