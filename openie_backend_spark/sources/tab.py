"""Legacy tab-format readers (S1/S2): ingest the reference's on-disk
line formats as typed DataFrames, so a user migrating from the
reference can load existing HDFS dumps directly.

Format per ``models/.../ReVerbExtraction.scala:137-147``: 7 tab
columns — arg1/rel/arg2 intervals (``[start, end)``), three
space-delimited aligned token layers, source url. Parsed entirely
with JVM builtins (split/regexp_extract) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _interval(col, part: int):
    # regexp_extract yields '' on non-matching (malformed) lines;
    # try_cast maps that to NULL instead of an ANSI cast error, and the
    # reader's arg1_start IS NOT NULL filter then drops the line
    return F.regexp_extract(col, r"[\[{](\d+), (\d+)[)\]}]", part).try_cast("int")


def read_extractions_tab(spark: SparkSession, path: str) -> DataFrame:
    """Tab-serialized ReVerbExtraction lines → typed extraction rows."""
    lines = spark.read.text(path)
    c = F.split(F.regexp_replace(F.col("value"), "\r$", ""), "\t")
    return (
        lines.select(
            _interval(c[0], 1).alias("arg1_start"),
            _interval(c[0], 2).alias("arg1_end"),
            _interval(c[1], 1).alias("rel_start"),
            _interval(c[1], 2).alias("rel_end"),
            _interval(c[2], 1).alias("arg2_start"),
            _interval(c[2], 2).alias("arg2_end"),
            F.split(c[3], " ").alias("tokens"),
            F.split(c[4], " ").alias("pos_tags"),
            F.split(c[5], " ").alias("chunk_tags"),
            F.when(c[6] == "None", F.lit(None)).otherwise(c[6]).alias("url"),
        )
        .filter(F.col("arg1_start").isNotNull())
    )


def read_sentences_tab(spark: SparkSession, path: str) -> DataFrame:
    """``sentence \\t url`` lines (chunker input, S2)."""
    lines = spark.read.text(path)
    c = F.split(F.col("value"), "\t")
    return lines.select(c[0].alias("text"), c[1].alias("url"))
