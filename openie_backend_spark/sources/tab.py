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


def _interval_bounds(col):
    """``(start, end)`` columns for a serialized interval literal,
    honoring all three forms ``intervalFromString`` accepts
    (``ReVerbExtraction.scala:180-196``): ``[a, b)`` open, ``[a, b]``
    closed (end-inclusive, so end+1 in our half-open convention), and
    ``{n}`` singleton (= ``[n, n+1)``). Any other shape yields NULL
    bounds, and the reader drops the line — matching the reference,
    which fails the whole line unless all three intervals parse.
    """
    nums = F.regexp_extract_all(col, F.lit(r"\d+"), 0)
    n = F.size(nums)
    start = F.when((n == 1) | (n == 2), F.element_at(nums, 1).try_cast("int"))
    closed_bump = F.when(col.endswith(")"), F.lit(0)).otherwise(F.lit(1))
    end = F.when(n == 2, F.element_at(nums, 2).try_cast("int") + closed_bump).when(
        n == 1, F.element_at(nums, 1).try_cast("int") + 1
    )
    return start, end


def read_extractions_tab(spark: SparkSession, path: str) -> DataFrame:
    """Tab-serialized ReVerbExtraction lines → typed extraction rows."""
    lines = spark.read.text(path)
    c = F.split(F.regexp_replace(F.col("value"), "\r$", ""), "\t")
    a1s, a1e = _interval_bounds(c[0])
    rls, rle = _interval_bounds(c[1])
    a2s, a2e = _interval_bounds(c[2])
    out = lines.select(
        a1s.alias("arg1_start"),
        a1e.alias("arg1_end"),
        rls.alias("rel_start"),
        rle.alias("rel_end"),
        a2s.alias("arg2_start"),
        a2e.alias("arg2_end"),
        F.split(c[3], " ").alias("tokens"),
        F.split(c[4], " ").alias("pos_tags"),
        F.split(c[5], " ").alias("chunk_tags"),
        F.when(c[6] == "None", F.lit(None)).otherwise(c[6]).alias("url"),
    )
    # reference drops the line unless ALL three intervals parsed
    # (argIntervals.size != 3 -> failure, ReVerbExtraction.scala:160)
    all_parsed = F.lit(True)
    for f in ("arg1_start", "arg1_end", "rel_start", "rel_end", "arg2_start", "arg2_end"):
        all_parsed = all_parsed & F.col(f).isNotNull()
    return out.filter(all_parsed)


def read_sentences_tab(spark: SparkSession, path: str) -> DataFrame:
    """``sentence \\t url`` lines (chunker input, S2)."""
    lines = spark.read.text(path)
    c = F.split(F.col("value"), "\t")
    return lines.select(c[0].alias("text"), c[1].alias("url"))
