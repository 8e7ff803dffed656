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
    ``{n}`` singleton (= ``[n, n+1)``). Like the reference's
    ``numExtractorPattern.findAllIn``, the digit runs may appear in
    any surrounding shape; a string with zero or 3+ digit runs yields
    NULL bounds, and an INVERTED span (end <= start, which makes
    ``Interval.open/closed`` throw in the reference and fail the
    line) is dropped by the reader's filter below.
    """
    # trim first (all three engines agree on the trimmed literal) and
    # reject 10+-digit runs outright: a token index cannot need them,
    # and int-overflow behavior would otherwise differ per engine
    t = F.trim(col)
    ok = ~t.rlike(r"\d{10}")
    nums = F.regexp_extract_all(t, F.lit(r"\d+"), 0)
    n = F.size(nums)
    start = F.when(ok & ((n == 1) | (n == 2)),
                   F.element_at(nums, 1).try_cast("int"))
    closed_bump = F.when(t.endswith(")"), F.lit(0)).otherwise(F.lit(1))
    end = F.when(ok & (n == 2),
                 F.element_at(nums, 2).try_cast("int") + closed_bump).when(
        ok & (n == 1), F.element_at(nums, 1).try_cast("int") + 1
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
    # (argIntervals.size != 3 -> failure, ReVerbExtraction.scala:160);
    # inverted spans make Interval.open/closed throw there -> same drop
    all_parsed = F.lit(True)
    for side in ("arg1", "rel", "arg2"):
        all_parsed = (
            all_parsed
            & F.col(f"{side}_start").isNotNull()
            & F.col(f"{side}_end").isNotNull()
            & (F.col(f"{side}_end") > F.col(f"{side}_start"))
        )
    return out.filter(all_parsed)


def read_sentences_tab(spark: SparkSession, path: str) -> DataFrame:
    """``sentence \\t url`` lines (chunker input, S2)."""
    lines = spark.read.text(path)
    c = F.split(F.col("value"), "\t")
    return lines.select(c[0].alias("text"), c[1].alias("url"))
