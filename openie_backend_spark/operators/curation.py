"""Training-corpus curation operators: benchmark decontamination and
sequence packing.

These are LLM-data-pipeline components the reference engine predates
(its curation surface stops at the F-family instance filters,
`backend/.../InstanceFilters.scala`); both are standard steps between
a raw web corpus and a pretraining run:

* **decontamination** — drop documents that share word n-grams with an
  evaluation benchmark so downstream eval numbers are not inflated
  (the n-gram-overlap rule of Brown et al. 2020 appendix C, Dodge et
  al. 2021);
* **sequence packing** — assign documents to fixed-token-budget packs
  for dense pretraining batches (concat-then-chunk packing in the
  T5/GPT lineage, Raffel et al. 2020 §3.1.3).

Scale notes:

* decontamination never shuffles the corpus: the benchmark side is
  tiny by construction (eval sets are ~10^4..10^6 rows vs 10^12 docs),
  so its distinct shingle set is broadcast and the corpus-side
  probe is a map-side hash join; per-document shingle fan-out is
  capped (sorted-prefix, same concession as the dedup family);
* packing is ONE hash exchange on a salt bucket; within a bucket the
  running-total window is streaming (`ROWS BETWEEN ... AND 1
  PRECEDING` needs no partition buffering). Parallelism equals
  ``n_buckets`` — size it to the cluster (buckets are md5-salted so
  no data-dependent skew is possible);
* hashing/bucketing is md5-based (byte-identical across engines), so
  both operators carry DuckDB value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openie_backend_spark.functions.text import shingles, token_count


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    max_shingles: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Documents sharing at least one word ``n``-gram with the
    benchmark: (doc_id, n_shingles, n_hits, contamination_bp).

    ``contamination_bp`` is basis points of the document's (capped)
    shingle set that hit the benchmark — an integer, not a rounded
    float, so the value hashes identically across engines (DuckDB
    rounds half-away-from-zero, Spark/Python round half-even; floor
    of the scaled ratio sidesteps the .5 boundary entirely).

    Both shingle sets are distinct + sorted + prefix-capped at
    ``max_shingles`` (deterministic; mirrored in the oracle SQL), so a
    pathological mega-document bounds its own join fan-out: each
    corpus row contributes ≤ max_shingles probe rows, and because both
    sides are distinct a (doc, gram) pair matches at most once — the
    aggregate needs no count-distinct Expand.
    """
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.slice(shingles(text_col, n), 1, max_shingles).alias("sh"),
    ).filter(F.size("sh") > 0)
    doc_grams = doc_sh.select(
        "doc_id",
        F.size("sh").alias("n_shingles"),
        F.explode("sh").alias("gram"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(F.slice(shingles(bench_text_col, n), 1, max_shingles)).alias(
                "gram"
            )
        )
        .distinct()
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "gram")
    return (
        hits.groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            F.floor(F.lit(10000) * F.col("n_hits") / F.col("n_shingles"))
            .cast("int")
            .alias("contamination_bp"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 1024,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic concat-then-chunk sequence packing: (doc_id,
    n_tokens, bucket, pack_id) — ``pack_id`` is the fixed-budget pack
    the document opens in when the bucket's documents are laid out
    end-to-end in md5 order.

    Semantics (disclosed, mirrored in the oracle): a document is
    assigned WHOLE to the pack where its first token lands
    (``floor(exclusive-running-total / max_tokens)``), so a pack's
    token sum can overshoot ``max_tokens`` by at most one document's
    tail; trainers that split documents across window boundaries do so
    downstream with ``pos = cum_tokens % max_tokens``, which this
    layout determines.

    Order inside a bucket is md5(doc_id) — content-independent, so the
    packing is a uniform shuffle of the corpus (what pretraining
    wants) AND reproducible run-to-run. Empty documents (0 tokens)
    ride along in whatever pack the running total is in; they never
    advance it.
    """
    key = F.md5(F.col(id_col).cast("string"))
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).alias("n_tokens"),
        key.alias("sort_key"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("int") % n_buckets).alias(
            "bucket"
        ),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("sort_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.floor(cum / F.lit(max_tokens)).cast("int").alias("pack_id"),
    )
