"""Quality filters — all builtin Spark SQL (no Python in the hot path).

Spark mapping of:

* F2 instance quality filter
  (``hadoop/.../ScoobiReVerbGroupFilter.scala:25-35,77-127``): drop an
  instance if it contains a negation word in rel/arg2, total triple
  text length > 60, pronoun arg, confidence < 0.5, empty cleaned
  part, arg1 == arg2 after cleaning, ≥ 5 questionable characters, or
  matches the likely-error regex ``.*(http|\\(|\\)|"|\\[|thing).*``;
* F3 group filter (``:69-75``): all norms non-empty and ≥ 2 instances;
* F4 extreme-precision filter
  (``ScoobiReVerbGroupExtremeFilter.scala:56,65-91``);
* F5 frequency filter (``ScoobiEntityLinker.scala:161,172-197``);
* F7 entity stoplist (broadcast anti join,
  ``backend/.../ExtractionGroupFetcher.scala:119-133``);
* F9 Bernoulli sample (``hadoop/.../FileSampler.scala:52-54``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEGATION_WORDS = ("no", "not", "none", "n't", "never")
PRONOUNS = (
    "he", "she", "it", "they", "them", "him", "her", "i", "you", "we",
    "us", "me", "this", "that", "these", "those",
)
EXTREME_STOP_RELS = ("said", "have", "is", "be", "say")
EXTREME_STOP_ARGS = (
    "both", "all", "some", "many", "few", "most", "none", "everyone",
    "someone", "anyone", "it", "this", "that", "one", "today",
)
LIKELY_ERROR_RE = r'.*(http|\(|\)|"|\[|thing).*'
MAX_TRIPLE_LEN = 60


def _negation(col):
    return F.exists(
        F.split(F.lower(col), " "),
        lambda w: w.isin(*NEGATION_WORDS),
    )


def _pronoun(col):
    return F.lower(col).isin(*PRONOUNS)


def instance_quality_filter(extractions: DataFrame, min_conf: float = 0.5) -> DataFrame:
    """F2 over extraction rows (applied BEFORE the grouping shuffle —
    the volume cut the reference only gets post-shuffle; SURVEY §7.4-4)."""
    total_len = (
        F.length("arg1_text") + F.length("rel_text") + F.length("arg2_text")
    )
    triple = F.concat_ws(" ", "arg1_text", "rel_text", "arg2_text")
    questionable = F.length(triple) - F.length(
        F.regexp_replace(triple, r"[^A-Za-z0-9 .,'-]", "")
    )
    return extractions.filter(
        ~_negation(F.col("rel_text"))
        & ~_negation(F.col("arg2_text"))
        & (total_len <= MAX_TRIPLE_LEN)
        & ~_pronoun(F.col("arg1_text"))
        & ~_pronoun(F.col("arg2_text"))
        & (F.col("confidence") >= min_conf)
        & (F.length(F.trim(F.col("arg1_norm"))) > 0)
        & (F.length(F.trim(F.col("rel_norm"))) > 0)
        & (F.length(F.trim(F.col("arg2_norm"))) > 0)
        & (F.col("arg1_norm") != F.col("arg2_norm"))
        & (questionable < 5)
        & ~F.lower(triple).rlike(LIKELY_ERROR_RE)
    )


def group_filter(groups: DataFrame, min_instances: int = 2) -> DataFrame:
    """F3: groups with ≥ 2 instances and non-empty norms."""
    return groups.filter(
        (F.size("instances") >= min_instances)
        & (F.length("arg1_norm") > 0)
        & (F.length("rel_norm") > 0)
        & (F.length("arg2_norm") > 0)
    )


def extreme_precision_filter(groups: DataFrame, min_conf: float = 0.9) -> DataFrame:
    """F4: conf > 0.9 on the best instance; stop-rel/arg lists; no
    pronoun args. (The reference's DT-NN definite-noun scan folds into
    the head-phrase emptiness check since determiners are stripped.)"""
    best_conf = F.element_at(F.col("instances"), 1)["confidence"]
    return groups.filter(
        (best_conf >= min_conf)
        & ~F.col("rel_norm").isin(*EXTREME_STOP_RELS)
        & ~F.col("arg1_norm").isin(*EXTREME_STOP_ARGS)
        & ~F.col("arg2_norm").isin(*EXTREME_STOP_ARGS)
        & ~_pronoun(F.col("arg1_norm"))
        & ~_pronoun(F.col("arg2_norm"))
    )


def frequency_filter(groups: DataFrame, min_freq: int = 1, max_freq: int = 100000) -> DataFrame:
    """F5: pre-linking cost control by group size."""
    return groups.filter(F.col("size").between(min_freq, max_freq))


def entity_stoplist_filter(groups: DataFrame, stoplist: DataFrame, side: str) -> DataFrame:
    """F7: null-out the entity link when its fbid is stoplisted —
    broadcast left join + conditional, the set-based form of the
    reference's per-row HashSet check."""
    col = f"{side}_entity"
    joined = groups.join(
        F.broadcast(stoplist.select(F.col("fbid").alias("_stop_fbid"))),
        F.col(f"{col}.fbid") == F.col("_stop_fbid"),
        "left",
    )
    return joined.withColumn(
        col,
        F.when(F.col("_stop_fbid").isNotNull(), F.lit(None)).otherwise(F.col(col)),
    ).drop("_stop_fbid")


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """F9."""
    return df.sample(fraction=fraction, seed=seed)
