"""Grouping stage: extraction rows → relation groups (REGs).

Spark mapping of ``ScoobiReVerbGrouper`` (G1,
``hadoop/.../ScoobiReVerbGrouper.scala:113-130``) and
``ScoobiGroupReGrouper`` (G2, ``ScoobiGroupReGrouper.scala:44-77``):

* one shuffle on the normalized key (arg1_norm, rel_norm, arg2_norm);
* deterministic per-key caps replacing the reference's arrival-order
  caps (read ≤ 40 000 instances per group,
  ``ScoobiReVerbGrouper.scala:38,65``; drop groups over 500 000,
  ``:109-111``) — we order by (-confidence, url, sent_id) so reruns
  are reproducible (SURVEY §4 "Custom Spark work" item 3);
* control-character scrub (M9, ``ScoobiGroupReGrouper.scala:114-125``)
  as builtin ``regexp_replace``;
* instance Set semantics: dropDuplicates on the full instance struct
  after 3-decimal confidence rounding (``ExtractionGroup.scala:45``,
  SURVEY §7.4-6).

The cap is applied with a windowed row_number over the SAME hash
partitioning the groupBy uses, so AQE plans exactly one exchange; the
skewed-key danger of collect_list on a mega-group is bounded by the
cap before aggregation, not after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_INSTANCES_PER_GROUP = 40_000
MAX_GROUP_SIZE = 500_000

GROUP_KEY = ["arg1_norm", "rel_norm", "arg2_norm"]

_INSTANCE_COLS = [
    "url", "sent_id", "tokens", "pos_tags", "chunk_tags",
    "arg1_start", "arg1_end", "rel_start", "rel_end",
    "arg2_start", "arg2_end", "arg1_text", "rel_text", "arg2_text",
    "confidence", "corpus",
]


def _instance_cols(df) -> list[str]:
    # slim extraction mode drops the token-layer arrays; the instance
    # struct adapts to whatever payload the pipeline carries
    return [c for c in _INSTANCE_COLS if c in df.columns or c == "corpus"]


def _scrub(col):
    # M9: tabs → space, control chars stripped
    return F.regexp_replace(F.regexp_replace(col, "\t", " "), r"\p{Cntrl}", "")


def group_extractions(
    extractions: DataFrame,
    corpus: str = "cc",
    max_instances: int = MAX_INSTANCES_PER_GROUP,
    max_group_size: int = MAX_GROUP_SIZE,
) -> DataFrame:
    """extractions → groups(arg1_norm, rel_norm, arg2_norm, instances,
    size, frontend keys, head phrases of the top instance)."""
    ex = extractions.withColumn("corpus", F.lit(corpus))
    for c in GROUP_KEY:
        ex = ex.withColumn(c, _scrub(F.col(c)))
    # F1: empty-key filter (ScoobiReVerbGrouper.scala:53-55)
    ex = ex.filter(
        (F.length("arg1_norm") > 0)
        & (F.length("rel_norm") > 0)
        & (F.length("arg2_norm") > 0)
    )
    ex = ex.withColumn("confidence", F.round("confidence", 3))
    inst_cols = _instance_cols(ex)
    # instance Set semantics (dedup by full structural equality):
    # identical instances necessarily share the group key, so the dedup
    # can ride the SAME hash partitioning as the cap windows — a
    # lag-over-sorted-hash within the key instead of a second exchange
    # (dropDuplicates on key+instance would shuffle the data twice)
    ih = F.md5(F.to_json(F.struct(*[F.col(c) for c in inst_cols])))
    ex = ex.withColumn("_ih", ih)
    w_dup = Window.partitionBy(*GROUP_KEY).orderBy("_ih")
    ex = ex.withColumn("_prev_ih", F.lag("_ih").over(w_dup)).filter(
        F.col("_prev_ih").isNull() | (F.col("_prev_ih") != F.col("_ih"))
    )
    # total order within the key: after the instance dedup, two distinct
    # rows must differ in at least one span bound, so this ordering has
    # no ties and the cap + top-instance selection are fully determined
    w = Window.partitionBy(*GROUP_KEY).orderBy(
        F.desc("confidence"), F.asc("url"), F.asc("sent_id"),
        F.asc("arg1_start"), F.asc("arg1_end"), F.asc("rel_start"),
        F.asc("rel_end"), F.asc("arg2_start"), F.asc("arg2_end"),
    )
    ex = (
        ex.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy(*GROUP_KEY)))
        .filter((F.col("_cnt") <= max_group_size) & (F.col("_rn") <= max_instances))
        .drop("_ih", "_prev_ih")
    )
    instance = F.struct(*[F.col(c) for c in inst_cols]).alias("instance")
    grouped = (
        ex.select(*GROUP_KEY, "arg1_frontend", "rel_frontend", "arg2_frontend",
                  "arg1_head", "arg2_head", "_rn", instance)
        .groupBy(*GROUP_KEY)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_rn"), F.col("instance")))
            ).alias("_ranked"),
            F.min_by(
                F.struct("arg1_frontend", "rel_frontend", "arg2_frontend",
                         "arg1_head", "arg2_head"),
                F.col("_rn"),
            ).alias("_top"),
            F.count(F.lit(1)).alias("size"),
        )
        .select(
            *GROUP_KEY,
            F.col("_top.arg1_frontend").alias("arg1_frontend"),
            F.col("_top.rel_frontend").alias("rel_frontend"),
            F.col("_top.arg2_frontend").alias("arg2_frontend"),
            F.col("_top.arg1_head").alias("arg1_head"),
            F.col("_top.arg2_head").alias("arg2_head"),
            F.transform(F.col("_ranked"), lambda r: r["instance"]).alias("instances"),
            "size",
        )
    )
    return grouped


def regroup_merge(groups_a: DataFrame, groups_b: DataFrame,
                  max_instances: int = MAX_INSTANCES_PER_GROUP) -> DataFrame:
    """G2: merge two group tables on the key — concat instance lists
    (capped), keep the larger side's frontend/head fields, preferring
    entity-linked sides upstream (``ScoobiGroupReGrouper.scala:54-77``).
    """
    merged = (
        groups_a.unionByName(groups_b, allowMissingColumns=True)
        .groupBy(*GROUP_KEY)
        .agg(
            F.slice(F.flatten(F.collect_list("instances")), 1, max_instances).alias("instances"),
            F.max_by(
                F.struct("arg1_frontend", "rel_frontend", "arg2_frontend",
                         "arg1_head", "arg2_head"),
                F.col("size"),
            ).alias("_top"),
            F.sum("size").alias("size"),
        )
        .select(
            *GROUP_KEY,
            F.col("_top.*"),
            "instances",
            F.least(F.col("size"), F.lit(max_instances)).alias("size"),
        )
    )
    return merged
