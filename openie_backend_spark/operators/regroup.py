"""G3 + G4: query-time entity-merge regrouping and the inlink-ratio
computer.

* G3 (``models/.../ReVerbExtractionGroup.scala:103-147,154-168``):
  regroup REGs by (entity-or-norm, relNorm, entity-or-norm) — groups
  whose arg resolved to the same entity merge even when their surface
  norms differ; unlinked groups merge into at most one linked
  candidate, while distinct linked entities stay separate. Two-stage
  groupBy + max_by, no Python.
* G4 (``hadoop/.../ScoobiInlinkRatioComputer.scala:40-57,66-75``):
  per-entity group count over the entity's inlink count — the prior
  quality signal ("entities that attract many distinct groups per
  inlink are suspicious").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_key(side: str):
    return F.coalesce(F.col(f"{side}_entity.fbid"), F.col(f"{side}_norm"))


def entity_merge_regroup(groups: DataFrame) -> DataFrame:
    """G3: merge groups sharing (arg1-entity-or-norm, rel, arg2-...)."""
    keyed = groups.withColumn("_k1", _merge_key("arg1")).withColumn(
        "_k2", _merge_key("arg2")
    )
    has_instances = "instances" in groups.columns
    aggs = [
        F.sum("size").alias("size"),
        F.max_by(
            F.struct("arg1_norm", "rel_norm", "arg2_norm", "arg1_entity",
                     "arg2_entity", "arg1_types", "arg2_types"),
            F.struct(
                F.col("arg1_entity").isNotNull().cast("int").alias("linked"),
                F.col("size").alias("sz"),
                # deterministic representative on (linked, size) ties
                F.col("arg1_norm").alias("t1"), F.col("arg2_norm").alias("t2"),
            ),
        ).alias("_rep"),
        F.count(F.lit(1)).alias("merged_groups"),
    ]
    if has_instances:
        aggs.append(F.flatten(F.collect_list("instances")).alias("instances"))
    out = keyed.groupBy("_k1", "rel_norm", "_k2").agg(*aggs)
    cols = [
        F.col("_rep.arg1_norm").alias("arg1_norm"),
        F.col("rel_norm"),
        F.col("_rep.arg2_norm").alias("arg2_norm"),
        F.col("_rep.arg1_entity").alias("arg1_entity"),
        F.col("_rep.arg2_entity").alias("arg2_entity"),
        F.col("_rep.arg1_types").alias("arg1_types"),
        F.col("_rep.arg2_types").alias("arg2_types"),
        F.col("size"),
        F.col("merged_groups"),
    ]
    if has_instances:
        cols.append(F.col("instances"))
    return out.select(*cols)


FRONTEND_KEY = ["arg1_frontend", "rel_frontend", "arg2_frontend"]


def frontend_regroup(groups: DataFrame) -> DataFrame:
    """G3 stage 2 / M6 (``ReVerbExtractionGroup.scala:139-168``
    ``indexGroupingToFrontendGrouping`` + ``mergeUnlinkedIntoLargest
    LinkedGroup``): regroup by the FRONTEND key (less aggressive
    normalization than the index key, so e.g. different determiner
    usages merge for display). Per frontend key:

    * at most one linked group → merge everything into one group;
    * several linked groups → merge only the unlinked ones together
      (entities must not be conflated), linked groups pass through.

    Set-based: one window + one groupBy on the SAME frontend key (AQE
    plans a single exchange); no Python. Output rows carry the frontend
    key as the group key (the reference's ``convertKey``), the summed
    size, how many input groups merged, and the surviving arg1 fbid
    (NULL for unlinked-merge rows)."""
    from pyspark.sql import Window

    has_links = "arg1_entity" in groups.columns
    lk = (
        (F.col("arg1_entity").isNotNull() | F.col("arg2_entity").isNotNull())
        if has_links
        else F.lit(False)
    )
    w = Window.partitionBy(*FRONTEND_KEY)
    g = (
        groups.withColumn("_lk", lk)
        .withColumn("_nl", F.sum(F.col("_lk").cast("int")).over(w))
        # consumed by BOTH the mergeable aggregate and the passthrough
        # branch: materialize once so the upstream pipeline (often the
        # full linked KG) is not evaluated twice (r6)
        .localCheckpoint(eager=True)
    )
    fbid1 = (
        F.col("arg1_entity.fbid") if has_links else F.lit(None).cast("string")
    )
    mergeable = (F.col("_nl") <= 1) | ~F.col("_lk")
    merged = (
        g.filter(mergeable)
        .groupBy(*FRONTEND_KEY)
        .agg(
            F.sum("size").alias("size"),
            F.count(F.lit(1)).alias("merged_groups"),
            # ≤1 linked group is mergeable per key, so this max is over
            # at most one non-null value — deterministic
            F.max(F.when(F.col("_lk"), fbid1)).alias("arg1_fbid"),
        )
    )
    passthru = g.filter(~mergeable).select(
        *FRONTEND_KEY,
        F.col("size"),
        F.lit(1).cast("long").alias("merged_groups"),
        fbid1.alias("arg1_fbid"),
    )
    return merged.unionByName(passthru)


def inlink_ratio(groups: DataFrame, inlinks_dim: DataFrame, side: str = "arg1") -> DataFrame:
    """G4: (fbid, group_count, inlinks, ratio = groups/inlinks)."""
    counted = (
        groups.select(F.col(f"{side}_entity.fbid").alias("fbid"))
        .filter(F.col("fbid").isNotNull())
        .groupBy("fbid")
        .agg(F.count(F.lit(1)).alias("group_count"))
    )
    return (
        counted.join(F.broadcast(inlinks_dim.select("fbid", "inlinks")), "fbid", "left")
        .withColumn(
            "ratio",
            F.round(F.col("group_count") / F.greatest(F.col("inlinks"), F.lit(1)), 6),
        )
    )
