"""Unlinkable-entity typer (G6-G9): predict FreeBase types for args the
linker could not resolve, from the type signatures of the relations
they occur with.

Spark mapping of ``hadoop/.../UnlinkableEntityTyper.scala`` (the
reference's most complex shuffle chain):

* phase 1a (G6, ``:100-136,181``): group linked+typed entities by
  relation; per relation read ≤ 5000 entities, sample 150, and compute
  ``relWeight`` = fraction of entity pairs sharing ≥ 1 type over the
  n(n−1)/2 denominator (``calculateRelWeight :118-136``). Relations
  with 3 < len ≤ 100 and weight ≥ min_rel_weight produce a RelInfo.
  The reference samples with ``Random.shuffle`` (``:86``); we order by
  md5(fbid) — a deterministic uniform shuffle, so reruns reproduce
  (SURVEY §4 custom-work item 3).
* phase 1b (G7, ``:191-216``): join RelInfos with (rel, argNorm) pairs
  (arg filter F8: length ≥ 4, no 3+-digit number, no stop token,
  ``:73-77``), fanning each RelInfo out to ≤ 1000 distinct args.
  RelInfo side is small → broadcast.
* phase 2 (G8, ``:219-243``): group by arg (read ≤ 20 000 RelInfos);
  weight every candidate entity by 10^(4·relWeight) summed across
  relations (``expWeight :143``); take top-15 entities; count shared
  types across them; keep types with share ≥ min_share_score, top 5.
* G9 attach (``TypeAttacher.scala:17-40``): left join predictions onto
  groups by argNorm, attaching only when the side is unlinked/untyped.
  The reference salts short argNorms with a random 0-99 prefix; here
  AQE skew-join splitting (enabled in the session factory) handles the
  hot keys without changing results.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
)

MAX_ENTITIES_READ_PER_REL = 5000
MAX_ENTITIES_WRITE_PER_REL = 150
MAX_ARGS_PER_RELINFO = 1000
MAX_RELINFOS_READ_PER_ARG = 20000
MAX_SIMILAR_ENTITIES = 15
MAX_PREDICTED_TYPES = 5
MAX_NOTABLE_RELS = 4    # UnlinkableEntityTyper.scala:225
MIN_SHARE_SCORE = 10
MIN_REL_WEIGHT = 0.10
MIN_ARG_LENGTH = 4
ARG_STOPLIST = {"one", "two", "three", "four", "five", "some", "any", "all"}

RELINFO_SCHEMA = StructType(
    [
        StructField("rel_norm", StringType(), False),
        StructField("weight", DoubleType(), False),
        StructField("entities", ArrayType(
            StructType([
                StructField("fbid", StringType(), False),
                StructField("types", ArrayType(StringType()), False),
            ])
        ), False),
    ]
)

PREDICTION_SCHEMA = StructType(
    [
        StructField("arg_norm", StringType(), False),
        StructField("predicted_types", ArrayType(
            StructType([
                StructField("type", StringType(), False),
                StructField("share_score", IntegerType(), False),
            ])
        ), False),
        StructField("total_entity_weight", DoubleType(), False),
        StructField("top_similar_fbids", ArrayType(StringType()), False),
        # T4: top-4 notable relations for the arg, by descending
        # RelInfo weight (UnlinkableEntityTyper.scala:223-229)
        StructField("notable_rels", ArrayType(StringType()), False),
    ]
)


def _rel_entities(groups: DataFrame, side: str, stoplist: DataFrame | None) -> DataFrame:
    """(rel_norm, fbid, types, md5_order) for linked + typed args."""
    src = groups.select(
        "rel_norm",
        F.col(f"{side}_entity.fbid").alias("fbid"),
        F.col(f"{side}_types").alias("types"),
    ).filter(F.col("fbid").isNotNull() & (F.size("types") > 0))
    if stoplist is not None:
        src = src.join(
            F.broadcast(stoplist.select(F.col("fbid").alias("_sf"))),
            src["fbid"] == F.col("_sf"),
            "left_anti",
        )
    return src


def _relinfo_pandas(min_rel_weight: float):
    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = pdf["rel_norm"].iloc[0]
        if len(rel) <= 3 or len(rel) > 100:
            return pd.DataFrame(columns=["rel_norm", "weight", "entities"])
        # deterministic read cap + "shuffle": md5 order (precomputed)
        pdf = pdf.sort_values("ord").head(MAX_ENTITIES_READ_PER_REL)
        pdf = pdf.head(MAX_ENTITIES_WRITE_PER_REL)
        ents = list(zip(pdf["fbid"], [set(t) for t in pdf["types"]]))
        n = len(ents)
        if n <= 1:
            return pd.DataFrame(columns=["rel_norm", "weight", "entities"])
        shared = 0
        for i in range(n):
            ti = ents[i][1]
            for j in range(i + 1, n):
                if not ti.isdisjoint(ents[j][1]):
                    shared += 1
        weight = shared / (n * (n - 1) / 2.0)
        if weight < min_rel_weight:
            return pd.DataFrame(columns=["rel_norm", "weight", "entities"])
        return pd.DataFrame(
            {
                "rel_norm": [rel],
                "weight": [round(weight, 6)],
                "entities": [[
                    {"fbid": f, "types": sorted(t)} for f, t in ents
                ]],
            }
        )

    return compute


def rel_infos(
    groups: DataFrame,
    side: str = "arg1",
    stoplist: DataFrame | None = None,
    min_rel_weight: float = MIN_REL_WEIGHT,
) -> DataFrame:
    """Phase 1a: per-relation type-cohesion weight + entity sample."""
    ents = _rel_entities(groups, side, stoplist).withColumn(
        "ord", F.md5(F.concat("rel_norm", F.lit("|"), "fbid"))
    ).dropDuplicates(["rel_norm", "fbid"])
    return ents.groupBy("rel_norm").applyInPandas(
        _relinfo_pandas(min_rel_weight), schema=RELINFO_SCHEMA
    )


def _arg_ok(col):
    no_number = ~col.rlike("[0-9][0-9][0-9]+")
    no_stop = ~F.exists(F.split(col, " "), lambda w: w.isin(*sorted(ARG_STOPLIST)))
    return (F.length(col) >= MIN_ARG_LENGTH) & no_number & no_stop


def arg_relinfos(
    groups: DataFrame,
    relinfos: DataFrame,
    side: str = "arg1",
) -> DataFrame:
    """Phase 1b: fan RelInfos out to their relations' (filtered,
    distinct, capped) argNorms."""
    args = (
        groups.select("rel_norm", F.col(f"{side}_norm").alias("arg_norm"))
        .filter(_arg_ok(F.col("arg_norm")))
        .dropDuplicates(["rel_norm", "arg_norm"])
    )
    capped = (
        args.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("rel_norm").orderBy("arg_norm")),
        )
        .filter(F.col("_rn") <= MAX_ARGS_PER_RELINFO)
        .drop("_rn")
    )
    return capped.join(F.broadcast(relinfos), "rel_norm", "inner")


def _predict_pandas(min_share_score: int):
    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        arg = pdf["arg_norm"].iloc[0]
        pdf = pdf.sort_values("weight", ascending=False).head(MAX_RELINFOS_READ_PER_ARG)
        weights: dict[str, float] = {}
        types_by_fbid: dict[str, list] = {}
        total = 0.0
        for w, ents in zip(pdf["weight"], pdf["entities"]):
            ew = math.pow(10, 4 * w)
            for e in ents:
                fbid = e["fbid"]
                weights[fbid] = weights.get(fbid, 0.0) + ew
                types_by_fbid[fbid] = list(e["types"])
                total += ew
        top = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_SIMILAR_ENTITIES]
        counts: dict[str, int] = {}
        for fbid, _ in top:
            for t in types_by_fbid[fbid]:
                counts[t] = counts.get(t, 0) + 1
        preds = sorted(
            ((t, c) for t, c in counts.items() if c >= min_share_score),
            key=lambda kv: (-kv[1], kv[0]),
        )[:MAX_PREDICTED_TYPES]
        if not preds:
            return pd.DataFrame(
                columns=["arg_norm", "predicted_types", "total_entity_weight",
                         "top_similar_fbids", "notable_rels"]
            )
        # T4: getNotableRels — top-4 relations by weight (rels are
        # already distinct per arg, so the reference's post-take dedup
        # is a no-op); rel_norm breaks weight ties deterministically
        notable = [
            r for _, r in sorted(
                zip(pdf["weight"], pdf["rel_norm"]),
                key=lambda t: (-t[0], t[1]),
            )[:MAX_NOTABLE_RELS]
        ]
        return pd.DataFrame(
            {
                "arg_norm": [arg],
                "predicted_types": [[{"type": t, "share_score": c} for t, c in preds]],
                "total_entity_weight": [round(total, 4)],
                "top_similar_fbids": [[f for f, _ in top[:5]]],
                "notable_rels": [notable],
            }
        )

    return compute


def type_predictions(
    arg_relinfo_pairs: DataFrame,
    min_share_score: int = MIN_SHARE_SCORE,
) -> DataFrame:
    """Phase 2: per-arg type prediction from weighted similar entities."""
    return arg_relinfo_pairs.groupBy("arg_norm").applyInPandas(
        _predict_pandas(min_share_score), schema=PREDICTION_SCHEMA
    )


def attach_types(groups: DataFrame, predictions: DataFrame, side: str = "arg1") -> DataFrame:
    """G9: attach predicted types to groups whose side is untyped."""
    preds = predictions.select(
        F.col("arg_norm").alias(f"_{side}_key"),
        F.transform("predicted_types", lambda p: p["type"]).alias("_pred_types"),
    )
    joined = groups.join(
        preds, groups[f"{side}_norm"] == preds[f"_{side}_key"], "left"
    )
    types_col = f"{side}_types"
    has_types = types_col in groups.columns
    if not has_types:
        joined = joined.withColumn(types_col, F.array().cast("array<string>"))
    return joined.withColumn(
        types_col,
        F.when(
            (F.size(types_col) == 0) & F.col("_pred_types").isNotNull(),
            F.col("_pred_types"),
        ).otherwise(F.col(types_col)),
    ).drop(f"_{side}_key", "_pred_types")


def type_unlinkable(
    groups: DataFrame,
    side: str = "arg1",
    stoplist: DataFrame | None = None,
    min_rel_weight: float = MIN_REL_WEIGHT,
    min_share_score: int = MIN_SHARE_SCORE,
) -> DataFrame:
    """The full G6→G9 chain for one argument side."""
    # three references below (rel_infos, arg_relinfos, attach_types):
    # materialize the input once (r6, same rationale as link_groups)
    groups = groups.localCheckpoint(eager=True)
    ri = rel_infos(groups, side, stoplist, min_rel_weight)
    pairs = arg_relinfos(groups, ri, side)
    preds = type_predictions(pairs, min_share_score)
    return attach_types(groups, preds, side)
