"""KG-level analytics over grouped extractions: DIRT-style relation
synonym candidates and snapshot diffing.

Both are downstream consumers the reference serves ad hoc from its
Lucene index (``backend/.../ExtractionGroupFetcher.scala`` answer
queries); here they are first-class batch operators with value-hash
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openie_backend_spark.operators.group import GROUP_KEY


def relation_synonyms(
    groups: DataFrame,
    min_shared: int = 2,
    max_rels_per_pair: int = 64,
) -> DataFrame:
    """Relation-synonym candidates by shared argument pairs (the
    distributional-similarity signal of DIRT, Lin & Pantel 2001 —
    relations that connect the same (arg1, arg2) pairs tend to be
    paraphrases: "acquired"/"bought"). Output: (rel_a, rel_b,
    n_shared_pairs) with rel_a < rel_b and ≥ ``min_shared`` witnesses.

    Scale shape: the self-join key is the (arg1, arg2) pair, and hot
    pairs ("united states", "china") carry many relations — an
    uncapped self-join squares that count. ``max_rels_per_pair`` is
    the same deterministic windowed cap as every other fan-out in the
    engine (two_hop, G5/G7): at most k relations per arg-pair enter
    the pair expansion, ordered by rel_norm, so a hot pair emits
    ≤ k(k−1)/2 rows instead of millions. The window partitions on the
    join key itself, so the exchange is reused. Recall-only loss,
    disclosed (a capped pair can miss SOME witness pairs, never emit
    false ones); precision is untouched.
    """
    # materialized once (r6): the capped frame is SELF-JOINED below, so
    # without this the upstream groups pipeline executes twice. The
    # checkpoint sits on the distinct triples (pre-window) so the cap
    # window — and its map-side WindowGroupLimit — stays in the final
    # plan; re-running the window per join side costs one exchange over
    # the (tiny, distinct) triple set, not a pipeline re-run.
    triples = groups.select("rel_norm", "arg1_norm", "arg2_norm").distinct() \
        .localCheckpoint(eager=True)
    w = Window.partitionBy("arg1_norm", "arg2_norm").orderBy("rel_norm")
    capped = (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_rels_per_pair)
        .drop("_rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    joined = a.join(
        b,
        (F.col("a.arg1_norm") == F.col("b.arg1_norm"))
        & (F.col("a.arg2_norm") == F.col("b.arg2_norm"))
        & (F.col("a.rel_norm") < F.col("b.rel_norm")),
    )
    return (
        joined.groupBy(
            F.col("a.rel_norm").alias("rel_a"),
            F.col("b.rel_norm").alias("rel_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_pairs"))
        .filter(F.col("n_shared_pairs") >= min_shared)
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Diff two KG snapshots on the group key — (arg1_norm, rel_norm,
    arg2_norm, old_size, new_size, status ∈ {added, removed, grown,
    shrunk}). The operational primitive for incremental pipelines:
    what did this crawl batch change? Unchanged groups are dropped so
    the output is proportional to the CHANGE, not the table.

    Scale shape: one full-outer shuffle join on the group key — both
    sides arrive hash-partitioned on the same key the groups stage
    already partitions by, and when snapshots are written bucketed
    (plans/pipeline.py) the join is co-located with no re-shuffle at
    all. No skew exposure beyond what G1's caps already bound.
    """
    o = old.select(*GROUP_KEY, F.col("size").alias("old_size"))
    n = new.select(*GROUP_KEY, F.col("size").alias("new_size"))
    full = o.join(n, list(GROUP_KEY), "full_outer")
    status = (
        F.when(F.col("old_size").isNull(), F.lit("added"))
        .when(F.col("new_size").isNull(), F.lit("removed"))
        .when(F.col("new_size") > F.col("old_size"), F.lit("grown"))
        .when(F.col("new_size") < F.col("old_size"), F.lit("shrunk"))
    )
    return (
        full.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*GROUP_KEY, "old_size", "new_size", "status")
    )


def relation_type_signature(
    linked: DataFrame,
    k: int = 3,
    max_types_per_side: int = 8,
) -> DataFrame:
    """Schema induction over the linked KG: the top-``k`` (arg1_type,
    arg2_type) signatures per relation, weighted by instance support —
    "acquired" ⇒ (/business/company, /business/company). This is the
    aggregate view of what the reference's typer consumes per-arg
    (``UnlinkableEntityTyper.scala:219-243`` predicts types FROM
    rel→entity evidence; the signature table is that evidence turned
    into a queryable relation-schema artifact).

    Output: (rel_norm, arg1_type, arg2_type, support = Σ group size,
    n_groups, rank).

    Scale shape: the only expansion is the per-group type cross
    product, bounded at ``max_types_per_side``² by a deterministic
    sorted-prefix cap on EACH side's type list (FreeBase-style type
    sets run 1-10 types; a pathological entity with hundreds cannot
    quadratic-blow the explode — same concession as the shingle
    caps). Then one map-side-combinable groupBy and a windowed top-k
    per relation; hot relations ("is") are bounded by the window, not
    by luck.
    """
    t1 = F.explode(
        F.slice(F.array_sort("arg1_types"), 1, max_types_per_side)
    ).alias("arg1_type")
    pairs = (
        linked.select("rel_norm", "size", t1, "arg2_types")
        .select(
            "rel_norm",
            "size",
            "arg1_type",
            F.explode(
                F.slice(F.array_sort("arg2_types"), 1, max_types_per_side)
            ).alias("arg2_type"),
        )
    )
    agg = pairs.groupBy("rel_norm", "arg1_type", "arg2_type").agg(
        F.sum("size").alias("support"), F.count(F.lit(1)).alias("n_groups")
    )
    w = Window.partitionBy("rel_norm").orderBy(
        F.desc("support"), F.asc("arg1_type"), F.asc("arg2_type")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def entity_aliases(
    linked: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Alias table per linked entity: the top-``k`` surface forms
    (normalized arg strings) that link to each FreeBase id, weighted
    by instance support — the KG-construction artifact that answers
    "what strings do people use for /m/02mjmr?" and feeds the
    reference's frontend grouping (M6 groups BY this equivalence;
    ``ExtractionGroupFetcher.scala`` resolves queries through it).
    Both argument sides contribute: an entity's aliases as a subject
    and as an object are the same alias set.

    Output: (fbid, surface, support = Σ group size, n_groups, rank).

    Scale shape: a two-way union of column projections (map-only),
    ONE map-side-combinable groupBy on (fbid, surface), then the
    windowed per-entity top-k — WindowGroupLimit pushes the rank
    filter map-side, so a mega-entity ("united states") never
    materializes its full surface list on one task beyond the
    aggregated distinct-surface rows it actually has.
    """
    # both sides project from `linked`; materialize once so a
    # pipeline-fed linked KG is not extracted+linked twice (r6)
    linked = linked.localCheckpoint(eager=True)
    sides = []
    for side in ("arg1", "arg2"):
        sides.append(
            linked.select(
                F.col(f"{side}_entity.fbid").alias("fbid"),
                F.col(f"{side}_norm").alias("surface"),
                F.col("size"),
            ).filter(F.col("fbid").isNotNull())
        )
    agg = (
        sides[0].unionByName(sides[1])
        .groupBy("fbid", "surface")
        .agg(F.sum("size").alias("support"), F.count(F.lit(1)).alias("n_groups"))
    )
    w = Window.partitionBy("fbid").orderBy(
        F.desc("support"), F.asc("surface")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def relation_inverses(
    groups: DataFrame,
    min_shared: int = 2,
    max_rels_per_pair: int = 64,
) -> DataFrame:
    """Inverse/converse-relation candidates by SWAPPED argument pairs —
    the mirror of ``relation_synonyms``: rel_a(x, y) co-occurring with
    rel_b(y, x) signals converse paraphrases ("acquired"/"was bought
    by", "owns"/"belongs to"), and rel_a = rel_b signals a SYMMETRIC
    relation ("married", "borders"). Output: (rel_a, rel_b,
    n_shared_pairs) with rel_a ≤ rel_b; for the symmetric diagonal
    each unordered witness pair {x, y} is counted once (x < y guard)
    and x = y self-witnesses are excluded.

    Scale shape: identical to relation_synonyms — one windowed cap per
    (arg1, arg2) pair bounds both join sides at ``max_rels_per_pair``
    (a hot entity pair emits ≤ k² rows, never millions), and the join
    key is pure equality (a's (arg1, arg2) against b's (arg2, arg1)).
    Recall-only cap loss, disclosed.
    """
    triples = (
        groups.select("rel_norm", "arg1_norm", "arg2_norm")
        .filter(F.col("arg1_norm") != F.col("arg2_norm"))
        .distinct()
    )
    # checkpointed pre-window as in relation_synonyms (r6)
    triples = triples.localCheckpoint(eager=True)
    w = Window.partitionBy("arg1_norm", "arg2_norm").orderBy("rel_norm")
    capped = (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_rels_per_pair)
        .drop("_rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    joined = a.join(
        b,
        (F.col("a.arg1_norm") == F.col("b.arg2_norm"))
        & (F.col("a.arg2_norm") == F.col("b.arg1_norm"))
        & (
            (F.col("a.rel_norm") < F.col("b.rel_norm"))
            | (
                (F.col("a.rel_norm") == F.col("b.rel_norm"))
                & (F.col("a.arg1_norm") < F.col("a.arg2_norm"))
            )
        ),
    )
    return (
        joined.groupBy(
            F.col("a.rel_norm").alias("rel_a"),
            F.col("b.rel_norm").alias("rel_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_pairs"))
        .filter(F.col("n_shared_pairs") >= min_shared)
    )
