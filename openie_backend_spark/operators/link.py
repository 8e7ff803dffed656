"""Entity linking: groups → groups + FreeBase-style entity links/types.

Set-based Spark rewrite of the reference linker
(``linker/.../entity/EntityLinker.scala:37-45`` per-group flow:
head phrase → CrossWikis candidates → context match → argmax → types):

* M10 head-phrase shrink loop (``linker/.../util/HeadPhraseFinder.scala:
  8-62``): the reference probes the anchor dictionary word-by-word
  ("shrink from the left until the phrase has candidates"). The
  set-based form: posexplode ALL left-suffixes of the head phrase,
  inner-join the anchor dim once, keep the longest matching suffix
  (min shrink index) per (group, side) — one broadcast join instead of
  a per-row loop (SURVEY §7.4-2).
* J3 anchor→prior is a **broadcast** join against the CrossWikis-style
  dim with the reference's high-precision cutoffs cprob ≥ 0.5,
  count ≥ 500 (``CrosswikisCandidateFinder.java:26-29,50-71``). At
  10^12-page scale the dim (~100M anchors) may exceed broadcast size:
  ``broadcast_threshold_rows`` switches to a shuffle hash join where
  AQE's skew-join splitting handles head anchors ("obama"), replacing
  the reference's manual 0-99 salting (``TypeAttacher.scala:20,25``).
* J8 context match replaces Lucene MoreLikeThis
  (``linker/.../entity/batch_match.java:209-254``) with a candidate-
  pruned IDF-WEIGHTED term match: MoreLikeThis ranks query terms by
  tf·idf against the whole index, so a term shared by every candidate
  ("tesla" for both Nikola Tesla and Tesla Motors) contributes almost
  nothing while a discriminative term ("motors") decides. The Spark
  analog multiplies each candidate context term's weight by its corpus
  idf — ``ln(N_entities / df(term))`` over dim_context_terms, one
  groupBy at dim-prep time — and the score is the matched idf-weight
  fraction, computed with zip_with/aggregate on the JVM, no Python.
* T6 argmax: ``max_by(candidate, cprob · log(inlinks) · context)``
  (``EntityLinker.scala:147-149``), 3-decimal rounding as in
  ``batch_match.java:244``.
* J6 typing: broadcast join fbid → types
  (``linker/.../util/FbTypeLookup.scala:49-60``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_backend_spark.operators.group import GROUP_KEY

HIGH_PRECISION_CPROB = 0.5
HIGH_PRECISION_COUNT = 500

ENTITY_STRUCT_FIELDS = ("name", "fbid", "score", "inlink_ratio")

# Junk-anchor refusal (spirit of the reference's serve-time entity
# stoplist, ``ExtractionGroupFetcher.scala:119-133,170``, applied on
# the anchor side): a bare closed-class word is not an entity mention
# — the reference resolves "you" → the article "Bless you" only via
# its out-of-band per-entity context index, which we do not ship, so
# the safe behavior is NO link rather than a prior-driven mislink.
# Applied per-SUFFIX: a single-word suffix that is a pronoun /
# determiner / preposition / auxiliary / pure number produces no
# candidate; longer suffixes ("october 15") are never refused, and a
# multi-word head still links through them.
JUNK_ANCHORS = frozenset(
    # pronouns, wh-words, expletives, indefinites
    "i you he she it we they me him her us them "
    "my your his its our their mine yours hers ours theirs "
    "myself yourself himself herself itself ourselves themselves "
    "this that these those who whom whose which what "
    "there here one something anything nothing everything "
    "someone anyone everyone nobody somebody everybody".split()
) | frozenset(
    # determiners, conjunctions, prepositions, auxiliaries/copulas
    "the a an some all both any each every no none other "
    "and or but of in on at by for with to from as "
    "up off out over under into about after before between "
    "am is are was were be been being do does did "
    "have has had having will would can could shall should "
    "may might must not so then than if because when while".split()
)


def _lnrm_sql(col):
    """CrossWikis lnrm (``CrosswikisHandler.java:23-29``) as builtins:
    lowercase + strip non-alphanumerics. (Diacritics folding for
    non-ASCII lives in the pandas-UDF variant in functions.norm;
    builtin path keeps the hot join JVM-side.)"""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def _prepare_dims(spark_dims: dict[str, DataFrame]) -> DataFrame:
    """One denormalized candidate dim: anchor_lnrm → (entity struct).
    Joining the four reference lookup stores once at dim-prep time
    means the per-group path does a single broadcast join."""
    anchors = spark_dims["dim_anchor_prior"].filter(
        (F.col("cprob") >= HIGH_PRECISION_CPROB)
        & (F.col("count") >= HIGH_PRECISION_COUNT)
    )
    title_fbid = spark_dims["dim_title_fbid"]
    inlinks = spark_dims["dim_fbid_title_inlinks"].select("fbid", "inlinks")
    types = spark_dims["dim_fbid_types"]
    # J8: idf-weight the context terms over the candidate corpus (the
    # MoreLikeThis analog — see module docstring). term_df joins on
    # term as a shuffle join (AQE decides broadcast); the 1-row total
    # is an explicit broadcast.
    ctx_src = spark_dims["dim_context_terms"]
    term_df = ctx_src.groupBy("term").agg(
        F.count_distinct("fbid").alias("_df")
    )
    n_total = ctx_src.agg(F.count_distinct("fbid").alias("_n"))
    weighted = (
        ctx_src.join(term_df, "term")
        .crossJoin(F.broadcast(n_total))
        .select(
            "fbid", "term",
            (F.col("weight") * F.log(F.col("_n") / F.col("_df"))).alias("weight"),
        )
    )
    ctx = (
        weighted
        .groupBy("fbid")
        .agg(
            F.collect_list("term").alias("ctx_terms"),
            F.collect_list("weight").alias("ctx_weights"),
            F.sum("weight").alias("ctx_total"),
        )
    )
    return (
        anchors.join(title_fbid, anchors["entity_title"] == title_fbid["title"], "inner")
        .join(inlinks, "fbid", "left")
        .join(types, "fbid", "left")
        .join(ctx, "fbid", "left")
        .select(
            "anchor_lnrm", "title", "fbid", "cprob",
            F.coalesce("inlinks", F.lit(2)).alias("inlinks"),
            F.coalesce("types", F.array().cast("array<string>")).alias("types"),
            F.coalesce("ctx_terms", F.array().cast("array<string>")).alias("ctx_terms"),
            F.coalesce("ctx_weights", F.array().cast("array<double>")).alias("ctx_weights"),
            F.coalesce("ctx_total", F.lit(0.0)).alias("ctx_total"),
        )
    )


def junk_anchor_dim(spark, extra_dims: dict[str, DataFrame] | None = None) -> DataFrame:
    """The junk-anchor refusal set as a one-column broadcast dim table
    (``junk_word``), mirroring the reference's data-driven entity
    stoplist (``entity-stoplist-25k.txt``,
    ``ExtractionGroupFetcher.scala:218-224``) and our own F7 shape:
    operators consume a TABLE, so deployments can extend or replace
    the refusal list without code changes by supplying
    ``dims["dim_junk_anchors"]``. Defaults to the built-in
    ``JUNK_ANCHORS`` closed-class set (the oracle SQL imports the same
    constant, so default behavior is byte-identical)."""
    if extra_dims and "dim_junk_anchors" in extra_dims:
        return extra_dims["dim_junk_anchors"].select(
            F.lower(F.col(extra_dims["dim_junk_anchors"].columns[0]))
            .alias("junk_word")
        )
    return spark.createDataFrame(
        [(w,) for w in sorted(JUNK_ANCHORS)], "junk_word string"
    )


def _link_side(
    groups: DataFrame,
    cand_dim: DataFrame,
    side: str,
    broadcast_dim: bool,
    refuse_junk: bool = True,
    min_score: float = 0.0,
    junk_dim: DataFrame | None = None,
) -> DataFrame:
    """Resolve one argument side to its best entity candidate."""
    head_col = f"{side}_head"
    # context bag: sentence tokens of the top instance when the
    # pipeline carries token layers; in slim mode fall back to the
    # triple's own words (weaker but well-defined context)
    inst_fields = {
        f.name
        for f in groups.schema["instances"].dataType.elementType.fields
    } if "instances" in groups.columns else set()
    if "tokens" in inst_fields:
        context = F.transform(
            F.element_at("instances", 1)["tokens"], lambda t: F.lower(t)
        )
    else:
        top = F.element_at("instances", 1)
        context = F.split(
            F.lower(
                F.concat_ws(" ", top["arg1_text"], top["rel_text"], top["arg2_text"])
            ),
            " ",
        )
    src = groups.select(
        *GROUP_KEY,
        F.split(F.col(head_col), " ").alias("_head_words"),
        context.alias("_sent_tokens"),
    ).filter(F.size("_head_words") > 0)

    # all left-suffixes of the head phrase, shrink index 0 = full phrase
    suffixes = src.select(
        *GROUP_KEY,
        "_sent_tokens",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_head_words") - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("_head_words"), i + 1, F.size("_head_words"))
                ),
            )
        ).alias("shrink_idx", "suffix"),
    ).withColumn("anchor_lnrm", _lnrm_sql(F.col("suffix")))

    if refuse_junk:
        single_word = ~F.col("suffix").contains(" ")
        # all-caps multi-letter suffixes (US, WHO, IT) are acronym
        # mentions, not the closed-class words their lowercase spells —
        # exempt them from the stoplist (ADVICE r4); the pure-digit
        # refusal still applies regardless of case
        acronym = (
            (F.col("suffix") == F.upper(F.col("suffix")))
            & (F.length("suffix") > 1)
            & F.col("suffix").rlike("[A-Z]")
        )
        if junk_dim is None:
            junk_dim = junk_anchor_dim(groups.sparkSession)
        # stoplist refusal as a broadcast left-anti join against the
        # dim table (data-driven, F7's shape) instead of a code-level
        # IN-list; the tiny dim broadcasts, so no shuffle is added
        suffixes = suffixes.join(
            F.broadcast(junk_dim),
            single_word & ~acronym
            & (F.lower(F.col("suffix")) == F.col("junk_word")),
            "left_anti",
        ).filter(
            ~(single_word & F.col("anchor_lnrm").rlike("^[0-9]+$"))
        )

    dim = F.broadcast(cand_dim) if broadcast_dim else cand_dim
    cands = suffixes.join(dim, "anchor_lnrm", "inner")

    # context score: matched weight fraction of the candidate's terms
    matched = F.aggregate(
        F.zip_with(
            "ctx_terms", "ctx_weights",
            lambda t, w: F.when(F.array_contains(F.col("_sent_tokens"), t), w).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ctx_score = F.when(F.col("ctx_total") > 0, matched / F.col("ctx_total")).otherwise(F.lit(0.0))
    score = F.round(F.col("cprob") * F.log(F.col("inlinks")) * ctx_score, 3)

    best = (
        cands.withColumn("_score", score)
        # longest matching suffix wins; among equals, best score
        .groupBy(*GROUP_KEY)
        .agg(
            F.max_by(
                F.struct(
                    F.col("title").alias("name"),
                    F.col("fbid"),
                    F.col("_score").alias("score"),
                    (F.lit(1.0) / F.col("inlinks")).alias("inlink_ratio"),
                    F.col("types"),
                ),
                # fbid as the final component makes exact-tie selection
                # deterministic (two candidates with equal suffix length
                # and equal score resolve by fbid, not arrival order)
                F.struct((-F.col("shrink_idx")).alias("a"), F.col("_score").alias("b"),
                         F.col("fbid").alias("c")),
            ).alias("_best")
        )
        # acceptance floor AFTER the argmax: the longest-suffix winner
        # still blocks shorter suffixes; if THAT winner scores below
        # min_score the group gets NO link (NULL after the caller's
        # left join), never a different, lower-priority entity.
        # Default 0.0 keeps every winner (scores are >= 0).
        .filter(F.col("_best.score") >= F.lit(min_score))
        .select(
            *GROUP_KEY,
            F.struct(
                F.col("_best.name"), F.col("_best.fbid"),
                F.col("_best.score"), F.col("_best.inlink_ratio"),
            ).alias(f"{side}_entity"),
            F.col("_best.types").alias(f"{side}_types"),
        )
    )
    return best


def link_groups(
    groups: DataFrame,
    dims: dict[str, DataFrame],
    broadcast_dim: bool = True,
    min_score: float = 0.0,
    refuse_junk_anchors: bool = True,
) -> DataFrame:
    """Attach arg1/arg2 entity links + types to groups.

    ``groups`` is referenced three times (the base frame + one
    ``_link_side`` per argument side); materialize it once so a
    pipeline-fed frame (extraction + grouping upstream) is not
    re-executed per reference (r6 — the ad-hoc analog of the stage
    materialization plans/pipeline.py does with parquet)."""
    groups = groups.localCheckpoint(eager=True)
    cand_dim = _prepare_dims(dims)
    junk_dim = junk_anchor_dim(groups.sparkSession, dims)
    out = groups
    for side in ("arg1", "arg2"):
        linked = _link_side(groups, cand_dim, side, broadcast_dim,
                            refuse_junk=refuse_junk_anchors,
                            min_score=min_score, junk_dim=junk_dim)
        out = out.join(linked, GROUP_KEY, "left")
    empty = F.array().cast("array<string>")
    return (
        out.withColumn("arg1_types", F.coalesce("arg1_types", empty))
        .withColumn("arg2_types", F.coalesce("arg2_types", empty))
    )
