"""Serving layer: conjunctive queries over the materialized group/SPO
tables — the Spark SQL replacement for the reference's Lucene serving
path (``backend/.../QuerySpec.scala:22-34,81-134`` +
``ParallelExtractionGroupFetcher.scala:70-186``).

A ``QuerySpec`` is a conjunction of equality predicates on normalized
columns plus entity/type constraints, answered as
``WHERE ... ORDER BY size DESC LIMIT n``. Catalyst does what the
reference hand-rolls: the size-bucketed biggest-first subqueries
(``QuerySpec.scala:138-150``) collapse into the ORDER BY + LIMIT
(TopK physical operator), and partition pruning on the bucketed norm
columns replaces shard fan-out. Query fields are stemmed with the same
normalizer the pipeline used (``QuerySpec.scala:61-79``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openie_backend_spark.nlp import chunker, stemmer

DEFAULT_MAX_GROUPS = 750  # ExtractionGroupFetcher.scala:173


def normalize_query_text(text: str) -> str:
    """POS-tag + stem + determiner-strip a free-text query field."""
    toks = chunker.tokenize(text)
    tags = chunker.pos_tag(toks)
    return stemmer.index_key_part(toks, tags)


@dataclass
class QuerySpec:
    # each free-text field accepts one phrase or a LIST of phrases —
    # the reference ORs multiple phrase clauses within one field
    # (QuerySpec.scala:81-134 builds a BooleanQuery of SHOULD phrase
    # clauses per field); a list here is the same disjunction
    arg1: str | list[str] | None = None
    rel: str | list[str] | None = None
    arg2: str | list[str] | None = None
    arg1_entity_id: str | None = None
    arg2_entity_id: str | None = None
    arg1_types: list[str] = field(default_factory=list)
    arg2_types: list[str] = field(default_factory=list)
    corpora: str | None = None
    max_groups: int = DEFAULT_MAX_GROUPS
    stem: bool = True
    # QuerySpec.scala:32,36,128 — `and: Boolean`: False answers the
    # disjunction of the field predicates instead of the conjunction
    conjunction: bool = True

    def predicate(self):
        conds = []
        for col, raw in (("arg1_norm", self.arg1), ("rel_norm", self.rel),
                         ("arg2_norm", self.arg2)):
            if raw is not None and raw != "":
                phrases = [raw] if isinstance(raw, str) else list(raw)
                values = [
                    normalize_query_text(p) if self.stem else p
                    for p in phrases
                ]
                if not values:
                    # explicit empty disjunction: 'match nothing', NOT
                    # 'no constraint' (None means no constraint)
                    conds.append(F.lit(False))
                else:
                    # OR within the field (an IN-list, so Catalyst can
                    # turn it into partition pruning on a bucketed norm
                    # column); AND/OR ACROSS fields stays governed by
                    # `conjunction`
                    conds.append(F.col(col).isin(*values))
        if self.arg1_entity_id:
            conds.append(F.col("arg1_entity.fbid") == self.arg1_entity_id)
        if self.arg2_entity_id:
            conds.append(F.col("arg2_entity.fbid") == self.arg2_entity_id)
        for t in self.arg1_types:
            conds.append(F.array_contains("arg1_types", t))
        for t in self.arg2_types:
            conds.append(F.array_contains("arg2_types", t))
        if self.corpora:
            conds.append(
                F.exists("instances", lambda i: i["corpus"] == self.corpora)
            )
        if not conds:
            return F.lit(True)
        pred = conds[0]
        for c in conds[1:]:
            pred = (pred & c) if self.conjunction else (pred | c)
        return pred


def fetch_groups(
    groups: DataFrame,
    spec: QuerySpec,
    max_instances_per_group: int | None = None,
    max_instances_total: int | None = None,
) -> DataFrame:
    """Biggest groups first under the result budgets (T7/T8).

    ``max_instances_total`` is the reference's result-set instance
    budget with 5 % tolerance (``ExtractionGroupFetcher.scala:55-57,
    141-161``: keep consuming results while the remaining instance
    budget exceeds ``max/20``). Set-based form: a group is admitted iff
    the instances consumed BEFORE it leave more than the tolerance —
    a cumulative-sum window over the (size DESC, key ASC) result
    order. The window is evaluated after the ``max_groups`` LIMIT, so
    it runs over ≤ 750 rows — no global-sort scale concern. The
    reference decrements budgets per Lucene sub-query; the cumulative
    form is the order-equivalent declarative semantics.
    ``max_instances_per_group`` additionally truncates payloads
    (``ParallelExtractionGroupFetcher.scala:73-77``)."""
    order = [F.desc("size")] + [
        F.asc(c) for c in ("arg1_norm", "rel_norm", "arg2_norm")
        if c in groups.columns
    ]
    out = (
        groups.filter(spec.predicate())
        .orderBy(*order)
        .limit(spec.max_groups)
    )
    if max_instances_total is not None:
        tolerance = max_instances_total // 20
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        out = (
            out.withColumn("_consumed", F.coalesce(F.sum("size").over(w), F.lit(0)))
            # reference: keep while remaining budget > tolerance, i.e.
            # consumed-before < max − tolerance (strict)
            .filter(F.col("_consumed") < max_instances_total - tolerance)
            .drop("_consumed")
        )
    if max_instances_per_group is not None and "instances" in groups.columns:
        out = out.withColumn(
            "instances", F.slice("instances", 1, max_instances_per_group)
        )
    return out
