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

from pyspark.sql import DataFrame
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
    arg1: str | None = None
    rel: str | None = None
    arg2: str | None = None
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
            if raw:
                value = normalize_query_text(raw) if self.stem else raw
                conds.append(F.col(col) == value)
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
    groups: DataFrame, spec: QuerySpec, max_instances_per_group: int | None = None
) -> DataFrame:
    """Biggest groups first under the result budget (T7/T8). The
    reference additionally budgets instances per result set
    (``ParallelExtractionGroupFetcher.scala:73-77``); here a per-group
    truncation keeps payloads bounded without a driver-side loop."""
    out = (
        groups.filter(spec.predicate())
        .orderBy(F.desc("size"), *[F.asc(c) for c in ("arg1_norm", "rel_norm", "arg2_norm") if c in groups.columns])
        .limit(spec.max_groups)
    )
    if max_instances_per_group is not None and "instances" in groups.columns:
        out = out.withColumn(
            "instances", F.slice("instances", 1, max_instances_per_group)
        )
    return out
