"""Physical-plan audit: `.explain(formatted)` for the headline
queries, with automated assertions on the plan properties the engine
is designed around → EXPLAIN.md.

Checks (each a grep over the formatted plan):

* kg pipeline scan reads ONLY (url, text) under the NLP stage
  (column pruning through the lang filter) and pushes the lang filter
  to the parquet scan (PushedFilters);
* grouping runs on ONE exchange (dedup + caps + agg share the hash
  partitioning);
* the linker's dim joins are broadcast, not shuffled;
* LSH bucket join is a shuffled equality join (no NestedLoop /
  CartesianProduct anywhere except the by-design ANN brute force);
* scalar text operators are one shuffle-free JVM projection over the
  scan, with no Python-eval operator in the plan.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from openie_backend_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", parallelism=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    sections = []
    checks = []

    def audit(name, df, assertions):
        plan = plan_of(df)
        results = []
        for desc, pattern, want in assertions:
            found = bool(re.search(pattern, plan))
            ok = found == want
            results.append((desc, ok))
            checks.append((name, desc, ok))
        sections.append((name, plan, results))

    # 1. KG pipeline (extract -> filter -> group -> SPO)
    audit("kg_spo", qs["kg_spo"](spark, sf_dir), [
        ("parquet scan pruned to doc_id,text,lang (url derives from doc_id)",
         r"ReadSchema: struct<doc_id:bigint,text:string,lang:string>", True),
        ("lang filter pushed to scan", r"PushedFilters: \[.*EqualTo\(lang,en\)", True),
        ("group exchange partitioned on the norm key",
         r"Arguments: hashpartitioning\(arg1_norm", True),
        ("no cartesian/nested-loop join", r"CartesianProduct|BroadcastNestedLoop", False),
    ])
    plan = plan_of(qs["kg_spo"](spark, sf_dir))
    # the only other Exchange is the sandbox input repartition
    # (RoundRobinPartitioning, REPARTITION_BY_NUM in _t())
    n_exchanges = len(re.findall(r"Arguments: hashpartitioning", plan))
    checks.append(("kg_spo", f"hash exchanges total = {n_exchanges} (1 expected: "
                   "dedup+caps+agg share one shuffle)", n_exchanges == 1))

    # 2. Linker chain: broadcast dims
    audit("kg_linked", qs["kg_linked"](spark, sf_dir), [
        ("candidate dim broadcast-joined", r"BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct", False),
    ])

    # 3. LSH dedup: equality bucket join, no self nested loop
    audit("dedup_minhash_lsh", qs["dedup_minhash_lsh"](spark, sf_dir), [
        ("no cartesian/nested-loop", r"CartesianProduct|BroadcastNestedLoop", False),
        ("map-side partial min-agg before exchange", r"partial_min", True),
    ])

    # 4. Jaccard over LSH candidates: id-equality joins only
    audit("dedup_ngram_jaccard", qs["dedup_ngram_jaccard"](spark, sf_dir), [
        ("no shingle self-join blowup (no sort-merge on shingle)",
         r"SortMergeJoin \[shingle", False),
        ("no cartesian/nested-loop", r"CartesianProduct|BroadcastNestedLoop", False),
    ])

    # 5. Text quality: pure codegen, no Python eval
    audit("txt_quality", qs["txt_quality"](spark, sf_dir), [
        ("single JVM projection over the scan (no shuffle)",
         r"Arguments: hashpartitioning", False),
        ("no Python UDF in plan", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])

    # 6. Serving query: filter + TopK (no full sort)
    audit("kg_serving_query", qs["kg_serving_query"](spark, sf_dir), [
        ("TakeOrderedAndProject (TopK) instead of global sort+limit",
         r"TakeOrderedAndProject", True),
    ])

    # 7. Salted join (J2): join keys carry the salt, right side exploded
    audit("j2_salted_join", qs["j2_salted_join"](spark, sf_dir), [
        ("join condition includes the salt column", r"_salt", True),
        ("right side exploded over salt buckets", r"explode\(", True),
        ("no cartesian/nested-loop join", r"CartesianProduct|BroadcastNestedLoop", False),
    ])

    # 8. Tab source (S1/M12): JVM split/regexp only, single stage
    audit("src_tab_extractions", qs["src_tab_extractions"](spark, sf_dir), [
        ("no Python UDF in the parse path",
         r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("no shuffle (pure per-line projection)",
         r"Arguments: hashpartitioning", False),
    ])

    # 9. Frontend regroup (G3 stage 2): one hash exchange on the
    # frontend key shared by the window and the groupBy
    # (the plan embeds the linker chain, whose 1-row idf-total
    # crossJoin(broadcast(...)) is an intentional BroadcastNestedLoop —
    # assert no CartesianProduct, as the kg_linked audit does)
    fr = qs["kg_frontend_regroup"](spark, sf_dir)
    audit("kg_frontend_regroup", fr, [
        ("partitioned on the frontend key",
         r"hashpartitioning\(arg1_frontend", True),
        ("no cartesian join", r"CartesianProduct", False),
    ])

    # 10. Banded SimHash (round 5): candidates via the shared
    # bucketed_pairs star-of-groups path — ONE exchange on the band
    # key serves window + bucket aggregate (no band self-join at all),
    # and the banded rows CARRY the signature (emit_order), so the
    # Hamming rerank is a per-pair bit_count with NO join whatsoever
    audit("dedup_simhash_banded", qs["dedup_simhash_banded"](spark, sf_dir), [
        ("no cartesian signature scan", r"CartesianProduct", False),
        ("bucket exchange on the band key", r"hashpartitioning\(band_idx", True),
        ("no join at all (signature carried through the bucket rows)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", False),
        ("no Python in the signature path",
         r"BatchEvalPython|ArrowEvalPython", False),
    ])

    # 11. Two-hop reachability (round 5): a self-join of the edge
    # relation on the mid key — equality join, no cartesian, and the
    # hub-degree cap's row_number window on both inputs
    audit("kg_two_hop", qs["kg_two_hop"](spark, sf_dir), [
        ("equality join on mid", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct", False),
        ("hub-degree cap window", r"row_number", True),
    ])

    # 12. Multi-probe ANN (round 4): probe explode on the broadcast
    # query side only; bucket join stays an equality join
    audit("ann_lsh", qs["ann_lsh"](spark, sf_dir), [
        ("bucket equality join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct", False),
        ("probe explode present (multi-probe)", r"explode\(array\(bucket", True),
    ])

    # 13. Distinct-sentence extraction (round 5): the CPython NLP stage
    # must sit ABOVE the distinct aggregate (runs once per distinct
    # sentence), with the explicit round-robin repartition countering
    # AQE's byte-size coalescing, and the provenance join an equality
    # hash join on the md5 key
    from pyspark.sql import functions as F
    from openie_backend_spark.operators.extract import extract_pages
    ded_pages = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("url"), "text",
        F.lit("en").alias("lang"))
    ded = extract_pages(ded_pages, include_layers=False,
                        dedup_sentences=True)
    audit("extract_dedup_sentences", ded, [
        ("distinct aggregate on the sentence key",
         r"Keys \[2\]: \[sent_key", True),
        ("explicit repartition before the NLP stage",
         r"RoundRobinPartitioning", True),
        ("provenance join is an equality join",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("Python stage present exactly once", r"MapInPandas", True),
    ])
    ded_plan = plan_of(ded)
    n_py = len(re.findall(r"\(\d+\) MapInPandas", ded_plan))
    checks.append(("extract_dedup_sentences",
                   f"MapInPandas nodes = {n_py} (NLP fused once)", n_py == 1))

    # 14. Web-text hygiene family (round 5): repetition/PII are pure
    # per-row codegen (no shuffle, no Python); URL canon and line dedup
    # each do exactly ONE hash exchange (their groupBy)
    xq = entry.extra_queries()
    audit("txt_repetition", xq["txt_repetition"](spark, sf_dir), [
        ("no shuffle (per-row array expressions)",
         r"Arguments: hashpartitioning", False),
        ("no Python UDF in plan", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    audit("web_pii_mask", xq["web_pii_mask"](spark, sf_dir), [
        ("no shuffle (per-row regexp chain)",
         r"Arguments: hashpartitioning", False),
        ("no Python UDF in plan", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    # url canon: ONE exchange (its groupBy). line dedup: exactly TWO —
    # the unavoidable cost of exact n_docs, taken as two-level agg
    # (fine key then line key) instead of Spark's 2×-row Expand plan
    # for count+count_distinct in one aggregate.
    for q, want_ex in (("web_url_canon", 1), ("dedup_lines", 2)):
        df = xq[q](spark, sf_dir)
        p = plan_of(df)
        n_ex = len(re.findall(r"Arguments: hashpartitioning", p))
        checks.append((q, f"hash exchanges = {n_ex} ({want_ex} expected)",
                       n_ex == want_ex))
        checks.append((q, "map-side partial aggregation before the exchange",
                       bool(re.search(r"partial_count|partial_min", p))))
        checks.append((q, "no 2x Expand node for distinct aggregation",
                       not re.search(r"\(\d+\) Expand", p)))
        checks.append((q, "no Python UDF in plan",
                       not re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas", p)))
        sections.append((q, p, []))

    # 15. Corpus-curation family (round 5): decontamination broadcasts
    # the benchmark side and never shuffles the corpus before the probe
    # join; packing is ONE exchange (the salt-bucket window); host
    # stats is the two-level agg (no Expand), two exchanges
    audit("web_decontaminate", xq["web_decontaminate"](spark, sf_dir), [
        ("benchmark side broadcast-joined", r"BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("no Python UDF in plan", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    dec_plan = plan_of(xq["web_decontaminate"](spark, sf_dir))
    n_ex = len(re.findall(r"Arguments: hashpartitioning", dec_plan))
    checks.append(("web_decontaminate",
                   f"hash exchanges = {n_ex} (2 expected: benchmark-side "
                   "distinct + per-doc hit aggregate; the corpus probe side "
                   "never shuffles)", n_ex == 2))
    audit("pack_sequences", xq["pack_sequences"](spark, sf_dir), [
        ("running-total window over the salt bucket", r"\(\d+\) Window", True),
        ("no Python UDF in plan", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
    ])
    pk_plan = plan_of(xq["pack_sequences"](spark, sf_dir))
    n_ex = len(re.findall(r"Arguments: hashpartitioning", pk_plan))
    checks.append(("pack_sequences",
                   f"hash exchanges = {n_ex} (1 expected: the bucket window)",
                   n_ex == 1))
    hs_plan = plan_of(xq["web_host_stats"](spark, sf_dir))
    n_ex = len(re.findall(r"Arguments: hashpartitioning", hs_plan))
    checks.append(("web_host_stats",
                   f"hash exchanges = {n_ex} (2 expected: (host,url) then host)",
                   n_ex == 2))
    checks.append(("web_host_stats", "no 2x Expand node for distinct aggregation",
                   not re.search(r"\(\d+\) Expand", hs_plan)))
    checks.append(("web_host_stats", "map-side partial aggregation",
                   bool(re.search(r"partial_count|partial_min", hs_plan))))
    sections.append(("web_host_stats", hs_plan, []))

    # 16. DSIR importance weighting: the 4096-row weight dim is
    # broadcast onto the exploded corpus grams; the only corpus-wide
    # exchange is the final groupBy(doc_id) — the two histogram
    # exchanges are <=n_buckets rows each (map-side combined)
    audit("dsir_importance", xq["dsir_importance"](spark, sf_dir), [
        ("weight dim broadcast-joined", r"BroadcastHashJoin", True),
        ("no cartesian on the corpus side (scalar totals are "
         "broadcast nested-loop by design, 1-row inner)",
         r"CartesianProduct", False),
        ("no Python UDF in plan", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("map-side partial aggregation", r"partial_count|partial_sum", True),
    ])
    # host quota sampling: exactly TWO window nodes (salted then
    # per-host over <=n_salt*quota survivors) and TWO exchanges —
    # never one giant per-host window
    hq = xq["host_quota_sample"](spark, sf_dir)
    audit("host_quota_sample", hq, [
        ("two-stage windowed top-k", r"\(\d+\) Window", True),
        ("no Python UDF in plan", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
    ])
    hq_plan = plan_of(hq)
    n_win = len(re.findall(r"\(\d+\) Window\n", hq_plan))
    checks.append(("host_quota_sample",
                   f"window nodes = {n_win} (2 expected: (host,salt) rank, "
                   "then host rank over bounded survivors)", n_win == 2))
    # rank<=k is pushed below each window as WindowGroupLimit
    # (partial BEFORE the exchange): map-side top-k pruning, so a hot
    # host ships <=quota rows per input partition instead of its whole
    # page set — the plan-level proof of the skew story
    checks.append(("host_quota_sample",
                   "WindowGroupLimit pushdown (map-side per-key top-k "
                   "before the shuffle)",
                   bool(re.search(r"WindowGroupLimit", hq_plan))))

    # 15. Graph analytics (round 5): audited over a parquet edge table
    # (NOT the full linker chain, whose 1-row scalar attach is a
    # by-design BroadcastNestedLoop — see the kg_linked audit above):
    # PageRank iterations are equality joins + hash aggregates, degree
    # stats is explode + two aggregations with no join at all
    from openie_backend_spark.operators.materialize import (
        degree_stats, pagerank)
    edges_dir = os.path.join(tempfile.gettempdir(),
                             f"plan_audit_edges_{os.getpid()}")
    spark.createDataFrame(
        [(f"n{i}", [f"n{(i * 7 + j) % 40}" for j in range(3)], 3)
         for i in range(40)],
        "subject_id string, dst_ids array<string>, out_degree bigint",
    ).write.mode("overwrite").parquet(edges_dir)
    edges_df = spark.read.parquet(edges_dir)
    audit("kg_pagerank", pagerank(edges_df, iterations=3), [
        ("equality joins only (contrib + refresh)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("no Python UDF in the iteration path",
         r"BatchEvalPython|ArrowEvalPython", False),
        ("map-side partial sum of contributions", r"partial_sum", True),
    ])
    audit("kg_degree_stats", degree_stats(edges_df), [
        ("no join (explode + two aggregations)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct",
         False),
        ("map-side partial count", r"partial_count", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython", False),
    ])
    from openie_backend_spark.operators.materialize import triangle_counts
    audit("kg_triangles", triangle_counts(edges_df), [
        ("equality joins only (degree attach, wedge, close)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython", False),
    ])
    shutil.rmtree(edges_dir, ignore_errors=True)

    # 15b. KG analytics over a standalone groups relation (the synth
    # chain upstream is audited by kg_spo/kg_linked): the synonym
    # self-join must carry the hot-pair cap as a map-side
    # WindowGroupLimit; the snapshot diff is one equality full-outer
    from openie_backend_spark.operators.kg_analytics import (
        relation_synonyms, snapshot_diff)
    groups_dir = os.path.join(tempfile.gettempdir(),
                              f"plan_audit_groups_{os.getpid()}")
    spark.createDataFrame(
        [(f"r{i % 5}", f"a{i % 7}", f"b{i % 3}", 1 + i % 4) for i in range(60)],
        "rel_norm string, arg1_norm string, arg2_norm string, size bigint",
    ).write.mode("overwrite").parquet(groups_dir)
    groups_df = spark.read.parquet(groups_dir)
    audit("kg_rel_synonyms", relation_synonyms(groups_df), [
        ("equality self-join on the arg pair",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("hot-pair cap pushed map-side (WindowGroupLimit)",
         r"WindowGroupLimit", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    audit("kg_snapshot_diff", snapshot_diff(groups_df, groups_df), [
        ("one equality full-outer join on the group key",
         r"SortMergeJoin .*FullOuter", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    shutil.rmtree(groups_dir, ignore_errors=True)

    # 16. tf-idf keywords: two map-side-combined aggregations, the
    # 1-row corpus-size broadcast (by-design BroadcastNestedLoop, same
    # as the linker's idf total), and WindowGroupLimit map-side top-k
    audit("txt_tfidf_keywords", xq["txt_tfidf_keywords"](spark, sf_dir), [
        ("map-side partial counts (tf and df)", r"partial_count", True),
        ("per-doc top-k pushed map-side (WindowGroupLimit)",
         r"WindowGroupLimit", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("no cartesian beyond the 1-row N broadcast",
         r"CartesianProduct", False),
    ])

    # 16b. Embedding quantization: one shuffle-free JVM projection
    audit("emb_quantize", xq["emb_quantize"](spark, sf_dir), [
        ("no shuffle (per-row array expressions)",
         r"Arguments: hashpartitioning", False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("no join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", False),
    ])

    # 17. Sessionization: lag window, running-sum window, and the
    # session aggregate must all reuse ONE user_id exchange
    # (HashPartitioning(user_id) satisfies the (user_id, session_no)
    # clustering), with no Python in the plan
    sess = xq["evt_sessionize"](spark, sf_dir)
    audit("evt_sessionize", sess, [
        ("partitioned on user_id", r"hashpartitioning\(user_id", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("no join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct", False),
    ])
    sess_plan = plan_of(sess)
    n_sess_ex = len(re.findall(r"Arguments: hashpartitioning", sess_plan))
    checks.append(("evt_sessionize",
                   f"hash exchanges = {n_sess_ex} (1 expected: windows + "
                   "aggregate share the user_id shuffle)", n_sess_ex == 1))

    # 18. Round-5b additions: IVF ANN (map-only assignment, broadcast
    # probe join — the corpus is never self-joined or re-shuffled
    # before the rerank window), Bloom membership (equality semi-join
    # shape, no history re-shuffle per probe row beyond the distinct),
    # temperature sampling (tiny broadcast rates, map-only keep
    # filter), relation type signature (bounded explode + one agg +
    # WindowGroupLimit top-k)
    audit("ann_ivf", xq["ann_ivf"](spark, sf_dir), [
        ("probe side broadcast-joined on centroid_id", r"BroadcastHashJoin", True),
        ("no cartesian join (centroids are literals, not a join side)",
         r"CartesianProduct|BroadcastNestedLoop", False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("rerank top-k pushed map-side (WindowGroupLimit)",
         r"WindowGroupLimit", True),
    ])
    audit("dedup_bloom", xq["dedup_bloom"](spark, sf_dir), [
        ("bit-position probe is an equality join",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
        ("map-side partial aggregation (distinct bits / hit counts)",
         r"partial_count|HashAggregate", True),
    ])
    audit("mix_temperature", xq["mix_temperature"](spark, sf_dir), [
        ("per-group rates broadcast back to the corpus",
         r"BroadcastHashJoin", True),
        ("map-side partial count of group sizes", r"partial_count", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    from openie_backend_spark.operators.kg_analytics import (
        relation_type_signature)
    linked_dir = os.path.join(tempfile.gettempdir(),
                              f"plan_audit_linked_{os.getpid()}")
    spark.createDataFrame(
        [(f"r{i % 5}", 1 + i % 4,
          [f"/t/{i % 3}", f"/t/{i % 7}"], [f"/t/{i % 4}"])
         for i in range(60)],
        "rel_norm string, size bigint, arg1_types array<string>, "
        "arg2_types array<string>",
    ).write.mode("overwrite").parquet(linked_dir)
    audit("kg_rel_signature",
          relation_type_signature(spark.read.parquet(linked_dir)), [
        ("one aggregation exchange feeding the per-rel window",
         r"Arguments: hashpartitioning\(rel_norm", True),
        ("per-rel top-k pushed map-side (WindowGroupLimit)",
         r"WindowGroupLimit", True),
        ("no join (type explode is row-local)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct",
         False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    shutil.rmtree(linked_dir, ignore_errors=True)

    # 19. Survivor selection + alias table: canonical_docs shares ONE
    # cluster_id exchange between the membership-count window and the
    # keep-rank window; entity_aliases is union -> one agg -> windowed
    # top-k with the rank filter pushed map-side
    canon_plan = xq["dedup_canonical"](spark, sf_dir)
    audit("dedup_canonical", canon_plan, [
        ("cluster join is an equality join, no cartesian",
         r"CartesianProduct|BroadcastNestedLoop", False),
        ("both windows share the cluster_id partitioning",
         r"hashpartitioning\(cluster_id", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    n_canon_ex = len(re.findall(r"Arguments: hashpartitioning\(cluster_id",
                                plan_of(canon_plan)))
    checks.append(("dedup_canonical",
                   f"cluster_id hash exchanges = {n_canon_ex} (1 expected: "
                   "count window + rank window share one shuffle)",
                   n_canon_ex == 1))
    from openie_backend_spark.operators.kg_analytics import entity_aliases
    alias_dir = os.path.join(tempfile.gettempdir(),
                             f"plan_audit_alias_{os.getpid()}")
    spark.createDataFrame(
        [(f"s{i % 7}", f"r{i % 3}", f"o{i % 5}", 1 + i % 4,
          (f"F{i % 4}",), (f"F{i % 6}",)) for i in range(60)],
        "arg1_norm string, rel_norm string, arg2_norm string, size bigint, "
        "arg1_entity struct<fbid:string>, arg2_entity struct<fbid:string>",
    ).write.mode("overwrite").parquet(alias_dir)
    audit("kg_entity_aliases",
          entity_aliases(spark.read.parquet(alias_dir)), [
        ("per-entity top-k pushed map-side (WindowGroupLimit)",
         r"WindowGroupLimit", True),
        ("no join (side union is a column projection)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct",
         False),
        ("map-side partial aggregation of (fbid, surface) support",
         r"partial_sum|HashAggregate", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    shutil.rmtree(alias_dir, ignore_errors=True)

    # 19b. Hash split: the 100 TB shape is a pure projection — the
    # plan must contain NO exchange, join, aggregate, or Python UDF.
    # Audited over the raw parquet read: the harness table loader adds
    # a round-robin repartition that is not part of the operator.
    from openie_backend_spark.operators.curation import hash_split
    split_plan = plan_of(hash_split(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))))
    for desc, pat in [
        ("no exchange (map-only projection)", r"Exchange"),
        ("no join", r"Join"),
        ("no aggregate", r"Aggregate"),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas"),
    ]:
        ok_split = not re.search(pat, split_plan)
        checks.append(("mix_split", desc, ok_split))
    sections.append(("mix_split", split_plan,
                     [("map-only plan", True)]))

    # 19c. Corpus datasheet: global aggregates with map-side partials,
    # single-row arithmetic joined by broadcast only
    audit("txt_profile", xq["txt_profile"](spark, sf_dir), [
        ("map-side partial aggregation", r"partial_count|partial_sum", True),
        ("single-row composition joins are broadcast",
         r"BroadcastNestedLoopJoin|BroadcastHashJoin", True),
        ("no shuffled join", r"SortMergeJoin|ShuffledHashJoin", False),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])

    # 19d. LM cross-entropy: the vocab dim must come back as a
    # BROADCAST join (hot tokens are lookups, never shuffle keys)
    audit("txt_lm_ce", xq["txt_lm_ce"](spark, sf_dir), [
        ("vocab dim broadcast back to the exploded corpus",
         r"BroadcastHashJoin", True),
        ("no shuffled token join", r"SortMergeJoin|ShuffledHashJoin", False),
        ("map-side partial aggregation", r"partial_count|partial_sum", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])

    # 20. Exact substring dedup: the duplicate decision is per-n-gram
    # (no pairwise join of documents anywhere); flagged positions come
    # back via ONE equality join on the gram hash
    audit("dedup_passages", xq["dedup_passages"](spark, sf_dir), [
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("flag join is an equality join on the gram hash",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("map-side partial aggregation of gram occurrences",
         r"partial_count|HashAggregate", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    # 20b. Within-doc repetition spans: the repeat decision is
    # per-(doc, gram) — NO join of any kind anywhere in the plan
    audit("txt_repeated_spans", xq["txt_repeated_spans"](spark, sf_dir), [
        ("no join at all (per-doc decision)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct",
         False),
        ("map-side partial aggregation of gram occurrences",
         r"partial_count|HashAggregate", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])

    # 21. Inverse-relation candidates over a synthetic groups table
    # (the real chain's NLP UDF is audited at kg_spo): capped swapped
    # self-join, equality keys only
    from openie_backend_spark.operators.kg_analytics import relation_inverses
    inv_dir = os.path.join(tempfile.gettempdir(),
                           f"plan_audit_inv_{os.getpid()}")
    spark.createDataFrame(
        [(f"r{i % 5}", f"e{i % 7}", f"e{(i + 1) % 7}") for i in range(80)],
        "rel_norm string, arg1_norm string, arg2_norm string",
    ).write.mode("overwrite").parquet(inv_dir)
    audit("kg_rel_inverses",
          relation_inverses(spark.read.parquet(inv_dir), min_shared=1), [
        ("swapped self-join is an equality join",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", True),
        ("no cartesian join", r"CartesianProduct|BroadcastNestedLoop", False),
        ("hot-pair cap window precedes the join (WindowGroupLimit)",
         r"WindowGroupLimit", True),
        ("no Python UDF", r"BatchEvalPython|ArrowEvalPython|MapInPandas", False),
    ])
    shutil.rmtree(inv_dir, ignore_errors=True)

    ok = sum(1 for _, _, k in checks if k)
    out = os.path.join(REPO, "EXPLAIN.md")
    with open(out, "w") as fh:
        fh.write("# EXPLAIN — physical-plan audit of the headline queries\n\n")
        fh.write(f"Automated assertions: **{ok}/{len(checks)} hold** "
                 f"(generated by `scripts/plan_audit.py` at {sf_dir}).\n\n")
        fh.write("| query | property | holds |\n|---|---|---|\n")
        for name, desc, k in checks:
            fh.write(f"| {name} | {desc} | {'✅' if k else '❌'} |\n")
        fh.write("\n")
        for name, plan, results in sections:
            fh.write(f"\n## {name}\n\n```\n{plan[:7000]}\n```\n")
    print(f"{ok}/{len(checks)} assertions hold -> {out}")
    for name, desc, k in checks:
        if not k:
            print(f"  FAILED: {name}: {desc}")


if __name__ == "__main__":
    main()
