"""Dump `.explain("formatted")` for a list of queries into a directory
(plans/r06 deliverable). Usage:

    PYTHONPATH=<tree> python scripts/dump_plans.py <out_dir> <suffix> [q ...]

Runs against whatever tree is first on PYTHONPATH, so the same script
produces `_before` dumps from a round-start worktree and `_after`
dumps from the working tree.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

DEFAULT_QUERIES = [
    "kg_spo", "kg_groups", "kg_extractions",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "ann_bruteforce",
    "g1_group_agg", "t9_per_key_cap", "j3_broadcast_dim", "txt_quality",
    "j_left_anti", "f9_hash_sample", "f2_doc_filters",
    "dedup_simhash", "dedup_simhash_banded", "dedup_clusters",
    "dedup_canonical", "dedup_passages", "txt_repeated_spans",
    "txt_repetition", "txt_profile", "txt_lm_ce", "txt_fingerprint",
    "dsir_importance", "web_decontaminate",
    "kg_linked", "kg_typed", "kg_frontend_regroup", "kg_instance_dedup",
    "kg_pagerank", "kg_triangles", "kg_degree_stats", "kg_two_hop",
    "kg_rel_synonyms", "kg_rel_inverses", "kg_entity_aliases",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from openie_backend_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**E.queries(), **E.extra_queries()}
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        try:
            df = qs[name](spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok" if "FAILED" not in txt else "FAILED", flush=True)


if __name__ == "__main__":
    main()
