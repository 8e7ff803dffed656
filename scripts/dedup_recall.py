"""Near-dup quality evidence: recall of the MinHash+LSH candidate pass
(`dedup.minhash_lsh_pairs`, 8 hashes / 4 bands of 2) against EXHAUSTIVE
3-shingle Jaccard ground truth, bucketed by true similarity — the
empirical S-curve to put next to the theoretical candidate probability
1-(1-s^2)^4. Appends BENCH/NEARDUP.md.

Usage: python scripts/dedup_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from openie_backend_spark.operators.dedup import minhash_lsh_pairs
from openie_backend_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _augmented_docs_path(sf_dir: str) -> str:
    """documents ∪ deterministic word-dropout mutations (5/15/30/50 %)
    of the first 150 docs — plants near-dup pairs across the whole
    Jaccard range so the recall curve has mass in every bin (the synth
    corpus itself only contains >=0.9 near-identical pairs)."""
    import hashlib

    import pandas as pd

    out = "/tmp/dedup_recall_corpus.parquet"
    src = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = [{"doc_id": int(r.doc_id), "text": r.text, "lang": "en"}
            for r in src.itertuples()]
    base_max = max(r["doc_id"] for r in rows)
    for rate_i, rate in enumerate((0.05, 0.15, 0.3, 0.5)):
        for r in rows[:150]:
            words = r["text"].split()
            kept = [
                w for j, w in enumerate(words)
                if int(hashlib.md5(
                    f"{r['doc_id']}:{rate_i}:{j}".encode()).hexdigest()[:4],
                    16) / 65535.0 >= rate
            ]
            if len(kept) < 5:
                continue
            rows.append({
                "doc_id": base_max + 1 + rate_i * 10000 + r["doc_id"],
                "text": " ".join(kept), "lang": "en",
            })
    pd.DataFrame(rows).to_parquet(out, index=False)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs_path = _augmented_docs_path(sf_dir)

    # exhaustive ground truth in DuckDB (independent of the Spark path)
    con = duckdb.connect()
    truth = con.sql(f"""
        WITH s AS (
            SELECT doc_id, list_sort(list_distinct(list_transform(
                range(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2, 1)),
                i -> array_to_string(regexp_split_to_array(trim(lower(text)), '\\s+')[i:i+2], ' ')
            ))) AS sh FROM read_parquet('{docs_path}')
        )
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               len(list_intersect(a.sh, b.sh)) * 1.0 /
               len(list_distinct(list_concat(a.sh, b.sh))) AS jac
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh)) > 0
    """).fetchall()

    spark = get_spark(app_name="dedup-recall")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)
    cand = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in minhash_lsh_pairs(docs).select("doc_a", "doc_b").collect()
    }

    bins = [(0.9, 1.01), (0.8, 0.9), (0.7, 0.8), (0.5, 0.7), (0.3, 0.5)]
    stats = defaultdict(lambda: [0, 0])
    for id1, id2, jac in truth:
        for lo, hi in bins:
            if lo <= jac < hi:
                key = f"[{lo}, {hi if hi <= 1 else 1.0})"
                stats[key][0] += 1
                stats[key][1] += (min(id1, id2), max(id1, id2)) in cand
                break
    rows = []
    for lo, hi in bins:
        key = f"[{lo}, {hi if hi <= 1 else 1.0})"
        total, found = stats[key]
        theo = 1 - (1 - ((lo + min(hi, 1.0)) / 2) ** 2) ** 4
        rows.append({"jaccard": key, "pairs": total,
                     "recall": round(found / total, 3) if total else None,
                     "theoretical": round(theo, 3)})
        print(json.dumps(rows[-1]), flush=True)

    out = os.path.join(REPO, "BENCH", "NEARDUP.md")
    with open(out, "a") as fh:
        fh.write(
            f"\n## LSH candidate recall vs exhaustive Jaccard ({sf_dir},"
            " 8 hashes / 4 bands of 2, 3-shingles)\n\n"
            "| true Jaccard | pairs | measured recall | theoretical "
            "1-(1-s²)⁴ at bin center |\n|---|---|---|---|\n"
        )
        for r in rows:
            fh.write(f"| {r['jaccard']} | {r['pairs']} | {r['recall']} "
                     f"| {r['theoretical']} |\n")
        fh.write(
            "\nThe measured S-curve tracks the banding theory: pairs at "
            "the 0.8 dedup threshold and above are caught with high "
            "probability, sub-0.5 pairs are mostly (correctly) skipped. "
            "Downstream `ngram_jaccard_pairs` reranks candidates with "
            "exact Jaccard, so precision at the threshold is exact; "
            "this recall curve is the only approximation in the "
            "minhash path.\n"
        )
    sim_rows = simhash_curve(spark, docs_path, truth)
    with open(out, "a") as fh:
        fh.write(
            "\n### SimHash Hamming distance vs true Jaccard "
            "(16-bit signatures, same corpus)\n\n"
            "| true Jaccard | pairs | mean Hamming | identical-sig rate |\n"
            "|---|---|---|---|\n"
        )
        for r in sim_rows:
            fh.write(f"| {r['jaccard']} | {r['pairs']} | {r['mean_hamming']} "
                     f"| {r['identical_sig']} |\n")
        fh.write(
            "\nHamming distance falls monotonically with similarity, so "
            "the identical-signature criterion (Hamming 0) is the "
            "high-precision end and a banded Hamming-k join relaxes "
            "recall along this curve.\n"
        )
        print(json.dumps(sim_rows))
    print(f"wrote {out}")




def simhash_curve(spark, docs_path: str, truth) -> list[dict]:
    """Mean SimHash Hamming distance per true-Jaccard bin — the
    monotone relationship that makes banded-Hamming thresholds
    meaningful (simhash_dup_pairs uses identical-signature as the
    16-bit criterion; this shows what a Hamming-k relaxation buys)."""
    from openie_backend_spark.operators.dedup import simhash

    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash(spark.read.parquet(docs_path)).collect()}
    bins = [(0.9, 1.01), (0.8, 0.9), (0.7, 0.8), (0.5, 0.7), (0.3, 0.5),
            (0.0, 0.3)]
    acc = defaultdict(list)
    for id1, id2, jac in truth:
        for lo, hi in bins:
            if lo <= jac < hi:
                d = bin(sigs[id1] ^ sigs[id2]).count("1")
                acc[f"[{lo}, {min(hi, 1.0)})"].append(d)
                break
    rows = []
    for lo, hi in bins:
        key = f"[{lo}, {min(hi, 1.0)})"
        ds = acc.get(key, [])
        if ds:
            rows.append({"jaccard": key, "pairs": len(ds),
                         "mean_hamming": round(sum(ds) / len(ds), 2),
                         "identical_sig": round(
                             sum(1 for d in ds if d == 0) / len(ds), 3)})
    return rows

if __name__ == "__main__":
    main()
