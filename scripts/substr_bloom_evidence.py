"""Evidence for the round-5 incremental/substring dedup operators:

1. duplicate_passages growth: wall time and output rows at sf0.01 vs
   sf0.1 (10x docs) — the claim is ~linear growth (no pairwise join
   exists anywhere in the plan, so there is no quadratic term to
   surface), plus a planted-passage recall check.
2. bloom_membership false positives: measured FP rate on planted
   NOVEL probes vs the classic (1 - e^(-kn/m))^k prediction, and the
   no-false-negative guarantee on planted re-crawls.

Appends BENCH/NEARDUP.md. Usage: python scripts/substr_bloom_evidence.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openie_backend_spark.operators.dedup import bloom_membership, duplicate_passages
from openie_backend_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    spark = get_spark(app_name="substr-bloom-evidence")
    spark.sparkContext.setLogLevel("ERROR")

    # --- duplicate_passages growth ---
    rows = []
    for sf in ("0.01", "0.1"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        n = docs.count()
        t0 = time.time()
        m = duplicate_passages(docs, ngram=8).count()
        dt = time.time() - t0
        rows.append((sf, n, m, round(dt, 2)))
        print(f"passages sf{sf}: docs={n} spans={m} {dt:.2f}s", flush=True)

    # planted recall: one 12-word passage shared by 3 docs among
    # 500 unique docs -> each of the 3 carries exactly one span
    passage = " ".join(f"planted{i}" for i in range(12))
    base = [(i, f"unique filler document number {i} " +
             " ".join(f"w{i}x{j}" for j in range(10))) for i in range(500)]
    planted = [(1000 + i, f"lead{i} text " + passage + f" tail{i}")
               for i in range(3)]
    pd_docs = spark.createDataFrame(base + planted, "doc_id long, text string")
    hits = duplicate_passages(pd_docs, ngram=8).filter(
        F.col("doc_id") >= 1000).count()
    print(f"planted passage: {hits}/3 docs flagged", flush=True)

    # --- bloom false positives ---
    m_bits, k = 1 << 18, 3
    hist = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_hist = hist.count()
    novel = spark.createDataFrame(
        [(i, f"genuinely novel probe text {i} never in any archive")
         for i in range(20000)],
        "doc_id long, text string",
    )
    out = bloom_membership(hist, novel, m_bits=m_bits, k_hashes=k)
    fp = out.filter(F.col("maybe_dup")).count()
    pred = (1 - math.exp(-k * n_hist / m_bits)) ** k
    recrawl = hist.limit(200).select("doc_id", "text")
    fn = bloom_membership(hist, recrawl, m_bits=m_bits, k_hashes=k).filter(
        ~F.col("maybe_dup")).count()
    print(f"bloom: archive={n_hist} novel=20000 fp={fp} "
          f"predicted_rate={pred:.2e} false_negatives={fn}", flush=True)

    out_path = os.path.join(REPO, "BENCH", "NEARDUP.md")
    with open(out_path, "a") as fh:
        fh.write(
            "\n## Exact substring dedup (duplicate_passages) growth\n\n"
            "| sf | docs | duplicated spans | wall s |\n|---|---|---|---|\n"
        )
        for sf, n, m, dt in rows:
            fh.write(f"| {sf} | {n} | {m} | {dt} |\n")
        r = rows[-1][3] / max(rows[0][3], 1e-9)
        fh.write(
            f"\n10× docs → {r:.1f}× wall. No pairwise join exists in the "
            "plan (per-n-gram decision + equality join back), so there is "
            "no quadratic term to surface at any scale; growth tracks "
            "total gram count. Planted-passage recall: "
            f"{hits}/3 carrier docs flagged (12-word passage, ngram=8).\n"
            "\n## Bloom incremental membership (bloom_membership)\n\n"
            f"Archive {n_hist} docs, m=2^18 bits, k=3: 20,000 planted "
            f"NOVEL probes → **{fp} false positives** (theory "
            f"(1−e^(−kn/m))^k = {pred:.2e} ≈ "
            f"{pred * 20000:.2f} expected); 200 planted re-crawls → "
            f"**{fn} false negatives** (the Bloom guarantee: must be 0).\n"
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
