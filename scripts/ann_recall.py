"""ANN quality evidence: self-excluded recall@k of the LSH-bucketed top-k
(`similarity.lsh_topk`) against the exact brute-force baseline
(`similarity.brute_force_topk`) on the embeddings table, across
hyperplane counts — plus the candidate fraction (mean bucket share of
the corpus), which is the scan-cost proxy the plane count trades
recall against. Appends BENCH/ANN.md.

Usage: python scripts/ann_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openie_backend_spark.operators import similarity as S
from openie_backend_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_corpus = emb.count()
    dim = len(emb.first()["embedding"])
    queries = (
        emb.orderBy("vec_id").limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )

    # fetch k+1 and drop the query's own vector from both sides:
    # queries come from the corpus, so the self-match (cosine 1.0)
    # would otherwise inflate recall by up to 1/k
    exact = S.brute_force_topk(emb, queries, k=k + 1).collect()
    gold: dict = {}
    for r in exact:
        if r["vec_id"] != r["query_id"]:
            gold.setdefault(r["query_id"], set()).add(r["vec_id"])
    # after dropping the self row (always rank 1) exactly k remain

    rows = []
    for n_planes in (4, 6, 8):
        approx = S.lsh_topk(emb, queries, k=k + 1, n_planes=n_planes, dim=dim)
        got: dict = {}
        for r in approx.collect():
            if r["vec_id"] != r["query_id"]:
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(gold[q] & got.get(q, set())) for q in gold)
        recall = hits / sum(len(v) for v in gold.values())
        # candidate fraction: mean share of the corpus scanned per
        # query across ALL its probe buckets (own + Hamming-1) — the
        # true cost of the multiprobe default
        planes = S._hyperplanes(dim, n_planes)
        bucketed = emb.withColumn("b", S.lsh_bucket(
            F.col("embedding").cast("array<double>"), planes))
        by_bucket = {r["b"]: r["count"]
                     for r in bucketed.groupBy("b").count().collect()}
        qb = [r["b"] for r in bucketed.orderBy("vec_id")
              .limit(n_queries).collect()]
        def probe_set(b):
            return [b] + [b[:i] + ("0" if b[i] == "1" else "1") + b[i + 1:]
                          for i in range(n_planes)]
        cand = sum(sum(by_bucket.get(p, 0) for p in probe_set(b)) for b in qb)
        frac = cand / (len(qb) * n_corpus)
        rows.append({"n_planes": n_planes, "recall": round(recall, 3),
                     "candidate_fraction": round(frac, 4)})
        print(json.dumps(rows[-1]), flush=True)

    out = os.path.join(REPO, "BENCH", "ANN.md")
    with open(out, "a") as fh:
        fh.write(
            f"\n## recall@{k} vs brute force — sf_dir={sf_dir}, "
            f"{n_corpus} vectors (dim {dim}), {n_queries} queries, "
            f"Hamming-1 multi-probe (lsh_topk default)\n\n"
            "| planes | recall | candidate fraction (scan-cost proxy) |\n"
            "|---|---|---|\n"
        )
        for r in rows:
            fh.write(f"| {r['n_planes']} | {r['recall']} "
                     f"| {r['candidate_fraction']} |\n")
        fh.write(
            "\nFewer planes = bigger buckets = higher recall at higher "
            "scan cost; the sf testdata embeddings are near-orthogonal "
            "(max cosine ~0.46), the hard case for hyperplane LSH — "
            "real embedding corpora with cluster structure sit well "
            "above these numbers at the same plane count. The scale "
            "path (ann_lsh oracle) keeps exact rerank inside buckets, "
            "so precision of returned pairs is exact by construction; "
            "recall is the only approximation.\n"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
