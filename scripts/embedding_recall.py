"""Embedding near-dup quality: recall of the banded-hyperplane
candidate pass (`dedup.embedding_neardup_pairs`, 32 planes / 4 bands)
against exact-cosine ground truth, per cosine bin. Planted pairs:
each source vector gets deterministic-noise variants spanning cosine
~0.5-0.99, so every bin has mass (the test embeddings themselves are
near-orthogonal). Appends BENCH/NEARDUP.md.

Usage: python scripts/embedding_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from openie_backend_spark.operators.dedup import embedding_neardup_pairs
from openie_backend_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    src = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base = np.stack(src["embedding"].to_numpy()[:400]).astype(np.float64)
    n, dim = base.shape

    rng = np.random.default_rng(11)  # deterministic seed, offline prep
    rows = [{"vec_id": int(i), "embedding": base[i].tolist()}
            for i in range(n)]
    truth = []  # (id_a, id_b, cosine)
    nid = n
    for level, scale in enumerate((0.07, 0.15, 0.35, 0.6, 0.9, 1.3)):
        for i in range(0, n, 5):
            noise = rng.standard_normal(dim) * scale * np.linalg.norm(
                base[i]) / math.sqrt(dim)
            v = base[i] + noise
            cos = float(base[i] @ v /
                        (np.linalg.norm(base[i]) * np.linalg.norm(v)))
            rows.append({"vec_id": nid, "embedding": v.tolist()})
            truth.append((i, nid, cos))
            nid += 1
    aug_path = "/tmp/embedding_recall.parquet"
    pd.DataFrame(rows).to_parquet(aug_path, index=False)

    spark = get_spark(app_name="embedding-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(aug_path)
    got = {
        (min(r["vec_a"], r["vec_b"]), max(r["vec_a"], r["vec_b"]))
        for r in embedding_neardup_pairs(emb, threshold=0.0).collect()
    }

    bins = [(0.95, 1.01), (0.9, 0.95), (0.8, 0.9), (0.7, 0.8), (0.5, 0.7)]
    acc = defaultdict(lambda: [0, 0])
    for a, b, cos in truth:
        for lo, hi in bins:
            if lo <= cos < hi:
                key = f"[{lo}, {min(hi, 1.0)})"
                acc[key][0] += 1
                acc[key][1] += (min(a, b), max(a, b)) in got
                break
    out_rows = []
    for lo, hi in bins:
        key = f"[{lo}, {min(hi, 1.0)})"
        total, hit = acc[key]
        if total:
            out_rows.append({"cosine": key, "pairs": total,
                             "recall": round(hit / total, 3)})
            print(json.dumps(out_rows[-1]), flush=True)

    out = os.path.join(REPO, "BENCH", "NEARDUP.md")
    with open(out, "a") as fh:
        fh.write(
            "\n### Embedding near-dup candidate recall vs exact cosine "
            "(32 planes / 4 bands — the round-4 defaults, planted noisy variants)\n\n"
            "| true cosine | pairs | candidate recall |\n|---|---|---|\n"
        )
        for r in out_rows:
            fh.write(f"| {r['cosine']} | {r['pairs']} | {r['recall']} |\n")
        fh.write(
            "\nCandidates are exact-cosine reranked downstream, so "
            "precision at any threshold is exact; this recall curve is "
            "the banding approximation. Production near-dup thresholds "
            "(>=0.95) sit in the top bin.\n"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
