"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k of every query against the
  corpus: a broadcast nested-loop of a SMALL query set against the big
  corpus (queries are broadcast; the corpus is never shuffled), dot
  products computed JVM-side with zip_with/aggregate inside
  whole-stage codegen. This is the correctness baseline.
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets
  (deterministic seeded planes); queries probe only their bucket (and
  optionally neighboring bands), turning the scan into an equality
  join. Recall < 1 by construction; the bench reports both.

At 100 TB the corpus side stays partitioned on disk; both operators
are single-pass over it (no self-shuffle). For billion-scale a
coarse-quantizer (IVF) variant drops in by replacing the bucket
expression with an assigned-centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries(query_id, embedding)``
    must be small (broadcast)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("cnrm"),
    ).filter(F.col("cnrm") > 0)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("qnrm"),
    ).filter(F.col("qnrm") > 0)
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.round(_dot(F.col("cvec"), F.col("qvec")) / (F.col("cnrm") * F.col("qnrm")), 4),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7):
    """Deterministic pseudo-random hyperplanes (LCG — reproducible
    across engines and runs without numpy RNG state)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes) -> "F.Column":
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat_ws("", *bits)


def _flip_bit(bucket_col, i: int, n: int):
    """The bucket bit-string with bit ``i`` (0-based) flipped."""
    return F.concat(
        F.substring(bucket_col, 1, i),
        F.when(F.substring(bucket_col, i + 1, 1) == "1", F.lit("0"))
        .otherwise(F.lit("1")),
        F.substring(bucket_col, i + 2, n - i - 1),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucketing, exact rerank
    within the probed buckets. ``multiprobe=True`` (default) probes
    the query's own bucket PLUS every Hamming-distance-1 bucket
    (n_planes+1 probes — the standard multi-probe LSH recipe): a
    near neighbor on the wrong side of ONE hyperplane is still found,
    which roughly doubles recall on near-orthogonal corpora for a
    (n_planes+1)× bounded increase in candidates (measured in
    BENCH/ANN.md). The corpus side keeps exactly one bucket per
    vector, so the probe explode happens only on the (small,
    broadcast) query side and each corpus vector matches a query at
    most once."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("bucket", lsh_bucket(F.col("cvec"), planes)) \
     .withColumn("cnrm", _norm(F.col("cvec"))).filter(F.col("cnrm") > 0)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("bucket", lsh_bucket(F.col("qvec"), planes)) \
     .withColumn("qnrm", _norm(F.col("qvec"))).filter(F.col("qnrm") > 0)
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[_flip_bit(F.col("bucket"), i, n_planes) for i in range(n_planes)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine",
        F.round(_dot(F.col("cvec"), F.col("qvec")) / (F.col("cnrm") * F.col("qnrm")), 4),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer
    scale path this module's header promises: partition the corpus
    into ``n_centroids`` Voronoi cells, probe only the ``nprobe``
    cells closest to each query, exact-rerank inside them.

    Deterministic train step (no k-means iterations): centroids are
    the ``n_centroids`` corpus vectors first in ``(md5(vec_id),
    vec_id)`` order — a content-independent uniform sample, collected
    to the driver via TakeOrdered (no full shuffle) exactly like a
    real IVF trains on a sample. Assignment is then a MAP-ONLY
    expression over an array literal of centroids (argmax cosine,
    rounded to 6 decimals with centroid-id tiebreak so the oracle's
    window ordering reproduces it bit-for-bit) — the corpus is never
    shuffled and never joined against itself.

    Scale shape: at 10^9+ vectors the corpus is written partitioned
    by ``centroid_id`` (the inverted lists); a query batch touches
    ``nprobe/n_centroids`` of the data via partition pruning. Recall
    < 1 by construction; BENCH/ANN.md reports measured recall vs the
    brute-force baseline alongside LSH's.

    Id contract (ADVICE r5): ``id_col`` must be integer-convertible —
    the centroid tiebreak builds ``lit(-int(vec_id))`` at plan time,
    so a string id like ``'doc-123'`` raises ``ValueError`` when the
    plan is constructed. Every embeddings source in this engine uses
    integer vec_ids; widening the contract would need a hash/ordinal
    tiebreak and a matching oracle change.
    """
    v = F.col(vec_col).cast("array<double>")
    base = corpus.select(
        F.col(id_col).alias("vec_id"), v.alias("cvec"), _norm(v).alias("cnrm")
    ).filter(F.col("cnrm") > 0)
    cents = (
        base.select("vec_id", "cvec", "cnrm")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .collect()
    )

    def _scored(vec, nrm):
        # array of (cosine-to-centroid, -cid): array_max / reverse-sort
        # give cosine DESC then cid ASC, matching the oracle window
        return F.array(*[
            F.struct(
                F.round(
                    _dot(vec, F.array(*[F.lit(x) for x in r["cvec"]]))
                    / (nrm * F.lit(r["cnrm"])),
                    6,
                ).alias("cos"),
                F.lit(-int(r["vec_id"])).alias("neg_cid"),
            )
            for r in cents
        ])

    assigned = base.withColumn(
        "centroid_id", -F.array_max(_scored(F.col("cvec"), F.col("cnrm")))["neg_cid"]
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("qnrm"),
    ).filter(F.col("qnrm") > 0)
    probes = q.withColumn(
        "centroid_id",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_scored(F.col("qvec"), F.col("qnrm")))),
                    1,
                    nprobe,
                ),
                lambda s: -s["neg_cid"],
            )
        ),
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").withColumn(
        "cosine",
        F.round(_dot(F.col("cvec"), F.col("qvec")) / (F.col("cnrm") * F.col("qnrm")), 4),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def quantize_embeddings(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 scalar quantization — (vec_id, qmin, qmax,
    codes: array<int> in [0, 255], max_abs_err): the storage-compression
    step before shipping an embedding corpus to an ANN index (4× smaller
    than float32, reconstruction x̂ = qmin + code·scale).

    Entirely JVM expressions (array_min/max + one transform + one
    aggregate — no shuffle, no Python), so it runs inside whole-stage
    codegen at scan speed; constant vectors (scale 0) quantize to all-0
    codes with zero error. max_abs_err is the per-vector quality audit
    column — downstream consumers threshold on it instead of trusting
    the quantizer blindly. Rounded to 6 decimals for the cross-engine
    value-hash oracle (same float-drift concession as pagerank).
    """
    # exact float32→double widening FIRST: both engines then do all
    # arithmetic in double (a float32 intermediate would diverge from
    # the oracle's DOUBLE[] math)
    v = F.col(vec_col).cast("array<double>")
    qmin = F.array_min(v)
    qmax = F.array_max(v)
    scale = (qmax - qmin) / F.lit(255.0)

    codes = F.when(scale == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round((x - qmin) / scale).cast("int"))
    )
    return (
        embs.select(
            F.col(id_col).alias("vec_id"),
            v.alias("_v"),
            qmin.alias("qmin"),
            qmax.alias("qmax"),
            codes.alias("codes"),
        )
        .withColumn(
            "max_abs_err",
            F.round(
                F.array_max(
                    F.zip_with(
                        "_v",
                        "codes",
                        lambda x, c: F.abs(
                            x
                            - (
                                F.col("qmin")
                                + c.cast("double")
                                * (F.col("qmax") - F.col("qmin"))
                                / F.lit(255.0)
                            )
                        ),
                    )
                ),
                6,
            ),
        )
        .select("vec_id", F.round("qmin", 6).alias("qmin"),
                F.round("qmax", 6).alias("qmax"), "codes", "max_abs_err")
    )
