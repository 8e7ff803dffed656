"""Training-corpus curation operators: benchmark decontamination and
sequence packing.

These are LLM-data-pipeline components the reference engine predates
(its curation surface stops at the F-family instance filters,
`backend/.../InstanceFilters.scala`); both are standard steps between
a raw web corpus and a pretraining run:

* **decontamination** — drop documents that share word n-grams with an
  evaluation benchmark so downstream eval numbers are not inflated
  (the n-gram-overlap rule of Brown et al. 2020 appendix C, Dodge et
  al. 2021);
* **sequence packing** — assign documents to fixed-token-budget packs
  for dense pretraining batches (concat-then-chunk packing in the
  T5/GPT lineage, Raffel et al. 2020 §3.1.3).

Scale notes:

* decontamination never shuffles the corpus: the benchmark side is
  tiny by construction (eval sets are ~10^4..10^6 rows vs 10^12 docs),
  so its distinct shingle set is broadcast and the corpus-side
  probe is a map-side hash join; per-document shingle fan-out is
  capped (sorted-prefix, same concession as the dedup family);
* packing is ONE hash exchange on a salt bucket; within a bucket the
  running-total window is streaming (`ROWS BETWEEN ... AND 1
  PRECEDING` needs no partition buffering). Parallelism equals
  ``n_buckets`` — size it to the cluster (buckets are md5-salted so
  no data-dependent skew is possible);
* hashing/bucketing is md5-based (byte-identical across engines), so
  both operators carry DuckDB value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openie_backend_spark.functions.text import shingles, token_count


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    max_shingles: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Documents sharing at least one word ``n``-gram with the
    benchmark: (doc_id, n_shingles, n_hits, contamination_bp).

    ``contamination_bp`` is basis points of the document's (capped)
    shingle set that hit the benchmark — an integer, not a rounded
    float, so the value hashes identically across engines (DuckDB
    rounds half-away-from-zero, Spark/Python round half-even; floor
    of the scaled ratio sidesteps the .5 boundary entirely).

    Both shingle sets are distinct + sorted + prefix-capped at
    ``max_shingles`` (deterministic; mirrored in the oracle SQL), so a
    pathological mega-document bounds its own join fan-out: each
    corpus row contributes ≤ max_shingles probe rows, and because both
    sides are distinct a (doc, gram) pair matches at most once — the
    aggregate needs no count-distinct Expand.
    """
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.slice(shingles(text_col, n), 1, max_shingles).alias("sh"),
    ).filter(F.size("sh") > 0)
    doc_grams = doc_sh.select(
        "doc_id",
        F.size("sh").alias("n_shingles"),
        F.explode("sh").alias("gram"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(F.slice(shingles(bench_text_col, n), 1, max_shingles)).alias(
                "gram"
            )
        )
        .distinct()
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "gram")
    return (
        hits.groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            F.floor(F.lit(10000) * F.col("n_hits") / F.col("n_shingles"))
            .cast("int")
            .alias("contamination_bp"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 1024,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic concat-then-chunk sequence packing: (doc_id,
    n_tokens, bucket, pack_id) — ``pack_id`` is the fixed-budget pack
    the document opens in when the bucket's documents are laid out
    end-to-end in md5 order.

    Semantics (disclosed, mirrored in the oracle): a document is
    assigned WHOLE to the pack where its first token lands
    (``floor(exclusive-running-total / max_tokens)``), so a pack's
    token sum can overshoot ``max_tokens`` by at most one document's
    tail; trainers that split documents across window boundaries do so
    downstream with ``pos = cum_tokens % max_tokens``, which this
    layout determines.

    Order inside a bucket is md5(doc_id) — content-independent, so the
    packing is a uniform shuffle of the corpus (what pretraining
    wants) AND reproducible run-to-run. Empty documents (0 tokens)
    ride along in whatever pack the running total is in; they never
    advance it.
    """
    key = F.md5(F.col(id_col).cast("string"))
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).alias("n_tokens"),
        key.alias("sort_key"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("int") % n_buckets).alias(
            "bucket"
        ),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("sort_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.floor(cum / F.lit(max_tokens)).cast("int").alias("pack_id"),
    )


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    n: int = 2,
    n_buckets: int = 4096,
    max_shingles: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str = "text",
) -> DataFrame:
    """DSIR-style data-selection scores (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    each raw document by the log-likelihood ratio of its hashed word
    n-grams under the TARGET distribution vs the RAW distribution —
    (doc_id, n_grams, score_milli) where ``score_milli`` is the sum of
    per-bucket log ratios in integer milli-nats.

    Hashing and arithmetic are engine-stable by construction:

    * gram → bucket is md5-prefix mod ``n_buckets`` (byte-identical in
      Spark and DuckDB, like every hash in this repo — never
      engine-native hash());
    * per-bucket weight is ``floor(1000 · ln((ct+1)(Nr+B) /
      ((cr+1)(Nt+B))))`` — Laplace-smoothed counts, ONE transcendental
      per bucket, floored to an integer once; document scores are then
      integer sums, so aggregation order cannot perturb the value hash
      (float summation is order-dependent; integer summation is not).

    Scale shape: the target side is tiny by construction (a quality
    reference corpus ~10^4..10^6 docs vs 10^12 raw), so its bucket
    histogram collapses to ≤ ``n_buckets`` rows. The raw-side
    histogram is a map-side-combinable groupBy on bucket (≤
    ``n_buckets`` groups — no skew possible: hot buckets combine
    before the exchange). Scoring joins the exploded capped doc grams
    to the ``n_buckets``-row weight dim with an explicit broadcast —
    the corpus is never shuffled; the only corpus-wide exchange is the
    final groupBy(doc_id), which AQE coalesces. Per-document fan-out
    is bounded by ``max_shingles`` (sorted-prefix cap, the same
    deterministic concession as the dedup family).

    In production the raw histogram comes from a hash-sample of the
    corpus (a 10^-4 sample estimates 4096 bucket frequencies to ~1%);
    the estimator here takes ``docs`` as given and leaves sampling to
    the caller (filters.hash_sample composes).
    """
    def grams_of(frame: DataFrame, col: str) -> DataFrame:
        return frame.select(
            F.explode(F.slice(shingles(col, n), 1, max_shingles)).alias("gram")
        )

    def bucket_of(gram_col) -> F.Column:
        return (
            F.conv(F.substring(F.md5(gram_col), 1, 6), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket")

    t_hist = grams_of(target, target_text_col).select(bucket_of(F.col("gram"))) \
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    r_hist = grams_of(docs, text_col).select(bucket_of(F.col("gram"))) \
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    # totals as 1-row frames crossJoined onto the <=n_buckets dim (a
    # broadcast scalar attach, same move as link.py's idf norm)
    n_t = t_hist.agg(F.sum("ct").alias("nt"))
    n_r = r_hist.agg(F.sum("cr").alias("nr"))
    weights = (
        r_hist.join(t_hist, "bucket", "full")
        .crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_r))
        .select(
            "bucket",
            # ratio in doubles: long products overflow once gram
            # totals pass 2^63 / n_buckets (they do at 10^12 docs);
            # IEEE double multiply/divide round identically in Spark
            # and DuckDB, so the mirror stays byte-stable
            F.floor(
                F.lit(1000.0)
                * F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                     * (F.col("nr") + n_buckets).cast("double"))
                    / ((F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double")
                       * (F.col("nt") + n_buckets).cast("double"))
                )
            ).cast("long").alias("w_milli"),
        )
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.slice(shingles(text_col, n), 1, max_shingles)).alias("gram"),
    ).select("doc_id", bucket_of(F.col("gram")))
    return (
        doc_grams.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w_milli").alias("score_milli"),
        )
    )


def host_quota_sample(
    docs: DataFrame,
    quota: int = 2,
    n_salt: int = 16,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus balancing: keep at most ``quota`` documents per web
    host, chosen in deterministic md5(url) order — (doc_id, host,
    host_rank). The per-host cap is how web-corpus curation keeps
    mega-hosts (blogspot, forums, link farms) from dominating the
    token budget (C4/RefinedWeb-style domain balancing).

    Skew is the whole problem here: a naive ``row_number() OVER
    (PARTITION BY host)`` puts a 10^9-page host on ONE task. This is
    the standard exact two-stage top-k instead:

    1. rank within (host, salt) — salt = md5-prefix mod ``n_salt``
       spreads a hot host over ``n_salt`` tasks; keep ≤ quota rows per
       salt group;
    2. re-rank the survivors within host — input is now ≤ n_salt ×
       quota rows PER HOST no matter how large the host was, so the
       second window is skew-proof by construction.

    EXACT, not approximate: the global ordering key (md5(url),
    doc_id) is total, and any row in the host's true top-``quota`` is
    necessarily in its salt group's top-``quota``, so stage 2 sees
    every true winner. Size ``n_salt`` to the cluster; output is
    identical for any ``n_salt`` ≥ 1.
    """
    from openie_backend_spark.functions.web import url_host

    key = F.md5(F.col(url_col))
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        url_host(F.col(url_col)).alias("host"),
        key.alias("sort_key"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("int") % n_salt).alias(
            "salt"
        ),
    )
    w1 = Window.partitionBy("host", "salt").orderBy("sort_key", "doc_id")
    s1 = (
        t.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )
    w2 = Window.partitionBy("host").orderBy("sort_key", "doc_id")
    return (
        s1.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= quota)
        .select("doc_id", "host", "host_rank")
    )


def tfidf_keywords(docs: DataFrame, k: int = 5,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` tf-idf keywords per document — (doc_id, term, tf,
    score, rank). The classic corpus-statistics summarizer (Salton &
    Buckley 1988): tf is the in-document term count, idf is the
    smoothed log ratio ln((N+1)/(df+1)), score = tf·idf rounded to 6
    decimals (double arithmetic is order-independent here: tf and df
    are exact integers, so both engines compute identical doubles).

    Scale shape: ONE exchange on (doc, term) for tf (map-side
    combined), ONE on term for df — hot stopword terms collapse to a
    row per partition before the shuffle; the corpus-size scalar N
    attaches via a 1-row broadcast (the idf-total pattern of
    ``operators/link.py``); the per-doc top-k window partitions on the
    doc key with a deterministic (score DESC, term ASC) order and
    plans a WindowGroupLimit, so each input partition ships at most k
    rows per doc. No Python anywhere.
    """
    from openie_backend_spark.functions.text import words

    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )


def temperature_sample(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """τ=2 temperature sampling of a multilingual/multi-source corpus
    (the down-weight-the-head mixing rule of multilingual pretraining,
    Conneau & Lample 2019 §3.1 with α=1/τ=0.5): keep each document of
    group ℓ with probability r_ℓ = sqrt(n_min / n_ℓ), so the sampled
    group shares are proportional to sqrt of the raw shares — the
    rarest group keeps everything, the head is compressed. Output: the
    kept documents as (doc_id, group, rate_ppm), where rate_ppm =
    floor(10^6 · r_ℓ) is the audit column.

    Determinism & engine portability: the keep decision is
    u < r_ℓ with u = first-8-hex-digits(md5(doc_id)) / 2^32. r_ℓ uses
    ONLY IEEE-exact operations (integer sqrt inputs, one division of
    two correctly-rounded sqrts), so Spark and DuckDB compute
    bit-identical thresholds — no rounding tolerance needed at the
    decision boundary, unlike pow()-based α ≠ 0.5 temperatures.

    Scale shape: one tiny groupBy(group) count (map-side combined, as
    many rows as groups), broadcast back; the keep filter is then
    map-only over the corpus — no shuffle of the data plane at all.
    """
    counts = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "grp", (F.sqrt("n_min") / F.sqrt("n_l")).alias("rate")
    )
    # over the post-rename "doc_id" column (select below runs first)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp"))
        .join(F.broadcast(rates), "grp")
        .filter(u < F.col("rate"))
        .select(
            "doc_id",
            F.col("grp").alias(group_col),
            F.floor(F.lit(1000000.0) * F.col("rate")).cast("long").alias("rate_ppm"),
        )
    )


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each document lands in
    exactly one split based on u = first-8-hex-digits(md5(salt || ':'
    || doc_id)) / 2^32 against the cumulative fraction boundaries —
    reproducible across runs, engines, and partitionings (no RNG
    state), stable under corpus growth (a document's split never
    changes when other documents arrive — the property samplers with
    global row numbers lack, and the reason eval-set stability
    survives recrawls). The ``salt`` namespaces assignments so
    independent splits of the same corpus decorrelate.

    Output: every input row as (doc_id, split). Map-only: no shuffle,
    no aggregation — the 100 TB shape is a projection. Fractions must
    sum to 1 (validated); boundaries use exact decimal arithmetic on
    the caller's floats, mirrored digit-for-digit in the oracle SQL.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    expr = None
    cum = 0.0
    names = sorted(fractions)  # deterministic boundary order
    for name in names[:-1]:
        cum += fractions[name]
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("split"))


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Corpus datasheet in one call — the profile table a training-data
    pipeline publishes with every snapshot (docs, exact-dup rate,
    token mass, quality, language mix) so downstream consumers can diff
    snapshots without re-scanning the corpus. Output: (metric, value)
    rows — n_docs, distinct_texts, dup_rate, total_tokens, mean_tokens,
    total_bpe_tokens, mean_quality, and one lang_share:<lang> row per
    language.

    Engine portability at the float boundary: per-doc quality is
    already rounded to 4 decimals, so it is summed as an exact integer
    (×10⁴, cast long) and divided once at the end — a double sum would
    hash-diverge across engines because addition order differs per
    partitioning. All other sums are integer; each mean/share is ONE
    correctly-rounded division of exact integers.

    Scale shape: one map-side-combinable global aggregate over derived
    columns, one distinct-text count (two-level groupBy on md5 —
    map-side combined, skew-free), one tiny per-lang count; everything
    downstream of those is single-row arithmetic.
    """
    from openie_backend_spark.functions.text import (
        bpe_token_count,
        quality_score,
        token_count,
    )

    base = docs.select(
        token_count(text_col).alias("toks"),
        bpe_token_count(text_col).alias("bpe"),
        F.round(quality_score(text_col) * 10000).cast("long").alias("q4"),
        F.md5(F.col(text_col)).alias("h"),
        F.col(lang_col).alias("lang"),
    )
    # ONE per-language aggregate serves both the global totals and the
    # lang_share rows (r6): previously the corpus was scanned — with
    # the quality/BPE expressions re-evaluated — once for each of the
    # global aggregate, the language counts, and the dup count. All
    # sums are exact integers, so summing the per-lang partials is
    # bit-identical to the direct global aggregate.
    per_lang = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_l"),
        F.sum("toks").alias("st_l"),
        F.sum("bpe").alias("sb_l"),
        F.sum("q4").alias("sq_l"),
    ).localCheckpoint(eager=True)
    g = per_lang.agg(
        F.sum("n_l").alias("n"),
        F.sum("st_l").alias("st"),
        F.sum("sb_l").alias("sb"),
        F.sum("sq_l").alias("sq"),
    )
    d = (
        base.select("h").groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    n, st, sb, sq, nd = (F.col(c) for c in ("n", "st", "sb", "sq", "nd"))

    def m(name, value):
        return F.struct(F.lit(name).alias("metric"),
                        value.cast("double").alias("value"))

    core = g.crossJoin(F.broadcast(d)).select(
        F.explode(
            F.array(
                m("n_docs", n),
                m("distinct_texts", nd),
                m("dup_rate", F.round(F.lit(1.0) - nd / n, 6)),
                m("total_tokens", st),
                m("mean_tokens", F.round(st / n, 6)),
                m("total_bpe_tokens", sb),
                m("mean_quality", F.round(sq / F.lit(10000.0) / n, 6)),
            )
        ).alias("r")
    ).select("r.metric", "r.value")
    langs = (
        per_lang.select("lang", "n_l")
        .crossJoin(F.broadcast(g.select("n")))
        .select(
            F.concat(F.lit("lang_share:"), F.col("lang")).alias("metric"),
            F.round(F.col("n_l") / F.col("n"), 6).alias("value"),
        )
    )
    return core.unionByName(langs)


def lm_cross_entropy(
    docs: DataFrame,
    vocab_size: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under a unigram LM trained on the
    corpus itself — the CCNet-style perplexity quality signal (Wenzek
    et al. 2020 §3.3 rank by LM perplexity; Gopher filters on it):
    gibberish and boilerplate score far from the corpus average, and
    thresholding/bucketing this column is the standard quality split.

    Model: the top-``vocab_size`` tokens by corpus frequency (count
    DESC, token ASC tiebreak — deterministic vocab), everything else
    one UNK bucket, add-one smoothing:
    p(w) = (c_w + 1) / (N + K + 1) with K = |vocab|. Output:
    (doc_id, n_tokens, ce_micro, cross_entropy) for every document
    with ≥ 1 token, where ce_micro = −Σ round(ln p(w_i)·10⁶) is an
    exact integer (per-token log-probs quantized to micro-nats ONCE,
    per distinct token, then integer-summed — a double sum would
    hash-diverge on addition order) and cross_entropy =
    ce_micro / (10⁶·n) rounded 6.

    Scale shape: ONE map-side-combinable token count, a global top-K
    (TakeOrdered, no full sort), and a BROADCAST join of the ≤ K-row
    vocab dim back to the exploded corpus — hot tokens ("the") are a
    broadcast lookup, never a shuffle key, so token skew cannot
    concentrate; then one groupBy(doc_id). Model size is capped by
    ``vocab_size`` regardless of corpus scale.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    # the histogram feeds the vocab top-K AND the N_total scalar, and
    # the vocab is referenced three more times below — materialize both
    # once (r6) or the corpus-wide explode+aggregate re-executes per
    # reference (~5 full passes observed in the plan). The histogram is
    # corpus-VOCABULARY-sized (distinct whitespace tokens), bounded far
    # below the corpus itself.
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")) \
        .localCheckpoint(eager=True)
    vocab = counts.orderBy(F.desc("c"), F.asc("token")).limit(vocab_size) \
        .localCheckpoint(eager=True)
    tot = counts.agg(F.sum("c").alias("n_total")).crossJoin(
        F.broadcast(
            vocab.agg(F.sum("c").alias("n_vocab"), F.count(F.lit(1)).alias("k"))
        )
    )
    # denominator N + K + 1 and the UNK mass are single-row scalars
    lp = F.round(
        F.log((F.col("c") + 1.0) / (F.col("n_total") + F.col("k") + 1.0))
        * 1000000.0
    ).cast("long")
    vocab_lp = vocab.crossJoin(F.broadcast(tot)).select(
        "token", lp.alias("lp_micro")
    )
    unk = tot.select(
        F.round(
            F.log(
                (F.col("n_total") - F.col("n_vocab") + 1.0)
                / (F.col("n_total") + F.col("k") + 1.0)
            )
            * 1000000.0
        )
        .cast("long")
        .alias("unk_lp")
    )
    scored = (
        toks.join(F.broadcast(vocab_lp), "token", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            "doc_id",
            F.coalesce("lp_micro", F.col("unk_lp")).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("lp")).alias("ce_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "ce_micro",
            F.round(F.col("ce_micro") / (F.lit(1000000.0) * F.col("n_tokens")), 6)
            .alias("cross_entropy"),
        )
    )
