"""Single-process mirrors of the Python-UDF pipeline stages, used to
materialize oracle inputs for the DuckDB correctness gate.

The extraction / n-ary / multimodal stages are Python NLP running
inside ``mapInPandas`` — not SQL-expressible. To still put the whole
KG path under the hard DuckDB gate (VERDICT r1, next-round #1), we
materialize those stages' outputs to parquet with a *single-process
pandas* run of the same batch functions the Spark operators wrap, and
express every downstream stage (grouping ``ScoobiReVerbGrouper.scala:
113-130``, linking argmax ``EntityLinker.scala:147-149``, typer caps
``UnlinkableEntityTyper.scala:140-171``, serving ``QuerySpec.scala:
81-134``) as DuckDB SQL over these files. The Spark side of each
correctness entry still runs the full distributed operator chain from
the raw pages, so the comparison covers Arrow batching, shuffles,
window caps and joins — everything except the shared pure-Python NLP
core, which the parity harness gates separately.

Cache invalidation: the cache directory name embeds a hash of the NLP
and extractor sources, so changing the confidence model or the tagger
regenerates the mirrors automatically.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd

# Corpus cache is owned by synth.py (source-hash + n_pages keyed dir,
# race-safe): mirror and __spark_entry__ share synth.ensure_corpus().

_VERSIONED_SOURCES = [
    "nlp/chunker.py", "nlp/reverb.py", "nlp/stemmer.py", "nlp/nary.py",
    "nlp/lexicon.py", "nlp/tag_lexicon.py", "nlp/confidence.py",
    "nlp/perceptron.py", "nlp/tagger_model.json.gz",
    "nlp/chunker_model.json.gz",
    "operators/extract.py", "operators/nary.py", "operators/multimodal.py",
    "operators/instance_dedup.py", "synth.py",
]


def source_version() -> str:
    base = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    for rel in _VERSIONED_SOURCES:
        p = os.path.join(base, rel)
        if os.path.exists(p):
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:10]


def cache_dir() -> str:
    return f"/tmp/openie_oracle_cache_{source_version()}"


def extractions_pdf(pages: pd.DataFrame) -> pd.DataFrame:
    """Run the exact batch function ``extract_pages`` wraps (full
    layers), single-threaded, over a pandas pages table (en only)."""
    from openie_backend_spark.operators.extract import _make_extract_batches

    en = pages[pages["lang"] == "en"]
    src = pd.DataFrame(
        {
            "url": en["url"].astype(str).tolist(),
            "text": en["text"].astype(str).tolist(),
            "_tokens": [None] * len(en),
            "_pos": [None] * len(en),
            "_chunks": [None] * len(en),
        }
    )
    fn, _ = _make_extract_batches(True)
    return pd.concat(list(fn(iter([src]))), ignore_index=True)


def nary_pdf(pages: pd.DataFrame) -> pd.DataFrame:
    """Mirror of ``extract_nary`` (same batch function)."""
    from openie_backend_spark.operators.nary import _batches

    en = pages[pages["lang"] == "en"]
    src = pd.DataFrame(
        {"url": en["url"].astype(str).tolist(), "text": en["text"].astype(str).tolist()}
    )
    return pd.concat(list(_batches(iter([src]))), ignore_index=True)


def mm_features_pdf(n: int = 64, dim: int = 16) -> pd.DataFrame:
    """Mirror of ``synthetic_media`` + ``extract_features``: the raw
    (unrounded) feature sum accumulated in array order, exactly as the
    Spark ``F.aggregate`` does (double accumulator over float32)."""
    from openie_backend_spark.operators.multimodal import _decode_image

    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * 4
        feat = _decode_image(payload, dim)
        s = 0.0
        for x in feat:
            s += float(x)
        rows.append(
            {"media_id": i, "payload_bytes": len(payload), "feat_sum_raw": s}
        )
    return pd.DataFrame(rows)


def instance_dedup_pdf(ext: pd.DataFrame) -> pd.DataFrame:
    """Mirror of ``dedup_instances``: the same per-group sequential scan
    the grouped ``applyInPandas`` runs, over an in-memory extraction
    table (G10, ``InstanceDeduplicator.scala:22-90``)."""
    from openie_backend_spark.operators.instance_dedup import _dedup_one_group

    parts = []
    for _, pdf in ext.groupby(
        ["arg1_norm", "rel_norm", "arg2_norm"], sort=False
    ):
        parts.append(_dedup_one_group(pdf.reset_index(drop=True)))
    return pd.concat(parts, ignore_index=True)


def _docs_as_pages(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    return pd.DataFrame(
        {
            "url": ("doc://" + docs["doc_id"].astype(str)).tolist(),
            "text": docs["text"].tolist(),
            "lang": docs["lang"].tolist(),
        }
    )


def ensure(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Materialize all oracle inputs (idempotent). Returns paths."""
    from openie_backend_spark import synth

    d = cache_dir()
    os.makedirs(d, exist_ok=True)
    synth_cache = synth.ensure_corpus()

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    paths = {
        "ext_docs": os.path.join(d, f"ext_docs_{sf_name}.parquet"),
        "ext_synth": os.path.join(d, "ext_synth.parquet"),
        "inst_dedup": os.path.join(d, "inst_dedup_synth.parquet"),
        "nary_synth": os.path.join(d, "nary_synth.parquet"),
        "mm_features": os.path.join(d, "mm_features.parquet"),
        "synth_dir": synth_cache,
    }
    if not os.path.exists(paths["ext_docs"]):
        extractions_pdf(_docs_as_pages(sf_dir)).to_parquet(paths["ext_docs"], index=False)
    if not (os.path.exists(paths["ext_synth"]) and os.path.exists(paths["inst_dedup"])):
        pages = pd.read_parquet(os.path.join(synth_cache, "pages.parquet"))
        ext = extractions_pdf(pages)
        ext.to_parquet(paths["ext_synth"], index=False)
        instance_dedup_pdf(ext).to_parquet(paths["inst_dedup"], index=False)
    if not os.path.exists(paths["nary_synth"]):
        pages = pd.read_parquet(os.path.join(synth_cache, "pages.parquet"))
        nary_pdf(pages).to_parquet(paths["nary_synth"], index=False)
    if not os.path.exists(paths["mm_features"]):
        mm_features_pdf().to_parquet(paths["mm_features"], index=False)
    return paths
