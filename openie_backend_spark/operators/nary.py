"""Spark operators for the n-ary / noun-mediated extraction surface
(M3/M4): the OpenIE-4-shaped second extractor stack, emitting tagged
rows (``kind`` = 'T' ReVerb triple-with-attachments incl. coordination
repairs, 'N' noun-mediated, 'R' relative-clause re-attachment, 'C'
clausal complement) so the stream splitter (M4) is a plain column
filter.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from openie_backend_spark.nlp import chunker, nary, reverb, stemmer

NARY_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sent_id", LongType(), False),
        StructField("kind", StringType(), False),   # T = n-ary triple, N = relnoun
        StructField("arg1_text", StringType(), False),
        StructField("rel_text", StringType(), False),
        StructField("arg2_texts", ArrayType(StringType()), False),
        StructField("arg1_norm", StringType(), False),
        StructField("rel_norm", StringType(), False),
        StructField("arg2_norm", StringType(), False),  # core arg2 only
        StructField("confidence", DoubleType(), False),
    ]
)


def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in NARY_SCHEMA.fields]
    for pdf in it:
        rows = []
        for url, text in zip(pdf["url"], pdf["text"]):
            for sid, sent in enumerate(chunker.split_sentences(text)):
                toks, tags, chks = chunker.chunk_sentence(sent)
                seg = lambda a, b: (toks[a:b], tags[a:b])
                rv = reverb.extract(toks, tags, chks)
                base = nary.nary_extract(toks, tags, chks, triples=rv)
                extra = (nary.conj_extract(toks, tags, chks, base)
                         + nary.passive_extract(toks, tags, chks, base)
                         + nary.xcomp_extract(toks, tags, chks, base))
                for e in base + extra:
                    a1 = " ".join(toks[e.arg1[0]:e.arg1[1]])
                    rel = " ".join(toks[e.rel[0]:e.rel[1]])
                    a2s = [" ".join(toks[a:b]) for a, b in e.arg2s]
                    rows.append(
                        (
                            url, sid, "T", a1, rel, a2s,
                            stemmer.index_key_part(*seg(*e.arg1)),
                            stemmer.index_key_part(*seg(*e.rel)),
                            stemmer.index_key_part(*seg(*e.arg2s[0])),
                            0.7,
                        )
                    )
                for cc in nary.ccomp_extract(toks, tags, chks):
                    a1 = " ".join(toks[cc.arg1[0]:cc.arg1[1]])
                    rel = " ".join(toks[cc.rel[0]:cc.rel[1]])
                    a2 = " ".join(toks[cc.arg2[0]:cc.arg2[1]])
                    rows.append(
                        (
                            url, sid, "C", a1, rel, [a2],
                            stemmer.index_key_part(*seg(*cc.arg1)),
                            stemmer.index_key_part(*seg(*cc.rel)),
                            stemmer.index_key_part(*seg(*cc.arg2)),
                            0.55,
                        )
                    )
                for r in nary.relnoun_extract(toks, tags, chks):
                    a1 = " ".join(toks[r.arg1[0]:r.arg1[1]])
                    a2 = " ".join(toks[r.arg2[0]:r.arg2[1]])
                    rows.append(
                        (
                            url, sid, "N", a1, r.rel_text, [a2],
                            stemmer.index_key_part(*seg(*r.arg1)),
                            r.rel_text,
                            stemmer.index_key_part(*seg(*r.arg2)),
                            0.8,
                        )
                    )
                for ap in nary.appos_extract(toks, tags, chks):
                    a1 = " ".join(toks[ap.arg1[0]:ap.arg1[1]])
                    a2 = " ".join(toks[ap.arg2[0]:ap.arg2[1]])
                    rows.append(
                        (
                            url, sid, "N", a1, ap.rel_text, [a2],
                            stemmer.index_key_part(*seg(*ap.arg1)),
                            ap.rel_text,
                            stemmer.index_key_part(*seg(*ap.arg2)),
                            0.75,
                        )
                    )
                for rc in nary.relclause_extract(toks, tags, chks, triples=rv):
                    a1 = " ".join(toks[rc.arg1[0]:rc.arg1[1]])
                    rel = " ".join(toks[rc.rel[0]:rc.rel[1]])
                    a2 = " ".join(toks[rc.arg2[0]:rc.arg2[1]])
                    rows.append(
                        (
                            url, sid, "R", a1, rel, [a2],
                            stemmer.index_key_part(*seg(*rc.arg1)),
                            stemmer.index_key_part(*seg(*rc.rel)),
                            stemmer.index_key_part(*seg(*rc.arg2)),
                            0.6,
                        )
                    )
        yield pd.DataFrame(rows, columns=cols)


def extract_nary(pages: DataFrame, lang: str = "en") -> DataFrame:
    src = pages.filter(F.col("lang") == lang).select("url", "text")
    return src.mapInPandas(_batches, NARY_SCHEMA)


def split_streams(extractions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """M4: route by kind tag — verb-mediated rows ('T' n-ary, 'R'
    relative-clause re-attachments, 'C' clausal complements) vs
    noun-mediated ('N')."""
    return (
        extractions.filter(F.col("kind").isin("T", "R", "C")),
        extractions.filter(F.col("kind") == "N"),
    )
