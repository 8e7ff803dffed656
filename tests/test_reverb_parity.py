"""Extractor parity gate: our ReVerb reimplementation vs the reference's
golden fixture (``TestReVerbExtractions.txt``), the P/R ≥ 0.95 criterion
from BASELINE.json. Pure-Python (no Spark) — the Spark operator wraps the
same functions, so this gates the semantics."""

from __future__ import annotations

from collections import defaultdict

import pytest

from openie_backend_spark.nlp import reverb
from openie_backend_spark.sources import fixtures

pytestmark = pytest.mark.skipif(
    not fixtures.available(), reason="reference fixture checkout not present"
)


def _parity():
    gold_by_sent: dict[str, set] = defaultdict(set)
    layers: dict[str, tuple] = {}
    for g in fixtures.iter_gold_extractions():
        key = " ".join(g.tokens)
        gold_by_sent[key].add((g.arg1, g.rel, g.arg2))
        layers[key] = (g.tokens, g.pos, g.chunks)
    tp = fp = fn = 0
    for key, (toks, pos, chunks) in layers.items():
        pred = {(e.arg1, e.rel, e.arg2) for e in reverb.extract(toks, pos, chunks)}
        gold = gold_by_sent[key]
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
    return tp / (tp + fp), tp / (tp + fn)


def test_span_parity_meets_gate():
    p, r = _parity()
    assert p >= 0.95, f"precision {p:.4f} below 0.95 gate"
    assert r >= 0.95, f"recall {r:.4f} below 0.95 gate"


def test_simple_svo():
    toks = "Paris is the capital of France .".split()
    pos = ["NNP", "VBZ", "DT", "NN", "IN", "NNP", "."]
    chunks = ["B-NP", "B-VP", "B-NP", "I-NP", "B-PP", "B-NP", "O"]
    out = reverb.extract(toks, pos, chunks)
    assert (
        reverb.Extraction(arg1=(0, 1), rel=(1, 5), arg2=(5, 6)) in out
    ), out  # "is the capital of" via the relational-noun lexicon


def test_no_extraction_without_verb():
    toks = "The red car .".split()
    pos = ["DT", "JJ", "NN", "."]
    chunks = ["B-NP", "I-NP", "I-NP", "O"]
    assert reverb.extract(toks, pos, chunks) == []
