"""stdin/stdout CLI (S8) — the pipe-shaped entry the reference exposes
for its extraction tools (``docs/reverb-cluster-extraction-indexing.txt``
usage; ``backend`` CLI mains): raw sentences in, tab-serialized
extractions out, so shell pipelines work without a Spark session.

    echo "Acme Corp acquired Globex ." | python -m openie_backend_spark extract

Output is the reference's 7-column ReVerbExtraction tab format
(``models/.../ReVerbExtraction.scala:137-147`` — three ``[start, end)``
intervals, three space-joined aligned layers, url), which
``sources/tab.read_extractions_tab`` reads back losslessly (M12
round-trip, tested). ``--nary`` emits the second-extractor stream as
``kind<TAB>arg1<TAB>rel<TAB>arg2s...`` lines instead.

Pure Python — the distributed path is the library API / spark-submit;
this is the single-machine pipe analog.
"""

from __future__ import annotations

import argparse
import sys


def _extract_lines(lines, url: str, nary_mode: bool):
    from openie_backend_spark.nlp import chunker, nary, reverb

    for line in lines:
        text = line.rstrip("\n")
        if not text.strip():
            continue
        for sent in chunker.split_sentences(text):
            toks, tags, chks = chunker.chunk_sentence(sent)
            if nary_mode:
                rv = reverb.extract(toks, tags, chks)
                base = nary.nary_extract(toks, tags, chks, triples=rv)
                extra = (nary.conj_extract(toks, tags, chks, base)
                         + nary.passive_extract(toks, tags, chks, base)
                         + nary.xcomp_extract(toks, tags, chks, base))
                join = lambda a, b: " ".join(toks[a:b])
                for e in base + extra:
                    yield "\t".join(
                        ["T", join(*e.arg1), join(*e.rel)]
                        + [join(a, b) for a, b in e.arg2s]
                    )
                for c in nary.ccomp_extract(toks, tags, chks):
                    yield "\t".join(
                        ["C", join(*c.arg1), join(*c.rel), join(*c.arg2)])
                for r in nary.relnoun_extract(toks, tags, chks):
                    yield "\t".join(
                        ["N", join(*r.arg1), r.rel_text, join(*r.arg2)])
                for ap_ in nary.appos_extract(toks, tags, chks):
                    yield "\t".join(
                        ["N", join(*ap_.arg1), ap_.rel_text, join(*ap_.arg2)])
                for rc in nary.relclause_extract(toks, tags, chks, triples=rv):
                    yield "\t".join(
                        ["R", join(*rc.arg1), join(*rc.rel), join(*rc.arg2)])
            else:
                for e in reverb.extract(toks, tags, chks):
                    yield "\t".join([
                        f"[{e.arg1[0]}, {e.arg1[1]})",
                        f"[{e.rel[0]}, {e.rel[1]})",
                        f"[{e.arg2[0]}, {e.arg2[1]})",
                        " ".join(toks), " ".join(tags), " ".join(chks),
                        url,
                    ])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m openie_backend_spark",
        description="stdin -> extractions -> stdout (no Spark session)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("extract", help="sentences on stdin, tab lines out")
    ex.add_argument("--url", default="None",
                    help="url column value for the tab lines")
    ex.add_argument("--nary", action="store_true",
                    help="emit the n-ary/relnoun/relclause/ccomp stream")
    args = ap.parse_args(argv)
    if args.cmd == "extract":
        for out in _extract_lines(sys.stdin, args.url, args.nary):
            print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
