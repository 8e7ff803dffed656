"""Golden linker-argmax parity: run the set-based linker over the
reference's own ``test-groups.txt`` (999 REGs with the entities the
reference linker chose, ``models/src/main/resources/.../test-groups.txt``)
and require our argmax to reproduce the reference's picks.

The CrossWikis dictionary itself is not shipped with the reference, so
the candidate dims are reconstructed FROM the golden file: every golden
entity becomes a dim row (title→fbid, inlinks from the golden record),
and every golden (arg surface → entity) pair becomes an anchor.
Candidate generation is therefore easy by construction; what the test
pins is the *selection* machinery — head phrase computation,
suffix-shrink priority, the prior×log(inlinks)×context score and the
argmax — which is exactly the part J8 drift would silently change
(VERDICT r1 #10).

Context dims: the reference's MoreLikeThis searches a Lucene index with
ONE CONTEXT DOCUMENT PER ENTITY (``batch_match.java:209-254`` — the hit
is ``docPath`` → fbid), and scores the query sentence against it. The
test reconstructs each entity's context document from the golden file
itself: its title words plus the vocabulary of every golden sentence
the reference linked to that entity (the closest public analog of the
entity context files the reference ships out-of-band). The linker's
idf weighting over this corpus (``operators/link._prepare_dims``) is
what makes shared sentence vocabulary non-discriminative — without it
the gate below fails (measured 0.893 flat vs 0.923 idf-weighted).
"""

from __future__ import annotations

import os
import re

import pytest

GOLD = (
    "/root/reference/models/src/main/resources/edu/knowitall/openie/models/"
    "test-groups.txt"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLD), reason="reference fixtures not present"
)


def _interval(s: str) -> tuple[int, int] | None:
    m = re.match(r"\[(\d+), (\d+)\)", s)
    if m:
        return int(m.group(1)), int(m.group(2))
    m = re.match(r"\{(\d+)\}", s)
    if m:
        i = int(m.group(1))
        return i, i + 1
    return None


def _entity(s: str):
    if s == "X" or not s:
        return None
    parts = s.rsplit(",", 3)
    if len(parts) != 4:
        return None
    name, fbid, score, inlinks = parts
    try:
        return name, fbid, float(score), max(int(float(inlinks)), 2)
    except ValueError:
        return None


def _load_gold():
    rows = []
    with open(GOLD, encoding="utf-8") as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            if len(c) < 13:
                continue
            spans = [_interval(c[7]), _interval(c[8]), _interval(c[9])]
            if any(s is None for s in spans):
                continue
            toks, tags = c[10].split(" "), c[11].split(" ")
            if len(toks) != len(tags) or spans[2][1] > len(toks):
                continue
            rows.append(
                {
                    "arg1_norm": c[0], "rel_norm": c[1], "arg2_norm": c[2],
                    "e1": _entity(c[3]), "e2": _entity(c[4]),
                    "t1": c[5] if c[5] != "X" else "",
                    "t2": c[6] if c[6] != "X" else "",
                    "arg1": spans[0], "rel": spans[1], "arg2": spans[2],
                    "tokens": toks, "tags": tags,
                }
            )
    return rows


def _build_dims(rows, spark):
    """Candidate dims reconstructed from the golden entities."""
    from openie_backend_spark.nlp import stemmer

    anchors, titles, inlinks, types, ctx = {}, {}, {}, {}, {}
    for r in rows:
        for side, span in (("e1", "arg1"), ("e2", "arg2")):
            ent = r[side]
            if ent is None:
                continue
            name, fbid, _, inl = ent
            titles[name] = fbid
            inlinks[fbid] = max(inlinks.get(fbid, 0), inl)
            tkey = "t1" if side == "e1" else "t2"
            if r[tkey]:
                types[fbid] = sorted(set(r[tkey].split(",")))
            # entity context document = title words + the vocabulary of
            # every golden sentence linked to this entity (MLT analog,
            # see module docstring)
            ws = set(stemmer.lnrm(w) for w in name.split() if w)
            ws |= set(stemmer.lnrm(t) for t in r["tokens"])
            ws.discard("")
            ctx.setdefault(fbid, set()).update(ws)
            # anchor = the arg's head phrase (what the linker probes);
            # the prior is ESTIMATED from the golden picks themselves —
            # cprob(anchor→entity) ∝ how often the reference linked
            # that surface to that entity (CrossWikis is exactly such
            # a corpus-frequency table)
            s, e = r[span]
            head = stemmer.head_phrase(r["tokens"][s:e], r["tags"][s:e])
            for surf in (head, name):
                a = stemmer.lnrm(surf)
                if a:
                    anchors[(a, name)] = anchors.get((a, name), 0) + 1
    import pandas as pd

    anchor_totals = {}
    for (a, _), c in anchors.items():
        anchor_totals[a] = anchor_totals.get(a, 0) + c
    dims_pd = {
        "dim_anchor_prior": pd.DataFrame(
            [{"anchor_lnrm": a, "entity_title": t,
              # map the estimated prior into [0.5, 0.99] so the
              # high-precision cutoff (cprob ≥ 0.5) keeps every
              # golden candidate while frequency still ranks them
              "cprob": round(0.5 + 0.49 * c / anchor_totals[a], 4),
              "count": 1000}
             for (a, t), c in anchors.items()]
        ),
        "dim_title_fbid": pd.DataFrame(
            [{"title": t, "fbid": f} for t, f in titles.items()]
        ),
        "dim_fbid_title_inlinks": pd.DataFrame(
            [{"fbid": f, "title": t, "inlinks": inlinks[f]}
             for t, f in titles.items()]
        ),
        "dim_fbid_types": pd.DataFrame(
            [{"fbid": f, "types": ts} for f, ts in types.items()]
            or [{"fbid": "_none", "types": []}]
        ),
        "dim_context_terms": pd.DataFrame(
            [{"fbid": f, "term": w, "weight": 1.0}
             for f, ws in ctx.items() for w in sorted(ws)]
        ),
    }
    anchor_titles: dict[str, set[str]] = {}
    for (a, t) in anchors:
        anchor_titles.setdefault(a, set()).add(t)
    return {k: spark.createDataFrame(v) for k, v in dims_pd.items()}, anchor_titles


def _golden_groups(rows, spark):
    from pyspark.sql import Row

    from openie_backend_spark.nlp import stemmer

    group_rows = []
    for i, r in enumerate(rows):
        h1 = stemmer.head_phrase(
            r["tokens"][r["arg1"][0]:r["arg1"][1]],
            r["tags"][r["arg1"][0]:r["arg1"][1]],
        )
        h2 = stemmer.head_phrase(
            r["tokens"][r["arg2"][0]:r["arg2"][1]],
            r["tags"][r["arg2"][0]:r["arg2"][1]],
        )
        group_rows.append(
            Row(
                gid=i, arg1_norm=f"{i}|{r['arg1_norm']}", rel_norm=r["rel_norm"],
                arg2_norm=r["arg2_norm"], arg1_head=h1, arg2_head=h2,
                arg1_frontend=r["arg1_norm"], rel_frontend=r["rel_norm"],
                arg2_frontend=r["arg2_norm"], size=1,
                instances=[Row(tokens=r["tokens"])],
            )
        )
    return spark.createDataFrame(group_rows)


def _run_linker(spark, groups, dims, refuse):
    from pyspark.sql import functions as F

    from openie_backend_spark.operators.link import link_groups

    out = link_groups(groups, dims, refuse_junk_anchors=refuse).select(
        "gid",
        F.col("arg1_entity.fbid").alias("f1"),
        F.col("arg2_entity.fbid").alias("f2"),
    ).collect()
    return {r["gid"]: (r["f1"], r["f2"]) for r in out}


def _head_refused(head: str) -> bool:
    """Python mirror of link._link_side's suffix-level refusal: the
    head is a no-link iff EVERY suffix is refused (single junk word /
    pure number) or lnrm-empty."""
    from openie_backend_spark.nlp import stemmer as _st
    from openie_backend_spark.operators.link import JUNK_ANCHORS

    words = head.split()
    for i in range(len(words)):
        lnrm = _st.lnrm(" ".join(words[i:]))
        if not lnrm:
            continue
        acronym = (
            words[i] == words[i].upper()
            and len(words[i]) > 1
            and any(c.isalpha() for c in words[i])
        )
        if len(words) - i == 1 and (
            (words[i].lower() in JUNK_ANCHORS and not acronym)
            or lnrm.isdigit()
        ):
            continue
        return False
    return True


def test_linker_argmax_matches_reference_golden(spark):
    rows = _load_gold()
    assert len(rows) > 900, "golden file should parse almost fully"
    linked_gold = [r for r in rows if r["e1"] or r["e2"]]
    assert len(linked_gold) > 100

    groups = _golden_groups(rows, spark)
    dims, anchor_titles = _build_dims(rows, spark)
    # refusal OFF: pins the raw argmax machinery against every golden
    # pick, including junk anchors the dims-from-gold make resolvable
    got = _run_linker(spark, groups, dims, refuse=False)

    from openie_backend_spark.nlp import stemmer as _st

    checked = hits = u_checked = u_hits = 0
    misses, u_misses = [], []
    for i, r in enumerate(rows):
        for side, span, k in (("e1", "arg1", 0), ("e2", "arg2", 1)):
            if r[side] is None:
                continue
            checked += 1
            ok = got[i][k] == r[side][1]
            hits += ok
            if not ok:
                misses.append((i, side, r[side][0], got[i][k]))
            s, e = r[span]
            head_anchor = _st.lnrm(
                _st.head_phrase(r["tokens"][s:e], r["tags"][s:e])
            )
            if head_anchor and len(anchor_titles.get(head_anchor, ())) == 1:
                u_checked += 1
                u_hits += ok
                if not ok:
                    u_misses.append((i, side, r[side][0], got[i][k]))
    rate = hits / checked
    # overall gate (VERDICT r2 #3: 0.833 → ≥0.90): idf-weighted context
    # over per-entity context documents; measured 0.923 at pin time.
    # Residue = junk anchors ("it", "at") whose golden pick needed the
    # reference's out-of-band context files
    assert rate >= 0.90, f"golden argmax match {rate:.3f}; misses={misses[:10]}"
    # unambiguous anchors (exactly one golden entity) must link almost
    # perfectly — this pins the shrink-priority + argmax machinery
    u_rate = u_hits / u_checked
    assert u_checked > 200
    assert u_rate >= 0.97, (
        f"unambiguous argmax match {u_rate:.3f}; misses={u_misses[:10]}"
    )

    # the specific example from the verdict: 'Improvement commissioners'
    by_fbid = [i for i, r in enumerate(rows) if r["e2"] and r["e2"][1] == "0266lb5"]
    assert by_fbid and all(got[i][1] == "0266lb5" for i in by_fbid)


def test_linker_junk_anchor_refusal(spark):
    """Junk-anchor refusal (VERDICT r3 #4, the reference stoplist
    spirit, ``ExtractionGroupFetcher.scala:119-133``): with refusal ON
    (the default), closed-class/number anchors become NO-links instead
    of prior-driven mislinks. Gates: (a) every refused golden side is
    a no-link; (b) argmax accuracy on the non-refused sides is at
    least the refusal-off overall rate (the misses live in the refused
    set); (c) precision of EMITTED links strictly improves."""
    from openie_backend_spark.nlp import stemmer as _st

    rows = _load_gold()
    groups = _golden_groups(rows, spark)
    dims, _ = _build_dims(rows, spark)
    got_off = _run_linker(spark, groups, dims, refuse=False)
    got_on = _run_linker(spark, groups, dims, refuse=True)

    kept = kept_hits = 0
    emitted_on = hits_on = emitted_off = hits_off = 0
    refused_gold = 0
    for i, r in enumerate(rows):
        for side, span, k in (("e1", "arg1", 0), ("e2", "arg2", 1)):
            if r[side] is None:
                continue
            s, e = r[span]
            head = _st.head_phrase(r["tokens"][s:e], r["tags"][s:e])
            gold_fbid = r[side][1]
            if got_off[i][k] is not None:
                emitted_off += 1
                hits_off += got_off[i][k] == gold_fbid
            if got_on[i][k] is not None:
                emitted_on += 1
                hits_on += got_on[i][k] == gold_fbid
            if _head_refused(head):
                refused_gold += 1
                assert got_on[i][k] is None, (
                    f"junk anchor {head!r} still linked to {got_on[i][k]}"
                )
            else:
                kept += 1
                kept_hits += got_on[i][k] == gold_fbid
    assert refused_gold > 50, "refusal list should cover the junk golds"
    assert kept > 250
    # (b): accuracy on the anchors we still link must clear the old
    # overall gate with room — the residue misses were junk anchors
    assert kept_hits / kept >= 0.95, f"non-refused accuracy {kept_hits/kept:.3f}"
    # (c): precision of emitted links strictly improves over refusal-off
    assert emitted_on and hits_on / emitted_on > hits_off / emitted_off, (
        f"precision on={hits_on}/{emitted_on} vs off={hits_off}/{emitted_off}"
    )
