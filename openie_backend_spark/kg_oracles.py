"""DuckDB oracle SQL for the KG pipeline queries (the hard correctness
gate on the real operator chain — VERDICT r1 next-round #1).

Each oracle is ANSI/DuckDB SQL over the mirror parquet files written by
``mirror.ensure`` (single-process runs of the Python-NLP stages) plus
the synthetic linker dims. The SQL re-expresses, independently of the
Spark operator code:

* grouping — F2 instance filter + instance-set dedup + size
  (``ScoobiReVerbGroupFilter.scala:77-127``,
  ``ScoobiReVerbGrouper.scala:113-130``);
* linking — head-suffix shrink, CrossWikis prior cutoffs, context
  cosine, argmax (``HeadPhraseFinder.scala:8-62``,
  ``CrosswikisCandidateFinder.java:26-71``,
  ``EntityLinker.scala:147-149``);
* the unlinkable-entity typer chain G6-G9
  (``UnlinkableEntityTyper.scala:100-243``);
* regroup/inlink-ratio/projections/edges/serving
  (``ReVerbExtractionGroup.scala:103-168``,
  ``ScoobiInlinkRatioComputer.scala:40-75``,
  ``ScoobiGroupToAnswer.scala:26-43``, ``QuerySpec.scala:81-134``).

A hash mismatch on any of these queries means the distributed plan
(shuffles, window caps, broadcast joins, Arrow batching) diverged from
the declarative semantics.
"""

from __future__ import annotations

from openie_backend_spark import mirror

_NEG = "('no','not','none','n''t','never')"
_PRON = (
    "('he','she','it','they','them','him','her','i','you','we','us','me',"
    "'this','that','these','those')"
)
_TRIPLE = "arg1_text || ' ' || rel_text || ' ' || arg2_text"

# F2 instance quality filter at min_conf=0 (mirror of
# operators/filters.instance_quality_filter)
_F2 = f"""
        len(list_filter(regexp_split_to_array(lower(rel_text), ' '),
                        w -> w IN {_NEG})) = 0
    AND len(list_filter(regexp_split_to_array(lower(arg2_text), ' '),
                        w -> w IN {_NEG})) = 0
    AND length(arg1_text) + length(rel_text) + length(arg2_text) <= 60
    AND lower(arg1_text) NOT IN {_PRON}
    AND lower(arg2_text) NOT IN {_PRON}
    AND length(trim(arg1_norm)) > 0
    AND length(trim(rel_norm)) > 0
    AND length(trim(arg2_norm)) > 0
    AND arg1_norm <> arg2_norm
    AND (length({_TRIPLE})
         - length(regexp_replace({_TRIPLE}, '[^A-Za-z0-9 .,''-]', '', 'g'))) < 5
    AND NOT regexp_matches(lower({_TRIPLE}), '(http|\\(|\\)|"|\\[|thing)')
"""

_INST_SLIM = (
    "url, sent_id, arg1_start, arg1_end, rel_start, rel_end, "
    "arg2_start, arg2_end, arg1_text, rel_text, arg2_text, confidence"
)

_TOTAL_ORDER = (
    "confidence DESC, url, sent_id, arg1_start, arg1_end, "
    "rel_start, rel_end, arg2_start, arg2_end"
)


def _groups_ctes(ext_path: str, with_heads: bool) -> str:
    """flt → ded (instance-set dedup) → grp (+ top, the cap-window
    leader carrying heads and the context token bag)."""
    inst = _INST_SLIM + (
        ", tokens, pos_tags, arg1_head, arg2_head,"
        " arg1_frontend, rel_frontend, arg2_frontend" if with_heads else ""
    )
    top = ""
    if with_heads:
        top = f""",
    top AS (
        SELECT arg1_norm, rel_norm, arg2_norm, arg1_head, arg2_head,
               arg1_frontend, rel_frontend, arg2_frontend,
               list_transform(tokens, t -> lower(t)) AS ctx
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY arg1_norm, rel_norm, arg2_norm
                ORDER BY {_TOTAL_ORDER}) AS rn
            FROM ded
        ) WHERE rn = 1
    )"""
    return f"""
    flt AS (SELECT * FROM read_parquet('{ext_path}') WHERE {_F2}),
    ded AS (SELECT DISTINCT arg1_norm, rel_norm, arg2_norm, {inst} FROM flt),
    grp AS (SELECT arg1_norm, rel_norm, arg2_norm, count(*) AS size
            FROM ded GROUP BY 1, 2, 3){top}"""


def _cand_ctes(dims: str) -> str:
    """Denormalized candidate dim + context totals (mirror of
    link._prepare_dims, high-precision cutoffs cprob≥0.5, count≥500)."""
    return f"""
    cand AS (
        SELECT a.anchor_lnrm, t.title, t.fbid, a.cprob,
               coalesce(i.inlinks, 2) AS inlinks,
               coalesce(ty.types, CAST([] AS VARCHAR[])) AS types
        FROM read_parquet('{dims}/dim_anchor_prior.parquet') a
        JOIN read_parquet('{dims}/dim_title_fbid.parquet') t
          ON a.entity_title = t.title
        LEFT JOIN read_parquet('{dims}/dim_fbid_title_inlinks.parquet') i
          ON i.fbid = t.fbid
        LEFT JOIN read_parquet('{dims}/dim_fbid_types.parquet') ty
          ON ty.fbid = t.fbid
        WHERE a.cprob >= 0.5 AND a."count" >= 500
    ),
    idf AS (
        SELECT term,
               ln((SELECT count(DISTINCT fbid)
                   FROM read_parquet('{dims}/dim_context_terms.parquet')) * 1.0
                  / count(DISTINCT fbid)) AS idf
        FROM read_parquet('{dims}/dim_context_terms.parquet') GROUP BY term
    ),
    ctxw AS (
        SELECT c.fbid, c.term, c.weight * i.idf AS weight
        FROM read_parquet('{dims}/dim_context_terms.parquet') c
        JOIN idf i USING (term)
    ),
    ctxt AS (
        SELECT fbid, sum(weight) AS ctx_total FROM ctxw GROUP BY 1
    )"""


def _junk_anchor_list() -> str:
    """SQL IN-list of the linker's junk-anchor refusal words
    (operators/link.JUNK_ANCHORS), kept in lockstep by importing."""
    from openie_backend_spark.operators.link import JUNK_ANCHORS

    return "(" + ",".join(f"'{w}'" for w in sorted(JUNK_ANCHORS)) + ")"


def _link_side_ctes(side: str, dims: str) -> str:
    """Suffix-shrink candidates, context-cosine score, argmax
    (shrink ASC, score DESC, fbid DESC — matches the max_by struct).
    Junk-anchor refusal: a single-word suffix that is a closed-class
    word or a pure number yields no candidate (link._link_side)."""
    return f"""
    sfx_{side} AS (
        SELECT arg1_norm, rel_norm, arg2_norm, ctx, words,
               unnest(range(0, len(words))) AS shrink_idx
        FROM (SELECT *, regexp_split_to_array({side}_head, ' ') AS words FROM top)
    ),
    sc_{side} AS (
        SELECT s.arg1_norm, s.rel_norm, s.arg2_norm, s.shrink_idx,
               c.title, c.fbid, c.types, c.inlinks, c.cprob,
               coalesce((SELECT sum(w.weight)
                         FROM ctxw w
                         WHERE w.fbid = c.fbid AND list_contains(s.ctx, w.term)),
                        0.0) AS matched,
               coalesce(ct.ctx_total, 0.0) AS ctx_total
        FROM (SELECT *, regexp_replace(
                  lower(array_to_string(words[shrink_idx+1:], ' ')),
                  '[^a-z0-9]', '', 'g') AS anchor_lnrm
              FROM sfx_{side}) s
        JOIN cand c USING (anchor_lnrm)
        LEFT JOIN ctxt ct ON ct.fbid = c.fbid
        WHERE NOT (len(s.words) - s.shrink_idx = 1
                   AND ((lower(s.words[s.shrink_idx + 1]) IN {_junk_anchor_list()}
                         -- acronym exemption (link.py): all-caps multi-
                         -- letter single words are not closed-class junk
                         AND NOT (s.words[s.shrink_idx + 1] = upper(s.words[s.shrink_idx + 1])
                                  AND len(s.words[s.shrink_idx + 1]) > 1
                                  AND regexp_matches(s.words[s.shrink_idx + 1], '[A-Z]')))
                        OR regexp_matches(s.anchor_lnrm, '^[0-9]+$')))
    ),
    best_{side} AS (
        SELECT arg1_norm, rel_norm, arg2_norm, fbid, title, types FROM (
            SELECT *, row_number() OVER (
                PARTITION BY arg1_norm, rel_norm, arg2_norm
                ORDER BY shrink_idx ASC, score DESC, fbid DESC) AS rnk
            FROM (SELECT *, round(cprob * ln(inlinks) *
                        CASE WHEN ctx_total > 0 THEN matched / ctx_total
                             ELSE 0.0 END, 3) AS score
                  FROM sc_{side})
        ) WHERE rnk = 1
    )"""


def _linked_sql(ext_synth: str, dims: str) -> str:
    """All CTEs up to ``linked`` (one row per group with both sides'
    best entity + types), over the synth corpus."""
    return f"""WITH {_groups_ctes(ext_synth, with_heads=True)},
    {_cand_ctes(dims)},
    {_link_side_ctes('arg1', dims)},
    {_link_side_ctes('arg2', dims)},
    linked AS (
        SELECT g.arg1_norm, g.rel_norm, g.arg2_norm, g.size,
               b1.fbid AS arg1_fbid,
               coalesce(b1.types, CAST([] AS VARCHAR[])) AS arg1_types,
               b2.fbid AS arg2_fbid,
               coalesce(b2.types, CAST([] AS VARCHAR[])) AS arg2_types
        FROM grp g
        LEFT JOIN best_arg1 b1 USING (arg1_norm, rel_norm, arg2_norm)
        LEFT JOIN best_arg2 b2 USING (arg1_norm, rel_norm, arg2_norm)
    )"""


def _typed_sql(ext_synth: str, dims: str) -> str:
    """G6→G9 over ``linked`` with arg1='acme corp' force-unlinked
    (mirror of the kg_typed query; min_rel_weight=0.05, min_share=2)."""
    stop = f"(SELECT fbid FROM read_parquet('{dims}/dim_entity_stoplist.parquet'))"
    return f"""{_linked_sql(ext_synth, dims)},
    lk2 AS (
        SELECT arg1_norm, rel_norm, arg2_norm, size,
               CASE WHEN arg1_norm = 'acme corp' THEN NULL
                    ELSE arg1_fbid END AS fbid1,
               CASE WHEN arg1_norm = 'acme corp' THEN CAST([] AS VARCHAR[])
                    ELSE arg1_types END AS types1
        FROM linked
    ),
    ents AS (
        SELECT DISTINCT rel_norm, fbid1 AS fbid,
               list_sort(list_distinct(types1)) AS types,
               md5(rel_norm || '|' || fbid1) AS ord
        FROM lk2
        WHERE fbid1 IS NOT NULL AND len(types1) > 0
          AND fbid1 NOT IN {stop}
    ),
    samp AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY rel_norm ORDER BY ord) AS rn
            FROM ents WHERE length(rel_norm) > 3 AND length(rel_norm) <= 100
        ) WHERE rn <= 150
    ),
    nper AS (SELECT rel_norm, count(*) AS n FROM samp GROUP BY 1),
    shr AS (
        SELECT a.rel_norm, count(*) AS shared
        FROM samp a JOIN samp b ON a.rel_norm = b.rel_norm AND a.rn < b.rn
        WHERE len(list_intersect(a.types, b.types)) > 0
        GROUP BY 1
    ),
    relinfo AS (
        SELECT rel_norm, round(w, 6) AS weight FROM (
            SELECT n.rel_norm,
                   coalesce(s.shared, 0) / (n.n * (n.n - 1) / 2.0) AS w
            FROM nper n LEFT JOIN shr s USING (rel_norm) WHERE n.n > 1
        ) WHERE w >= 0.05
    ),
    args AS (
        SELECT rel_norm, arg_norm FROM (
            SELECT rel_norm, arg_norm,
                   row_number() OVER (PARTITION BY rel_norm ORDER BY arg_norm) AS rn
            FROM (SELECT DISTINCT rel_norm, arg1_norm AS arg_norm FROM lk2
                  WHERE length(arg1_norm) >= 4
                    AND NOT regexp_matches(arg1_norm, '[0-9][0-9][0-9]+')
                    AND len(list_filter(regexp_split_to_array(arg1_norm, ' '),
                        w -> w IN ('all','any','five','four','one','some','three','two'))) = 0)
        ) WHERE rn <= 1000
    ),
    contrib AS (
        SELECT a.arg_norm, s.fbid, min(s.types) AS types,
               sum(pow(10, 4 * r.weight)) AS w
        FROM args a JOIN relinfo r USING (rel_norm) JOIN samp s USING (rel_norm)
        GROUP BY 1, 2
    ),
    top15 AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY arg_norm
                ORDER BY w DESC, fbid ASC) AS rk FROM contrib
        ) WHERE rk <= 15
    ),
    tc AS (
        SELECT arg_norm, t.typ, count(*) AS c
        FROM top15, unnest(top15.types) AS t(typ)
        GROUP BY 1, 2
    ),
    pred AS (
        SELECT arg_norm, list(typ ORDER BY pr) AS ptypes FROM (
            SELECT arg_norm, typ,
                   row_number() OVER (PARTITION BY arg_norm
                       ORDER BY c DESC, typ ASC) AS pr
            FROM tc WHERE c >= 2
        ) WHERE pr <= 5 GROUP BY 1
    )"""


def _pagerank_iteration_ctes(n: int) -> str:
    """Unrolled GraphX-convention PageRank iterations as chained CTEs
    (mirror of materialize.pagerank's declarative loop): contribution
    aggregation c{i} then rank refresh r{i}, damping 0.85 over
    CAST-to-DOUBLE arithmetic so DuckDB doesn't promote to DECIMAL."""
    parts = []
    for i in range(1, n + 1):
        parts.append(f""",
            c{i} AS (
                SELECT e.oid AS node, sum(r.rank / deg.d) AS s
                FROM e JOIN r{i - 1} r ON r.node = e.sid
                       JOIN deg ON deg.sid = e.sid
                GROUP BY 1
            ),
            r{i} AS (
                SELECT n.node,
                       CAST(0.15 AS DOUBLE)
                       + CAST(0.85 AS DOUBLE) * coalesce(c{i}.s, 0) AS rank
                FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node
            )""")
    return "".join(parts)


def build(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Materialize mirror inputs and return the kg_* oracle dict."""
    from openie_backend_spark.operators.query import normalize_query_text

    p = mirror.ensure(sf_dir)
    dims = p["synth_dir"]
    ext_docs, ext_synth = p["ext_docs"], p["ext_synth"]

    node1 = "'n:' || substr(sha256(arg1_norm), 1, 16)"
    node2 = "'n:' || substr(sha256(arg2_norm), 1, 16)"
    rel_q = normalize_query_text("acquired")
    rel_q2 = normalize_query_text("invented")
    arg1_q = normalize_query_text("Acme Corp")

    # F4 per-instance extreme-precision filter (mirror of
    # filters.extreme_precision_filter; see its docstring for the
    # definite-noun-scan note)
    rel_black = (
        "('said','say','says','saying','have','has','had','having',"
        "'is','are','was','were','be','been','being','am')"
    )
    arg_black = (
        "('both','all','some','other','this','that','those','sunday',"
        "'monday','tuesday','wednesday','thursday','friday','saturday',"
        "'yesterday','tomorrow','today')"
    )
    definite = (
        "len(list_filter(range(1, len({p})), "
        "i -> {p}[i] = 'DT' AND {p}[i+1] IN ('NN','NNP'))) > 0"
    )
    any_lower_in = "len(list_filter({a}, t -> lower(t) IN {s})) > 0"
    extreme_sql = f"""
            WITH {_groups_ctes(ext_synth, with_heads=True)},
            sl AS (
                SELECT arg1_norm, rel_norm, arg2_norm, confidence,
                       tokens[arg1_start+1 : arg1_end] AS a1t,
                       tokens[arg2_start+1 : arg2_end] AS a2t,
                       tokens[rel_start+1 : rel_end] AS rlt,
                       pos_tags[arg1_start+1 : arg1_end] AS a1p,
                       pos_tags[arg2_start+1 : arg2_end] AS a2p
                FROM ded
            ),
            keep AS (
                SELECT arg1_norm, rel_norm, arg2_norm FROM sl
                WHERE confidence > 0.9
                  AND NOT (len(rlt) = 1 AND lower(rlt[1]) IN {rel_black})
                  AND NOT {any_lower_in.format(a='a1t', s=arg_black)}
                  AND NOT {any_lower_in.format(a='a2t', s=arg_black)}
                  AND NOT {any_lower_in.format(a='a1t', s=_PRON)}
                  AND NOT {any_lower_in.format(a='a2t', s=_PRON)}
                  AND NOT {any_lower_in.format(a='rlt', s=_PRON)}
                  AND NOT {definite.format(p='a1p')}
                  AND NOT {definite.format(p='a2p')}
            )
            SELECT arg1_norm, rel_norm, arg2_norm, count(*) AS size
            FROM keep GROUP BY 1, 2, 3 HAVING count(*) >= 2
    """

    return {
        "kg_extreme_filter": extreme_sql,
        "kg_extractions": f"""
            SELECT url, sent_id, arg1_text, rel_text, arg2_text,
                   arg1_norm, rel_norm, arg2_norm, confidence
            FROM read_parquet('{ext_docs}')
        """,
        "kg_groups": f"""
            WITH {_groups_ctes(ext_docs, with_heads=False)}
            SELECT arg1_norm, rel_norm, arg2_norm, size FROM grp
        """,
        "kg_spo": f"""
            WITH {_groups_ctes(ext_docs, with_heads=False)}
            SELECT {node1} AS subject_id, arg1_norm AS subject,
                   rel_norm AS predicate,
                   {node2} AS object_id, arg2_norm AS object,
                   size AS group_size
            FROM grp
        """,
        "kg_linked": f"""
            {_linked_sql(ext_synth, dims)}
            SELECT arg1_norm, rel_norm, arg2_norm, size,
                   arg1_fbid, arg2_fbid,
                   coalesce(array_to_string(arg1_types, ','), '') AS arg1_types_csv
            FROM linked
        """,
        "kg_entity_aliases": f"""
            {_linked_sql(ext_synth, dims)},
            sides AS (
                SELECT arg1_fbid AS fbid, arg1_norm AS surface, size
                FROM linked WHERE arg1_fbid IS NOT NULL
                UNION ALL
                SELECT arg2_fbid, arg2_norm, size
                FROM linked WHERE arg2_fbid IS NOT NULL
            ),
            aliagg AS (
                SELECT fbid, surface, CAST(sum(size) AS BIGINT) AS support,
                       count(*) AS n_groups
                FROM sides GROUP BY 1, 2
            )
            SELECT fbid, surface, support, n_groups, rank FROM (
                SELECT *, CAST(row_number() OVER (PARTITION BY fbid
                    ORDER BY support DESC, surface ASC) AS INT) AS rank
                FROM aliagg
            ) WHERE rank <= 5
        """,
        "kg_rel_signature": f"""
            {_linked_sql(ext_synth, dims)},
            capped AS (
                SELECT rel_norm, size,
                       list_sort(arg1_types)[1:8] AS t1s,
                       list_sort(arg2_types)[1:8] AS t2s
                FROM linked
            ),
            typairs AS (
                SELECT rel_norm, size, t1.x AS arg1_type, t2.y AS arg2_type
                FROM capped, unnest(t1s) AS t1(x), unnest(t2s) AS t2(y)
            ),
            sigagg AS (
                SELECT rel_norm, arg1_type, arg2_type,
                       CAST(sum(size) AS BIGINT) AS support,
                       count(*) AS n_groups
                FROM typairs GROUP BY 1, 2, 3
            )
            SELECT rel_norm, arg1_type, arg2_type, support, n_groups, rank
            FROM (
                SELECT *, CAST(row_number() OVER (PARTITION BY rel_norm
                    ORDER BY support DESC, arg1_type ASC, arg2_type ASC)
                    AS INT) AS rank
                FROM sigagg
            ) WHERE rank <= 3
        """,
        "kg_typed": f"""
            {_typed_sql(ext_synth, dims)}
            SELECT l.arg1_norm, l.rel_norm, l.arg2_norm,
                   coalesce(array_to_string(
                       CASE WHEN len(l.types1) = 0 AND p.ptypes IS NOT NULL
                            THEN p.ptypes ELSE l.types1 END, ','), '') AS arg1_types_csv
            FROM lk2 l LEFT JOIN pred p ON p.arg_norm = l.arg1_norm
        """,
        "kg_notable_rels": f"""
            {_typed_sql(ext_synth, dims)},
            nr AS (
                SELECT arg_norm, list(rel_norm ORDER BY rn) AS rels FROM (
                    SELECT a.arg_norm, r.rel_norm,
                           row_number() OVER (PARTITION BY a.arg_norm
                               ORDER BY r.weight DESC, r.rel_norm ASC) AS rn
                    FROM args a JOIN relinfo r USING (rel_norm)
                ) WHERE rn <= 4 GROUP BY 1
            ),
            tf AS (
                SELECT arg_norm, list(fbid ORDER BY rk) AS fbids
                FROM (SELECT * FROM top15 WHERE rk <= 5) GROUP BY 1
            )
            SELECT p.arg_norm,
                   coalesce(array_to_string(n.rels, ','), '') AS notable_rels_csv,
                   coalesce(array_to_string(t.fbids, ','), '') AS top_fbids_csv
            FROM pred p
            LEFT JOIN nr n USING (arg_norm)
            LEFT JOIN tf t USING (arg_norm)
        """,
        "kg_regroup_entity": f"""
            {_linked_sql(ext_synth, dims)},
            keyed AS (
                SELECT *, coalesce(arg1_fbid, arg1_norm) AS k1,
                          coalesce(arg2_fbid, arg2_norm) AS k2
                FROM linked
            ),
            agg AS (
                SELECT k1, rel_norm, k2, CAST(sum(size) AS BIGINT) AS size,
                       count(*) AS merged_groups
                FROM keyed GROUP BY 1, 2, 3
            ),
            rep AS (
                SELECT * FROM (
                    SELECT k1, rel_norm, k2, arg1_norm, arg2_norm,
                           row_number() OVER (PARTITION BY k1, rel_norm, k2
                               ORDER BY (arg1_fbid IS NOT NULL) DESC, size DESC,
                                        arg1_norm DESC, arg2_norm DESC) AS rr
                    FROM keyed
                ) WHERE rr = 1
            )
            SELECT r.arg1_norm, r.rel_norm, r.arg2_norm, a.size, a.merged_groups
            FROM rep r JOIN agg a
              ON a.k1 = r.k1 AND a.rel_norm = r.rel_norm AND a.k2 = r.k2
        """,
        "kg_inlink_ratio": f"""
            {_linked_sql(ext_synth, dims)},
            cnt AS (
                SELECT arg1_fbid AS fbid, count(*) AS group_count
                FROM linked WHERE arg1_fbid IS NOT NULL GROUP BY 1
            )
            SELECT c.fbid, c.group_count, i.inlinks,
                   round(c.group_count / greatest(i.inlinks, 1), 6) AS ratio
            FROM cnt c
            LEFT JOIN read_parquet('{dims}/dim_fbid_title_inlinks.parquet') i
              USING (fbid)
        """,
        "kg_serving_query": f"""
            {_linked_sql(ext_synth, dims)}
            SELECT arg1_norm, rel_norm, arg2_norm, size FROM linked
            WHERE rel_norm = '{rel_q}'
        """,
        "kg_serving_query_or": f"""
            {_linked_sql(ext_synth, dims)}
            SELECT arg1_norm, rel_norm, arg2_norm, size FROM linked
            WHERE rel_norm = '{rel_q}' OR arg1_norm = '{arg1_q}'
        """,
        "kg_serving_query_multi": f"""
            {_linked_sql(ext_synth, dims)}
            SELECT arg1_norm, rel_norm, arg2_norm, size FROM linked
            WHERE rel_norm IN ('{rel_q}', '{rel_q2}')
        """,
        "kg_regroup_merge": f"""
            WITH {_groups_ctes(ext_synth, with_heads=False)}
            SELECT arg1_norm, rel_norm, arg2_norm,
                   count(*) AS size, count(*) AS inst_cnt,
                   min(url) AS min_url
            FROM ded GROUP BY 1, 2, 3
        """,
        "kg_freq_filter": f"""
            WITH {_groups_ctes(ext_synth, with_heads=False)}
            SELECT arg1_norm, rel_norm, arg2_norm, size FROM grp
            WHERE size >= 2 AND size BETWEEN 2 AND 4
        """,
        "kg_fracture": f"""
            WITH {_groups_ctes(ext_synth, with_heads=False)}
            SELECT rel_norm, count(*) AS size, min(url) AS min_url
            FROM ded GROUP BY 1
        """,
        "kg_frontend_regroup": f"""
            {_linked_sql(ext_synth, dims)},
            fr AS (
                SELECT t.arg1_frontend, t.rel_frontend, t.arg2_frontend,
                       l.size, l.arg1_fbid, l.arg2_fbid
                FROM linked l
                JOIN top t USING (arg1_norm, rel_norm, arg2_norm)
            ),
            fl AS (
                SELECT *,
                       (arg1_fbid IS NOT NULL OR arg2_fbid IS NOT NULL) AS lk,
                       sum(CASE WHEN arg1_fbid IS NOT NULL
                                  OR arg2_fbid IS NOT NULL
                                THEN 1 ELSE 0 END) OVER (
                           PARTITION BY arg1_frontend, rel_frontend,
                                        arg2_frontend) AS nl
                FROM fr
            )
            SELECT arg1_frontend, rel_frontend, arg2_frontend,
                   CAST(sum(size) AS BIGINT) AS size,
                   count(*) AS merged_groups,
                   max(CASE WHEN lk THEN arg1_fbid END) AS arg1_fbid
            FROM fl WHERE nl <= 1 OR NOT lk
            GROUP BY 1, 2, 3
            UNION ALL
            SELECT arg1_frontend, rel_frontend, arg2_frontend,
                   size, CAST(1 AS BIGINT) AS merged_groups, arg1_fbid
            FROM fl WHERE nl > 1 AND lk
        """,
        "kg_serving_budget": f"""
            {_linked_sql(ext_synth, dims)},
            ordered AS (
                SELECT arg1_norm, rel_norm, arg2_norm, size,
                       coalesce(sum(size) OVER (
                           ORDER BY size DESC, arg1_norm, rel_norm, arg2_norm
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS consumed
                FROM linked
            )
            SELECT arg1_norm, rel_norm, arg2_norm, size
            FROM ordered WHERE consumed < 60 - (60 / 20)
        """,
        "kg_answer_projections": f"""
            {_linked_sql(ext_synth, dims)}
            SELECT m.mask, count(*) AS cnt, CAST(sum(g.size) AS BIGINT) AS total_size
            FROM linked g,
                 (SELECT unnest(['X__','_X_','__X','XX_','X_X','_XX']) AS mask) m
            GROUP BY 1
        """,
        "kg_edges": f"""
            {_linked_sql(ext_synth, dims)},
            spo AS (
                SELECT coalesce(arg1_fbid, {node1}) AS sid,
                       coalesce(arg2_fbid, {node2}) AS oid
                FROM linked
            )
            SELECT sid AS subject_id,
                   coalesce(array_to_string(list_sort(list(DISTINCT oid)), ','), '') AS dst_csv,
                   count(*) AS out_degree
            FROM spo GROUP BY 1
        """,
        "kg_two_hop": f"""
            {_linked_sql(ext_synth, dims)},
            spo AS (
                SELECT coalesce(arg1_fbid, {node1}) AS sid,
                       coalesce(arg2_fbid, {node2}) AS oid
                FROM linked
            ),
            e AS (SELECT DISTINCT sid, oid FROM spo),
            -- hub-degree cap mirror of materialize.two_hop(max_fanout=1000):
            -- deterministic windowed top-k per mid on BOTH join inputs
            h1 AS (
                SELECT src, mid FROM (
                    SELECT sid AS src, oid AS mid,
                           row_number() OVER (PARTITION BY oid ORDER BY sid) AS rn
                    FROM e) WHERE rn <= 1000
            ),
            h2 AS (
                SELECT mid, hop2 FROM (
                    SELECT sid AS mid, oid AS hop2,
                           row_number() OVER (PARTITION BY sid ORDER BY oid) AS rn
                    FROM e) WHERE rn <= 1000
            ),
            h AS (
                SELECT DISTINCT h1.src, h2.hop2
                FROM h1 JOIN h2 USING (mid)
            )
            SELECT src AS subject_id, CAST(count(*) AS BIGINT) AS n_hop2,
                   min(hop2) AS min_hop2, max(hop2) AS max_hop2
            FROM h GROUP BY 1
        """,
        "kg_degree_stats": f"""
            {_linked_sql(ext_synth, dims)},
            spo AS (
                SELECT coalesce(arg1_fbid, {node1}) AS sid,
                       coalesce(arg2_fbid, {node2}) AS oid
                FROM linked
            ),
            -- out side counts triple rows (materialize.edge_table's
            -- out_degree); in side counts distinct-adjacency entries
            e AS (SELECT DISTINCT sid, oid FROM spo),
            outd AS (SELECT sid, count(*) AS degree FROM spo GROUP BY 1),
            ind  AS (SELECT oid, count(*) AS degree FROM e GROUP BY 1)
            SELECT 'out' AS side, degree, CAST(count(*) AS BIGINT) AS n_nodes
            FROM outd GROUP BY 2
            UNION ALL
            SELECT 'in' AS side, degree, CAST(count(*) AS BIGINT) AS n_nodes
            FROM ind GROUP BY 2
        """,
        "kg_pagerank": f"""
            {_linked_sql(ext_synth, dims)},
            spo AS (
                SELECT coalesce(arg1_fbid, {node1}) AS sid,
                       coalesce(arg2_fbid, {node2}) AS oid
                FROM linked
            ),
            e AS (SELECT DISTINCT sid, oid FROM spo),
            deg AS (SELECT sid, count(*) AS d FROM e GROUP BY 1),
            nodes AS (SELECT sid AS node FROM e UNION SELECT oid FROM e),
            r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)
            {_pagerank_iteration_ctes(3)}
            SELECT node AS node_id, round(rank, 6) AS pagerank FROM r3
        """,
        # Weakly connected components of the KG: same transitive-closure
        # ground truth as the dedup_clusters oracle, over the spo edge
        # set (the WITH needs RECURSIVE prepended for the reach CTE)
        "kg_components": f"""
            {_linked_sql(ext_synth, dims).replace("WITH ", "WITH RECURSIVE ", 1)},
            spo AS (
                SELECT coalesce(arg1_fbid, {node1}) AS sid,
                       coalesce(arg2_fbid, {node2}) AS oid
                FROM linked
            ),
            sym AS (
                SELECT sid AS a, oid AS b FROM spo WHERE sid <> oid
                UNION SELECT oid, sid FROM spo WHERE sid <> oid
            ),
            reach AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            )
            SELECT a AS node_id, least(a, min(b)) AS component_id
            FROM reach GROUP BY a
        """,
        # DIRT-style relation synonyms (kg_analytics.relation_synonyms):
        # same 64-per-pair windowed cap mirrored
        "kg_rel_synonyms": f"""
            WITH {_groups_ctes(ext_synth, with_heads=False)},
            capped AS (
                SELECT arg1_norm, arg2_norm, rel_norm FROM (
                    SELECT arg1_norm, arg2_norm, rel_norm,
                           row_number() OVER (
                               PARTITION BY arg1_norm, arg2_norm
                               ORDER BY rel_norm) AS rn
                    FROM grp
                ) WHERE rn <= 64
            )
            SELECT a.rel_norm AS rel_a, b.rel_norm AS rel_b,
                   count(*) AS n_shared_pairs
            FROM capped a
            JOIN capped b ON a.arg1_norm = b.arg1_norm
                         AND a.arg2_norm = b.arg2_norm
                         AND a.rel_norm < b.rel_norm
            GROUP BY 1, 2 HAVING count(*) >= 1
        """,
        "kg_rel_inverses": f"""
            WITH {_groups_ctes(ext_synth, with_heads=False)},
            capped AS (
                SELECT arg1_norm, arg2_norm, rel_norm FROM (
                    SELECT arg1_norm, arg2_norm, rel_norm,
                           row_number() OVER (
                               PARTITION BY arg1_norm, arg2_norm
                               ORDER BY rel_norm) AS rn
                    FROM grp WHERE arg1_norm <> arg2_norm
                ) WHERE rn <= 64
            )
            SELECT a.rel_norm AS rel_a, b.rel_norm AS rel_b,
                   count(*) AS n_shared_pairs
            FROM capped a
            JOIN capped b ON a.arg1_norm = b.arg2_norm
                         AND a.arg2_norm = b.arg1_norm
                         AND (a.rel_norm < b.rel_norm
                              OR (a.rel_norm = b.rel_norm
                                  AND a.arg1_norm < a.arg2_norm))
            GROUP BY 1, 2 HAVING count(*) >= 1
        """,
        # Snapshot diff (kg_analytics.snapshot_diff): old = url-hash
        # subset, new = full corpus, full-outer on the group key
        "kg_snapshot_diff": f"""
            WITH {_groups_ctes(ext_synth, with_heads=False)},
            old_g AS (
                SELECT arg1_norm, rel_norm, arg2_norm,
                       count(*) AS old_size
                FROM ded WHERE substr(md5(url), 1, 1) < '8'
                GROUP BY 1, 2, 3
            ),
            d AS (
                SELECT arg1_norm, rel_norm, arg2_norm,
                       o.old_size, g.size AS new_size,
                       CASE WHEN o.old_size IS NULL THEN 'added'
                            WHEN g.size IS NULL THEN 'removed'
                            WHEN g.size > o.old_size THEN 'grown'
                            WHEN g.size < o.old_size THEN 'shrunk'
                       END AS status
                FROM old_g o
                FULL OUTER JOIN grp g USING (arg1_norm, rel_norm, arg2_norm)
            )
            SELECT * FROM d WHERE status IS NOT NULL
        """,
        # Compact-forward triangle counting mirror (materialize.
        # triangle_counts): degree-ordered orientation, wedge close
        "kg_triangles": f"""
            {_linked_sql(ext_synth, dims)},
            spo AS (
                SELECT coalesce(arg1_fbid, {node1}) AS sid,
                       coalesce(arg2_fbid, {node2}) AS oid
                FROM linked
            ),
            und AS (
                SELECT DISTINCT least(sid, oid) AS u, greatest(sid, oid) AS v
                FROM spo WHERE sid <> oid
            ),
            deg AS (
                SELECT n, count(*) AS d FROM (
                    SELECT u AS n FROM und UNION ALL SELECT v FROM und
                ) GROUP BY 1
            ),
            oriented AS (
                SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v)
                            THEN e.u ELSE e.v END AS src,
                       CASE WHEN (du.d, e.u) < (dv.d, e.v)
                            THEN e.v ELSE e.u END AS dst
                FROM und e
                JOIN deg du ON du.n = e.u
                JOIN deg dv ON dv.n = e.v
            ),
            wedges AS (
                SELECT x.src, x.dst AS p, y.dst AS q
                FROM oriented x JOIN oriented y ON x.src = y.src
                WHERE x.dst < y.dst
            ),
            tris AS (
                SELECT w.src, w.p, w.q
                FROM wedges w JOIN und ON und.u = w.p AND und.v = w.q
            )
            SELECT node_id, count(*) AS n_triangles FROM (
                SELECT src AS node_id FROM tris
                UNION ALL SELECT p FROM tris
                UNION ALL SELECT q FROM tris
            ) GROUP BY 1
        """,
        "s4_point_lookup": f"""
            {_linked_sql(ext_synth, dims)},
            spo AS (
                SELECT coalesce(arg1_fbid, {node1}) AS sid, arg1_norm,
                       rel_norm, arg2_norm, size,
                       coalesce(arg2_fbid, {node2}) AS oid
                FROM linked
            )
            SELECT 'subject' AS side, arg1_norm AS subject,
                   rel_norm AS predicate, arg2_norm AS object,
                   CAST(size AS BIGINT) AS group_size
            FROM spo WHERE sid = (SELECT min(sid) FROM spo
                                  WHERE arg1_norm = 'acme corp')
            UNION ALL
            SELECT 'object', arg1_norm, rel_norm, arg2_norm,
                   CAST(size AS BIGINT)
            FROM spo WHERE oid = (SELECT min(oid) FROM spo
                                  WHERE arg2_norm = 'acme corp')
        """,
        "kg_instance_dedup": f"""
            SELECT url, arg1_norm, rel_norm, arg2_norm, confidence
            FROM read_parquet('{p["inst_dedup"]}')
        """,
        "kg_nary": f"""
            SELECT url, sent_id, kind, arg1_norm, rel_norm, arg2_norm,
                   coalesce(array_to_string(arg2_texts, ' | '), '') AS arg2s
            FROM read_parquet('{p["nary_synth"]}')
        """,
        # M4 stream splitter: verb-mediated ('T' n-ary + 'R' relclause
        # + 'C' clausal complement) vs noun-mediated ('N') routing
        # re-derived as a CASE over the same mirror rows the Spark side
        # re-extracts distributed.
        "m4_split_streams": f"""
            SELECT CASE WHEN kind IN ('T','R','C') THEN 'verb' ELSE 'noun' END AS stream,
                   count(*) AS cnt, count(DISTINCT rel_norm) AS n_rels
            FROM read_parquet('{p["nary_synth"]}') GROUP BY 1
        """,
        "mm_features": f"""
            SELECT media_id, payload_bytes, round(feat_sum_raw, 4) AS feat_sum
            FROM read_parquet('{p["mm_features"]}')
        """,
    }
