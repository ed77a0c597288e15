"""DuckDB oracle SQL for every SQL-expressible query in queries.py.

Column names, rounding, and id types mirror the Ray implementations
exactly. The shared CTE prelude defines the g1 fixture graph. Iterative
algorithms use WITH RECURSIVE (cc/bfs) or programmatically-unrolled
iterations (pagerank, lpa) so DuckDB stays a pure ANSI-ish oracle.
"""

from __future__ import annotations

MOD = 211

_E = f"""e AS (
  SELECT l_partkey % {MOD} AS src, l_suppkey % {MOD} AS dst,
         round(sum(l_quantity), 6) AS w, count(*) AS n
  FROM lineitem GROUP BY 1, 2
)"""

_N = """n AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e)"""
_EBIN = """ebin AS (SELECT DISTINCT src, dst FROM e)"""
_UE = """ue AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e)"""
_UE_NOSELF = """ue AS (
  SELECT src, dst FROM e WHERE src <> dst
  UNION SELECT dst, src FROM e WHERE src <> dst)"""
_SUPP = f"""sv AS (
  SELECT s_suppkey % {MOD} AS v, round(sum(s_acctbal), 6) AS val
  FROM supplier GROUP BY 1)"""
_CUST = f"""cv AS (
  SELECT c_custkey % {MOD} AS v, round(sum(c_acctbal), 6) AS val
  FROM customer GROUP BY 1)"""


def _pagerank_sql(k: int = 8, damping: float = 0.85) -> str:
    parts = [
        _E,
        _EBIN,
        _N,
        "dout AS (SELECT src, count(*) AS c FROM ebin GROUP BY 1)",
        "nn AS (SELECT count(*) AS c FROM n)",
        "r0 AS (SELECT v, 1.0 / (SELECT c FROM nn) AS score FROM n)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.v,
         ({1 - damping} / (SELECT c FROM nn))
         + {damping} * COALESCE(s.x, 0) AS score
  FROM n LEFT JOIN (
    SELECT eb.dst AS v, sum(r{i-1}.score / d.c) AS x
    FROM ebin eb
    JOIN r{i-1} ON r{i-1}.v = eb.src
    JOIN dout d ON d.src = eb.src
    GROUP BY eb.dst
  ) s ON s.v = n.v
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT v, round(score, 6) AS score FROM r{k} ORDER BY v"
    )


def _lpa_sql(k: int = 3) -> str:
    parts = [_E, _UE_NOSELF, _N, "l0 AS (SELECT v, v AS label FROM n)"]
    for i in range(1, k + 1):
        parts.append(
            f"""l{i} AS (
  SELECT n.v, COALESCE(w.label, l{i-1}.label) AS label
  FROM n
  JOIN l{i-1} ON l{i-1}.v = n.v
  LEFT JOIN (
    SELECT dst AS v, label FROM (
      SELECT ue.dst, lp.label, count(*) AS cnt,
             row_number() OVER (PARTITION BY ue.dst
                                ORDER BY count(*) DESC, lp.label ASC) AS rn
      FROM ue JOIN l{i-1} lp ON lp.v = ue.src
      GROUP BY ue.dst, lp.label
    ) WHERE rn = 1
  ) w ON w.v = n.v
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT v, label FROM l{k} ORDER BY v"


def _sliding_sql(window_s=3600, slide_s=900) -> str:
    n_covers = window_s // slide_s
    unions = []
    for j in range(n_covers):
        unions.append(
            f"""SELECT event_type,
       CAST((floor(epoch(ts) / {slide_s}) - {j}) * {slide_s} AS BIGINT) AS "window",
       value
FROM events
WHERE epoch(ts) >= (floor(epoch(ts) / {slide_s}) - {j}) * {slide_s}
  AND epoch(ts) <  (floor(epoch(ts) / {slide_s}) - {j}) * {slide_s} + {window_s}"""
        )
    body = "\nUNION ALL\n".join(unions)
    return f"""WITH assigned AS (
{body}
)
SELECT event_type, "window", round(sum(value), 6) AS sum_value, count(*) AS n
FROM assigned GROUP BY 1, 2 ORDER BY event_type, "window\""""


ORACLES: dict[str, str] = {
    "coo_build_dup_plus": f"WITH {_E} SELECT src, dst, w, n FROM e ORDER BY src, dst",
    "degrees_out": f"""WITH {_E}
SELECT src AS v, count(*) AS deg, round(sum(w), 6) AS wsum
FROM e GROUP BY 1 ORDER BY v""",
    "mxv_plus_times": f"""WITH {_E}, {_SUPP}
SELECT e.src AS v, round(sum(e.w * sv.val), 6) AS val
FROM e JOIN sv ON sv.v = e.dst GROUP BY 1 ORDER BY v""",
    "vxm_min_plus": f"""WITH {_E}, {_SUPP}
SELECT e.dst AS v, round(min(e.w + sv.val), 6) AS val
FROM e JOIN sv ON sv.v = e.src GROUP BY 1 ORDER BY v""",
    "apply_rowindex": f"""WITH {_E},
p AS (SELECT src, dst, CAST(src + 1 AS DOUBLE) AS w FROM e),
r AS (
  SELECT dst, w,
         row_number() OVER (PARTITION BY dst ORDER BY w ASC, src ASC) AS rn,
         src
  FROM p)
SELECT dst AS v, count(*) AS count, min(w) AS min,
       max(CASE WHEN rn = 1 THEN src END) AS argmin
FROM r GROUP BY 1 ORDER BY v""",
    "rowwise_agg": f"""WITH {_E},
r AS (
  SELECT src, dst, w,
         row_number() OVER (PARTITION BY src ORDER BY w ASC, dst ASC) AS rn,
         row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS rx
  FROM e)
SELECT src AS v, count(*) AS count, round(sum(w) / count(*), 6) AS mean,
       max(CASE WHEN rn = 1 THEN dst END) AS argmin,
       max(CASE WHEN rx = 1 THEN dst END) AS argmax
FROM r GROUP BY 1 ORDER BY v""",
    "mxv_masked": f"""WITH {_E}, {_SUPP}, {_CUST}
SELECT s.v, round(s.val, 6) AS val FROM (
  SELECT e.src AS v, sum(e.w * sv.val) AS val
  FROM e JOIN sv ON sv.v = e.dst GROUP BY 1
) s JOIN (SELECT DISTINCT v FROM cv WHERE v <= 140) m ON m.v = s.v
ORDER BY s.v""",
    "ewise_add_plus": f"""WITH {_CUST}, {_SUPP}
SELECT COALESCE(cv.v, sv.v) AS v,
       round(COALESCE(cv.val, 0) + COALESCE(sv.val, 0), 6) AS val
FROM cv FULL OUTER JOIN sv ON cv.v = sv.v ORDER BY v""",
    "ewise_mult_times": f"""WITH {_CUST}, {_SUPP}
SELECT cv.v AS v, round(cv.val * sv.val, 6) AS val
FROM cv JOIN sv ON cv.v = sv.v ORDER BY v""",
    "ewise_union_minus": f"""WITH {_CUST}, {_SUPP}
SELECT COALESCE(cv.v, sv.v) AS v,
       round(COALESCE(cv.val, 0) - COALESCE(sv.val, 0), 6) AS val
FROM cv FULL OUTER JOIN sv ON cv.v = sv.v ORDER BY v""",
    "apply_abs_minus": f"""WITH {_SUPP}
SELECT v, round(abs(val - 100.0), 6) AS val FROM sv ORDER BY v""",
    "select_triu_w": f"""WITH {_E}
SELECT src, dst, w FROM e WHERE dst >= src AND w >= 25.0 ORDER BY src, dst""",
    "reduce_rowwise_max": f"""WITH {_E}
SELECT src AS v, round(max(w), 6) AS val FROM e GROUP BY 1 ORDER BY v""",
    "reduce_scalar_plus": f"WITH {_E} SELECT round(sum(w), 4) AS total FROM e",
    "outer_product": f"""WITH {_CUST}, {_SUPP}
SELECT cv.v AS src, sv.v AS dst, round(cv.val * sv.val, 4) AS w
FROM cv CROSS JOIN sv ORDER BY src, dst""",
    "reduce_colwise_plus": f"""WITH {_E}
SELECT dst AS v, round(sum(w), 4) AS val FROM e GROUP BY 1 ORDER BY v""",
    "extract_remap": f"""WITH {_SUPP},
idx(pos, tgt) AS (VALUES (0, 3), (1, 5), (2, 10), (3, 5), (4, 200))
SELECT idx.pos AS v, sv.val AS val
FROM idx JOIN sv ON sv.v = idx.tgt ORDER BY v""",
    "assign_reduce_min": f"""WITH {_SUPP},
u AS (SELECT o_custkey % {MOD} AS v, min(o_totalprice) AS val
      FROM orders GROUP BY 1)
SELECT COALESCE(sv.v, u.v) AS v,
       round(CASE WHEN sv.v IS NOT NULL AND u.v IS NOT NULL
                  THEN least(sv.val, u.val)
                  ELSE COALESCE(u.val, sv.val) END, 6) AS val
FROM sv FULL OUTER JOIN u ON sv.v = u.v ORDER BY v""",
    "transpose_edges": f"""WITH {_E}
SELECT dst AS src, src AS dst, w FROM e ORDER BY src, dst""",
    "triangle_count": f"""WITH {_E},
ud AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
       FROM e WHERE src <> dst)
SELECT count(*) AS triangles
FROM ud a JOIN ud b ON b.s = a.s AND b.d > a.d
          JOIN ud c ON c.s = a.d AND c.d = b.d""",
    "cc_labels": f"""WITH RECURSIVE {_E}, {_UE}, {_N},
reach(v, r) AS (
  SELECT v, v FROM n
  UNION
  SELECT ue.dst, reach.r FROM reach JOIN ue ON ue.src = reach.v
)
SELECT v, min(r) AS label FROM reach GROUP BY v ORDER BY v""",
    "pagerank_k8": _pagerank_sql(8),
    "bfs_from_1": f"""WITH RECURSIVE {_E}, {_EBIN},
reach(v, d) AS (
  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT eb.dst, reach.d + 1
  FROM reach JOIN ebin eb ON eb.src = reach.v
  WHERE reach.d < 64
)
SELECT v, min(d) AS dist FROM reach GROUP BY v ORDER BY v""",
    "lpa_k3": _lpa_sql(3),
    "doc_exact_dedup": """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents GROUP BY 1 ORDER BY content_hash""",
    "doc_token_counts": """SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws_tokens
FROM documents ORDER BY doc_id""",
    "doc_vocab_topk": """SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS token
      FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 100""",
    "emb_centroids": """SELECT CAST(label AS BIGINT) AS label,
       CAST(dim AS BIGINT) AS dim, round(avg(e), 6) AS centroid
FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding) AS e
      FROM embeddings)
GROUP BY label, dim ORDER BY label, dim""",
    "doc_pack_sequences": """WITH n AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM n
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
FROM c ORDER BY doc_id""",
    "doc_tfidf_topk": """WITH tf AS (
  SELECT doc_id, token, count(*) AS tf FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS token
    FROM documents) WHERE token <> '' GROUP BY 1, 2
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), ranked AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents)
                          / df.df), 6) AS tfidf,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rn
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tfidf FROM ranked WHERE rn <= 3
ORDER BY doc_id, token""",
    "knn_topk": """WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT 5
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.embedding, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM s
) WHERE rank <= 10 ORDER BY query_id, rank""",
    "emb_near_dups": """SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
ORDER BY a, b""",
    "events_tumbling": """SELECT event_type,
       CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS "window",
       round(sum(value), 6) AS sum_value, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY event_type, "window\"""",
    "events_sliding": _sliding_sql(),
    "events_asof_prev": """SELECT l.event_id, l.user_id,
       CAST(floor(epoch(l.ts)) AS BIGINT) AS epoch_s,
       round(l.value, 6) AS value, round(r.value, 6) AS prev
FROM events l ASOF LEFT JOIN (
  SELECT user_id, ts + INTERVAL 60 SECOND AS ts, value FROM events
) r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id""",
    "agg_argmax": """SELECT l_returnflag, l_orderkey FROM (
  SELECT l_returnflag, l_orderkey,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey ASC) AS rn
  FROM lineitem
) WHERE rn = 1 ORDER BY l_returnflag""",
    "agg_stats": """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(min(l_quantity), 4) AS min_qty,
       round(max(l_quantity), 4) AS max_qty,
       count(*) AS n
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "topk_per_group": """SELECT o_orderpriority, rank, o_orderkey FROM (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3 ORDER BY o_orderpriority, rank""",
}

ORACLES.update(
    {
        "mxm_plus_times": f"""WITH {_E}
SELECT a.src AS src, b.dst AS dst, round(sum(a.w * b.w), 4) AS w
FROM e a JOIN e b ON a.dst = b.src
GROUP BY 1, 2 ORDER BY src, dst""",
        "extract_submatrix": f"""WITH {_E},
ridx(p, v) AS (VALUES (0, 3), (1, 5), (2, 11), (3, 5)),
cidx(q, v) AS (VALUES (0, 2), (1, 7), (2, 52), (3, 97))
SELECT ridx.p AS src, cidx.q AS dst, e.w AS w
FROM e JOIN ridx ON e.src = ridx.v JOIN cidx ON e.dst = cidx.v
ORDER BY src, dst""",
        "assign_submatrix": f"""WITH {_E}
SELECT src, dst,
       round(CASE WHEN src IN (3, 5, 11) AND dst IN (2, 7, 52)
                  THEN w * 2 ELSE w END, 6) AS w
FROM e ORDER BY src, dst""",
        "mxm_masked": f"""WITH {_E},
l AS (SELECT src, dst, w FROM e WHERE dst < src)
SELECT a.src AS src, b.dst AS dst, round(sum(a.w * b.w), 4) AS w
FROM l a JOIN l b ON a.dst = b.src
JOIN l m ON m.src = a.src AND m.dst = b.dst
GROUP BY 1, 2 ORDER BY src, dst""",
        "inner_product": f"""WITH {_CUST}, {_SUPP}
SELECT round(sum(cv.val * sv.val), 4) AS ip
FROM cv JOIN sv ON cv.v = sv.v""",
        "selectk_rowwise": f"""WITH {_E}
SELECT src, dst, w FROM (
  SELECT src, dst, w,
         row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS rn
  FROM e
) WHERE rn <= 2 ORDER BY src, dst""",
        "sort_rowwise": f"""WITH {_E}
SELECT src,
       row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) - 1
         AS "rank",
       dst, w
FROM e ORDER BY src, "rank\"""",
    }
)


def _sssp_sql(k: int = 24, source: int = 1) -> str:
    """Unrolled Bellman-Ford: d_i[v] = min(d_{i-1}[v], min(d_{i-1}[src]+w)).

    Bit-identical to the frontier fixpoint (queries.q_sssp_weighted):
    both compute min over paths of the left-folded FP64 sum; k rounds
    suffice when every optimal path has <= k hops (measured 9 at sf0.01;
    24 leaves margin)."""
    parts = [_E, f"d0 AS (SELECT CAST({source} AS BIGINT) AS v, 0.0 AS dist)"]
    for i in range(1, k + 1):
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT v, min(dist) AS dist FROM (
    SELECT v, dist FROM d{i-1}
    UNION ALL
    SELECT e.dst AS v, d{i-1}.dist + e.w AS dist
    FROM d{i-1} JOIN e ON e.src = d{i-1}.v
  ) GROUP BY v
)"""
        )
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT v, round(dist, 6) AS dist FROM d{k} ORDER BY v")


ORACLES["sssp_weighted"] = _sssp_sql(24)


# exact SQL twins for the r1 rows-only queries (VERDICT r1 next #4)

_TOKEN_RE_SQL = "[A-Za-zÀ-ɏ]+|[0-9]+|[^\\sA-Za-z0-9À-ɏ]"
_PUNCT_RE_SQL = "[^\\sA-Za-z0-9À-ɏ_]"
_WORD_RE_SQL = "[A-Za-zÀ-ɏ]+"
_STOP_EN_SQL = "('the','and','of','to','a','in','is','that','it','for','was','with')"

ORACLES["doc_analysis"] = f"""SELECT doc_id,
       length(text) AS n_chars,
       length(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_tokens,
       CASE WHEN trim(text) = '' THEN 0
            ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws_tokens,
       length(regexp_extract_all(text, '{_PUNCT_RE_SQL}')) AS n_punct,
       (SELECT count(*) FROM unnest(regexp_extract_all(lower(text), '{_WORD_RE_SQL}')) AS u(w)
        WHERE w IN {_STOP_EN_SQL}) AS n_stopwords
FROM documents ORDER BY doc_id"""

# exact word-3-gram Jaccard >= threshold over all pairs — the full set the
# banding+exact-verify pipeline must reproduce (recall 1.0 by construction
# of the banding parameters on this corpus; precision 1.0 by exact verify)
ORACLES["minhash_pairs"] = """WITH toks AS MATERIALIZED (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l FROM documents
    WHERE trim(text) <> ''
  ), LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS ord) AS u
),
grams AS MATERIALIZED (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS g
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
              JOIN toks c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
),
cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = inter.a JOIN cnt cb ON cb.doc_id = inter.b
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
ORDER BY a, b"""

# md5-based sim64 recomputed in SQL, then the exact Hamming<=3 pair set
ORACLES["simhash_pairs"] = """WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
),
tc AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
th AS (SELECT doc_id, cnt, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM tc),
bits AS (SELECT unnest(range(64)) AS b),
sc AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS s
  FROM th CROSS JOIN bits GROUP BY 1, 2
),
sh AS (
  SELECT d.doc_id,
         coalesce((SELECT sum(CASE WHEN s > 0 THEN 1::UBIGINT << b ELSE 0 END)::UBIGINT
                   FROM sc WHERE sc.doc_id = d.doc_id), 0::UBIGINT) AS sim64
  FROM (SELECT DISTINCT doc_id FROM documents) d
)
SELECT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.sim64, y.sim64)) AS hamming
FROM sh x JOIN sh y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.sim64, y.sim64)) <= 3
ORDER BY a, b"""


ORACLES["ewise_add_int64"] = f"""WITH va AS (
  SELECT l_partkey % {MOD} AS v,
         max(l_orderkey * 1099511627776 + l_linenumber) AS val
  FROM lineitem GROUP BY 1
),
vb AS (
  SELECT l_suppkey % {MOD} AS v,
         min(l_orderkey * 1099511627776 + l_linenumber) AS val
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(va.v, vb.v) AS v,
       CASE WHEN va.val IS NOT NULL AND vb.val IS NOT NULL THEN va.val + vb.val
            ELSE COALESCE(va.val, vb.val) END AS val
FROM va FULL OUTER JOIN vb ON va.v = vb.v ORDER BY v"""

ORACLES["graph_overlay"] = f"""WITH {_E},
t AS (SELECT dst AS src, src AS dst, w FROM e)
SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.dst, b.dst) AS dst,
       round(CASE WHEN a.w IS NOT NULL AND b.w IS NOT NULL THEN a.w + b.w
                  ELSE COALESCE(a.w, b.w) END, 6) AS w
FROM e a FULL OUTER JOIN t b ON a.src = b.src AND a.dst = b.dst
ORDER BY src, dst"""


ORACLES["agg_norms"] = f"""WITH {_SUPP}
SELECT count(*) FILTER (val <> 0) AS l0,
       round(sum(abs(val)), 6) AS l1,
       round(sqrt(sum(val * val)), 6) AS l2,
       round(max(abs(val)), 6) AS linf
FROM sv"""

ORACLES["agg_var_argmin"] = f"""WITH {_CUST}
SELECT round(var_pop(val), 3) AS varp,
       round(stddev_samp(val), 3) AS stds,
       (SELECT v FROM cv ORDER BY val ASC, v ASC LIMIT 1) AS argmin,
       (SELECT v FROM cv ORDER BY val DESC, v ASC LIMIT 1) AS argmax,
       min(v) AS first_index,
       max(v) AS last_index
FROM cv"""

ORACLES["select_rowle"] = f"""WITH {_E}
SELECT src, dst, w FROM e WHERE src <= 100 AND dst > 50 ORDER BY src, dst"""

ORACLES["agg_tail"] = f"""WITH ov AS (
  SELECT o_custkey % {MOD} AS v, round(sum(o_totalprice), 6) AS val
  FROM orders GROUP BY 1),
m AS (SELECT count(*) AS n, max(val) AS mx, min(val) AS mn,
             sum(ln(val)) AS sl, sum(1.0 / val) AS si FROM ov),
l AS (SELECT sum(exp(val - (SELECT mx FROM m))) AS se,
             sum(pow(2.0, val - (SELECT mx FROM m))) AS se2 FROM ov)
SELECT round(exp((SELECT sl FROM m) / (SELECT n FROM m)), 4) AS geometric_mean,
       round((SELECT n FROM m) / (SELECT si FROM m), 4) AS harmonic_mean,
       round((SELECT mx FROM m) + ln((SELECT se FROM l)), 4) AS logaddexp,
       round((SELECT mx FROM m) + log2((SELECT se2 FROM l)), 4) AS logaddexp2,
       round((SELECT mx FROM m) - (SELECT mn FROM m), 4) AS peak_to_peak,
       round((SELECT si FROM m), 9) AS sum_of_inverses,
       CAST(1 AS BIGINT) AS "exists\""""

ORACLES["reduce_bxor_groups"] = f"""WITH {_E}
SELECT src AS v, bit_xor(n) AS val FROM e GROUP BY 1 ORDER BY v"""


ORACLES["diag_vector"] = f"""WITH {_E}
SELECT src AS v, round(w, 6) AS val FROM e WHERE src = dst ORDER BY v"""

ORACLES["reposition_edges"] = f"""WITH {_SUPP}
SELECT v + 1000 AS v, round(val, 6) AS val FROM sv ORDER BY v"""

ORACLES["kron_small"] = """WITH a AS (
  SELECT n_regionkey AS src, n_nationkey % 5 AS dst, max(n_nationkey + 1.0) AS w
  FROM nation GROUP BY 1, 2
),
b AS (
  SELECT r_regionkey AS src, (r_regionkey + 1) % 3 AS dst,
         r_regionkey + 2.0 AS w
  FROM region
)
SELECT a.src * 5 + b.src AS src, a.dst * 3 + b.dst AS dst,
       round(a.w * b.w, 6) AS w
FROM a CROSS JOIN b ORDER BY src, dst"""

ORACLES["power3"] = f"""WITH {_E},
c AS (SELECT src, dst, CAST(n AS DOUBLE) AS w FROM e)
SELECT a.src AS src, t.dst AS dst, CAST(sum(a.w * b.w * t.w) AS BIGINT) AS w
FROM c a JOIN c b ON a.dst = b.src JOIN c t ON b.dst = t.src
GROUP BY 1, 2 ORDER BY 1, 2"""

# knn_lsh: rebuild the md5-derived ±1 hyperplanes and the 2^20-quantized
# integer dot products bit-for-bit (similarity._md5_sign_planes/_quantize),
# reproduce the banded buckets, take the union-of-bands candidate set per
# query, then exact-cosine rank (same tie rule as knn_topk).
ORACLES["knn_lsh"] = """WITH planes AS (
  SELECT j, d,
         CASE WHEN ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                                       CAST(d AS VARCHAR)), 1, 16))::UBIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(32) t(j) CROSS JOIN range(64) r(d)
),
ev AS MATERIALIZED (
  SELECT vec_id, CAST(floor(x * 1048576.0) AS BIGINT) AS xq, ord - 1 AS d
  FROM (SELECT vec_id, embedding AS l FROM embeddings),
       LATERAL (SELECT unnest(l) AS x, generate_subscripts(l, 1) AS ord) AS u
),
signs AS (
  SELECT ev.vec_id, p.j, sum(ev.xq * p.s) > 0 AS pos
  FROM ev JOIN planes p ON p.d = ev.d GROUP BY 1, 2
),
buckets AS MATERIALIZED (
  SELECT vec_id, CAST(j // 2 AS INT) AS band,
         sum(CASE WHEN pos THEN (1::BIGINT << CAST(j % 2 AS INT)) ELSE 0 END) AS bucket
  FROM signs GROUP BY 1
  , 2
),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, v.vec_id
  FROM buckets qb JOIN qids ON qids.vec_id = qb.vec_id
  JOIN buckets v ON v.band = qb.band AND v.bucket = qb.bucket
),
s AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(qe.embedding, e.embedding) AS sim
  FROM cand c JOIN embeddings qe ON qe.vec_id = c.query_id
              JOIN embeddings e ON e.vec_id = c.vec_id
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM s
) WHERE rank <= 5 ORDER BY query_id, rank"""

# knn_ivf: rebuild the IVF coarse quantizer exactly — centroids are the 8
# corpus vectors with smallest md5(vec_id) digests, assignment/probe order
# is exact int64 dot (2^20-quantized components) DESC then cid ASC — then
# exact-cosine rank within the probed inverted lists (tie rule = knn_topk).
ORACLES["knn_ivf"] = """WITH ev AS MATERIALIZED (
  SELECT vec_id, CAST(floor(x * 1048576.0) AS BIGINT) AS xq, ord - 1 AS d
  FROM (SELECT vec_id, embedding AS l FROM embeddings),
       LATERAL (SELECT unnest(l) AS x, generate_subscripts(l, 1) AS ord) AS u
),
cent AS (
  SELECT vec_id AS cid FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
cv AS MATERIALIZED (
  SELECT c.cid, ev.d, ev.xq FROM cent c JOIN ev ON ev.vec_id = c.cid
),
dots AS MATERIALIZED (
  SELECT ev.vec_id, cv.cid, sum(ev.xq * cv.xq) AS dot
  FROM ev JOIN cv ON cv.d = ev.d GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, cid ASC) AS rn
    FROM dots
  ) WHERE rn = 1
),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
qprobe AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT d.vec_id, d.cid,
           row_number() OVER (PARTITION BY d.vec_id
                              ORDER BY dot DESC, cid ASC) AS rn
    FROM dots d JOIN qids USING (vec_id)
  ) WHERE rn <= 2
),
cand AS (
  SELECT DISTINCT qp.query_id, a.vec_id
  FROM qprobe qp JOIN assign a ON a.cid = qp.cid
),
s AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(qe.embedding, e.embedding) AS sim
  FROM cand c JOIN embeddings qe ON qe.vec_id = c.query_id
              JOIN embeddings e ON e.vec_id = c.vec_id
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM s
) WHERE rank <= 5 ORDER BY query_id, rank"""

# --- bit-exact SQL reproduction of the mix64-chained token-hash gram key
# (dedup._token_hashes + the splitmix64 finalizer, util.py:27). DuckDB's
# UBIGINT errors on overflow rather than wrapping, so 64-bit modular
# multiplication is spelled as a HUGEINT split-multiply:
#   (x*C) mod 2^64 = ((hi32(x)*C mod 2^32)*2^32 + lo32(x)*C) mod 2^64
_M64 = 1 << 64


def _mulmod_sql(x: str, c: int) -> str:
    return (f"CAST((((CAST(({x}) >> 32 AS HUGEINT) * {c}) % 4294967296) "
            f"* 4294967296 + CAST(({x}) & 4294967295 AS HUGEINT) * {c}) "
            f"% {_M64} AS UBIGINT)")


def _xorshift_sql(x: str, s: int) -> str:
    return f"xor(({x}), ({x}) >> {s})"


def _mix64_sql(x: str) -> str:
    """splitmix64 finalizer, textually inlined (util.mix64)."""
    e = _xorshift_sql(x, 30)
    e = _mulmod_sql(e, 0xBF58476D1CE4E9B9)
    e = _xorshift_sql(e, 27)
    e = _mulmod_sql(e, 0x94D049BB133111EB)
    return _xorshift_sql(e, 31)


# token hash: Horner over code points, h=((0+c1)*P+c2)*P... + len mod 2^64
_GRAM_P = 1099511628211
_TOKEN_HASH_SQL = (
    "CAST((CAST(list_reduce(list_prepend(CAST(0 AS UBIGINT), "
    "list_transform(range(1, length(t) + 1), i -> CAST(ord(t[i]) AS UBIGINT))), "
    f"(a, b) -> {_mulmod_sql(f'CAST((CAST(a AS HUGEINT) + b) % {_M64} AS UBIGINT)', _GRAM_P)}"
    f") AS HUGEINT) + length(t)) % {_M64} AS UBIGINT)"
)

# gram key: reduce([0, h_i..h_{i+n-1}], (a,b) -> mix64(a XOR b))
_GRAM_LAMBDA_SQL = f"(a, b) -> {_mix64_sql('xor(a, b)')}"

_NGRAM_N = 8
ORACLES["repeated_ngrams"] = f"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(coalesce(text, '')) <> ''
),
th AS (
  SELECT doc_id, list_transform(ts, t -> {_TOKEN_HASH_SQL}) AS hs
  FROM toks WHERE len(ts) >= {_NGRAM_N}
),
grams AS (
  SELECT doc_id,
         lpad(lower(to_hex(list_reduce(
           list_prepend(CAST(0 AS UBIGINT), hs[i:i + {_NGRAM_N - 1}]),
           {_GRAM_LAMBDA_SQL}))), 16, '0') AS gram
  FROM th, LATERAL (SELECT unnest(range(1, len(hs) - {_NGRAM_N} + 2)) AS i) u
)
SELECT gram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS min_doc
FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
ORDER BY gram"""

# doc_quality: the stopword-profile lang-ID argmax (dict-order strict->
# tie rule: en beats de beats fr; all-zero -> 'und') and the quality
# formula with the SAME IEEE expression order as text.QualityScore.
# shared lang-ID/quality CTE chain (used by doc_quality AND doc_profile)
_DOCQ_CTES = """w AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(coalesce(text, ''), '[a-zA-ZÀ-ɏ]+'),
                        x -> lower(x)) AS words,
         CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(coalesce(text, ''),
                                     '[^\\p{L}\\p{N}_\\s]')) AS DOUBLE) AS n_punct
  FROM documents
),
s AS (
  SELECT doc_id, n_chars, n_punct,
         CAST(len(words) AS DOUBLE) AS n_words,
         CAST(len(list_filter(words, x -> x IN
           ('the','and','of','to','a','in','is','that','it','for','was','with')))
           AS DOUBLE) AS en_sc,
         len(list_filter(words, x -> x IN
           ('der','die','das','und','ist','nicht','ein','eine','mit','von','zu')))
           AS de_sc,
         len(list_filter(words, x -> x IN
           ('le','la','les','et','est','une','un','des','que','pour','dans')))
           AS fr_sc
  FROM w
),
r AS (
  SELECT doc_id,
         CASE WHEN n_words = 0 OR (en_sc = 0 AND de_sc = 0 AND fr_sc = 0)
                   THEN 'und'
              WHEN en_sc >= de_sc AND en_sc >= fr_sc THEN 'en'
              WHEN de_sc >= fr_sc THEN 'de'
              ELSE 'fr' END AS pred_lang,
         n_punct / greatest(n_chars, 1.0) AS punct_ratio,
         en_sc / greatest(n_words, 1.0) AS stopword_ratio,
         n_words
  FROM s
)"""

_QUALITY_EXPR = """round(least(greatest(
         0.4 * least(greatest(n_words / 50.0, 0.0), 1.0)
         + 0.3 * (1.0 - punct_ratio)
         + 0.3 * least(greatest(stopword_ratio * 4.0, 0.0), 1.0),
       0.0), 1.0), 6)"""

ORACLES["doc_quality"] = f"""WITH {_DOCQ_CTES}
SELECT doc_id, pred_lang, round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       {_QUALITY_EXPR} AS quality
FROM r ORDER BY doc_id"""

# doc_profile: the full fused analyzer output, INCLUDING the rolling
# code-point fingerprint — Horner in HUGEINT split-multiply arithmetic,
# bit-exact vs datapipe.text.rolling_fingerprint (r2's last no_oracle)
_FP_HORNER = (
    "list_reduce(list_prepend(CAST(0 AS UBIGINT), "
    "list_transform(regexp_extract_all(coalesce(text, ''), '(?s).'), "
    "c -> CAST(ord(c) AS UBIGINT))), "
    f"(a, b) -> {_mulmod_sql(f'CAST((CAST(a AS HUGEINT) + b) % {_M64} AS UBIGINT)', _GRAM_P)})"
)

ORACLES["doc_profile"] = f"""WITH {_DOCQ_CTES},
f AS (
  SELECT doc_id,
         length(regexp_extract_all(coalesce(text, ''), '{_TOKEN_RE_SQL}')) AS n_tokens,
         CASE WHEN trim(coalesce(text, '')) = '' THEN 0
              ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws_tokens,
         {_FP_HORNER} AS fingerprint
  FROM documents)
SELECT f.doc_id, f.n_tokens, f.n_ws_tokens, r.pred_lang,
       {_QUALITY_EXPR} AS quality, f.fingerprint
FROM f JOIN r USING (doc_id) ORDER BY doc_id"""

ORACLES["doc_sample_per_lang"] = """SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 5 ORDER BY lang, doc_id"""

ORACLES["doc_len_quantiles"] = """WITH c AS (
  SELECT n_chars AS v, count(*) AS cnt FROM documents GROUP BY 1
),
t AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
tot AS (SELECT sum(cnt) AS n FROM c),
p AS (SELECT CAST(unnest([25, 50, 75, 90, 99]) AS BIGINT) AS pct)
SELECT p.pct AS pct, min(t.v) AS v
FROM p, tot, t
WHERE t.cum >= (p.pct * tot.n + 99) // 100
GROUP BY p.pct ORDER BY pct"""

ORACLES["scan_vector_plus"] = f"""WITH {_SUPP}
SELECT v, round(sum(val) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS val
FROM sv ORDER BY v"""

ORACLES["scan_rowwise_min"] = f"""WITH {_E}
SELECT src, dst, round(min(w) OVER (PARTITION BY src ORDER BY dst
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS w
FROM e ORDER BY src, dst"""

ORACLES["reshape_flat"] = f"""WITH {_E}
SELECT (src * 211 + dst) // 64 AS src, (src * 211 + dst) % 64 AS dst,
       round(w, 6) AS w
FROM e ORDER BY src, dst"""


# r4 queries: output-control, dot-mode mxm, clustering, media codecs

ORACLES["agg_first_last"] = f"""WITH {_SUPP}
SELECT round((SELECT val FROM sv ORDER BY v ASC LIMIT 1), 6) AS "first",
       round((SELECT val FROM sv ORDER BY v DESC LIMIT 1), 6) AS "last",
       (SELECT min(v) FROM sv) AS first_index,
       (SELECT max(v) FROM sv) AS last_index"""

ORACLES["mxv_value_mask"] = f"""WITH {_E}, {_SUPP}, {_CUST}
SELECT e.src AS v, round(sum(e.w * sv.val), 4) AS val
FROM e JOIN sv ON sv.v = e.dst
WHERE e.src IN (SELECT v FROM cv WHERE v % 2 = 1)
GROUP BY 1 ORDER BY v"""

ORACLES["mxm_masked_dot"] = f"""WITH {_E},
hub AS (SELECT dst FROM e GROUP BY dst ORDER BY count(*) DESC, dst ASC LIMIT 1),
m AS (SELECT src, dst FROM e WHERE dst = (SELECT dst FROM hub))
SELECT a.src AS src, b.dst AS dst, round(sum(a.w * b.w), 4) AS w
FROM e a JOIN e b ON a.dst = b.src
JOIN m ON m.src = a.src AND m.dst = b.dst
GROUP BY 1, 2 ORDER BY src, dst"""

# C(M, plus, replace)[rows, cols] << C[rows, cols]: in-region cells
# double where the value mask is truthy ((src+dst) even) and are DELETED
# where it is falsy (replace drops unmasked in-region old entries);
# outside the region C is untouched (GxB_subassign scope)
ORACLES["assign_submatrix_masked"] = f"""WITH {_E},
t AS (SELECT src, dst, w,
             (src IN (3, 5, 11) AND dst IN (2, 7, 52)) AS inreg,
             ((src + dst) % 2 = 0) AS even
      FROM e)
SELECT src, dst, round(CASE WHEN inreg AND even THEN w * 2 ELSE w END, 6) AS w
FROM t WHERE (NOT inreg) OR even
ORDER BY src, dst"""

# connected components (min label) over the exact-Jaccard >= 0.5 pair
# graph — the same pair set minhash_pairs is hash-verified against;
# singleton docs keep themselves
ORACLES["dedup_clusters"] = """WITH RECURSIVE toks AS MATERIALIZED (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l FROM documents
    WHERE trim(text) <> ''
  ), LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS ord) AS u
),
grams AS MATERIALIZED (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS g
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
              JOIN toks c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
),
cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a, b FROM inter
  JOIN cnt ca ON ca.doc_id = inter.a JOIN cnt cb ON cb.doc_id = inter.b
  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
)
SELECT node AS doc_id, min(r) AS keep_id FROM reach GROUP BY 1 ORDER BY doc_id"""

# media codec gate: recompute every integer feature from (id, size)
# closed forms — matches ONLY if the PPM/WAV encode+decode round-trips
# the exact synthetic pixels/samples
ORACLES["media_features"] = """WITH ids AS (
  SELECT unnest(generate_series(0, 47)) AS id),
img AS (SELECT id, 16 + (id*7)%17 AS w, 16 + (id*5)%13 AS h FROM ids WHERE id%2=0),
ipx AS (
  SELECT img.id, img.w, img.h,
         CAST(sum((X.xx*3 + Y.yy*5 + C.cc*7 + img.id*11) % 256) AS BIGINT) AS s
  FROM img,
       LATERAL (SELECT unnest(generate_series(0, img.w-1)) AS xx) X,
       LATERAL (SELECT unnest(generate_series(0, img.h-1)) AS yy) Y,
       LATERAL (SELECT unnest(generate_series(0, 2)) AS cc) C
  GROUP BY 1, 2, 3),
aud AS (SELECT id, 400 + (id*31)%211 AS n FROM ids WHERE id%2=1),
apx AS (
  SELECT aud.id, aud.n,
         CAST(sum(abs(((I.ii*37 + aud.id*101) % 2048) - 1024)) AS BIGINT) AS s
  FROM aud, LATERAL (SELECT unnest(generate_series(0, aud.n-1)) AS ii) I
  GROUP BY 1, 2)
SELECT id AS media_id, 'image' AS kind, CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height, CAST(w*h AS BIGINT) AS n_units, s AS sum_val
FROM ipx
UNION ALL
SELECT id, 'audio', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(n AS BIGINT), s
FROM apx
ORDER BY media_id"""

ORACLES["selectk_first"] = f"""WITH {_E}
SELECT src, dst, round(w, 6) AS w FROM (
  SELECT src, dst, w,
         row_number() OVER (PARTITION BY src ORDER BY dst ASC) AS rn
  FROM e
) WHERE rn <= 2 ORDER BY src, dst"""

# video leg of the codec gate: frame count + Σ pixel over all frames,
# recomputed from the id alone (pixel = (x*3+y*5+c*7+id*11+f*13)%256,
# w = 8+id%5, h = 6+id%3, frames = 2+(id*3)%5)
ORACLES["media_frames"] = """WITH ids AS (
  SELECT unnest(generate_series(0, 11)) AS id),
dims AS (SELECT id, 8 + id%5 AS w, 6 + id%3 AS h, 2 + (id*3)%5 AS nf FROM ids),
px AS (
  SELECT d.id, d.nf,
         CAST(sum((X.xx*3 + Y.yy*5 + C.cc*7 + d.id*11 + F.ff*13) % 256)
              AS BIGINT) AS s
  FROM dims d,
       LATERAL (SELECT unnest(generate_series(0, d.nf-1)) AS ff) F,
       LATERAL (SELECT unnest(generate_series(0, d.w-1)) AS xx) X,
       LATERAL (SELECT unnest(generate_series(0, d.h-1)) AS yy) Y,
       LATERAL (SELECT unnest(generate_series(0, 2)) AS cc) C
  GROUP BY 1, 2)
SELECT id AS media_id, 'video' AS kind, CAST(nf AS BIGINT) AS n_units,
       s AS sum_val
FROM px ORDER BY media_id"""

# C(M, plus) << A.mxm(A) with M = C's structure: product entries at C
# positions accumulate into C; C entries without a product survive (the
# accum union); product outside C is masked away
ORACLES["mxm_update"] = f"""WITH {_E},
p AS (
  SELECT a.src AS src, b.dst AS dst, sum(a.w * b.w) AS pw
  FROM e a JOIN e b ON a.dst = b.src
  JOIN e m ON m.src = a.src AND m.dst = b.dst
  GROUP BY 1, 2)
SELECT e.src, e.dst, round(e.w + coalesce(p.pw, 0), 4) AS w
FROM e LEFT JOIN p ON p.src = e.src AND p.dst = e.dst
ORDER BY e.src, e.dst"""

# FC64 SpMV: complex product (w + i*n) * (re + i*im), grouped complex sum.
# re/im component sums are separable; products written in numpy's exact
# (ac - bd, ad + bc) form so both sides round identically.
ORACLES["complex_mxv"] = f"""WITH {_E}, {_SUPP},
sc AS (SELECT v, val AS re, CAST(v AS DOUBLE) / 100 AS im FROM sv)
SELECT e.src AS v,
       round(sum(e.w * sc.re - CAST(e.n AS DOUBLE) * sc.im), 4) AS re,
       round(sum(e.w * sc.im + CAST(e.n AS DOUBLE) * sc.re), 4) AS im
FROM e JOIN sc ON sc.v = e.dst GROUP BY 1 ORDER BY v"""

ORACLES["complex_ewise"] = f"""WITH {_SUPP}, {_CUST},
sc AS (SELECT v, val AS re, CAST(v AS DOUBLE) / 100 AS im FROM sv),
cc AS (SELECT v, val AS re, (CAST(v AS DOUBLE) + 1) / 50 AS im FROM cv)
SELECT sc.v AS v,
       round(sc.re * cc.re - sc.im * cc.im, 4) AS re,
       round(sc.re * cc.im + sc.im * cc.re, 4) AS im
FROM sc JOIN cc ON cc.v = sc.v ORDER BY v"""

# UDT (x:int-count, y:float-sum) ewise UDF: x adds, y multiplies
ORACLES["udt_ewise"] = """WITH
sa AS (SELECT s_suppkey % 211 AS v, count(*) AS x,
              round(sum(s_acctbal), 6) AS y
       FROM supplier GROUP BY 1),
cb AS (SELECT c_custkey % 211 AS v, count(*) AS x,
              round(sum(c_acctbal), 6) AS y
       FROM customer GROUP BY 1)
SELECT sa.v AS v, sa.x + cb.x AS x, round(sa.y * cb.y, 4) AS y
FROM sa JOIN cb ON cb.v = sa.v ORDER BY v"""

ORACLES["mxv_positional"] = f"""WITH {_E}, {_SUPP}
SELECT e.src AS v, round(CAST(min(e.dst) AS DOUBLE), 6) AS val
FROM e JOIN sv ON sv.v = e.dst GROUP BY 1 ORDER BY v"""

ORACLES["vxm_min_first"] = f"""WITH {_E}, {_SUPP}
SELECT e.dst AS v, round(min(sv.val), 6) AS val
FROM e JOIN sv ON sv.v = e.src GROUP BY 1 ORDER BY v"""

ORACLES["mxm_positional"] = f"""WITH {_E}
SELECT a.src AS src, b.dst AS dst,
       round(CAST(sum(a.dst + 1) AS DOUBLE), 4) AS w
FROM e a JOIN e b ON a.dst = b.src
GROUP BY 1, 2 ORDER BY src, dst"""

ORACLES["bfs_parents"] = f"""WITH RECURSIVE {_E}, {_EBIN},
reach(v, d) AS (
  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT eb.dst, reach.d + 1
  FROM reach JOIN ebin eb ON eb.src = reach.v
  WHERE reach.d < 64
),
dist AS (SELECT v, min(d) AS d FROM reach GROUP BY v)
SELECT v, parent FROM (
  SELECT d2.v AS v, CAST(min(eb.src) AS BIGINT) AS parent
  FROM ebin eb
  JOIN dist d1 ON d1.v = eb.src
  JOIN dist d2 ON d2.v = eb.dst
  WHERE d1.d + 1 = d2.d
  GROUP BY 1
  UNION ALL SELECT CAST(1 AS BIGINT), CAST(1 AS BIGINT)
) ORDER BY v"""

ORACLES["selectk_vector"] = f"""WITH {_SUPP}
SELECT v, round(val, 6) AS val FROM sv
ORDER BY val DESC, v ASC LIMIT 3"""

ORACLES["split_concat"] = f"""WITH {_E}
SELECT src, dst, round(w, 6) AS w FROM e ORDER BY src, dst"""


# FC64 matmul: complex wedge sum in numpy's exact (ac - bd, ad + bc) form
ORACLES["complex_mxm"] = f"""WITH {_E},
ce AS (SELECT src, dst, w AS re, CAST(n AS DOUBLE) AS im FROM e)
SELECT a.src AS src, b.dst AS dst,
       round(sum(a.re * b.re - a.im * b.im), 3) AS re,
       round(sum(a.re * b.im + a.im * b.re), 3) AS im
FROM ce a JOIN ce b ON a.dst = b.src
GROUP BY 1, 2 ORDER BY src, dst"""

# INT64-exact min_plus SpMV: weights 2^54 + k*1024 + 7 stay BIGINT on
# both sides (no DOUBLE cast anywhere — the +7 would not survive one)
ORACLES["mxv_int64_exact"] = """WITH
ei AS (
  SELECT l_partkey % 211 AS src, l_suppkey % 211 AS dst,
         CAST(9007199254740992 * 2 AS BIGINT)
         + (min(CAST(l_orderkey AS BIGINT) * 1048576 + l_partkey)
            % 1048576) * 1024 + 7 AS w
  FROM lineitem GROUP BY 1, 2),
svi AS (SELECT s_suppkey % 211 AS v, min(CAST(s_suppkey AS BIGINT)) AS val
        FROM supplier GROUP BY 1)
SELECT ei.src AS v, min(ei.w + svi.val) AS val
FROM ei JOIN svi ON svi.v = ei.dst GROUP BY 1 ORDER BY v"""

ORACLES["apply_diagindex"] = f"""WITH {_E}
SELECT src, dst, CAST(dst AS BIGINT) - CAST(src AS BIGINT) + 3 AS w
FROM e ORDER BY src, dst"""


# interval join: same-key events within [ts-1800s, ts+900s], self excluded
ORACLES["events_range_join"] = """SELECT a.event_id AS ident,
       count(*) AS n_near, round(sum(b.value), 6) AS sum_near
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND b.ts >= a.ts - INTERVAL 1800 SECOND
 AND b.ts <= a.ts + INTERVAL 900 SECOND
 AND b.event_id <> a.event_id
GROUP BY 1 ORDER BY ident"""


# edge support (k-truss building block): common-neighbor count per
# undirected edge of the simple symmetric graph — C(A) << A.mxm(A)
ORACLES["edge_support"] = f"""WITH {_E}, {_UE_NOSELF}
SELECT s.src AS src, s.dst AS dst, CAST(count(*) AS BIGINT) AS support
FROM ue s JOIN ue a ON a.src = s.src JOIN ue b ON b.src = a.dst AND b.dst = s.dst
WHERE s.src < s.dst
GROUP BY s.src, s.dst
ORDER BY src, dst"""

# 3-core: simultaneous degree peel to fixpoint. The recursive term
# re-emits the surviving symmetric edge set each round (window degrees
# computed BEFORE the round's removals); round 32 is far past fixpoint
# at any tested scale, so its row set IS the core.
ORACLES["kcore3"] = f"""WITH RECURSIVE {_E}, {_UE_NOSELF},
alive(round, src, dst) AS (
  SELECT 0, src, dst FROM ue
  UNION ALL
  SELECT round + 1, src, dst FROM (
    SELECT round, src, dst,
           count(*) OVER (PARTITION BY round, src) AS dsrc,
           count(*) OVER (PARTITION BY round, dst) AS ddst
    FROM alive)
  WHERE round < 32 AND dsrc >= 3 AND ddst >= 3
)
SELECT DISTINCT src AS v FROM alive WHERE round = 32 ORDER BY v"""

# sliding-window chunking: geometry + boundary tokens (window 128 / stride 96)
ORACLES["doc_chunks"] = """WITH tt AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM documents
),
n AS (SELECT doc_id, toks, len(toks) AS n FROM tt WHERE len(toks) > 0),
ch AS (SELECT doc_id, toks, n, unnest(range(0, (n + 95) // 96)) AS r FROM n)
SELECT doc_id, CAST(r AS BIGINT) AS chunk_id, CAST(r * 96 AS BIGINT) AS tok_start,
       CAST(least(128, n - r * 96) AS BIGINT) AS n_tok,
       toks[CAST(r * 96 + 1 AS BIGINT)] AS first_tok,
       toks[CAST(r * 96 + least(128, n - r * 96) AS BIGINT)] AS last_tok
FROM ch ORDER BY doc_id, chunk_id"""

# benchmark decontamination: 5-gram positional overlap vs the
# doc_id % 37 == 0 split, gram keys = the repeated_ngrams mix64 chain
_DECON_N = 5
ORACLES["doc_decontaminate"] = f"""WITH toks AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
th AS (
  SELECT doc_id, list_transform(ts, t -> {_TOKEN_HASH_SQL}) AS hs
  FROM toks WHERE len(ts) >= {_DECON_N}
),
grams AS (
  SELECT doc_id, list_reduce(
           list_prepend(CAST(0 AS UBIGINT), hs[i:i + {_DECON_N - 1}]),
           {_GRAM_LAMBDA_SQL}) AS gram
  FROM th, LATERAL (SELECT unnest(range(1, len(hs) - {_DECON_N} + 2)) AS i) u
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 37 = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_hits
  FROM grams g JOIN bench USING (gram)
  WHERE g.doc_id % 37 <> 0 GROUP BY 1
)
SELECT t.doc_id,
       CAST(greatest(len(t.ts) - {_DECON_N} + 1, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) >= 1 AS BIGINT) AS contaminated
FROM toks t LEFT JOIN hits h USING (doc_id)
WHERE t.doc_id % 37 <> 0 ORDER BY t.doc_id"""


# JSON metadata extraction + grouped rollup (integer-exact)
ORACLES["events_props_agg"] = """SELECT event_type,
       CAST(count(k) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type"""


def _hits_sql(k: int = 8) -> str:
    """HITS unrolled: a_i = norm1(Aᵀ h_{i-1}), h_i = norm1(A a_i)."""
    # every CTE is MATERIALIZED: the normalization subquery references
    # its raw CTE a second time, and DuckDB re-evaluates non-materialized
    # CTEs per reference — 2^k scans of lineitem without this
    parts = [_E, _EBIN, _N,
             "h0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS x FROM n)"]
    prev_h = "h0"
    for i in range(1, k + 1):
        parts.append(
            f"a{i}r AS MATERIALIZED (SELECT eb.dst AS v, sum(h.x) AS x "
            f"FROM ebin eb JOIN {prev_h} h ON h.v = eb.src GROUP BY 1)")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT v, "
            f"x * (1.0 / (SELECT sum(x) FROM a{i}r)) AS x FROM a{i}r)")
        parts.append(
            f"h{i}r AS MATERIALIZED (SELECT eb.src AS v, sum(a.x) AS x "
            f"FROM ebin eb JOIN a{i} a ON a.v = eb.dst GROUP BY 1)")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT v, "
            f"x * (1.0 / (SELECT sum(x) FROM h{i}r)) AS x FROM h{i}r)")
        prev_h = f"h{i}"
    return ("WITH " + ",\n".join(parts) +
            f"""
SELECT n.v, round(coalesce(h.x, 0), 6) AS hub,
       round(coalesce(a.x, 0), 6) AS auth
FROM n LEFT JOIN h{k} h ON h.v = n.v LEFT JOIN a{k} a ON a.v = n.v
ORDER BY n.v""")


ORACLES["hits_k8"] = _hits_sql(8)


def _katz_sql(k: int = 8, alpha: float = 0.05, beta: float = 1.0) -> str:
    """Katz unrolled: x_i = alpha * A^T x_{i-1} + beta, x_0 = 0, final L2
    normalization. MATERIALIZED per iteration (see _hits_sql note)."""
    parts = [_E, _EBIN, _N,
             "x0 AS MATERIALIZED (SELECT v, CAST(0.0 AS DOUBLE) AS x FROM n)"]
    for i in range(1, k + 1):
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT n.v, "
            f"{alpha} * coalesce(s.x, 0) + {beta} AS x FROM n LEFT JOIN ("
            f"SELECT eb.dst AS v, sum(x.x) AS x FROM ebin eb "
            f"JOIN x{i - 1} x ON x.v = eb.src GROUP BY 1) s ON s.v = n.v)")
    return ("WITH " + ",\n".join(parts) +
            f"""
SELECT v, round(x / (SELECT sqrt(sum(x * x)) FROM x{k}), 6) AS katz
FROM x{k} ORDER BY v""")


ORACLES["katz_k8"] = _katz_sql(8)

# overall reciprocity of the directed simple graph (integer-exact ppm)
ORACLES["reciprocity"] = f"""WITH {_E},
d AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
r AS (SELECT count(*) AS nr FROM d a JOIN d b
      ON b.src = a.dst AND b.dst = a.src)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_edges,
       CAST((SELECT nr FROM r) AS BIGINT) AS n_recip,
       CAST((SELECT nr FROM r) * 1000000 // (SELECT count(*) FROM d)
            AS BIGINT) AS reciprocity_ppm"""

# global clustering coefficient 3*tri/triads (integer-exact ppm)
ORACLES["transitivity"] = f"""WITH {_E},
ud AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
       FROM e WHERE src <> dst),
tri AS (SELECT count(*) AS t FROM ud a
        JOIN ud b ON b.s = a.s AND b.d > a.d
        JOIN ud c ON c.s = a.d AND c.d = b.d),
deg AS (SELECT v, count(*) AS dg FROM
        (SELECT s AS v FROM ud UNION ALL SELECT d FROM ud) GROUP BY v),
tds AS (SELECT CAST(sum(dg * (dg - 1) / 2) AS BIGINT) AS triads FROM deg)
SELECT CAST((SELECT t FROM tri) AS BIGINT) AS triangles,
       (SELECT triads FROM tds) AS triads,
       CAST(3 * (SELECT t FROM tri) * 1000000 // (SELECT triads FROM tds)
            AS BIGINT) AS transitivity_ppm"""

# per-existing-edge Jaccard similarity (integer-exact ppm)
ORACLES["edge_jaccard"] = f"""WITH {_E}, {_UE_NOSELF},
sup AS (SELECT s.src, s.dst, count(*) AS support
        FROM ue s JOIN ue a ON a.src = s.src
                  JOIN ue b ON b.src = a.dst AND b.dst = s.dst
        WHERE s.src < s.dst GROUP BY s.src, s.dst),
deg AS (SELECT src AS v, count(*) AS dg FROM ue GROUP BY 1)
SELECT sup.src AS src, sup.dst AS dst,
       CAST(sup.support AS BIGINT) AS support,
       CAST(sup.support * 1000000 // (du.dg + dv.dg - sup.support)
            AS BIGINT) AS jaccard_ppm
FROM sup JOIN deg du ON du.v = sup.src JOIN deg dv ON dv.v = sup.dst
ORDER BY src, dst"""

# per-vertex local clustering coefficient (integer-exact ppm)
ORACLES["local_clustering"] = f"""WITH {_E}, {_UE_NOSELF},
deg AS (SELECT src AS v, count(*) AS dg FROM ue GROUP BY 1),
t2 AS (SELECT a.src AS v, count(*) AS t2
       FROM ue a JOIN ue b ON b.src = a.dst
                 JOIN ue c ON c.src = a.src AND c.dst = b.dst
       GROUP BY 1)
SELECT deg.v AS v, CAST(deg.dg AS BIGINT) AS deg,
       CAST(coalesce(t2.t2, 0) / 2 AS BIGINT) AS tri,
       CAST(CASE WHEN deg.dg >= 2 THEN
            coalesce(t2.t2, 0) * 1000000 // (deg.dg * (deg.dg - 1))
            ELSE 0 END AS BIGINT) AS lcc_ppm
FROM deg LEFT JOIN t2 ON t2.v = deg.v ORDER BY v"""

# average neighbor degree (integer-exact ppm)
ORACLES["avg_neighbor_degree"] = f"""WITH {_E}, {_UE_NOSELF},
deg AS (SELECT src AS v, count(*) AS dg FROM ue GROUP BY 1),
s AS (SELECT ue.src AS v, sum(deg.dg) AS snd
      FROM ue JOIN deg ON deg.v = ue.dst GROUP BY 1)
SELECT deg.v AS v, CAST(deg.dg AS BIGINT) AS deg,
       CAST(s.snd AS BIGINT) AS sum_nbr_deg,
       CAST(s.snd * 1000000 // deg.dg AS BIGINT) AS avg_nbr_deg_ppm
FROM deg JOIN s ON s.v = deg.v ORDER BY v"""

# degree assortativity (exact int64 moments; final division in DOUBLE)
ORACLES["degree_assortativity"] = f"""WITH {_E}, {_UE_NOSELF},
deg AS (SELECT src AS v, count(*) AS dg FROM ue GROUP BY 1),
j AS (SELECT du.dg AS x, dv.dg AS y
      FROM ue JOIN deg du ON du.v = ue.src JOIN deg dv ON dv.v = ue.dst),
t AS (SELECT count(*) AS m, sum(x) AS sx, sum(x * x) AS sxx,
             sum(x * y) AS sxy FROM j)
SELECT CAST(m AS BIGINT) AS m, CAST(sx AS BIGINT) AS sx,
       CAST(sxx AS BIGINT) AS sxx, CAST(sxy AS BIGINT) AS sxy,
       CASE WHEN m * sxx - sx * sx = 0 THEN 0.0 ELSE
            round(CAST(m * sxy - sx * sx AS DOUBLE)
                  / CAST(m * sxx - sx * sx AS DOUBLE), 6) END
       AS assortativity
FROM t"""

# strongly connected components: label = min mutually-reachable id.
# The closure is tiny at the 211-vertex universe; the engine computes
# the same labels without ever materializing reachability.
# NOTE: inside a WITH RECURSIVE block, DuckDB 1.0.0 loses the dedup of
# the plain UNION in the shared `n` CTE (yields src||dst concatenation),
# so the vertex universe is re-deduped explicitly via `nd`.
ORACLES["scc_labels"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_N},
nd AS (SELECT DISTINCT v FROM n),
reach(a, b) AS (
  SELECT src, dst FROM ebin
  UNION
  SELECT r.a, eb.dst FROM reach r JOIN ebin eb ON eb.src = r.b
),
mut AS (SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a)
SELECT nd.v AS v, CAST(least(nd.v, coalesce(m.mn, nd.v)) AS BIGINT) AS scc
FROM nd LEFT JOIN (SELECT v, min(u) AS mn FROM mut GROUP BY 1) m
ON m.v = nd.v ORDER BY v"""


def _ppr_sql(k: int = 8, damping: float = 0.85) -> str:
    """Personalized PageRank unrolled: p uniform over {v % 7 == 0},
    r0 = p, r = (1-d)*p + d*A^T(r/deg)."""
    parts = [
        _E, _EBIN, _N,
        "dout AS (SELECT src, count(*) AS c FROM ebin GROUP BY 1)",
        "ns AS (SELECT count(*) AS c FROM n WHERE v % 7 = 0)",
        "pv AS MATERIALIZED (SELECT v, CASE WHEN v % 7 = 0 THEN"
        " 1.0 / (SELECT c FROM ns) ELSE 0.0 END AS p FROM n)",
        "r0 AS (SELECT v, p AS score FROM pv)",
    ]
    for i in range(1, k + 1):
        parts.append(f"""r{i} AS MATERIALIZED (
  SELECT pv.v, {1 - damping} * pv.p + {damping} * COALESCE(s.x, 0) AS score
  FROM pv LEFT JOIN (
    SELECT eb.dst AS v, sum(r{i-1}.score / d.c) AS x
    FROM ebin eb
    JOIN r{i-1} ON r{i-1}.v = eb.src
    JOIN dout d ON d.src = eb.src
    GROUP BY eb.dst
  ) s ON s.v = pv.v
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT v, round(score, 6) AS score FROM r{k} ORDER BY v")


ORACLES["ppr_k8"] = _ppr_sql(8)


# skip-gram pairs: ordered (toks[i], toks[i+d]), 1 <= d <= 3, whitespace
# tokens of trimmed text (same tokenization as doc_chunks)
ORACLES["skipgram_pairs"] = """WITH tt AS (
  SELECT CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM documents
),
p AS (
  SELECT toks[i] AS tok_a, toks[i + d] AS tok_b
  FROM tt,
       LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) u,
       LATERAL (SELECT unnest([1, 2, 3]) AS d) dd
  WHERE i + d <= len(toks)
)
SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2 ORDER BY tok_a, tok_b"""


# sequential regex redaction; counts taken on the pre-replacement state
# of each step (RE2 on both sides)
ORACLES["doc_redact"] = """WITH s0 AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM s0
),
s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t, 'https?://[^\\s]+')) AS n_url,
         regexp_replace(t, 'https?://[^\\s]+', '<URL>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_url,
         len(regexp_extract_all(t, '\\b\\w{6,}\\b')) AS n_long,
         regexp_replace(t, '\\b\\w{6,}\\b', '<LONG>', 'g') AS t
  FROM s2
)
SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
       CAST(n_url AS BIGINT) AS n_url, CAST(n_long AS BIGINT) AS n_long,
       t AS text
FROM s3 ORDER BY doc_id"""


def _walks_sql(steps: int = 4) -> str:
    """Deterministic walk: next = arg_min over out-neighbors of
    mix64((cur*K1) xor (t*K2) xor nbr) — splitmix64 keyed choice,
    collision-free for fixed (cur, t)."""
    K1 = 0x9E3779B97F4A7C15
    K2 = 0xD1B54A32D192ED03
    parts = [_E, _EBIN, _N,
             "w0 AS (SELECT v AS start, v AS cur FROM n WHERE v % 29 = 0)"]
    for t in range(1, steps + 1):
        salt = (t * K2) % (1 << 64)
        key = _mix64_sql(
            "xor(xor(" + _mulmod_sql("CAST(w.cur AS UBIGINT)", K1)
            + f", CAST({salt} AS UBIGINT)), CAST(eb.dst AS UBIGINT))")
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT w.start, arg_min(eb.dst, {key}) AS cur "
            f"FROM w{t-1} w JOIN ebin eb ON eb.src = w.cur GROUP BY w.start)")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST(start AS BIGINT) AS start, CAST({t} AS BIGINT) AS step,"
        f" CAST(cur AS BIGINT) AS v FROM w{t}" for t in range(steps + 1))
    return ("WITH " + ",\n".join(parts) + "\n" + sel
            + "\nORDER BY start, step")


ORACLES["random_walks"] = _walks_sql(4)


def _ktruss_sql(k: int, rounds: int = 16) -> str:
    """k-truss unrolled: each round keeps symmetric edges with >= k-2
    common neighbors (simultaneous removal); `rounds` is far past
    fixpoint at tested scales and peeling is monotone, so the final
    round's row set IS the truss."""
    parts = [_E, _UE_NOSELF,
             "t0 AS MATERIALIZED (SELECT src, dst FROM ue)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"""t{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM t{i-1} e
  JOIN t{i-1} a ON a.src = e.src
  JOIN t{i-1} b ON b.src = a.dst AND b.dst = e.dst
  GROUP BY e.src, e.dst HAVING count(*) >= {k - 2}
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT src, dst FROM t{rounds} WHERE src < dst"
            + " ORDER BY src, dst")


ORACLES["ktruss92"] = _ktruss_sql(92)


# multi-source BFS: one recursive CTE carries (source, v, d); min per pair
_BFS_MULTI_REACH = """reach(source, v, d) AS (
  SELECT s.v, s.v, CAST(0 AS BIGINT)
  FROM (SELECT unnest([CAST(1 AS BIGINT), 2, 5]) AS v) s
  UNION
  SELECT reach.source, eb.dst, reach.d + 1
  FROM reach JOIN ebin eb ON eb.src = reach.v
  WHERE reach.d < 64
)"""

ORACLES["bfs_multi"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_BFS_MULTI_REACH}
SELECT source, v, min(d) AS dist FROM reach
GROUP BY source, v ORDER BY source, v"""

ORACLES["eccentricity3"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_BFS_MULTI_REACH},
md AS (SELECT source, v, min(d) AS dist FROM reach GROUP BY source, v)
SELECT source, max(dist) AS ecc, CAST(count(*) AS BIGINT) AS n_reached
FROM md GROUP BY source ORDER BY source"""


ORACLES["closeness3"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_BFS_MULTI_REACH},
md AS (SELECT source, v, min(d) AS dist FROM reach GROUP BY source, v)
SELECT source,
       round(CASE WHEN sum(dist) > 0
                  THEN (count(*) - 1) / CAST(sum(dist) AS DOUBLE)
                  ELSE 0.0 END, 6) AS closeness,
       CAST(count(*) AS BIGINT) AS n_reached
FROM md GROUP BY source ORDER BY source"""

ORACLES["degree_hist"] = f"""WITH {_E},
d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)
SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices
FROM d GROUP BY 1 ORDER BY deg"""


def _mis_sql(rounds: int = 12) -> str:
    """Luby MIS unrolled: round i keeps v iff mix64(v) < min over alive
    neighbors (isolated vertices win); winners + neighborhoods leave.
    Luby needs O(log n) rounds — 12 is far past convergence at tested
    scales (the alive set is empty well before)."""
    pri = lambda x: _mix64_sql(f"CAST({x} AS UBIGINT)")  # noqa: E731
    parts = [_E, _UE_NOSELF,
             "a0 AS MATERIALIZED (SELECT src AS v FROM ue GROUP BY 1)",
             "e0 AS MATERIALIZED (SELECT src, dst FROM ue)"]
    for i in range(1, rounds + 1):
        parts += [
            f"""mn{i} AS MATERIALIZED (
  SELECT e.src AS v, min({pri('e.dst')}) AS mn FROM e{i-1} e GROUP BY 1)""",
            f"""win{i} AS MATERIALIZED (
  SELECT a.v FROM a{i-1} a LEFT JOIN mn{i} m ON m.v = a.v
  WHERE m.mn IS NULL OR {pri('a.v')} < m.mn)""",
            f"""rem{i} AS MATERIALIZED (
  SELECT v FROM win{i}
  UNION SELECT e.dst AS v FROM e{i-1} e JOIN win{i} w ON w.v = e.src)""",
            f"""a{i} AS MATERIALIZED (
  SELECT v FROM a{i-1} a
  WHERE NOT EXISTS (SELECT 1 FROM rem{i} r WHERE r.v = a.v))""",
            f"""e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i-1} e
  WHERE NOT EXISTS (SELECT 1 FROM rem{i} r WHERE r.v = e.src)
    AND NOT EXISTS (SELECT 1 FROM rem{i} r WHERE r.v = e.dst))""",
        ]
    sel = " UNION ALL ".join(f"SELECT v FROM win{i}"
                             for i in range(1, rounds + 1))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT v FROM ({sel}) ORDER BY v")


ORACLES["mis_labels"] = _mis_sql(12)


def _pagerank_weighted_sql(k: int = 8, damping: float = 0.85) -> str:
    """Weighted PageRank unrolled: contributions r_u * w_uv / strength_u."""
    parts = [
        _E, _N,
        "sout AS (SELECT src, sum(w) AS s FROM e GROUP BY 1)",
        "nn AS (SELECT count(*) AS c FROM n)",
        "r0 AS (SELECT v, 1.0 / (SELECT c FROM nn) AS score FROM n)",
    ]
    for i in range(1, k + 1):
        parts.append(f"""r{i} AS MATERIALIZED (
  SELECT n.v,
         ({1 - damping} / (SELECT c FROM nn))
         + {damping} * COALESCE(s.x, 0) AS score
  FROM n LEFT JOIN (
    SELECT e.dst AS v, sum(r{i-1}.score * e.w / d.s) AS x
    FROM e
    JOIN r{i-1} ON r{i-1}.v = e.src
    JOIN sout d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.v = n.v
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT v, round(score, 6) AS score FROM r{k} ORDER BY v")


ORACLES["pagerank_weighted_k8"] = _pagerank_weighted_sql(8)


def _walk_skipgrams_sql(steps: int = 8, window: int = 2) -> str:
    """Walk corpus from _walks_sql's recurrence, then pairs with step
    distance in [1, window], counted."""
    K1 = 0x9E3779B97F4A7C15
    K2 = 0xD1B54A32D192ED03
    parts = [_E, _EBIN, _N,
             "w0 AS (SELECT v AS start, v AS cur FROM n WHERE v % 29 = 0)"]
    for t in range(1, steps + 1):
        salt = (t * K2) % (1 << 64)
        key = _mix64_sql(
            "xor(xor(" + _mulmod_sql("CAST(w.cur AS UBIGINT)", K1)
            + f", CAST({salt} AS UBIGINT)), CAST(eb.dst AS UBIGINT))")
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT w.start, arg_min(eb.dst, {key}) AS cur "
            f"FROM w{t-1} w JOIN ebin eb ON eb.src = w.cur GROUP BY w.start)")
    walk = " UNION ALL ".join(
        f"SELECT start, {t} AS step, cur AS v FROM w{t}"
        for t in range(steps + 1))
    parts.append(f"walk AS MATERIALIZED ({walk})")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT CAST(p.v AS BIGINT) AS a, CAST(q.v AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS n
FROM walk p JOIN walk q
  ON q.start = p.start AND q.step - p.step BETWEEN 1 AND {window}
GROUP BY 1, 2 ORDER BY a, b""")


ORACLES["walk_skipgrams"] = _walk_skipgrams_sql(8, 2)


def _hll_sql(p: int = 10) -> str:
    """HLL registers: top-p bits of mix64(user_id) pick the register,
    leftmost-1 position of the low 64-p bits is the rank (integer-exact
    CASE ladder — no float log2)."""
    m_bits = 64 - p
    h = _mix64_sql("CAST(user_id AS UBIGINT)")
    ladder = " ".join(
        f"WHEN w >= CAST({1 << (b - 1)} AS UBIGINT) THEN {m_bits - b + 1}"
        for b in range(m_bits, 0, -1))
    return f"""WITH hx AS (
  SELECT {h} AS h FROM events
),
rw AS (
  SELECT CAST(h >> {m_bits} AS BIGINT) AS register,
         h & CAST({(1 << m_bits) - 1} AS UBIGINT) AS w
  FROM hx
)
SELECT register,
       CAST(max(CASE {ladder} ELSE {m_bits + 1} END) AS BIGINT) AS maxrank
FROM rw GROUP BY register ORDER BY register"""


ORACLES["events_hll"] = _hll_sql(10)


# condensed SCC DAG: label edges by min-mutually-reachable-id, count
# distinct-edge multiplicity between different components
ORACLES["scc_condensation"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_N},
nd AS (SELECT DISTINCT v FROM n),
reach(a, b) AS (
  SELECT src, dst FROM ebin
  UNION
  SELECT r.a, eb.dst FROM reach r JOIN ebin eb ON eb.src = r.b
),
mut AS (SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a),
lab AS (SELECT nd.v AS v, least(nd.v, coalesce(m.mn, nd.v)) AS scc
        FROM nd LEFT JOIN (SELECT v, min(u) AS mn FROM mut GROUP BY 1) m
        ON m.v = nd.v)
SELECT CAST(la.scc AS BIGINT) AS cfrom, CAST(lb.scc AS BIGINT) AS cto,
       CAST(count(*) AS BIGINT) AS n_edges
FROM ebin e JOIN lab la ON la.v = e.src JOIN lab lb ON lb.v = e.dst
WHERE la.scc <> lb.scc
GROUP BY 1, 2 ORDER BY cfrom, cto"""


ORACLES["harmonic3"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_BFS_MULTI_REACH},
md AS (SELECT source, v, min(d) AS dist FROM reach GROUP BY source, v)
SELECT source, round(sum(1.0 / dist), 6) AS harmonic,
       CAST(count(*) AS BIGINT) AS n_reached
FROM md WHERE dist > 0 GROUP BY source ORDER BY source"""


# induced 2-hop subgraph of sources {1,2}: members = min-dist <= 2
ORACLES["khop_subgraph"] = f"""WITH RECURSIVE {_E}, {_EBIN},
reach(v, dd) AS (
  SELECT s.v, CAST(0 AS BIGINT)
  FROM (SELECT unnest([CAST(1 AS BIGINT), 2]) AS v) s
  UNION
  SELECT eb.dst, reach.dd + 1
  FROM reach JOIN ebin eb ON eb.src = reach.v
  WHERE reach.dd < 2
),
mem AS (SELECT DISTINCT v FROM reach)
SELECT e.src, e.dst, e.w, e.n
FROM e JOIN mem a ON a.v = e.src JOIN mem b ON b.v = e.dst
ORDER BY e.src, e.dst"""


def _cms_sql(depth: int = 4, width: int = 1024) -> str:
    """Count-Min cells: counter = mix64(token_hash ^ seed_row) % width,
    seeds = (row*K2) ^ K1 — same Horner token hash as repeated_ngrams."""
    K1 = 0x9E3779B97F4A7C15
    K2 = 0xD1B54A32D192ED03
    rows = []
    for r in range(depth):
        seed = ((r * K2) % (1 << 64)) ^ K1
        cell = _mix64_sql(f"xor(h, CAST({seed} AS UBIGINT))")
        rows.append(f"SELECT {r} AS crow, CAST(({cell}) % {width} AS BIGINT)"
                    " AS counter FROM th")
    return f"""WITH toks AS (
  SELECT unnest(CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
                     ELSE regexp_split_to_array(trim(text), '\\s+') END) AS t
  FROM documents
),
th AS (SELECT {_TOKEN_HASH_SQL} AS h FROM toks),
cells AS ({' UNION ALL '.join(rows)})
SELECT crow AS "row", counter, CAST(count(*) AS BIGINT) AS count
FROM cells GROUP BY 1, 2 ORDER BY 1, 2"""


ORACLES["doc_cms"] = _cms_sql(4, 1024)


def _feature_hash_sql(dim: int = 4096) -> str:
    sign_seed = 0xA24BAED4963EE407
    feat = _mix64_sql("h")
    sgn = _mix64_sql(f"xor(h, CAST({sign_seed} AS UBIGINT))")
    return f"""WITH toks AS (
  SELECT doc_id, unnest(CASE WHEN trim(coalesce(text, '')) = ''
                             THEN CAST([] AS VARCHAR[])
                             ELSE regexp_split_to_array(trim(text), '\\s+')
                        END) AS t
  FROM documents
),
th AS (SELECT doc_id, {_TOKEN_HASH_SQL} AS h FROM toks),
fx AS (
  SELECT doc_id, CAST(({feat}) % {dim} AS BIGINT) AS feature,
         CASE WHEN ({sgn}) >> 63 = 1 THEN 1 ELSE -1 END AS s
  FROM th
)
SELECT doc_id, feature, CAST(count(*) AS BIGINT) AS count,
       CAST(sum(s) AS BIGINT) AS signed
FROM fx GROUP BY 1, 2 ORDER BY doc_id, feature"""


ORACLES["doc_feature_hash"] = _feature_hash_sql(4096)


# gap sessionization: lag + windowed cumsum session numbering
ORACLES["events_sessions"] = """WITH x AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us"""


# bigram LM self-score: avg ln(n(a,b)/n(a,*)) over consecutive pairs,
# keys = the repeated_ngrams mix64 chain at n=2
ORACLES["doc_lm_score"] = f"""WITH toks AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
th AS (
  SELECT doc_id, list_transform(ts, t -> {_TOKEN_HASH_SQL}) AS hs
  FROM toks WHERE len(ts) >= 2
),
pairs AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS UBIGINT), hs[i:i + 1]),
                     {_GRAM_LAMBDA_SQL}) AS g,
         hs[i] AS pre
  FROM th, LATERAL (SELECT unnest(range(1, len(hs))) AS i) u
),
bg AS (SELECT g, count(*) AS nb FROM pairs GROUP BY 1),
pf AS (SELECT pre, count(*) AS npf FROM pairs GROUP BY 1),
sc AS (
  SELECT p.doc_id, count(*) AS n_bigrams,
         sum(ln(CAST(b.nb AS DOUBLE) / CAST(f.npf AS DOUBLE))) AS s
  FROM pairs p JOIN bg b ON b.g = p.g JOIN pf f ON f.pre = p.pre
  GROUP BY 1
)
SELECT t.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(sc.s / sc.n_bigrams, 0.0), 6) AS avg_logprob
FROM toks t LEFT JOIN sc ON sc.doc_id = t.doc_id ORDER BY t.doc_id"""

ORACLES["emb_dim_stats"] = """SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(e), 6) AS mean, round(stddev_pop(e), 6) AS std,
       round(min(e), 6) AS min_v, round(max(e), 6) AS max_v
FROM (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding) AS e
      FROM embeddings)
GROUP BY dim ORDER BY dim"""

ORACLES["dedup_apply"] = """WITH w AS (
  SELECT min(doc_id) AS doc_id, count(*) AS n_dups
  FROM documents GROUP BY md5(text))
SELECT d.doc_id, d.lang, w.n_dups
FROM documents d JOIN w USING (doc_id) ORDER BY d.doc_id"""

ORACLES["emb_normalize"] = """WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(dim AS BIGINT) AS dim,
       round(e / greatest(sqrt(sum(e*e) OVER (PARTITION BY vec_id)), 1e-12),
             6) AS val
FROM x ORDER BY vec_id, dim"""

ORACLES["emb_quantize"] = """WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings),
s AS (SELECT vec_id, max(abs(e)) / 127.0 AS scale FROM x GROUP BY vec_id)
SELECT CAST(x.vec_id AS BIGINT) AS vec_id, CAST(x.dim AS BIGINT) AS dim,
       CAST(floor(x.e / (CASE WHEN s.scale = 0 THEN 1.0 ELSE s.scale END)
                  + 0.5) AS BIGINT) AS code,
       round(s.scale, 9) AS scale
FROM x JOIN s USING (vec_id) ORDER BY x.vec_id, x.dim"""

ORACLES["contract_mod7"] = f"""WITH {_E}
SELECT src % 7 AS src, dst % 7 AS dst, round(sum(w), 6) AS w,
       CAST(count(*) AS BIGINT) AS m
FROM e GROUP BY 1, 2 ORDER BY src, dst"""

ORACLES["sample_neighbors"] = f"""WITH {_E}, {_EBIN},
h AS (SELECT src, dst,
             md5(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)) AS hx
      FROM ebin),
l1 AS (SELECT src, dst FROM (
         SELECT src, dst,
                row_number() OVER (PARTITION BY src ORDER BY hx, dst) AS rn
         FROM h WHERE src IN (1, 2)) WHERE rn <= 3),
f2 AS (SELECT DISTINCT dst AS v FROM l1),
l2 AS (SELECT src, dst FROM (
         SELECT h.src, h.dst,
                row_number() OVER (PARTITION BY h.src ORDER BY hx, dst) AS rn
         FROM h JOIN f2 ON h.src = f2.v) WHERE rn <= 3)
SELECT CAST(1 AS BIGINT) AS hop, src, dst FROM l1
UNION ALL
SELECT CAST(2 AS BIGINT) AS hop, src, dst FROM l2
ORDER BY hop, src, dst"""

ORACLES["pq_codes"] = """WITH ev AS MATERIALIZED (
  SELECT vec_id, CAST(floor(x * 1048576.0) AS BIGINT) AS xq, ord - 1 AS d
  FROM (SELECT vec_id, embedding AS l FROM embeddings),
       LATERAL (SELECT unnest(l) AS x, generate_subscripts(l, 1) AS ord) AS u
),
cent AS (
  SELECT vec_id AS cid FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
cv AS MATERIALIZED (
  SELECT c.cid, ev.d, ev.xq AS cq FROM cent c JOIN ev ON ev.vec_id = c.cid
),
dists AS MATERIALIZED (
  SELECT ev.vec_id, CAST(ev.d // 16 AS BIGINT) AS sub, cv.cid,
         sum((ev.xq - cv.cq) * (ev.xq - cv.cq)) AS dist
  FROM ev JOIN cv ON cv.d = ev.d GROUP BY 1, 2, 3
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, sub, CAST(cid AS BIGINT) AS code
FROM (SELECT vec_id, sub, cid,
             row_number() OVER (PARTITION BY vec_id, sub
                                ORDER BY dist ASC, cid ASC) AS rn
      FROM dists) WHERE rn = 1
ORDER BY vec_id, sub"""

ORACLES["jl_project"] = """WITH planes AS (
  SELECT j, d,
         CASE WHEN (\'0x\' || substr(md5(CAST(j AS VARCHAR) || \':\' ||
                                       CAST(d AS VARCHAR)), 1, 16))::UBIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(16) t(j) CROSS JOIN range(64) r(d)
),
ev AS MATERIALIZED (
  SELECT vec_id, CAST(floor(x * 1048576.0) AS BIGINT) AS xq, ord - 1 AS d
  FROM (SELECT vec_id, embedding AS l FROM embeddings),
       LATERAL (SELECT unnest(l) AS x, generate_subscripts(l, 1) AS ord) AS u
)
SELECT CAST(ev.vec_id AS BIGINT) AS vec_id, CAST(p.j AS BIGINT) AS dim,
       round(sum(ev.xq * p.s) / (sqrt(16.0) * 1048576.0), 6) AS val
FROM ev JOIN planes p ON p.d = ev.d
GROUP BY 1, 2 ORDER BY vec_id, dim"""

ORACLES["pq_knn"] = """WITH ev AS MATERIALIZED (
  SELECT vec_id, CAST(floor(x * 1048576.0) AS BIGINT) AS xq, ord - 1 AS d
  FROM (SELECT vec_id, embedding AS l FROM embeddings),
       LATERAL (SELECT unnest(l) AS x, generate_subscripts(l, 1) AS ord) AS u
),
cent AS (
  SELECT vec_id AS cid FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
cv AS MATERIALIZED (
  SELECT c.cid, ev.d, ev.xq AS cq FROM cent c JOIN ev ON ev.vec_id = c.cid
),
dists AS MATERIALIZED (
  SELECT ev.vec_id, CAST(ev.d // 16 AS BIGINT) AS sub, cv.cid,
         sum((ev.xq - cv.cq) * (ev.xq - cv.cq)) AS dist
  FROM ev JOIN cv ON cv.d = ev.d GROUP BY 1, 2, 3
),
assign AS (
  SELECT vec_id, sub, cid FROM (
    SELECT vec_id, sub, cid,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist ASC, cid ASC) AS rn
    FROM dists) WHERE rn = 1
),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
qlut AS (
  SELECT d.vec_id AS query_id, d.sub, d.cid, d.dist
  FROM dists d JOIN qids ON qids.vec_id = d.vec_id
),
ad AS (
  SELECT q.query_id, a.vec_id, sum(q.dist) AS adist
  FROM assign a JOIN qlut q ON q.sub = a.sub AND q.cid = a.cid
  GROUP BY 1, 2
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(adist AS BIGINT) AS adist,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY adist ASC, vec_id ASC) AS BIGINT) AS rank
FROM ad QUALIFY rank <= 10 ORDER BY query_id, rank"""

ORACLES["pmi_collocations"] = """WITH tt AS (
  SELECT CASE WHEN trim(coalesce(text, \'\')) = \'\' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), \'\\s+\') END AS toks
  FROM documents),
tok AS (SELECT unnest(toks) AS tok FROM tt),
uni AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
p AS (SELECT toks[i] AS tok_a, toks[i+1] AS tok_b
      FROM tt, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) u
      WHERE i + 1 <= len(toks)),
bg AS (SELECT tok_a, tok_b, count(*) AS n FROM p GROUP BY 1, 2),
tot AS (SELECT sum(n) AS N FROM bg)
SELECT tok_a, tok_b, CAST(bg.n AS BIGINT) AS n,
       round(ln(CAST(tot.N AS DOUBLE) * bg.n / (ua.c * ub.c)), 6) AS pmi
FROM bg CROSS JOIN tot
JOIN uni ua ON ua.tok = bg.tok_a JOIN uni ub ON ub.tok = bg.tok_b
WHERE bg.n >= 5
ORDER BY pmi DESC, tok_a, tok_b LIMIT 50"""

ORACLES["bm25_topk"] = """WITH tt AS (
  SELECT doc_id,
         CASE WHEN trim(coalesce(text, \'\')) = \'\' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), \'\\s+\') END AS toks
  FROM documents),
stats AS (SELECT count(*) AS N, avg(len(toks)) AS avgdl FROM tt),
f AS (SELECT doc_id, unnest(toks) AS tok FROM tt),
q AS (SELECT unnest([\'column\', \'hash\', \'join\']) AS tok),
tf AS (SELECT f.doc_id, f.tok, count(*) AS tf FROM f JOIN q USING (tok)
       GROUP BY 1, 2),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, len(toks) AS dl FROM tt),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.N - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, round(score, 6) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 10"""


# ngram_scrub: the Lee et al. removal step — coverage/span arithmetic over
# the SAME mix64 gram chain as repeated_ngrams; span heads via window lag.
ORACLES["ngram_scrub"] = f"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(coalesce(text, '')) <> ''
),
th AS (
  SELECT doc_id, len(ts) AS n_tok,
         list_transform(ts, t -> {_TOKEN_HASH_SQL}) AS hs
  FROM toks
),
grams AS (
  SELECT doc_id, i,
         list_reduce(list_prepend(CAST(0 AS UBIGINT), hs[i:i + {_NGRAM_N - 1}]),
                     {_GRAM_LAMBDA_SQL}) AS gram
  FROM th, LATERAL (SELECT unnest(range(1, len(hs) - {_NGRAM_N} + 2)) AS i) u
  WHERE n_tok >= {_NGRAM_N}
),
rep AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT g.doc_id, g.i + o.o AS p
  FROM grams g JOIN rep USING (gram),
       LATERAL (SELECT unnest(range(0, {_NGRAM_N})) AS o) o
),
covn AS (SELECT doc_id, count(*) AS n_covered FROM cov GROUP BY doc_id),
spans AS (
  SELECT doc_id, count(*) AS n_spans FROM (
    SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp
    FROM cov
  ) WHERE pp IS NULL OR p - pp > 1 GROUP BY doc_id)
SELECT t.doc_id, CAST(t.n_tok AS BIGINT) AS n_tok,
       CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_covered,
       CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(t.n_tok - coalesce(c.n_covered, 0) AS BIGINT) AS keep_tok
FROM th t LEFT JOIN covn c USING (doc_id) LEFT JOIN spans s USING (doc_id)
ORDER BY t.doc_id"""


# betweenness4: Brandes from landmarks {1,2,5,7}, depth-4 truncated,
# programmatically unrolled level-synchronous sigma + dependency CTEs
# (same pattern as the other unrolled BFS-family oracles).
_BC_SOURCES = [1, 2, 5, 7]
_BC_D = 4


def _bc_sql(sources, D):
    srcs = ", ".join(f"CAST({s} AS BIGINT)" for s in sources)
    parts = [
        f"reach(source, v, d) AS (SELECT s.v, s.v, CAST(0 AS BIGINT) "
        f"FROM (SELECT unnest([{srcs}]) AS v) s "
        f"UNION SELECT reach.source, eb.dst, reach.d + 1 "
        f"FROM reach JOIN ebin eb ON eb.src = reach.v WHERE reach.d < {D})",
        "md AS (SELECT source, v, min(d) AS dist FROM reach "
        "GROUP BY source, v)",
        f"sig0 AS (SELECT v AS source, v, CAST(1 AS DOUBLE) AS sigma "
        f"FROM (SELECT unnest([{srcs}]) AS v))",
    ]
    for k in range(1, D + 1):
        parts.append(
            f"sig{k} AS (SELECT s.source, eb.dst AS v, "
            f"CAST(sum(s.sigma) AS DOUBLE) AS sigma "
            f"FROM sig{k - 1} s JOIN ebin eb ON eb.src = s.v "
            f"JOIN md m ON m.source = s.source AND m.v = eb.dst "
            f"AND m.dist = {k} GROUP BY 1, 2)")
    parts.append("sig AS (" + " UNION ALL ".join(
        f"SELECT source, v, sigma, {k} AS dist FROM sig{k}"
        for k in range(D + 1)) + ")")
    parts.append(
        f"delta{D} AS (SELECT CAST(NULL AS BIGINT) AS source, "
        f"CAST(NULL AS BIGINT) AS v, CAST(0 AS DOUBLE) AS delta "
        f"WHERE 1 = 0)")
    for k in range(D - 1, -1, -1):
        parts.append(
            f"delta{k} AS (SELECT m.source, m.v, "
            f"coalesce(x.delta, 0) AS delta FROM md m LEFT JOIN ("
            f"SELECT sv.source, sv.v, sum(sv.sigma / sw.sigma * "
            f"(1 + coalesce(dn.delta, 0))) AS delta "
            f"FROM sig sv JOIN ebin eb ON eb.src = sv.v "
            f"JOIN sig sw ON sw.source = sv.source AND sw.v = eb.dst "
            f"AND sw.dist = {k + 1} "
            f"LEFT JOIN delta{k + 1} dn ON dn.source = sv.source "
            f"AND dn.v = eb.dst "
            f"WHERE sv.dist = {k} GROUP BY 1, 2"
            f") x ON x.source = m.source AND x.v = m.v "
            f"WHERE m.dist = {k})")
    alld = " UNION ALL ".join(f"SELECT * FROM delta{k}" for k in range(D))
    return ("WITH RECURSIVE " + _E + ", " + _EBIN + ",\n"
            + ",\n".join(parts)
            + f"\nSELECT v, round(sum(delta), 6) AS bc FROM ({alld}) "
            "WHERE v <> source GROUP BY v ORDER BY v")


ORACLES["betweenness4"] = _bc_sql(_BC_SOURCES, _BC_D)


# modularity7: directed Newman-Leicht modularity of the v % 7 partition
# over the distinct edge set; identical float expression order as
# metrics.modularity (e/m - (dout/m)*(din/m), DOUBLE casts).
ORACLES["modularity7"] = f"""WITH {_E}, {_EBIN},
lab AS (SELECT v, v % 7 AS label
        FROM (SELECT src AS v FROM ebin UNION SELECT dst AS v FROM ebin)),
j AS (SELECT ls.label AS lsrc, ld.label AS ldst FROM ebin
      JOIN lab ls ON ls.v = ebin.src JOIN lab ld ON ld.v = ebin.dst),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM j),
douts AS (SELECT lsrc AS label, count(*) AS dout FROM j GROUP BY 1),
dins AS (SELECT ldst AS label, count(*) AS din FROM j GROUP BY 1),
eins AS (SELECT lsrc AS label, count(*) AS e_in FROM j
         WHERE lsrc = ldst GROUP BY 1),
base AS (SELECT DISTINCT label FROM lab)
SELECT b.label,
       CAST(coalesce(ei.e_in, 0) AS BIGINT) AS e_in,
       CAST(coalesce(do_.dout, 0) AS BIGINT) AS dout,
       CAST(coalesce(di.din, 0) AS BIGINT) AS din,
       round(coalesce(ei.e_in, 0) / t.m
             - (coalesce(do_.dout, 0) / t.m)
               * (coalesce(di.din, 0) / t.m), 6) AS q
FROM base b
LEFT JOIN eins ei USING (label)
LEFT JOIN douts do_ USING (label)
LEFT JOIN dins di USING (label)
CROSS JOIN tot t
ORDER BY b.label"""


def _hyperball_sql(radius: int, p: int) -> str:
    """HyperBall ANF oracle: register init = the _hll_sql hash/ladder on
    vertex ids, ball membership via hop-bounded recursive reach, then the
    HLL estimate (generic-alpha + linear-counting) per (v, t)."""
    m = 1 << p
    m_bits = 64 - p
    h = _mix64_sql("CAST(v AS UBIGINT)")
    ladder = " ".join(
        f"WHEN w >= CAST({1 << (b - 1)} AS UBIGINT) THEN {m_bits - b + 1}"
        for b in range(m_bits, 0, -1))
    alpha = f"(0.7213 / (1 + 1.079 / {m}))"
    return f"""WITH RECURSIVE {_E}, {_EBIN}, {_N},
reach(v, u, d) AS (
  SELECT v, v, CAST(0 AS BIGINT) FROM n
  UNION
  SELECT reach.v, eb.dst, reach.d + 1
  FROM reach JOIN ebin eb ON eb.src = reach.u WHERE reach.d < {radius}
),
md AS (SELECT v, u, min(d) AS dist FROM reach GROUP BY v, u),
hx AS (SELECT v, {h} AS h FROM n),
ru AS (SELECT v AS u, CAST(h >> {m_bits} AS BIGINT) AS register,
       CAST(CASE {ladder} ELSE {m_bits + 1} END AS DOUBLE) AS rk
       FROM (SELECT v, h, h & CAST({(1 << m_bits) - 1} AS UBIGINT) AS w
             FROM hx)),
rt AS (SELECT m.v, tt.t, r.register, max(r.rk) AS maxrank
       FROM md m JOIN ru r ON r.u = m.u
       CROSS JOIN (SELECT unnest(range(1, {radius + 1})) AS t) tt
       WHERE m.dist <= tt.t GROUP BY 1, 2, 3),
ag AS (SELECT v, t, count(*) AS cnt, sum(pow(2.0, -maxrank)) AS sp
       FROM rt GROUP BY v, t),
e0 AS (SELECT v, t, cnt,
       ({alpha} * {m} * {m}) / (CAST({m} - cnt AS DOUBLE) + sp) AS est
       FROM ag)
SELECT v, CAST(t AS BIGINT) AS t,
       round(CASE WHEN est <= {2.5 * m} AND cnt < {m}
                  THEN {m} * ln({m} / CAST(greatest({m} - cnt, 1) AS DOUBLE))
                  ELSE est END, 6) AS est
FROM e0 ORDER BY v, t"""


ORACLES["hyperball2"] = _hyperball_sql(2, 4)


# adamic_adar: wedge join over the symmetric self-loop-free edge set,
# 1/ln(deg) of the middle vertex, restricted to existing edges (the
# same join shape as edge_support).
ORACLES["adamic_adar"] = f"""WITH {_E}, {_UE_NOSELF},
deg AS (SELECT src AS v, count(*) AS deg FROM ue GROUP BY 1)
SELECT s.src AS src, s.dst AS dst, round(sum(1.0 / ln(d.deg)), 6) AS aa
FROM ue s JOIN ue a ON a.src = s.src
JOIN ue b ON b.src = a.dst AND b.dst = s.dst
JOIN deg d ON d.v = a.dst
WHERE s.src < s.dst
GROUP BY s.src, s.dst
ORDER BY src, dst"""


# cocitation: masked A^T·A — # of common in-neighbors per existing edge.
ORACLES["cocitation"] = f"""WITH {_E}, {_EBIN}
SELECT m.src AS src, m.dst AS dst, CAST(count(*) AS BIGINT) AS cocite
FROM ebin m JOIN ebin a ON a.dst = m.src
JOIN ebin b ON b.src = a.src AND b.dst = m.dst
GROUP BY m.src, m.dst
ORDER BY src, dst"""


# wl_colors2: two 1-WL rounds. Round-1 literals fold on the Python side
# (c0 is a constant), round 2 is the genuine per-vertex multiset hash:
# HUGEINT sum mod 2^64 of mix64(c1(u)) over in-neighbors.
def _wl_sql() -> str:
    import numpy as np

    from raygraph.util import mix64

    k1 = 0x9E3779B97F4A7C15
    c0 = int(mix64(np.asarray([1], np.uint64))[0])
    m0 = int(mix64(np.asarray([c0], np.uint64))[0])    # mix64(c0)
    l0 = (c0 * k1) % _M64                              # c0 * K1 mod 2^64
    s1 = _mulmod_sql("CAST(coalesce(i.indeg, 0) AS UBIGINT)", m0)
    c1 = _mix64_sql(f"xor(CAST({l0} AS UBIGINT), {s1})")
    c2_arg = (f"xor({_mulmod_sql('c1.c', k1)}, "
              f"coalesce(s2.s, CAST(0 AS UBIGINT)))")
    return f"""WITH {_E}, {_EBIN}, {_N},
ind AS (SELECT dst AS v, count(*) AS indeg FROM ebin GROUP BY 1),
c1 AS (SELECT n.v, {c1} AS c
       FROM n LEFT JOIN ind i ON i.v = n.v),
m1 AS (SELECT v, {_mix64_sql('c')} AS m FROM c1),
s2 AS (SELECT eb.dst AS v,
       CAST(sum(CAST(m.m AS HUGEINT)) % {_M64} AS UBIGINT) AS s
       FROM ebin eb JOIN m1 m ON m.v = eb.src GROUP BY 1),
c2 AS (SELECT c1.v, {_mix64_sql(c2_arg)} AS c
       FROM c1 LEFT JOIN s2 ON s2.v = c1.v)
SELECT v, lpad(lower(to_hex(c)), 16, '0') AS color FROM c2 ORDER BY v"""


ORACLES["wl_colors2"] = _wl_sql()


def _msf_sql(rounds: int = 8) -> str:
    """Chained Borůvka: round i picks each component's min incident
    cross edge under (w, u, v), merges components via a recursive
    min-label reach over the selected component graph, repeats.
    Components at least halve per round, so ceil(log2(211)) = 8 rounds
    always reach the fixpoint at the fixture's vertex count; validated
    edge-for-edge against Kruskal under the same tie-break."""
    parts = [_E,
             """uw AS MATERIALIZED (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v,
         round(min(w), 6) AS w
  FROM e WHERE src <> dst GROUP BY 1, 2)""",
             "comp0 AS MATERIALIZED (SELECT x AS v, x AS c FROM "
             "(SELECT u AS x FROM uw UNION SELECT v FROM uw))"]
    for i in range(1, rounds + 1):
        parts += [
            f"""xe{i} AS MATERIALIZED (
  SELECT c1.c AS cu, c2.c AS cv, e.u, e.v, e.w
  FROM uw e JOIN comp{i-1} c1 ON c1.v = e.u JOIN comp{i-1} c2 ON c2.v = e.v
  WHERE c1.c <> c2.c)""",
            f"""sel{i} AS MATERIALIZED (
  SELECT c, u, v, w FROM (
    SELECT c, u, v, w,
           row_number() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM (SELECT cu AS c, w, u, v FROM xe{i}
          UNION ALL SELECT cv, w, u, v FROM xe{i})
  ) WHERE rn = 1)""",
            f"""ceb{i} AS (
  SELECT x.cu AS a, x.cv AS b
  FROM (SELECT DISTINCT u, v FROM sel{i}) s
  JOIN xe{i} x ON x.u = s.u AND x.v = s.v
  UNION
  SELECT x.cv, x.cu
  FROM (SELECT DISTINCT u, v FROM sel{i}) s
  JOIN xe{i} x ON x.u = s.u AND x.v = s.v)""",
            f"""reach{i}(c, l) AS (
  SELECT c, c FROM (SELECT DISTINCT c FROM comp{i-1})
  UNION
  SELECT cb.a, r.l FROM reach{i} r JOIN ceb{i} cb ON cb.b = r.c)""",
            f"""nl{i} AS MATERIALIZED (
  SELECT c, min(l) AS nl FROM reach{i} GROUP BY c)""",
            f"""comp{i} AS MATERIALIZED (
  SELECT p.v, n.nl AS c FROM comp{i-1} p JOIN nl{i} n ON n.c = p.c)""",
        ]
    sel = " UNION ALL ".join(f"SELECT u, v, w FROM sel{i}"
                             for i in range(1, rounds + 1))
    return ("WITH RECURSIVE " + ",\n".join(parts)
            + f"""\nSELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       round(w, 6) AS w
FROM (SELECT DISTINCT u, v, w FROM ({sel})) ORDER BY u, v""")


ORACLES["msf_edges"] = _msf_sql(8)


def _eigen_sql(k: int = 8) -> str:
    """Power iteration x_i = A^T x_{i-1} from x_0 = 1, final L2
    normalization (eigen_k8). MATERIALIZED per iteration (see
    _hits_sql note)."""
    parts = [_E, _EBIN, _N,
             "x0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS x FROM n)"]
    for i in range(1, k + 1):
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT n.v, coalesce(s.x, 0) AS x "
            f"FROM n LEFT JOIN (SELECT eb.dst AS v, sum(x.x) AS x "
            f"FROM ebin eb JOIN x{i - 1} x ON x.v = eb.src GROUP BY 1) s "
            f"ON s.v = n.v)")
    return ("WITH " + ",\n".join(parts) +
            f"""
SELECT v, round(x / (SELECT sqrt(sum(x * x)) FROM x{k}), 6) AS eig
FROM x{k} ORDER BY v""")


ORACLES["eigen_k8"] = _eigen_sql(8)


def _salsa_sql(k: int = 4) -> str:
    """SALSA unrolled: a_i = D_out^-T A^T h_{i-1}, h_i = D_in^-T A a_i
    from h_0 = 1; final L1 normalization of each. The per-edge factor
    is h.x * (1.0/d) — multiply by reciprocal, matching the engine's
    fold of the inverse-degree vector into the scatter."""
    parts = [_E, _EBIN, _N,
             "od AS MATERIALIZED (SELECT src AS v, count(*) AS d "
             "FROM ebin GROUP BY 1)",
             "idg AS MATERIALIZED (SELECT dst AS v, count(*) AS d "
             "FROM ebin GROUP BY 1)",
             "h0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS x FROM n)"]
    prev_h = "h0"
    for i in range(1, k + 1):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT eb.dst AS v, "
            f"sum(h.x * (1.0 / od.d)) AS x FROM ebin eb "
            f"JOIN {prev_h} h ON h.v = eb.src "
            f"JOIN od ON od.v = eb.src GROUP BY 1)")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT eb.src AS v, "
            f"sum(a.x * (1.0 / idg.d)) AS x FROM ebin eb "
            f"JOIN a{i} a ON a.v = eb.dst "
            f"JOIN idg ON idg.v = eb.dst GROUP BY 1)")
        prev_h = f"h{i}"
    return ("WITH " + ",\n".join(parts) +
            f"""
SELECT n.v,
       round(coalesce(h.x, 0) / (SELECT sum(x) FROM h{k}), 6) AS hub,
       round(coalesce(a.x, 0) / (SELECT sum(x) FROM a{k}), 6) AS auth
FROM n LEFT JOIN h{k} h ON h.v = n.v LEFT JOIN a{k} a ON a.v = n.v
ORDER BY n.v""")


ORACLES["salsa_k4"] = _salsa_sql(4)


# rich-club coefficient at k in {1,2,4,8,16,32} (integer-exact ppm)
ORACLES["rich_club"] = f"""WITH {_E},
ud AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
       FROM e WHERE src <> dst),
deg AS (SELECT v, count(*) AS dg FROM
        (SELECT s AS v FROM ud UNION ALL SELECT d FROM ud) GROUP BY v),
ks(k) AS (VALUES (1), (2), (4), (8), (16), (32)),
em AS (SELECT least(da.dg, db.dg) AS m FROM ud
       JOIN deg da ON da.v = ud.s JOIN deg db ON db.v = ud.d),
nk AS (SELECT ks.k, count(*) AS n_nodes FROM ks
       JOIN deg ON deg.dg > ks.k GROUP BY 1),
ek AS (SELECT ks.k, count(*) AS n_edges FROM ks
       JOIN em ON em.m > ks.k GROUP BY 1)
SELECT CAST(nk.k AS BIGINT) AS k,
       CAST(nk.n_nodes AS BIGINT) AS n_nodes,
       CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(2 * coalesce(ek.n_edges, 0) * 1000000
            // (nk.n_nodes * (nk.n_nodes - 1)) AS BIGINT) AS phi_ppm
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.n_nodes >= 2 ORDER BY k"""


# ordered funnel view -> click -> purchase, strictly-after earliest-match
ORACLES["events_funnel"] = """WITH
s1 AS (SELECT user_id, min(ts) AS t FROM events
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
       WHERE e.event_type = 'click' GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
       WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
ORDER BY step"""


# within-doc repeated 3-gram ratio; same mix64 gram-chain keys as
# repeated_ngrams, grouped per (doc, gram)
_REP_N = 3
ORACLES["doc_repetition"] = f"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(coalesce(text, '')) <> ''
),
th AS (
  SELECT doc_id, list_transform(ts, t -> {_TOKEN_HASH_SQL}) AS hs
  FROM toks WHERE len(ts) >= {_REP_N}
),
grams AS (
  SELECT doc_id, list_reduce(
           list_prepend(CAST(0 AS UBIGINT), hs[i:i + {_REP_N - 1}]),
           {_GRAM_LAMBDA_SQL}) AS g
  FROM th, LATERAL (SELECT unnest(range(1, len(hs) - {_REP_N} + 2)) AS i) u
),
per AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1000000
            // sum(c) AS BIGINT) AS dup_ppm
FROM per GROUP BY doc_id ORDER BY doc_id"""


# per-doc unigram Shannon entropy: ln(m) - sum(c*ln(c))/m, same
# algebraic form as text.doc_entropy
ORACLES["doc_entropy"] = """WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(coalesce(text, '')) <> ''
),
wds AS (SELECT doc_id, unnest(ts) AS w FROM toks),
c AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS c
      FROM wds GROUP BY 1, 2),
m AS (SELECT doc_id, sum(c) AS m FROM c GROUP BY 1)
SELECT c.doc_id,
       CAST(m.m AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(ln(m.m) - sum(c.c * ln(c.c)) / m.m, 6) AS entropy
FROM c JOIN m ON m.doc_id = c.doc_id
GROUP BY c.doc_id, m.m ORDER BY c.doc_id"""


# longest-path levels of the SCC condensation DAG (set-recursive on
# distinct (comp, level) pairs, bounded by depth — terminates on DAGs)
ORACLES["scc_levels"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_N},
nd AS (SELECT DISTINCT v FROM n),
reach(a, b) AS (
  SELECT src, dst FROM ebin
  UNION
  SELECT r.a, eb.dst FROM reach r JOIN ebin eb ON eb.src = r.b
),
mut AS (SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a),
lab AS (SELECT nd.v AS v, least(nd.v, coalesce(m.mn, nd.v)) AS scc
        FROM nd LEFT JOIN (SELECT v, min(u) AS mn FROM mut GROUP BY 1) m
        ON m.v = nd.v),
ce AS (SELECT DISTINCT la.scc AS cfrom, lb.scc AS cto
       FROM ebin e JOIN lab la ON la.v = e.src
                   JOIN lab lb ON lb.v = e.dst
       WHERE la.scc <> lb.scc),
comps AS (SELECT DISTINCT scc AS c FROM lab),
lvl(c, l) AS (
  SELECT c, CAST(0 AS BIGINT) FROM comps
  UNION
  SELECT ce.cto, lvl.l + 1 FROM lvl JOIN ce ON ce.cfrom = lvl.c)
SELECT CAST(c AS BIGINT) AS comp, CAST(max(l) AS BIGINT) AS level
FROM lvl GROUP BY c ORDER BY comp"""


# bow-tie decomposition: CORE = largest SCC (ties -> min label),
# OUT = forward-reached from the core's min member, IN = backward-
# reached, OTHER = rest
ORACLES["bowtie"] = f"""WITH RECURSIVE {_E}, {_EBIN}, {_N},
nd AS (SELECT DISTINCT v FROM n),
reach(a, b) AS (
  SELECT src, dst FROM ebin
  UNION
  SELECT r.a, eb.dst FROM reach r JOIN ebin eb ON eb.src = r.b
),
mut AS (SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a),
lab AS (SELECT nd.v AS v, least(nd.v, coalesce(m.mn, nd.v)) AS scc
        FROM nd LEFT JOIN (SELECT v, min(u) AS mn FROM mut GROUP BY 1) m
        ON m.v = nd.v),
sz AS (SELECT scc, count(*) AS c FROM lab GROUP BY 1),
core AS (SELECT min(scc) AS scc FROM sz
         WHERE c = (SELECT max(c) FROM sz)),
r AS (SELECT min(v) AS v FROM lab WHERE scc = (SELECT scc FROM core)),
fwd AS (SELECT b AS v FROM reach WHERE a = (SELECT v FROM r)
        UNION SELECT v FROM r),
bwd AS (SELECT a AS v FROM reach WHERE b = (SELECT v FROM r)
        UNION SELECT v FROM r)
SELECT CAST(lab.v AS BIGINT) AS v,
       CASE WHEN lab.scc = (SELECT scc FROM core) THEN 'core'
            WHEN lab.v IN (SELECT v FROM fwd) THEN 'out'
            WHEN lab.v IN (SELECT v FROM bwd) THEN 'in'
            ELSE 'other' END AS cls
FROM lab ORDER BY v"""


def _pagerank_dangling_sql(k: int = 8, damping: float = 0.85) -> str:
    """PageRank with exact dangling-mass redistribution, unrolled;
    MATERIALIZED per iteration (see _hits_sql note)."""
    parts = [
        _E, _EBIN, _N,
        "dout AS MATERIALIZED (SELECT src, count(*) AS c "
        "FROM ebin GROUP BY 1)",
        "nn AS MATERIALIZED (SELECT count(*) AS c FROM n)",
        "r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT c FROM nn) AS score "
        "FROM n)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""dgl{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.score), 0) AS m FROM r{i-1} r
  LEFT JOIN dout d ON d.src = r.v WHERE d.src IS NULL)""")
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT n.v,
         ({1 - damping} / (SELECT c FROM nn))
         + ({damping} * (SELECT m FROM dgl{i}) / (SELECT c FROM nn))
         + COALESCE(s.x, 0) AS score
  FROM n LEFT JOIN (
    SELECT eb.dst AS v, sum(r{i-1}.score * ({damping} * (1.0 / d.c))) AS x
    FROM ebin eb
    JOIN r{i-1} ON r{i-1}.v = eb.src
    JOIN dout d ON d.src = eb.src
    GROUP BY eb.dst
  ) s ON s.v = n.v)""")
    return ("WITH " + ",\n".join(parts) +
            f"""
SELECT v, round(score, 6) AS score FROM r{k} ORDER BY v""")


ORACLES["pagerank_dangling_k8"] = _pagerank_dangling_sql(8)


# component size histogram + giant-component fraction (exact ppm)
ORACLES["cc_sizes"] = f"""WITH RECURSIVE {_E}, {_UE}, {_N},
reach(v, r) AS (
  SELECT v, v FROM n
  UNION
  SELECT ue.dst, reach.r FROM reach JOIN ue ON ue.src = reach.v
),
lab AS (SELECT v, min(r) AS label FROM reach GROUP BY v),
cs AS (SELECT label, count(*) AS sz FROM lab GROUP BY 1),
tot AS (SELECT count(*) AS n FROM lab),
g AS (SELECT max(sz) AS giant FROM cs)
SELECT CAST(sz AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST((SELECT giant FROM g) * 1000000
            // (SELECT n FROM tot) AS BIGINT) AS giant_ppm
FROM cs GROUP BY sz ORDER BY size"""


# embedding near-dup clusters: CC over the exact all-pairs cosine
# graph at the emb_near_dups threshold
ORACLES["emb_clusters"] = """WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
)
SELECT node AS vec_id, min(r) AS keep_id FROM reach GROUP BY 1
ORDER BY vec_id"""


# directed triad census (reduced): transitive closures vs 3-cycles
ORACLES["triad_counts"] = f"""WITH {_E},
eb AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
p2 AS (SELECT a.src AS u, b.dst AS w, count(*) AS c
       FROM eb a JOIN eb b ON b.src = a.dst
       WHERE a.src <> b.dst GROUP BY 1, 2),
tr AS (SELECT coalesce(sum(c), 0) AS t FROM p2
       JOIN eb ON eb.src = p2.u AND eb.dst = p2.w),
cy AS (SELECT coalesce(sum(c), 0) AS t FROM p2
       JOIN eb ON eb.src = p2.w AND eb.dst = p2.u)
SELECT CAST((SELECT t FROM tr) AS BIGINT) AS n_transitive,
       CAST((SELECT t FROM cy) // 3 AS BIGINT) AS n_cyclic"""


# hard negatives: most-similar different-label vector, ties -> min id
ORACLES["hard_negatives"] = """SELECT vec_id, neg_id FROM (
  SELECT a.vec_id AS vec_id, b.vec_id AS neg_id,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.vec_id ASC) AS rn
  FROM embeddings a JOIN embeddings b
    ON b.vec_id <> a.vec_id AND b.label <> a.label
) WHERE rn = 1 ORDER BY vec_id"""


# weekly cohort retention triangle (integer epoch-us arithmetic)
ORACLES["events_retention"] = """WITH f AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1
),
a AS (
  SELECT DISTINCT e.user_id,
         epoch_us(f.t0) // 604800000000 AS cohort,
         (epoch_us(e.ts) - epoch_us(f.t0)) // 604800000000 AS week_offset
  FROM events e JOIN f ON f.user_id = e.user_id
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(week_offset AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2 ORDER BY cohort, week_offset"""


# per-type z-score outliers, threshold on the ROUNDED z (same keep
# rule as the engine; population std, same algebraic form)
ORACLES["events_outliers"] = """WITH st AS (
  SELECT event_type, count(*) AS n, sum(value) AS s,
         sum(value * value) AS s2
  FROM events GROUP BY 1
),
z AS (
  SELECT e.event_id, e.event_type, e.value,
         round(CASE WHEN sqrt(greatest(st.s2 / st.n
                       - (st.s / st.n) * (st.s / st.n), 0)) > 0
               THEN (e.value - st.s / st.n)
                    / sqrt(greatest(st.s2 / st.n
                       - (st.s / st.n) * (st.s / st.n), 0))
               ELSE 0 END, 6) AS z
  FROM events e JOIN st ON st.event_type = e.event_type
)
SELECT event_id, event_type, round(value, 6) AS value, z
FROM z WHERE abs(z) >= 2.5 ORDER BY event_id"""


# s-metric: sum of endpoint-degree products over undirected edges
ORACLES["s_metric"] = f"""WITH {_E},
ud AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
       FROM e WHERE src <> dst),
deg AS (SELECT v, count(*) AS dg FROM
        (SELECT s AS v FROM ud UNION ALL SELECT d FROM ud) GROUP BY v)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(da.dg * db.dg) AS BIGINT) AS s_metric
FROM ud JOIN deg da ON da.v = ud.s JOIN deg db ON db.v = ud.d"""


# bipartite projection: suppliers sharing distinct parts
ORACLES["cosupplier_graph"] = """WITH pv AS (
  SELECT DISTINCT l_partkey AS k, l_suppkey AS v FROM lineitem
)
SELECT a.v AS a, b.v AS b, CAST(count(*) AS BIGINT) AS n_shared
FROM pv a JOIN pv b ON b.k = a.k AND b.v > a.v
GROUP BY 1, 2 ORDER BY a, b"""


# A-ES weighted sample: key = -ln(u)/w, u from the first 52 md5 bits
ORACLES["doc_weighted_sample"] = """SELECT doc_id, n_chars FROM (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (ORDER BY
           -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                AS BIGINT) + 1) / 4503599627370496.0) / n_chars,
           doc_id) AS rn
  FROM documents WHERE n_chars > 0
) WHERE rn <= 50 ORDER BY doc_id"""


# per-user consecutive event-type transitions, (ts, event_id) order
ORACLES["events_transitions"] = """WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2 ORDER BY from_type, to_type"""


# k-means (k=8): md5 seed, one exact integer Lloyd step, final assign;
# floor-mean spelled to match numpy's negative-floor semantics
ORACLES["emb_kmeans"] = """WITH ev AS MATERIALIZED (
  SELECT vec_id, CAST(floor(x * 1048576.0) AS BIGINT) AS xq, ord - 1 AS d
  FROM (SELECT vec_id, embedding AS l FROM embeddings),
       LATERAL (SELECT unnest(l) AS x, generate_subscripts(l, 1) AS ord) AS u
),
cent AS MATERIALIZED (
  SELECT vec_id AS cid,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                            vec_id) - 1 AS pos
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
cv0 AS MATERIALIZED (
  SELECT c.pos, ev.d, ev.xq FROM cent c JOIN ev ON ev.vec_id = c.cid
),
d0 AS MATERIALIZED (
  SELECT ev.vec_id, cv0.pos, sum(ev.xq * cv0.xq) AS dot
  FROM ev JOIN cv0 ON cv0.d = ev.d GROUP BY 1, 2
),
a0 AS MATERIALIZED (
  SELECT vec_id, pos FROM (
    SELECT vec_id, pos, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dot DESC, pos ASC) AS rn FROM d0
  ) WHERE rn = 1
),
sums AS MATERIALIZED (
  SELECT a0.pos, ev.d, sum(ev.xq) AS s, count(*) AS cnt
  FROM a0 JOIN ev ON ev.vec_id = a0.vec_id GROUP BY 1, 2
),
cv1 AS MATERIALIZED (
  SELECT pos, d, (s - ((s % cnt) + cnt) % cnt) // cnt AS xq FROM sums
  UNION ALL
  SELECT cv0.pos, cv0.d, cv0.xq FROM cv0
  WHERE cv0.pos NOT IN (SELECT DISTINCT pos FROM sums)
),
d1 AS MATERIALIZED (
  SELECT ev.vec_id, cv1.pos, sum(ev.xq * cv1.xq) AS dot
  FROM ev JOIN cv1 ON cv1.d = ev.d GROUP BY 1, 2
)
SELECT vec_id, cluster FROM (
  SELECT vec_id, pos AS cluster,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dot DESC, pos ASC) AS rn
  FROM d1
) WHERE rn = 1 ORDER BY vec_id"""


# Pearson correlation of per-vertex in- vs out-degree (simple digraph)
ORACLES["inout_corr"] = f"""WITH {_E},
eb AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
nv AS (SELECT src AS v FROM eb UNION SELECT dst FROM eb),
od AS (SELECT src AS v, count(*) AS d FROM eb GROUP BY 1),
idg AS (SELECT dst AS v, count(*) AS d FROM eb GROUP BY 1),
xy AS (SELECT nv.v, coalesce(od.d, 0) AS x, coalesce(idg.d, 0) AS y
       FROM nv LEFT JOIN od ON od.v = nv.v LEFT JOIN idg ON idg.v = nv.v),
m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM xy)
SELECT CAST(n AS BIGINT) AS n_vertices,
       CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
       CAST(sxy AS BIGINT) AS sxy,
       round(CASE WHEN (n * sxx - sx * sx) > 0
                       AND (n * syy - sy * sy) > 0
                  THEN (n * sxy - sx * sy)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  ELSE 0 END, 6) AS corr
FROM m"""


# Zipf OLS fit over the top-100 vocabulary rank-frequency curve
ORACLES["vocab_zipf"] = """WITH v AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS token
        FROM documents)
  WHERE token <> ''
  GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 100
),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rk
      FROM v),
m AS (SELECT count(*) AS n, sum(ln(rk)) AS sx, sum(ln(cnt)) AS sy,
             sum(ln(rk) * ln(rk)) AS sxx, sum(ln(rk) * ln(cnt)) AS sxy,
             max(CASE WHEN rk = 1 THEN cnt END) AS top_cnt
      FROM r)
SELECT CAST(n AS BIGINT) AS n_tokens, top_cnt,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) AS intercept
FROM m"""


# dataset-card rollup per (source, lang), exact integer micro-units
ORACLES["doc_datasheet"] = """SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) * 1000000 // count(*) AS BIGINT) AS mean_chars_e6
FROM documents GROUP BY 1, 2 ORDER BY source, lang"""


def _lpa_seeded_sql(k: int = 3) -> str:
    """Seeded LPA unrolled: seeds 1/2/3 pinned to 9001/9002/9003 in the
    init AND re-pinned after every round (same CASE both sides)."""
    seed_case = ("CASE WHEN n.v = 1 THEN 9001 WHEN n.v = 2 THEN 9002 "
                 "WHEN n.v = 3 THEN 9003 ELSE {expr} END")
    parts = [_E, _UE_NOSELF, _N,
             "l0 AS (SELECT v, " +
             seed_case.replace("n.v", "v").format(expr="v") +
             " AS label FROM n)"]
    for i in range(1, k + 1):
        inner = f"COALESCE(w.label, l{i-1}.label)"
        parts.append(
            f"""l{i} AS (
  SELECT n.v, {seed_case.format(expr=inner)} AS label
  FROM n
  JOIN l{i-1} ON l{i-1}.v = n.v
  LEFT JOIN (
    SELECT dst AS v, label FROM (
      SELECT ue.dst, lp.label, count(*) AS cnt,
             row_number() OVER (PARTITION BY ue.dst
                                ORDER BY count(*) DESC, lp.label ASC) AS rn
      FROM ue JOIN l{i-1} lp ON lp.v = ue.src
      GROUP BY ue.dst, lp.label
    ) WHERE rn = 1
  ) w ON w.v = n.v
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT v, label FROM l{k} ORDER BY v")


ORACLES["lpa_seeded"] = _lpa_seeded_sql(3)


def _pagerank_pruned_sql(k: int = 8, topk: int = 5,
                         damping: float = 0.85) -> str:
    """PageRank over the top-``topk``-per-src pruned edge set
    (w desc, dst asc rank — the selectk_rowwise rule)."""
    parts = [
        _E,
        f"""ep AS (SELECT src, dst FROM (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY w DESC, dst ASC) AS rn
  FROM e) WHERE rn <= {topk})""",
        "ebin AS (SELECT DISTINCT src, dst FROM ep)",
        "n AS (SELECT src AS v FROM ebin UNION SELECT dst FROM ebin)",
        "dout AS (SELECT src, count(*) AS c FROM ebin GROUP BY 1)",
        "nn AS (SELECT count(*) AS c FROM n)",
        "r0 AS (SELECT v, 1.0 / (SELECT c FROM nn) AS score FROM n)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.v,
         ({1 - damping} / (SELECT c FROM nn))
         + {damping} * COALESCE(s.x, 0) AS score
  FROM n LEFT JOIN (
    SELECT eb.dst AS v, sum(r{i-1}.score / d.c) AS x
    FROM ebin eb
    JOIN r{i-1} ON r{i-1}.v = eb.src
    JOIN dout d ON d.src = eb.src
    GROUP BY eb.dst
  ) s ON s.v = n.v
)""")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT v, round(score, 6) AS score FROM r{k} ORDER BY v")


ORACLES["pagerank_pruned_k8"] = _pagerank_pruned_sql(8)


def _spectral_radius_sql(k: int = 9) -> str:
    """Power-iteration Rayleigh norm ratio sqrt(Σx9²)/sqrt(Σx8²)."""
    parts = [_E, _EBIN, _N,
             "x0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS x FROM n)"]
    for i in range(1, k + 1):
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT n.v, coalesce(s.x, 0) AS x "
            f"FROM n LEFT JOIN (SELECT eb.dst AS v, sum(x.x) AS x "
            f"FROM ebin eb JOIN x{i - 1} x ON x.v = eb.src GROUP BY 1) s "
            f"ON s.v = n.v)")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT round((SELECT sqrt(sum(x * x)) FROM x{k})
             / (SELECT sqrt(sum(x * x)) FROM x{k - 1}), 6) AS lambda_max""")


ORACLES["spectral_radius"] = _spectral_radius_sql(9)


# lang-ID confusion matrix vs the ground-truth lang column; acc_ppm on
# the diagonal (exact integer), 0 elsewhere
ORACLES["doc_lang_confusion"] = f"""WITH {_DOCQ_CTES},
j AS (SELECT d.lang, r.pred_lang FROM r
      JOIN documents d ON d.doc_id = r.doc_id),
c AS (SELECT lang, pred_lang, count(*) AS n FROM j GROUP BY 1, 2),
t AS (SELECT lang, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
       CAST(CASE WHEN c.lang = c.pred_lang
                 THEN c.n * 1000000 // t.tot ELSE 0 END AS BIGINT)
       AS acc_ppm
FROM c JOIN t ON t.lang = c.lang
ORDER BY c.lang, c.pred_lang"""


# quality-proportional A-ES sample: weight = the locked doc_quality
# score (rounded 6), key = -ln(u)/w on the first 52 md5 bits
ORACLES["doc_quality_sample"] = f"""WITH {_DOCQ_CTES},
qv AS (SELECT doc_id, {_QUALITY_EXPR} AS quality FROM r)
SELECT doc_id, quality FROM (
  SELECT doc_id, quality,
         row_number() OVER (ORDER BY
           -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                AS BIGINT) + 1) / 4503599627370496.0) / quality,
           doc_id) AS rn
  FROM qv WHERE quality > 0
) WHERE rn <= 25 ORDER BY doc_id"""


def _pagerank_host_sql(k: int = 8, damping: float = 0.85) -> str:
    """PageRank over the v%7-contracted binarized quotient graph."""
    parts = [
        _E,
        "ebin AS (SELECT DISTINCT src % 7 AS src, dst % 7 AS dst FROM e)",
        "n AS (SELECT src AS v FROM ebin UNION SELECT dst FROM ebin)",
        "dout AS (SELECT src, count(*) AS c FROM ebin GROUP BY 1)",
        "nn AS (SELECT count(*) AS c FROM n)",
        "r0 AS (SELECT v, 1.0 / (SELECT c FROM nn) AS score FROM n)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.v,
         ({1 - damping} / (SELECT c FROM nn))
         + {damping} * COALESCE(s.x, 0) AS score
  FROM n LEFT JOIN (
    SELECT eb.dst AS v, sum(r{i-1}.score / d.c) AS x
    FROM ebin eb
    JOIN r{i-1} ON r{i-1}.v = eb.src
    JOIN dout d ON d.src = eb.src
    GROUP BY eb.dst
  ) s ON s.v = n.v
)""")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT v, round(score, 6) AS score FROM r{k} ORDER BY v")


ORACLES["pagerank_host_k8"] = _pagerank_host_sql(8)


# cut size / volume / conductance of the even/odd bipartition
ORACLES["cut_metrics"] = f"""WITH {_E},
eb AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
m AS (SELECT
        sum(CASE WHEN src % 2 = 0 AND dst % 2 = 1 THEN 1 ELSE 0 END) AS cs,
        sum(CASE WHEN src % 2 = 1 AND dst % 2 = 0 THEN 1 ELSE 0 END) AS ct,
        sum(CASE WHEN src % 2 = 0 THEN 1 ELSE 0 END) AS vs,
        sum(CASE WHEN src % 2 = 1 THEN 1 ELSE 0 END) AS vt
      FROM eb)
SELECT CAST(cs AS BIGINT) AS cut_st, CAST(ct AS BIGINT) AS cut_ts,
       CAST(vs AS BIGINT) AS vol_s, CAST(vt AS BIGINT) AS vol_t,
       CAST((cs + ct) * 1000000 // greatest(least(vs, vt), 1) AS BIGINT)
       AS conductance_ppm
FROM m"""


# Gini coefficient of the undirected degree distribution (exact ppm);
# ranks over sorted degrees, ties broken arbitrarily — the Σ(2i-n-1)d_i
# numerator is tie-order invariant (equal d share any rank order)
ORACLES["degree_gini"] = f"""WITH {_E},
ud AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
       FROM e WHERE src <> dst),
deg AS (SELECT v, count(*) AS dg FROM
        (SELECT s AS v FROM ud UNION ALL SELECT d FROM ud) GROUP BY v),
r AS (SELECT dg, row_number() OVER (ORDER BY dg) AS i,
             count(*) OVER () AS n FROM deg),
m AS (SELECT max(n) AS n, sum(dg) AS tot,
             sum((2 * i - n - 1) * dg) AS num FROM r)
SELECT CAST(n AS BIGINT) AS n_vertices,
       CAST(tot AS BIGINT) AS sum_deg,
       CAST(num * 1000000 // (n * tot) AS BIGINT) AS gini_ppm
FROM m"""
