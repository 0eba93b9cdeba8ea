"""DuckDB oracle-SQL builders for the driver's correctness gate.

Every implemented operator exposes (a) a Spark query in
``__spark_entry__.queries()`` and (b) an equivalent ANSI-SQL string here,
runnable by DuckDB over the same parquet (testdata views + fixture files).
SQL is generated from the same constants the Spark operators use
(stopword lists, minhash params, trigger maps), so the two sides cannot
drift apart silently.
"""

from __future__ import annotations

from kgp.ops.dedup import MINHASH_P, MINHASH_SEED_A, MINHASH_SEED_B
from kgp.ops.textstats import BPE_ISH_RE, LANGS, STOPWORDS

# ---------------------------------------------------------------------------
# KG pipeline oracles (fixture-backed)
# ---------------------------------------------------------------------------


def doc_assembly_sql(transcripts_path: str, max_turns_per_doc: int) -> str:
    return f"""
SELECT conv_id,
       CAST(turn_idx // {max_turns_per_doc} AS BIGINT) AS seg,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM read_parquet('{transcripts_path}')
GROUP BY conv_id, turn_idx // {max_turns_per_doc}
"""


def gold_sql(gold_path: str) -> str:
    return f"SELECT * FROM read_parquet('{gold_path}')"


def re_pairs_sql(gold_mentions_path: str) -> str:
    return f"""
SELECT a.mention_id AS a_mention_id, b.mention_id AS b_mention_id
FROM read_parquet('{gold_mentions_path}') a
JOIN read_parquet('{gold_mentions_path}') b
  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx AND a.start < b.start
"""


def coref_pairs_sql(gold_mentions_path: str, window: int) -> str:
    return f"""
SELECT a.mention_id AS a_mention_id, b.mention_id AS b_mention_id
FROM read_parquet('{gold_mentions_path}') a
JOIN read_parquet('{gold_mentions_path}') b
  ON a.conv_id = b.conv_id
 AND b.turn_idx - a.turn_idx BETWEEN 0 AND {window}
 AND (a.turn_idx < b.turn_idx OR (a.turn_idx = b.turn_idx AND a.start < b.start))
"""


def kgat_edges_sql() -> str:
    """loader_kgat construct over lineitem-derived kg + orders-derived cf.

    kg: (l_partkey, 0, l_suppkey) distinct; cf: (o_custkey, l_partkey).
    Mirrors kgp.stages.graph.kgat_construct arithmetic exactly.
    """
    return """
WITH kg AS (SELECT DISTINCT l_partkey AS h, 0 AS r, l_suppkey AS t FROM lineitem),
 stats AS (SELECT (max(r)+1) AS n_rel, (greatest(max(h), max(t))+1) AS n_ent FROM kg),
 cf AS (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
SELECT CAST(h AS BIGINT) AS h, CAST(r + 2 AS BIGINT) AS r, CAST(t AS BIGINT) AS t FROM kg
UNION ALL
SELECT CAST(t AS BIGINT), CAST(r + (SELECT n_rel FROM stats) + 2 AS BIGINT), CAST(h AS BIGINT) FROM kg
UNION ALL
SELECT CAST(u + (SELECT n_ent FROM stats) AS BIGINT), CAST(0 AS BIGINT), CAST(i AS BIGINT) FROM cf
UNION ALL
SELECT CAST(i AS BIGINT), CAST(1 AS BIGINT), CAST(u + (SELECT n_ent FROM stats) AS BIGINT) FROM cf
"""


# ---------------------------------------------------------------------------
# data-op oracles (testdata views)
# ---------------------------------------------------------------------------


def dedup_exact_sql() -> str:
    return "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text FROM documents GROUP BY text"


def _shingle_cte(n: int) -> str:
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
 sh AS (SELECT doc_id,
        list_distinct(list_transform(range(0, greatest(len(w) - {n}, 0) + 1),
                                     i -> array_to_string(w[i + 1 : i + {n}], ' '))) AS g
        FROM t),
 ex AS (SELECT doc_id, len(g) AS n_sh, unnest(g) AS gram FROM sh)
"""


def ngram_jaccard_sql(n: int, threshold: float) -> str:
    return f"""
WITH {_shingle_cte(n)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) / (a.n_sh + b.n_sh - count(*)) AS jaccard
FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
HAVING count(*) / (a.n_sh + b.n_sh - count(*)) >= {threshold}
"""


def minhash_lsh_sql(k: int, bands: int, n: int) -> str:
    r = k // bands
    perm_exprs = []
    for i in range(k):
        a = (MINHASH_SEED_A * (i + 1)) % MINHASH_P
        b = (MINHASH_SEED_B * (i + 1)) % MINHASH_P
        perm_exprs.append(
            f"min(({a} * (hv % {MINHASH_P}) + {b}) % {MINHASH_P}) AS m{i}"
        )
    band_rows = []
    for bi in range(bands):
        key = " || '-' || ".join(f"CAST(m{bi * r + j} AS VARCHAR)" for j in range(r))
        band_rows.append(f"SELECT doc_id, {bi} AS band, {key} AS key FROM sig")
    banded = " UNION ALL ".join(band_rows)
    return f"""
WITH {_shingle_cte(n)},
 hashed AS (SELECT doc_id, CAST(('0x' || substr(md5(gram), 1, 15)) AS UBIGINT)::BIGINT AS hv FROM ex),
 sig AS (SELECT doc_id, {', '.join(perm_exprs)} FROM hashed GROUP BY doc_id),
 banded AS ({banded})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""


def simhash_sql() -> str:
    return """
WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
 hashed AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT AS h FROM toks),
 bits AS (SELECT doc_id, b.bit,
                 sum(CASE WHEN (h // (1::BIGINT << b.bit)) % 2 = 1 THEN 1 ELSE -1 END) AS s
          FROM hashed, (SELECT unnest(range(0, 60)) AS bit) b
          GROUP BY doc_id, b.bit)
SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def embedding_dups_sql(threshold: float) -> str:
    dot = (
        "list_aggregate(list_transform(range(1, len(a.embedding) + 1), "
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')"
    )
    nrm = (
        lambda col: f"sqrt(list_aggregate(list_transform({col}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    )
    return f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {dot} / ({nrm('a.embedding')} * {nrm('b.embedding')}) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {dot} / ({nrm('a.embedding')} * {nrm('b.embedding')}) >= {threshold}
"""


def ann_topk_sql(n_queries: int, k: int) -> str:
    dot = (
        "list_aggregate(list_transform(range(1, len(e.embedding) + 1), "
        "i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), 'sum')"
    )
    nrm = (
        lambda col: f"sqrt(list_aggregate(list_transform({col}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    )
    return f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}),
 scored AS (SELECT q.q_id, e.vec_id,
                   {dot} / ({nrm('e.embedding')} * {nrm('q.q_emb')}) AS cos
            FROM embeddings e, q)
SELECT q_id, vec_id, cos,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM scored)
WHERE rank <= {k}
"""


def lang_id_sql() -> str:
    hits = {
        lang: (
            f"len(list_intersect(string_split(text, ' '), "
            f"[{', '.join(repr(w) for w in STOPWORDS[lang])}]))"
        )
        for lang in LANGS
    }
    # sequential argmax fold: later lang wins only on strictly-greater
    lang_expr = f"'{LANGS[0]}'"
    run_max = hits[LANGS[0]]
    for lang in LANGS[1:]:
        lang_expr = f"CASE WHEN {hits[lang]} > ({run_max}) THEN '{lang}' ELSE ({lang_expr}) END"
        run_max = f"greatest({run_max}, {hits[lang]})"
    cols = ", ".join(f"CAST({hits[lang]} AS BIGINT) AS hits_{lang}" for lang in LANGS)
    return f"SELECT doc_id, {cols}, {lang_expr} AS pred_lang FROM documents"


def quality_sql() -> str:
    sw = ", ".join(repr(w) for w in STOPWORDS["en"])
    return f"""
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         len(list_filter(string_split(text, ' '), t -> list_contains([{sw}], t))) AS n_stop
  FROM documents)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       n_punct / greatest(n_chars, 1) AS punct_ratio,
       n_stop / greatest(n_tok, 1) AS stopword_ratio,
       (n_chars - n_tok + 1) / n_tok AS mean_word_len,
       least(n_tok / 64.0::DOUBLE, 1.0::DOUBLE) * 0.4::DOUBLE
         + (1.0::DOUBLE - least(n_punct / greatest(n_chars, 1) * 4, 1.0::DOUBLE)) * 0.3::DOUBLE
         + least(n_stop / greatest(n_tok, 1) * 5, 1.0::DOUBLE) * 0.3::DOUBLE AS quality
FROM base
"""


def token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS BIGINT) AS bpe_tokens
FROM documents
"""


def fingerprint_sql(n: int) -> str:
    return f"""
WITH {_shingle_cte(n)}
SELECT doc_id, CAST(min(CAST(('0x' || substr(md5(gram), 1, 15)) AS UBIGINT)) AS BIGINT) AS fingerprint
FROM ex GROUP BY doc_id
"""


def sessionize_sql(gap_minutes: int) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(new_s) AS BIGINT) AS n_sessions
FROM marked GROUP BY user_id
"""


def edge_softmax_sql() -> str:
    """Per-destination softmax over a deterministic lineitem-derived edge
    table (h=l_suppkey, t=l_partkey, score=l_discount); att rounded to
    12 dp on both engines to absorb sum-order float jitter. Max-shifted
    like the Spark op (kgp.stages.graph.edge_softmax) — exact where the
    naive form is finite."""
    return """
WITH e AS (SELECT DISTINCT l_suppkey AS h, l_partkey AS t, l_discount AS score FROM lineitem),
 mx AS (SELECT t, max(score) AS mx FROM e GROUP BY t),
 z AS (SELECT e.t, sum(exp(e.score - mx.mx)) AS z
       FROM e JOIN mx ON e.t = mx.t GROUP BY e.t)
SELECT CAST(e.h AS BIGINT) AS h, CAST(e.t AS BIGINT) AS t,
       round(exp(e.score - mx.mx) / z.z, 12) AS att
FROM e JOIN mx ON e.t = mx.t JOIN z ON e.t = z.t
"""


def tpch_q1_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def top_revenue_sql(limit: int) -> str:
    return f"""
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT {limit}
"""


# ---------------------------------------------------------------------------
# scale-path certification oracles (hyperplane-LSH / IVF twins)
# ---------------------------------------------------------------------------

_DOT_AB = (
    "list_aggregate(list_transform(range(1, len(a.embedding) + 1), "
    "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')"
)


def _nrm(col: str) -> str:
    return f"sqrt(list_aggregate(list_transform({col}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"


def _planes_values(n_planes: int, n_tables: int, dim: int, seed: int) -> str:
    """VALUES rows (tbl, j, plane-vector) for the SAME hyperplanes the
    Spark operators generate (kgp.ops.similarity._hyperplanes); float
    literals repr-round-trip so both engines see identical doubles."""
    from kgp.ops.similarity import _hyperplanes

    rows = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        for j, p in enumerate(planes):
            vec = ", ".join(repr(float(v)) for v in p)
            rows.append(f"({t}, {j}, [{vec}]::DOUBLE[])")
    return ",\n  ".join(rows)


def _bucket_cte(src: str, id_col: str, out_id: str, emb_col: str = "embedding") -> str:
    """Per-(row, table) sign-pattern bucket id over the ``planes`` CTE."""
    dot = (
        f"list_aggregate(list_transform(range(1, len(e.{emb_col}) + 1), "
        f"i -> e.{emb_col}[i]::DOUBLE * pl.p[i]), 'sum')"
    )
    return f"""SELECT e.{id_col} AS {out_id}, pl.tbl,
        sum(CASE WHEN {dot} >= 0 THEN (1::BIGINT << pl.j) ELSE 0 END) AS bucket
 FROM {src} e, planes pl GROUP BY e.{id_col}, pl.tbl"""


def embedding_lsh_sql(
    threshold: float, n_planes: int, n_tables: int, dim: int, seed: int
) -> str:
    return f"""
WITH planes AS (SELECT tbl, j, col2 AS p FROM (VALUES
  {_planes_values(n_planes, n_tables, dim, seed)}) t(tbl, j, col2)),
 bk AS ({_bucket_cte('embeddings', 'vec_id', 'vec_id')}),
 cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
          FROM bk x JOIN bk y ON x.tbl = y.tbl AND x.bucket = y.bucket
                               AND x.vec_id < y.vec_id)
SELECT cand.a_id, cand.b_id,
       {_DOT_AB} / ({_nrm('a.embedding')} * {_nrm('b.embedding')}) AS cos
FROM cand JOIN embeddings a ON a.vec_id = cand.a_id
          JOIN embeddings b ON b.vec_id = cand.b_id
WHERE {_DOT_AB} / ({_nrm('a.embedding')} * {_nrm('b.embedding')}) >= {threshold}
"""


def ann_lsh_sql(
    n_queries: int, k: int, n_planes: int, n_tables: int, dim: int, seed: int
) -> str:
    dot = (
        "list_aggregate(list_transform(range(1, len(e.embedding) + 1), "
        "i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), 'sum')"
    )
    return f"""
WITH planes AS (SELECT tbl, j, col2 AS p FROM (VALUES
  {_planes_values(n_planes, n_tables, dim, seed)}) t(tbl, j, col2)),
 qset AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}),
 ib AS ({_bucket_cte('embeddings', 'vec_id', 'vec_id')}),
 qb AS ({_bucket_cte('qset', 'q_id', 'q_id', 'q_emb')}),
 cand AS (SELECT DISTINCT qb.q_id, ib.vec_id
          FROM ib JOIN qb ON ib.tbl = qb.tbl AND ib.bucket = qb.bucket),
 scored AS (SELECT c.q_id, c.vec_id,
                   {dot} / ({_nrm('e.embedding')} * {_nrm('q.q_emb')}) AS cos
            FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
                        JOIN qset q ON q.q_id = c.q_id)
SELECT q_id, vec_id, cos, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM scored)
WHERE rank <= {k}
"""


def ann_ivf_sql(
    n_queries: int, k: int, n_centroids: int, nprobe: int, dim: int
) -> str:
    """One Lloyd round, mirroring kgp.ops.similarity.ivf_topk: seed
    centroids = lowest vec_ids, assign, elementwise mean computed as
    SORT-THEN-SUM over the member values (bit-deterministic across
    engines/partitionings) divided and rounded to 6 dp, reassign, probe."""
    sim = (
        "list_aggregate(list_transform(range(1, len(e.embedding) + 1), "
        "i -> e.embedding[i]::DOUBLE * c.c_emb[i]), 'sum')"
        f" / ({_nrm('e.embedding')} * {_nrm('c.c_emb')})"
    )
    qsim = (
        "list_aggregate(list_transform(range(1, len(q.q_emb) + 1), "
        "i -> q.q_emb[i]::DOUBLE * c.c_emb[i]), 'sum')"
        f" / ({_nrm('q.q_emb')} * {_nrm('c.c_emb')})"
    )
    dot = (
        "list_aggregate(list_transform(range(1, len(e.embedding) + 1), "
        "i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), 'sum')"
    )
    return f"""
WITH c0 AS (SELECT vec_id AS c_id, list_transform(embedding, x -> x::DOUBLE) AS c_emb
            FROM embeddings ORDER BY vec_id LIMIT {n_centroids}),
 a0 AS (SELECT vec_id, embedding, c_id FROM (
        SELECT e.vec_id, e.embedding, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {sim} DESC, c.c_id) AS rk
        FROM embeddings e, c0 c) WHERE rk = 1),
 c1 AS (SELECT c_id, list(m ORDER BY pos) AS c_emb FROM (
        SELECT c_id, r.range AS pos,
               round(list_aggregate(list_sort(list(embedding[r.range]::DOUBLE)), 'sum')
                     / count(*), 6) AS m
        FROM a0, range(1, {dim} + 1) r GROUP BY c_id, r.range) GROUP BY c_id),
 a1 AS (SELECT vec_id, embedding, c_id FROM (
        SELECT e.vec_id, e.embedding, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {sim} DESC, c.c_id) AS rk
        FROM embeddings e, c1 c) WHERE rk = 1),
 qset AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}),
 probes AS (SELECT q_id, q_emb, c_id FROM (
        SELECT q.q_id, q.q_emb, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY {qsim} DESC, c.c_id) AS rk
        FROM qset q, c1 c) WHERE rk <= {nprobe}),
 scored AS (SELECT q.q_id, e.vec_id,
                   {dot} / ({_nrm('e.embedding')} * {_nrm('q.q_emb')}) AS cos
            FROM a1 e JOIN probes q ON e.c_id = q.c_id)
SELECT q_id, vec_id, cos, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM scored)
WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# reference-format reader oracles (S1-S7): DuckDB re-parses the SAME raw
# files the Spark readers scan, so the certified object is the PARSER
# ---------------------------------------------------------------------------


def read_semeval_sql(path: str) -> str:
    """Twin of kgp.io.readers.read_semeval_jsonl's OK split (P3 filter:
    the joined span tokens must equal the recorded name)."""
    return f"""
WITH raw AS (SELECT * FROM read_json('{path}', format='newline_delimited',
  columns={{'token': 'VARCHAR[]',
           'h': 'STRUCT(name VARCHAR, pos BIGINT[])',
           't': 'STRUCT(name VARCHAR, pos BIGINT[])',
           'relation': 'VARCHAR'}})),
 d AS (SELECT array_to_string(token, ' ') AS sent,
              struct_extract(h, 'name') AS head_name,
              struct_extract(h, 'pos')[1] AS head_s,
              struct_extract(h, 'pos')[2] AS head_e,
              struct_extract(t, 'name') AS tail_name,
              struct_extract(t, 'pos')[1] AS tail_s,
              struct_extract(t, 'pos')[2] AS tail_e,
              relation,
              array_to_string(token[struct_extract(h, 'pos')[1] + 1 : struct_extract(h, 'pos')[2]], ' ') AS h_span,
              array_to_string(token[struct_extract(t, 'pos')[1] + 1 : struct_extract(t, 'pos')[2]], ' ') AS t_span
       FROM raw)
SELECT sent, head_name, head_s, head_e, tail_name, tail_s, tail_e, relation
FROM d WHERE h_span = head_name AND t_span = tail_name
"""


def read_mrc_sql(path: str) -> str:
    """Twin of read_mrc_ner_json + span explode: qas_id '<sample>.<label>'
    regroup, inclusive->exclusive end (+1)."""
    return f"""
WITH raw AS (SELECT * FROM read_json('{path}', format='array',
  columns={{'context': 'VARCHAR', 'qas_id': 'VARCHAR', 'entity_label': 'VARCHAR',
           'start_position': 'BIGINT[]', 'end_position': 'BIGINT[]',
           'impossible': 'BOOLEAN'}})),
 per AS (SELECT CAST(string_split(qas_id, '.')[1] AS BIGINT) AS sample_id,
                context, entity_label AS label,
                unnest(start_position) AS s, unnest(end_position) AS e
         FROM raw)
SELECT sample_id, context, s AS start, e + 1 AS "end", label FROM per
"""


def read_ccks_sql(path: str) -> str:
    return f"""
WITH raw AS (SELECT * FROM read_json('{path}', format='array',
  columns={{'sentence': 'VARCHAR', 'labeled entities': 'VARCHAR[][]'}})),
 ex AS (SELECT sentence, unnest("labeled entities") AS ent FROM raw)
SELECT sentence, CAST(ent[1] AS BIGINT) AS start, CAST(ent[2] AS BIGINT) AS "end",
       ent[3] AS label
FROM ex
"""


def read_el_tsv_sql(path: str) -> str:
    return f"""
SELECT text_a, text_b, CAST(label AS BIGINT) AS label
FROM read_csv('{path}', delim='\t', header=false,
  columns={{'text_a': 'VARCHAR', 'text_b': 'VARCHAR', 'label': 'INTEGER'}})
"""


def read_cdn_sql(path: str) -> str:
    return f"""
SELECT trim(text) AS text,
       unnest(string_split(normalized_result, '##')) AS gold_entity
FROM read_json('{path}', format='array',
  columns={{'text': 'VARCHAR', 'normalized_result': 'VARCHAR'}})
"""


def read_kg_triples_sql(path: str) -> str:
    return f"""
SELECT CAST(h AS BIGINT) AS h, CAST(r AS BIGINT) AS r, CAST(t AS BIGINT) AS t
FROM read_csv('{path}', delim=' ', header=false,
  columns={{'h': 'BIGINT', 'r': 'INTEGER', 't': 'BIGINT'}})
"""


def read_cf_adjacency_sql(path: str) -> str:
    """Twin of read_cf_adjacency: split 'user item item ...' lines, skip
    blanks, per-user distinct items (np.unique, loader_kgat.py:59)."""
    return f"""
WITH lines AS (SELECT * FROM read_csv('{path}', delim='\x01', header=false,
  columns={{'value': 'VARCHAR'}})),
 p AS (SELECT string_split(trim(value), ' ') AS parts FROM lines
       WHERE value IS NOT NULL AND length(trim(value)) > 0)
SELECT CAST(parts[1] AS BIGINT) AS "user",
       CAST(unnest(list_distinct(parts[2:])) AS BIGINT) AS item
FROM p
"""


def read_id_remap_sql(path: str) -> str:
    return f"""
SELECT org_id, remap_id
FROM read_csv('{path}', delim=' ', header=true,
  columns={{'org_id': 'VARCHAR', 'remap_id': 'BIGINT'}})
"""


# ---------------------------------------------------------------------------
# F7 KGAT attention oracle
# ---------------------------------------------------------------------------


def _matrix_values(rows) -> str:
    """VALUES rows (id, vector) with repr-round-tripping float literals."""
    out = []
    for i, vec in enumerate(rows):
        lit = ", ".join(repr(float(v)) for v in vec)
        out.append(f"({i}, [{lit}]::DOUBLE[])")
    return ",\n  ".join(out)


def _tensor_values(cube) -> str:
    """VALUES rows (id, matrix) as DOUBLE[][] literals."""
    out = []
    for i, mat in enumerate(cube):
        rows = ", ".join("[" + ", ".join(repr(float(v)) for v in row) + "]" for row in mat)
        out.append(f"({i}, [{rows}]::DOUBLE[][])")
    return ",\n  ".join(out)


def kgat_attention_sql(ent_emb, rel_emb, rel_w, n_ent: int, n_rel: int) -> str:
    """Twin of kgp.stages.graph.kgat_attention composed with edge_softmax
    over the deterministic lineitem-derived edge table:
    ``score = tanh(W_r e_h + e_r) . (W_r e_t)`` (KGAT.py:111-129),
    ``att = exp(score) / sum_t exp(score)`` (helper.py:11-23). Both
    engines fold the d-dim dot products in index order; score/att rounded
    to 9 dp (einsum uses pairwise summation — the only engine difference
    is sum-order float jitter ~1e-15)."""
    d = len(ent_emb[0])
    dr = len(rel_emb[0])
    wh = (
        f"list_aggregate(list_transform(range(1, {d} + 1), "
        "j -> wr[i][j] * eh[j]), 'sum')"
    )
    wt = (
        f"list_aggregate(list_transform(range(1, {d} + 1), "
        "j -> wr[i][j] * et[j]), 'sum')"
    )
    # DuckDB 1.0.0 has no tanh(): (exp(2x)-1)/(exp(2x)+1) is exact enough
    # (the 9-dp rounding absorbs the <=1e-15 formulation difference)
    tanh_arg = f"({wh} + er[i])"
    tanh = f"((exp(2 * {tanh_arg}) - 1) / (exp(2 * {tanh_arg}) + 1))"
    score = (
        f"list_aggregate(list_transform(range(1, {dr} + 1), "
        f"i -> {tanh} * {wt}), 'sum')"
    )
    return f"""
WITH ent AS (SELECT col0 AS id, col1 AS e FROM (VALUES
  {_matrix_values(ent_emb)}) v(col0, col1)),
 rel AS (SELECT col0 AS id, col1 AS er FROM (VALUES
  {_matrix_values(rel_emb)}) v(col0, col1)),
 w AS (SELECT col0 AS id, col1 AS wr FROM (VALUES
  {_tensor_values(rel_w)}) v(col0, col1)),
 edges AS (SELECT DISTINCT l_suppkey % {n_ent} AS h, l_linenumber % {n_rel} AS r,
                  l_partkey % {n_ent} AS t FROM lineitem),
 scored AS (SELECT edges.h, edges.r, edges.t,
                   {score} AS score
            FROM edges
            JOIN ent eh_t ON eh_t.id = edges.h
            JOIN ent et_t ON et_t.id = edges.t
            JOIN rel ON rel.id = edges.r
            JOIN w ON w.id = edges.r,
            LATERAL (SELECT eh_t.e AS eh, et_t.e AS et) _x),
 mx AS (SELECT t, max(score) AS mx FROM scored GROUP BY t),
 z AS (SELECT s.t, sum(exp(s.score - mx.mx)) AS z
       FROM scored s JOIN mx ON s.t = mx.t GROUP BY s.t)
SELECT CAST(s.h AS BIGINT) AS h, CAST(s.r AS BIGINT) AS r, CAST(s.t AS BIGINT) AS t,
       round(s.score, 9) AS score, round(exp(s.score - mx.mx) / z.z, 9) AS att
FROM scored s JOIN mx ON s.t = mx.t JOIN z ON s.t = z.t
"""


def kgat_aggregate_sql(
    ent_emb,
    rel_emb,
    rel_w,
    w1,
    w2,
    n_ent: int,
    n_rel: int,
    alpha: float = 0.2,
    aggregator: str = "bi-interaction",
) -> str:
    """Twin of kgp.stages.graph.kgat_aggregate composed after
    kgat_attention + edge_softmax over the deterministic lineitem edge
    table (KGAT-pytorch/model/KGAT.py:38-64 ``Aggregator``, all three
    ``aggregation_type`` variants). Bi-interaction:
    e_N(h) = sum att * e_t; e_out = leaky(sum s*W1) + leaky(sum p*W2)
    with s = e_h + e_N, p = e_h * e_N; gcn keeps only the s/W1 term;
    graphsage uses s = e_h, p = e_N under one leaky (the concat-linear
    split, kgp.stages.graph._agg_tail). Rounded to 6 dp (the groupBy sums
    have more terms than the attention dots, so the float sum-order
    jitter budget is looser than the 9-dp attention twin's)."""
    d = len(ent_emb[0])
    dr = len(rel_emb[0])
    wh = (
        f"list_aggregate(list_transform(range(1, {d} + 1), "
        "j -> wr[i][j] * eh[j]), 'sum')"
    )
    wt = (
        f"list_aggregate(list_transform(range(1, {d} + 1), "
        "j -> wr[i][j] * et[j]), 'sum')"
    )
    tanh_arg = f"({wh} + er[i])"
    tanh = f"((exp(2 * {tanh_arg}) - 1) / (exp(2 * {tanh_arg}) + 1))"
    score = (
        f"list_aggregate(list_transform(range(1, {dr} + 1), "
        f"i -> {tanh} * {wt}), 'sum')"
    )
    w_values = ",\n  ".join(
        f"({i + 1}, {j}, {float(w1[i][j])!r}, {float(w2[i][j])!r})"
        for i in range(d)
        for j in range(len(w1[0]))
    )

    def leaky(c: str) -> str:
        return f"(CASE WHEN {c} > 0 THEN {c} ELSE {alpha!r} * {c} END)"

    if aggregator == "graphsage":
        s_expr, p_expr = "b.e_h", "coalesce(m.n_val, 0.0)"
        out_expr = leaky("(z1 + z2)")
    elif aggregator == "gcn":
        s_expr = "b.e_h + coalesce(m.n_val, 0.0)"
        p_expr = "b.e_h * coalesce(m.n_val, 0.0)"
        out_expr = leaky("z1")
    else:
        s_expr = "b.e_h + coalesce(m.n_val, 0.0)"
        p_expr = "b.e_h * coalesce(m.n_val, 0.0)"
        out_expr = f"{leaky('z1')} + {leaky('z2')}"

    return f"""
WITH ent AS (SELECT col0 AS id, col1 AS e FROM (VALUES
  {_matrix_values(ent_emb)}) v(col0, col1)),
 rel AS (SELECT col0 AS id, col1 AS er FROM (VALUES
  {_matrix_values(rel_emb)}) v(col0, col1)),
 w AS (SELECT col0 AS id, col1 AS wr FROM (VALUES
  {_tensor_values(rel_w)}) v(col0, col1)),
 w12(i, j, w1, w2) AS (VALUES
  {w_values}),
 edges AS (SELECT DISTINCT l_suppkey % {n_ent} AS h, l_linenumber % {n_rel} AS r,
                  l_partkey % {n_ent} AS t FROM lineitem),
 scored AS (SELECT edges.h, edges.r, edges.t,
                   {score} AS score
            FROM edges
            JOIN ent eh_t ON eh_t.id = edges.h
            JOIN ent et_t ON et_t.id = edges.t
            JOIN rel ON rel.id = edges.r
            JOIN w ON w.id = edges.r,
            LATERAL (SELECT eh_t.e AS eh, et_t.e AS et) _x),
 mx AS (SELECT t, max(score) AS mx FROM scored GROUP BY t),
 z AS (SELECT s.t, sum(exp(s.score - mx.mx)) AS z
       FROM scored s JOIN mx ON s.t = mx.t GROUP BY s.t),
 att AS (SELECT s.h, s.t, exp(s.score - mx.mx) / z.z AS att
         FROM scored s JOIN mx ON s.t = mx.t JOIN z ON s.t = z.t),
 msg AS (SELECT a.h, u.i, sum(u.v * a.att) AS n_val
         FROM att a JOIN ent et ON et.id = a.t,
              LATERAL (SELECT unnest(et.e) AS v,
                              unnest(generate_series(1, {d})) AS i) u
         GROUP BY a.h, u.i),
 base AS (SELECT id AS h, unnest(generate_series(1, {d})) AS i,
                 unnest(e) AS e_h
          FROM ent),
 comb AS (SELECT b.h, b.i,
                 {s_expr} AS s,
                 {p_expr} AS p
          FROM base b LEFT JOIN msg m ON m.h = b.h AND m.i = b.i),
 lin AS (SELECT c.h, ww.j, sum(c.s * ww.w1) AS z1, sum(c.p * ww.w2) AS z2
         FROM comb c JOIN w12 ww ON ww.i = c.i
         GROUP BY c.h, ww.j)
SELECT CAST(h AS BIGINT) AS h, CAST(j AS BIGINT) AS j,
       round({out_expr}, 6) AS e_out
FROM lin
"""


def _att_expr(d: int, dr: int) -> str:
    """The shared per-edge attention-score expression (same text the
    attention/aggregate twins inline): tanh(W_r e_h + e_r) . (W_r e_t)."""
    wh = (
        f"list_aggregate(list_transform(range(1, {d} + 1), "
        "j -> wr[i][j] * eh[j]), 'sum')"
    )
    wt = (
        f"list_aggregate(list_transform(range(1, {d} + 1), "
        "j -> wr[i][j] * et[j]), 'sum')"
    )
    tanh_arg = f"({wh} + er[i])"
    tanh = f"((exp(2 * {tanh_arg}) - 1) / (exp(2 * {tanh_arg}) + 1))"
    return (
        f"list_aggregate(list_transform(range(1, {dr} + 1), "
        f"i -> {tanh} * {wt}), 'sum')"
    )


def _cf_embedding_with_clause(
    ent_emb, rel_emb, rel_w, layers, n_ent: int, n_rel: int, alpha: float = 0.2
) -> str:
    """Shared WITH-clause for the stacked cf_embedding twins
    (KGAT-pytorch/model/KGAT.py:164-176 ``cf_embedding``, Equation 11):
    the attention + edge-softmax CTEs feed a CHAIN of bi-interaction layer
    CTE blocks — each block is the kgat_aggregate twin re-rooted at the
    previous layer's long-form embedding, followed by a per-node L2
    normalize — ending in an ``allemb(h, k, val)`` CTE that unions ego +
    every normalized layer with global concat offsets (unrounded)."""
    d0 = len(ent_emb[0])
    dr = len(rel_emb[0])
    score = _att_expr(d0, dr)

    def leaky(c: str) -> str:
        return f"(CASE WHEN {c} > 0 THEN {c} ELSE {alpha!r} * {c} END)"

    ctes = [
        f"""ent AS (SELECT col0 AS id, col1 AS e FROM (VALUES
  {_matrix_values(ent_emb)}) v(col0, col1)),
 rel AS (SELECT col0 AS id, col1 AS er FROM (VALUES
  {_matrix_values(rel_emb)}) v(col0, col1)),
 w AS (SELECT col0 AS id, col1 AS wr FROM (VALUES
  {_tensor_values(rel_w)}) v(col0, col1)),
 edges AS (SELECT DISTINCT l_suppkey % {n_ent} AS h, l_linenumber % {n_rel} AS r,
                  l_partkey % {n_ent} AS t FROM lineitem),
 scored AS (SELECT edges.h, edges.r, edges.t,
                   {score} AS score
            FROM edges
            JOIN ent eh_t ON eh_t.id = edges.h
            JOIN ent et_t ON et_t.id = edges.t
            JOIN rel ON rel.id = edges.r
            JOIN w ON w.id = edges.r,
            LATERAL (SELECT eh_t.e AS eh, et_t.e AS et) _x),
 mx AS (SELECT t, max(score) AS mx FROM scored GROUP BY t),
 z AS (SELECT s.t, sum(exp(s.score - mx.mx)) AS z
       FROM scored s JOIN mx ON s.t = mx.t GROUP BY s.t),
 att AS (SELECT s.h, s.t, exp(s.score - mx.mx) / z.z AS att
         FROM scored s JOIN mx ON s.t = mx.t JOIN z ON s.t = z.t),
 emb0 AS (SELECT id AS h, unnest(generate_series(1, {d0})) AS i,
                 unnest(e) AS val
          FROM ent)"""
    ]
    parts = [f"SELECT h, i - 1 AS k, val FROM emb0"]
    offset = d0
    for k, (w1, w2) in enumerate(layers, start=1):
        d_in, d_out = len(w1), len(w1[0])
        w_values = ",\n  ".join(
            f"({i + 1}, {j + 1}, {float(w1[i][j])!r}, {float(w2[i][j])!r})"
            for i in range(d_in)
            for j in range(d_out)
        )
        prev = f"emb{k - 1}"
        ctes.append(
            f"""w12_{k}(i, j, w1, w2) AS (VALUES
  {w_values}),
 msg{k} AS (SELECT a.h, e.i, sum(e.val * a.att) AS n_val
            FROM att a JOIN {prev} e ON e.h = a.t
            GROUP BY a.h, e.i),
 comb{k} AS (SELECT b.h, b.i,
                    b.val + coalesce(m.n_val, 0.0) AS s,
                    b.val * coalesce(m.n_val, 0.0) AS p
             FROM {prev} b LEFT JOIN msg{k} m ON m.h = b.h AND m.i = b.i),
 lin{k} AS (SELECT c.h, ww.j, sum(c.s * ww.w1) AS z1, sum(c.p * ww.w2) AS z2
            FROM comb{k} c JOIN w12_{k} ww ON ww.i = c.i
            GROUP BY c.h, ww.j),
 out{k} AS (SELECT h, j, {leaky('z1')} + {leaky('z2')} AS val FROM lin{k}),
 nrm{k} AS (SELECT h, greatest(sqrt(sum(val * val)), 1e-12) AS nrm
            FROM out{k} GROUP BY h),
 emb{k} AS (SELECT o.h, o.j AS i, o.val / n.nrm AS val
            FROM out{k} o JOIN nrm{k} n ON n.h = o.h)"""
        )
        parts.append(f"SELECT h, i - 1 + {offset} AS k, val FROM emb{k}")
        offset += d_out
    ctes.append("allemb AS (" + "\n UNION ALL\n ".join(parts) + ")")
    return "WITH " + ",\n ".join(ctes)


def kgat_cf_embedding_sql(
    ent_emb, rel_emb, rel_w, layers, n_ent: int, n_rel: int, alpha: float = 0.2
) -> str:
    """Twin of kgp.stages.graph.kgat_cf_embedding: the stacked-layer
    WITH-clause (see :func:`_cf_embedding_with_clause`), projected as
    long-form (h, k, val) rounded to 6 dp (two layers of grouped double
    sums; same jitter budget as the aggregate twin)."""
    w = _cf_embedding_with_clause(ent_emb, rel_emb, rel_w, layers, n_ent, n_rel, alpha)
    return (
        w
        + "\nSELECT CAST(h AS BIGINT) AS h, CAST(k AS BIGINT) AS k, "
        + "round(val, 6) AS val FROM allemb"
    )


def kgat_cf_score_sql(
    ent_emb,
    rel_emb,
    rel_w,
    layers,
    n_ent: int,
    n_rel: int,
    user_mod: int,
    alpha: float = 0.2,
) -> str:
    """Twin of kgp.stages.graph.kgat_cf_score (KGAT-pytorch/model/
    KGAT.py:179-193 ``cf_score``, Equation 12): eval users are the
    embedding ids with ``h % user_mod == 2``, eval items the rest;
    score(u, i) = dot over the concat dim of the stacked cf_embedding."""
    w = _cf_embedding_with_clause(ent_emb, rel_emb, rel_w, layers, n_ent, n_rel, alpha)
    return f"""{w},
 ue AS (SELECT h AS u, k, val FROM allemb WHERE h % {user_mod} = 2),
 ie AS (SELECT h AS i, k, val FROM allemb WHERE h % {user_mod} <> 2)
SELECT CAST(ue.u AS BIGINT) AS "user", CAST(ie.i AS BIGINT) AS item,
       round(sum(ue.val * ie.val), 6) AS score
FROM ue JOIN ie ON ue.k = ie.k
GROUP BY ue.u, ie.i
"""


def kgat_cf_loss_sql(
    ent_emb,
    rel_emb,
    rel_w,
    layers,
    n_ent: int,
    n_rel: int,
    l2_lambda: float = 1e-5,
    alpha: float = 0.2,
) -> str:
    """Twin of kgp.stages.graph.kgat_cf_loss (KGAT-pytorch/model/
    KGAT.py:195-219 ``calc_cf_loss``, Equations 12-13) over the same
    deterministic DISTINCT lineitem batch the Spark query uses (distinct,
    so the per-row surrogate key and this GROUP BY agree on multiplicity):

        pos/neg = dot over the stacked concat embedding        (Eq 12)
        loss    = mean softplus(neg - pos) + lambda * mean L2  (Eq 13)

    Softplus in the same max-shifted stable form as the Spark side."""
    w = _cf_embedding_with_clause(ent_emb, rel_emb, rel_w, layers, n_ent, n_rel, alpha)
    sp = "greatest(neg - pos, 0.0) + ln(1 + exp(-abs(neg - pos)))"
    return f"""{w},
 batch AS (SELECT DISTINCT l_suppkey % {n_ent} AS u,
                  l_partkey % {n_ent} AS p,
                  (l_partkey + 13 * l_suppkey + 7) % {n_ent} AS ng
           FROM lineitem),
 per AS (SELECT b.u, b.p, b.ng,
                sum(ue.val * pe.val) AS pos,
                sum(ue.val * ne.val) AS neg,
                sum(ue.val * ue.val + pe.val * pe.val + ne.val * ne.val) / 2
                  AS l2_row
         FROM batch b
         JOIN allemb ue ON ue.h = b.u
         JOIN allemb pe ON pe.h = b.p AND pe.k = ue.k
         JOIN allemb ne ON ne.h = b.ng AND ne.k = ue.k
         GROUP BY b.u, b.p, b.ng)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(avg({sp}), 6) AS cf_loss,
       round(avg(l2_row), 6) AS l2_loss,
       round(avg({sp}) + {l2_lambda!r} * avg(l2_row), 6) AS loss
FROM per
"""


def _transr_ctes(ent_emb, rel_emb, rel_w, n_ent: int, n_rel: int) -> str:
    """Shared CTE chain for the TransR twins: the deterministic
    (h, r, pos_t, neg_t) lineitem batch -> per-row projections
    (KGAT.py:146-150) -> per-row pos/neg scores + L2 row (Equation 1)."""
    d = len(ent_emb[0])
    dr = len(rel_emb[0])

    def mul(vec: str) -> str:
        return (
            f"list_transform(range(1, {dr} + 1), "
            f"i -> list_aggregate(list_transform(range(1, {d} + 1), "
            f"j -> wr[i][j] * {vec}[j]), 'sum'))"
        )

    def sumsq(col: str) -> str:
        return f"list_aggregate(list_transform({col}, x -> x * x), 'sum')"

    def dist(a: str, b: str) -> str:
        return (
            f"list_aggregate(list_transform(range(1, {dr} + 1), "
            f"i -> ({a}[i] + er[i] - {b}[i]) * ({a}[i] + er[i] - {b}[i])), 'sum')"
        )

    return f"""ent AS (SELECT col0 AS id, col1 AS e FROM (VALUES
  {_matrix_values(ent_emb)}) v(col0, col1)),
 rel AS (SELECT col0 AS id, col1 AS er FROM (VALUES
  {_matrix_values(rel_emb)}) v(col0, col1)),
 w AS (SELECT col0 AS id, col1 AS wr FROM (VALUES
  {_tensor_values(rel_w)}) v(col0, col1)),
 batch AS (SELECT DISTINCT l_suppkey % {n_ent} AS h,
                  l_linenumber % {n_rel} AS r,
                  l_partkey % {n_ent} AS pos_t,
                  (l_partkey + 13 * l_suppkey + 7) % {n_ent} AS neg_t
           FROM lineitem),
 proj AS (SELECT b.h, b.r, b.pos_t, b.neg_t, rel.er,
                 {mul('eh')} AS mh, {mul('ep_e')} AS mp, {mul('en_e')} AS mn
          FROM batch b
          JOIN ent eh_t ON eh_t.id = b.h
          JOIN ent ep_t ON ep_t.id = b.pos_t
          JOIN ent en_t ON en_t.id = b.neg_t
          JOIN rel ON rel.id = b.r
          JOIN w ON w.id = b.r,
          LATERAL (SELECT eh_t.e AS eh, ep_t.e AS ep_e, en_t.e AS en_e) _x),
 vals AS (SELECT h, r, pos_t, neg_t,
                 {dist('mh', 'mp')} AS pos_score,
                 {dist('mh', 'mn')} AS neg_score,
                 ({sumsq('mh')} + {sumsq('er')} + {sumsq('mp')} + {sumsq('mn')}) / 2
                   AS l2_row
          FROM proj)"""


def transr_scores_sql(ent_emb, rel_emb, rel_w, n_ent: int, n_rel: int) -> str:
    """Per-row twin of kgp.functions.losses.transr_scores over the
    deterministic lineitem batch (KGAT.py:132-156, Equation 1).
    6 dp: scores are sums of O(d^2)-magnitude squares, so the einsum
    pairwise-vs-in-order jitter budget is looser than the attention
    twin's 9 dp."""
    ctes = _transr_ctes(ent_emb, rel_emb, rel_w, n_ent, n_rel)
    return f"""
WITH {ctes}
SELECT CAST(h AS BIGINT) AS h, CAST(r AS BIGINT) AS r,
       CAST(pos_t AS BIGINT) AS pos_t, CAST(neg_t AS BIGINT) AS neg_t,
       round(pos_score, 6) AS pos_score, round(neg_score, 6) AS neg_score,
       round(l2_row, 6) AS l2_row
FROM vals
"""


def transr_kg_loss_sql(
    ent_emb, rel_emb, rel_w, n_ent: int, n_rel: int, l2_lambda: float
) -> str:
    """Twin of kgp.functions.losses.transr_kg_loss (KGAT.py:152-161,
    Equation 2) over the same deterministic batch: softplus in the same
    max-shifted form as the certified BPR twin."""
    ctes = _transr_ctes(ent_emb, rel_emb, rel_w, n_ent, n_rel)
    return f"""
WITH {ctes},
 t AS (SELECT pos_score - neg_score AS dd, l2_row FROM vals)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(avg(greatest(dd, 0) + ln(1 + exp(-abs(dd)))), 6) AS kg_loss,
       round(avg(l2_row), 6) AS l2_loss,
       round(avg(greatest(dd, 0) + ln(1 + exp(-abs(dd)))) + {l2_lambda!r} * avg(l2_row), 6) AS loss
FROM t
"""


def el_threshold_sweep_sql(candidates_path: str, links_path: str, thetas) -> str:
    """Mirrors kgp.stages.linking.threshold_sweep over the materialized
    gold candidate/link tables (the Spark side sweeps the live pipeline's
    candidate table — candidate parity is therefore checked too)."""
    th_rows = ", ".join(f"({float(t)!r})" for t in thetas)
    return f"""
WITH th AS (SELECT CAST(col0 AS DOUBLE) AS theta FROM (VALUES {th_rows}) t(col0)),
 best AS (SELECT cluster_id, entity_id, score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                  ORDER BY score DESC, entity_id, surface, alias) AS rk
        FROM read_parquet('{candidates_path}')) WHERE rk = 1),
 gold AS (SELECT cluster_id, entity_id FROM read_parquet('{links_path}')),
 pred AS (SELECT t.theta, b.cluster_id, b.entity_id FROM best b, th t WHERE b.score > t.theta),
 agg AS (SELECT p.theta, count(*) AS n_pred,
                sum(CASE WHEN g.entity_id IS NOT NULL THEN 1 ELSE 0 END) AS tp
         FROM pred p LEFT JOIN gold g
              ON p.cluster_id = g.cluster_id AND p.entity_id = g.entity_id
         GROUP BY p.theta),
 ng AS (SELECT count(*) AS n_gold FROM gold),
 base AS (SELECT t.theta, CAST(coalesce(a.tp, 0) AS BIGINT) AS tp,
                 CAST(coalesce(a.n_pred, 0) AS BIGINT) AS n_pred,
                 CAST(ng.n_gold AS BIGINT) AS n_gold
          FROM th t LEFT JOIN agg a ON t.theta = a.theta, ng),
 pr AS (SELECT *,
               CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0.0 END AS precision,
               CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0.0 END AS recall
        FROM base)
SELECT theta, tp, n_pred, n_gold, precision, recall,
       CASE WHEN precision + recall > 0
            THEN 2 * precision * recall / (precision + recall) ELSE 0.0 END AS f1
FROM pr
"""


def metric_span_prf_sql(pred_path: str, gold_path: str) -> str:
    """Mirrors kgp.metrics.span_prf_df over the two gold mention tables."""
    return f"""
WITH p AS (SELECT * FROM read_parquet('{pred_path}')),
 g AS (SELECT * FROM read_parquet('{gold_path}')),
 stats AS (SELECT
   (SELECT count(*) FROM p WHERE EXISTS (
      SELECT 1 FROM g WHERE g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx
        AND g."start" = p."start" AND g."end" = p."end" AND g.label = p.label)) AS tp,
   (SELECT count(*) FROM p) AS n_pred,
   (SELECT count(*) FROM g) AS n_true),
 pr AS (SELECT *,
   CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0.0 END AS precision,
   CASE WHEN n_true > 0 THEN tp / n_true ELSE 0.0 END AS recall
 FROM stats)
SELECT CAST(tp AS BIGINT) AS tp, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, precision, recall,
       CASE WHEN precision + recall > 0
            THEN 2 * precision * recall / (precision + recall) ELSE 0.0 END AS f1
FROM pr
"""


def metric_ann_recall_sql(
    n_queries: int, k: int, n_planes: int, n_tables: int, dim: int, seed: int
) -> str:
    """ranking_metrics(approx=LSH top-k, truth=exact top-k) twin: per-query
    precision@k / recall@k / ndcg@k. ndcg rounded to 9 dp on both engines
    (group-sum float order is the only difference; all other columns are
    exact integer ratios)."""
    dot = (
        "list_aggregate(list_transform(range(1, len(e.embedding) + 1), "
        "i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), 'sum')"
    )
    return f"""
WITH planes AS (SELECT tbl, j, col2 AS p FROM (VALUES
  {_planes_values(n_planes, n_tables, dim, seed)}) t(tbl, j, col2)),
 qset AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}),
 ib AS ({_bucket_cte('embeddings', 'vec_id', 'vec_id')}),
 qb AS ({_bucket_cte('qset', 'q_id', 'q_id', 'q_emb')}),
 cand AS (SELECT DISTINCT qb.q_id, ib.vec_id
          FROM ib JOIN qb ON ib.tbl = qb.tbl AND ib.bucket = qb.bucket),
 ascored AS (SELECT c.q_id, c.vec_id,
                    {dot} / ({_nrm('e.embedding')} * {_nrm('q.q_emb')}) AS cos
             FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
                         JOIN qset q ON q.q_id = c.q_id),
 approx AS (SELECT q_id AS u, vec_id AS item, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        FROM ascored) WHERE rank <= {k}),
 tscored AS (SELECT q.q_id, e.vec_id,
                    {dot} / ({_nrm('e.embedding')} * {_nrm('q.q_emb')}) AS cos
             FROM embeddings e, qset q),
 struth AS (SELECT q_id AS u, vec_id AS item FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        FROM tscored) WHERE rank <= {k}),
 hits AS (SELECT a.u, a.item, a.rank,
                 CASE WHEN t.item IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM approx a LEFT JOIN struth t ON a.u = t.u AND a.item = t.item),
 ntr AS (SELECT u, count(*) AS n_true FROM struth GROUP BY u),
 per AS (SELECT u, sum(hit) AS n_hit,
                sum((pow(2.0, hit) - 1) / log2(rank + 1)) AS dcg
         FROM hits GROUP BY u)
SELECT per.u AS user, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(n_true AS BIGINT) AS n_true,
       n_hit / {k} AS precision_at_k,
       n_hit / n_true AS recall_at_k,
       round(dcg / greatest(
         list_aggregate(list_transform(range(1, CAST(least(n_true, {k}) AS BIGINT) + 1),
                                       i -> 1.0 / log2(i + 1)), 'sum'),
         1e-12), 9) AS ndcg_at_k
FROM per JOIN ntr ON per.u = ntr.u
"""


def metric_micro_prf_sql(pred_path: str, gold_path: str) -> str:
    """A6 twin (eval_el.py:309-346 global accumulation): micro P/R/F1 of
    the EL candidate set against the gold link set, both as distinct
    (cluster_id, entity_id) pairs. Mirrors kgp.metrics.micro_prf_df."""
    return f"""
WITH p AS (SELECT DISTINCT cluster_id, entity_id FROM read_parquet('{pred_path}')),
 g AS (SELECT DISTINCT cluster_id, entity_id FROM read_parquet('{gold_path}')),
 stats AS (SELECT
   (SELECT count(*) FROM p WHERE EXISTS (
      SELECT 1 FROM g WHERE g.cluster_id = p.cluster_id
        AND g.entity_id = p.entity_id)) AS tp,
   (SELECT count(*) FROM p) AS n_pred,
   (SELECT count(*) FROM g) AS n_true),
 pr AS (SELECT *,
   CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0.0 END AS precision,
   CASE WHEN n_true > 0 THEN tp / n_true ELSE 0.0 END AS recall
 FROM stats)
SELECT CAST(tp AS BIGINT) AS tp, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, precision, recall,
       CASE WHEN precision + recall > 0
            THEN 2 * precision * recall / (precision + recall) ELSE 0.0 END AS f1
FROM pr
"""


def metric_frame_acc_sql(pred_path: str, gold_path: str) -> str:
    """A8 twin (CRF/metrics_utils.py:17-35 "all slots correct"): per-turn
    frame accuracy of a deterministically perturbed prediction table
    against the gold mentions. The perturbation (drop spans with
    (start*31 + end*7 + turn_idx) % 10 == 0, relabel those ≡ 1 to PER) is
    applied identically on both engines — the metric machinery, not a
    model, is the operator under test. Mirrors kgp.metrics.frame_accuracy_df."""
    return f"""
WITH g AS (SELECT conv_id, turn_idx, "start", "end", label
           FROM read_parquet('{gold_path}')),
 p AS (SELECT conv_id, turn_idx, "start", "end",
              CASE WHEN ("start" * 31 + "end" * 7 + turn_idx) % 10 = 1
                   THEN 'PER' ELSE label END AS label
       FROM read_parquet('{pred_path}')
       WHERE ("start" * 31 + "end" * 7 + turn_idx) % 10 <> 0),
 np_t AS (SELECT conv_id, turn_idx, count(*) AS np_t FROM p GROUP BY 1, 2),
 nt_t AS (SELECT conv_id, turn_idx, count(*) AS nt_t FROM g GROUP BY 1, 2),
 tp_t AS (SELECT conv_id, turn_idx, count(*) AS tp_t FROM p
          WHERE EXISTS (SELECT 1 FROM g
                        WHERE g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx
                          AND g."start" = p."start" AND g."end" = p."end"
                          AND g.label = p.label)
          GROUP BY 1, 2),
 frames AS (SELECT coalesce(np_t.np_t, 0) AS np_t, coalesce(nt_t.nt_t, 0) AS nt_t,
                   coalesce(tp_t.tp_t, 0) AS tp_t
            FROM np_t FULL OUTER JOIN nt_t USING (conv_id, turn_idx)
                      LEFT JOIN tp_t USING (conv_id, turn_idx))
SELECT CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN np_t = nt_t AND tp_t = nt_t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       sum(CASE WHEN np_t = nt_t AND tp_t = nt_t THEN 1 ELSE 0 END)::DOUBLE
         / count(*) AS accuracy
FROM frames
"""


def metric_re_prior_acc_sql(relations_path: str, mentions_path: str) -> str:
    """A9 twin (utils.py:61-65 ``(preds == labels).mean()``): accuracy of a
    label-pair-prior relation predictor — per (head_label, tail_label) the
    most frequent rel_id (ties broken by smaller rel_id) — against the
    emitted relation table."""
    return f"""
WITH r AS (SELECT head_mention_id, tail_mention_id, rel_id
           FROM read_parquet('{relations_path}')),
 m AS (SELECT mention_id, label FROM read_parquet('{mentions_path}')),
 lab AS (SELECT mh.label AS head_label, mt.label AS tail_label, r.rel_id
         FROM r JOIN m mh ON mh.mention_id = r.head_mention_id
                JOIN m mt ON mt.mention_id = r.tail_mention_id),
 prior AS (SELECT head_label, tail_label, rel_id AS prior_rel FROM (
    SELECT head_label, tail_label, rel_id,
           ROW_NUMBER() OVER (PARTITION BY head_label, tail_label
                              ORDER BY count(*) DESC, rel_id) AS rn
    FROM lab GROUP BY head_label, tail_label, rel_id) WHERE rn = 1)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN lab.rel_id = prior.prior_rel THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       avg(CASE WHEN lab.rel_id = prior.prior_rel THEN 1.0 ELSE 0.0 END) AS accuracy
FROM lab JOIN prior USING (head_label, tail_label)
"""


# ---------------------------------------------------------------------------
# S8 Excel dict / J9 negative sampling / W5 early stopping / F8 losses
# ---------------------------------------------------------------------------


def read_excel_dict_sql(csv_twin_path: str) -> str:
    """Twin of kgp.io.xlsx.read_excel_dict: DuckDB has no xlsx scan, so
    the fixture writer emits a byte-equivalent CSV of the same logical
    rows; equality across the two FORMATS certifies the xlsx parser."""
    return f"""
SELECT code AS icd_code, coalesce(name, '') AS entity_name
FROM read_csv('{csv_twin_path}', header=true, all_varchar=true)
"""


_CF_POS = """
pos AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u, CAST(l_partkey AS BIGINT) AS item
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)"""


def neg_sample_items_sql(attempts: int, seed: int, split_mod: int | None = None) -> str:
    """Twin of kgp.stages.training.negative_sample_items over the
    orders x lineitem interaction table (same md5-derived candidate
    stream, same bounded-rejection anti-join).

    With ``split_mod``, sampling runs over the md5-derived train split
    (hash % split_mod < split_mod - 1, i.e. the last residue is held
    out) while the candidate modulus stays the FULL universe's
    max(item)+1 — the reference's ``self.n_items`` semantics
    (loader_base.py:71-75): negatives can hit items unseen in the train
    split, and rejection tests train positives only."""
    if split_mod is None:
        train = "pos"
        train_cte = ""
    else:
        train = "train"
        train_cte = f""",
 train AS (SELECT u, item FROM pos
           WHERE CAST(('0x' || substr(md5(concat_ws('|', 'negsplit', u, item)), 1, 15))
                 AS UBIGINT) % {split_mod} < {split_mod - 1})"""
    return f"""
WITH {_CF_POS}{train_cte},
 st AS (SELECT max(item) + 1 AS n_items FROM pos),
 props AS (
   SELECT u, item AS pos_item, CAST(j AS INT) AS attempt,
          CAST(CAST(('0x' || substr(md5(concat_ws('|', '{seed}', u, item, j)), 1, 15))
               AS UBIGINT) % n_items AS BIGINT) AS neg_item
   FROM {train}, st, generate_series(1, {attempts}) AS g(j)
 ),
 surv AS (
   SELECT p.u, p.pos_item, p.neg_item, p.attempt,
          row_number() OVER (PARTITION BY p.u, p.pos_item ORDER BY p.attempt) AS rn
   FROM props p
   ANTI JOIN {train} t ON t.u = p.u AND t.item = p.neg_item
 )
SELECT u AS "user", pos_item, neg_item, CAST(attempt AS BIGINT) AS attempt
FROM surv WHERE rn = 1
"""


def early_stopping_sql(n_epochs: int, stopping_steps: int) -> str:
    """Twin of kgp.stages.training.early_stopping_history over the
    deterministic orders-derived epoch history (metric = max(o_totalprice)
    per epoch bucket: order-independent, so float-exact on both engines)."""
    return f"""
WITH hist AS (
  SELECT CAST(o_orderkey % {n_epochs} AS BIGINT) AS epoch,
         max(o_totalprice) AS recall
  FROM orders GROUP BY 1
),
 marked AS (
  SELECT epoch, recall,
         row_number() OVER (ORDER BY epoch) AS rn,
         recall > coalesce(
           max(recall) OVER (ORDER BY epoch ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST('-infinity' AS DOUBLE)) AS nb
  FROM hist
)
SELECT epoch, recall,
       max(recall) OVER (ORDER BY epoch) AS best_recall,
       max(CASE WHEN nb THEN epoch END) OVER (ORDER BY epoch) AS best_epoch,
       rn - max(CASE WHEN nb THEN rn END) OVER (ORDER BY epoch) >= {stopping_steps}
         AS should_stop
FROM marked
"""


def focal_loss_sql(gamma: float) -> str:
    """Twin of kgp.functions.losses.focal_loss over the deterministic
    lineitem-derived (logits, label) table (1-based list indexing matches
    element_at; max-shifted softmax matches the Spark fold)."""
    return f"""
WITH t AS (
  SELECT [l_discount * 10, l_tax * 10, ln(l_quantity + 1)] AS lg,
         CAST(l_linenumber % 3 AS INT) AS lb
  FROM lineitem
),
 r AS (
  SELECT lg[lb + 1] - list_max(lg)
         - ln(list_sum(list_transform(lg, x -> exp(x - list_max(lg))))) AS logp
  FROM t
)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(avg(-pow(1 - exp(logp), {gamma}) * logp), 6) AS focal_loss
FROM r
"""


def dice_loss_sql(smooth: float) -> str:
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n,
       round(1 - (2 * sum(l_discount * y) + {smooth})
                 / (sum(l_discount) + sum(y) + {smooth}), 6) AS dice_loss
FROM (SELECT l_discount, CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
      FROM lineitem)
"""


def bpr_loss_sql() -> str:
    """softplus(neg-pos) mean, max-shifted exactly like the Spark column."""
    return """
WITH t AS (
  SELECT l_tax * 10 - l_extendedprice / 10000 AS d FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(avg(greatest(d, 0) + ln(1 + exp(-abs(d)))), 6) AS bpr_loss
FROM t
"""


def _tok_expr(col: str) -> str:
    """SQL twin of kgp.functions.surrogate.tokenize: control-strip ->
    lower -> punct spacing -> \\s+ split, drop empties (collapse+strip
    are redundant under the final split, as tokenize_batch proves)."""
    return (
        "list_filter(string_split_regex(regexp_replace(lower("
        f"regexp_replace(coalesce({col}, ''), "
        r"'[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')), "
        '\'([.,!?;:()\\[\\]"\'\'])\', \' \\1 \', \'g\'), '
        r"'\s+'), x -> x <> '')"
    )


def crf_nll_sql(transcripts_path: str, surfaces) -> str:
    """Twin of kgp.functions.losses.crf_nll over the transcripts fixture
    (all-O gold labeling, the __spark_entry__ query's configuration).

    The forward algorithm's log-sum-exp recursion over time steps runs as a
    DuckDB RECURSIVE CTE with the 9-label alpha vector pivoted into columns
    (a0..a8) — each step is a pure scalar expression over the previous
    step's columns, so no aggregate is needed in the recursive term. The
    emission model (gazetteer B-/I- membership, CRF/modeling_bert.py:85-94
    surrogate) is rebuilt IN SQL from the (surface, etype) list via the
    same tokenize chain the Spark side uses, and the transition/start
    constants are generated from kgp.functions.surrogate.transition_matrix
    — one source of truth, two executors. Max-shifted log-sum-exp matches
    the numpy form term-for-term (same 9-term order), so float64 results
    agree to well below the 1e-6 rounding the compare hashes.
    """
    from kgp.functions.surrogate import ENTITY_TYPES, LABELS, NEG, transition_matrix

    L = len(LABELS)
    tr = transition_matrix()
    start = [NEG if lb.startswith("I-") else 0.0 for lb in LABELS]

    tok_expr = _tok_expr

    surf_values = ",\n    ".join(
        "('{}', '{}')".format(s.replace("'", "''"), t) for s, t in surfaces
    )
    types = list(ENTITY_TYPES)
    mask_cols = ", ".join(
        f"bool_or(etype = '{t}') AS {t.lower()}" for t in types
    )

    def em_col(j: int) -> str:
        # explicit DOUBLE casts: bare literals type as DECIMAL in DuckDB and
        # the recursive UNION ALL pins the base branch's types
        lb = LABELS[j]
        if lb == "O":
            return f"CAST(1.0 AS DOUBLE) AS e{j}"
        side = "b" if lb.startswith("B-") else "i"
        return (
            f"CASE WHEN {side}m.{lb[2:].lower()} THEN CAST(2.0 AS DOUBLE) "
            f"ELSE CAST({NEG!r} AS DOUBLE) END AS e{j}"
        )

    em_cols = ",\n         ".join(em_col(j) for j in range(L))
    base_cols = ",\n         ".join(
        (f"e{j} AS a{j}" if start[j] == 0.0 else f"({start[j]!r} + e{j}) AS a{j}")
        for j in range(L)
    )

    def step_col(j: int) -> str:
        terms = [
            (f"p.a{i}" if tr[i][j] == 0.0 else f"(p.a{i} + {tr[i][j]!r})")
            for i in range(L)
        ]
        mx = f"greatest({', '.join(terms)})"
        s = " + ".join(f"exp({t} - {mx})" for t in terms)
        return f"({mx} + ln({s}) + e.e{j}) AS a{j}"

    step_cols = ",\n         ".join(step_col(j) for j in range(L))
    a_list = ", ".join(f"a{j}" for j in range(L))
    fin_sum = " + ".join(f"exp(a{j} - mx)" for j in range(L))

    return f"""
WITH RECURSIVE turns AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         {tok_expr('text')} AS toks
  FROM read_parquet('{transcripts_path}')
),
tok AS (
  SELECT conv_id, turn_idx,
         unnest(toks) AS tok,
         unnest(generate_series(1, len(toks))) AS t
  FROM turns
),
surf(surface, etype) AS (VALUES
    {surf_values}
),
stok AS (
  SELECT etype,
         unnest({tok_expr('surface')}) AS tok,
         unnest(generate_series(1, len({tok_expr('surface')}))) AS st
  FROM surf
),
bmask AS (SELECT tok, {mask_cols} FROM stok WHERE st = 1 GROUP BY tok),
imask AS (SELECT tok, {mask_cols} FROM stok WHERE st > 1 GROUP BY tok),
em AS (
  SELECT k.conv_id, k.turn_idx, k.t,
         {em_cols}
  FROM tok k
  LEFT JOIN bmask bm ON bm.tok = k.tok
  LEFT JOIN imask im ON im.tok = k.tok
),
alpha AS (
  SELECT conv_id, turn_idx, t,
         {base_cols}
  FROM em WHERE t = 1
  UNION ALL
  SELECT e.conv_id, e.turn_idx, e.t,
         {step_cols}
  FROM alpha p
  JOIN em e ON e.conv_id = p.conv_id AND e.turn_idx = p.turn_idx
           AND e.t = p.t + 1
),
lens AS (SELECT conv_id, turn_idx, len(toks) AS n FROM turns),
fin AS (
  SELECT a.conv_id, a.turn_idx, greatest({a_list}) AS mx, {a_list}
  FROM alpha a JOIN lens l
    ON a.conv_id = l.conv_id AND a.turn_idx = l.turn_idx AND a.t = l.n
),
logz AS (
  SELECT conv_id, turn_idx, mx + ln({fin_sum}) AS logz FROM fin
),
gold AS (
  -- all-O path: start(O)=0, trans(O->O)=0, so score = sum of O emissions
  SELECT conv_id, turn_idx, sum(e0) AS g FROM em GROUP BY conv_id, turn_idx
)
SELECT l.conv_id, l.turn_idx,
       coalesce(round(z.logz - g.g, 6), 0.0) AS nll
FROM lens l
LEFT JOIN logz z ON z.conv_id = l.conv_id AND z.turn_idx = l.turn_idx
LEFT JOIN gold g ON g.conv_id = l.conv_id AND g.turn_idx = l.turn_idx
"""


def kgat_cf_eval_sql(k: int, seed: int, user_mod: int) -> str:
    """Twin of the full-ranking CF eval (J7 mask + W3 ranking + A11
    metrics, KGAT-pytorch/utility/metrics.py:121-146): same md5-derived
    deterministic train/test split and score table over the
    orders x lineitem interactions, same per-user window, same
    ndcg rounding discipline as metric_ann_recall_sql."""
    return f"""
WITH {_CF_POS},
 users AS (SELECT DISTINCT u FROM pos WHERE u % {user_mod} = 1),
 items AS (SELECT DISTINCT item FROM pos),
 split AS (
   SELECT u, item,
          CAST(('0x' || substr(md5(concat_ws('|', 'cfsplit', u, item)), 1, 15))
               AS UBIGINT) % 5 AS s
   FROM pos),
 train AS (SELECT u, item FROM split WHERE s < 3),
 test AS (SELECT u, item FROM split WHERE s >= 3),
 scores AS (
   SELECT users.u, items.item,
          CAST(CAST(('0x' || substr(md5(concat_ws('|', '{seed}', users.u, items.item)), 1, 15))
               AS UBIGINT) AS DOUBLE) / 1152921504606846976 AS score
   FROM users, items),
 masked AS (SELECT s.* FROM scores s
            ANTI JOIN train t ON t.u = s.u AND t.item = s.item),
 topk AS (SELECT * FROM (
     SELECT *, row_number() OVER (PARTITION BY u ORDER BY score DESC, item) AS rank
     FROM masked) WHERE rank <= {k}),
 truth AS (SELECT t.u, t.item FROM test t JOIN users USING (u)),
 hits AS (SELECT a.u, a.item, a.rank,
                 CASE WHEN t.item IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM topk a LEFT JOIN truth t ON a.u = t.u AND a.item = t.item),
 ntr AS (SELECT u, count(*) AS n_true FROM truth GROUP BY u),
 per AS (SELECT u, sum(hit) AS n_hit,
                sum((pow(2.0, hit) - 1) / log2(rank + 1)) AS dcg
         FROM hits GROUP BY u)
SELECT per.u AS "user", CAST(n_hit AS BIGINT) AS n_hit,
       CAST(n_true AS BIGINT) AS n_true,
       n_hit / {k} AS precision_at_k,
       n_hit / n_true AS recall_at_k,
       round(dcg / greatest(
         list_aggregate(list_transform(range(1, CAST(least(n_true, {k}) AS BIGINT) + 1),
                                       i -> 1.0 / log2(i + 1)), 'sum'),
         1e-12), 9) AS ndcg_at_k
FROM per JOIN ntr ON per.u = ntr.u
"""


def encode_markers_sql(
    transcripts_path: str, gold_path: str, max_len: int
) -> str:
    """Twin of the P8/P9/P4 encode_markers query: entity-marker insertion
    v2/v3 (data_loader.py:203-266), rel_position_ids over the marked
    sequence (:273-277), and the marker-overflow filter (P4) — all as
    DuckDB list slicing over the same tokenize chain. Spans are 0-based
    [s, e) word indexes; DuckDB list slices are 1-based inclusive, hence
    the +-1 bookkeeping. Pairs are same-turn gold-mention pairs with
    head.mention_id < tail.mention_id and disjoint spans (the insertion
    precondition), in either sentence order."""
    from kgp.functions.encoding import (
        HEAD_CLOSE,
        HEAD_OPEN,
        HEAD_REPL,
        TAIL_CLOSE,
        TAIL_OPEN,
        TAIL_REPL,
    )

    return f"""
WITH t AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         {_tok_expr('text')} AS toks
  FROM read_parquet('{transcripts_path}')
),
m AS (SELECT conv_id, turn_idx, "start" AS s, "end" AS e, mention_id
      FROM read_parquet('{gold_path}')),
pairs AS (
  SELECT h.conv_id, h.turn_idx,
         h.mention_id AS head_id, tl.mention_id AS tail_id,
         h.s AS hs, h.e AS he, tl.s AS ts, tl.e AS te
  FROM m h JOIN m tl
    ON h.conv_id = tl.conv_id AND h.turn_idx = tl.turn_idx
  WHERE h.mention_id < tl.mention_id
    AND (h.e <= tl.s OR tl.e <= h.s)
),
j AS (
  SELECT p.*, t.toks,
         least(p.hs, p.ts) AS s1,
         CASE WHEN p.hs < p.ts THEN p.he ELSE p.te END AS e1,
         greatest(p.hs, p.ts) AS s2,
         CASE WHEN p.hs < p.ts THEN p.te ELSE p.he END AS e2,
         p.hs < p.ts AS head_first
  FROM pairs p JOIN t ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
),
v2 AS (
  SELECT *,
         toks[1:s1]
           || [CASE WHEN head_first THEN '{HEAD_OPEN}' ELSE '{TAIL_OPEN}' END]
           || toks[s1 + 1:e1]
           || [CASE WHEN head_first THEN '{HEAD_CLOSE}' ELSE '{TAIL_CLOSE}' END]
           || toks[e1 + 1:s2]
           || [CASE WHEN head_first THEN '{TAIL_OPEN}' ELSE '{HEAD_OPEN}' END]
           || toks[s2 + 1:e2]
           || [CASE WHEN head_first THEN '{TAIL_CLOSE}' ELSE '{HEAD_CLOSE}' END]
           || toks[e2 + 1:] AS marked,
         s1 AS f_s, e1 + 2 AS f_e, s2 + 2 AS g_s, e2 + 4 AS g_e
  FROM j
),
v3 AS (
  SELECT *,
         toks[1:s1]
           || [CASE WHEN head_first THEN '{HEAD_REPL}' ELSE '{TAIL_REPL}' END]
           || toks[e1 + 1:s2]
           || [CASE WHEN head_first THEN '{TAIL_REPL}' ELSE '{HEAD_REPL}' END]
           || toks[e2 + 1:] AS marked,
         s1 AS f_s, s1 + 1 AS f_e,
         s1 + 1 + s2 - e1 AS g_s, s1 + 2 + s2 - e1 AS g_e
  FROM j
),
u AS (
  SELECT conv_id, turn_idx, head_id, tail_id, 'v2' AS variant, marked,
         head_first, f_s, f_e, g_s, g_e FROM v2
  UNION ALL
  SELECT conv_id, turn_idx, head_id, tail_id, 'v3' AS variant, marked,
         head_first, f_s, f_e, g_s, g_e FROM v3
),
spans AS (
  SELECT *,
         CASE WHEN head_first THEN f_s ELSE g_s END AS head_start,
         CASE WHEN head_first THEN f_e ELSE g_e END AS head_end,
         CASE WHEN head_first THEN g_s ELSE f_s END AS tail_start,
         CASE WHEN head_first THEN g_e ELSE f_e END AS tail_end
  FROM u WHERE len(marked) <= {max_len}
)
SELECT conv_id, turn_idx, head_id, tail_id, variant,
       array_to_string(marked, ' ') AS marked,
       CAST(head_start AS BIGINT) AS head_start,
       CAST(head_end AS BIGINT) AS head_end,
       CAST(tail_start AS BIGINT) AS tail_start,
       CAST(tail_end AS BIGINT) AS tail_end,
       array_to_string(
         list_transform(generate_series(0, len(marked) - 1),
           i -> CASE WHEN i >= head_start AND i < head_end THEN 1
                     WHEN i >= tail_start AND i < tail_end THEN 2
                     ELSE 0 END),
         ',') AS relpos
FROM spans
"""


def dedup_within_group_sql() -> str:
    """Twin of kgp.ops.dedup.dedup_within_group over events: first row
    per (user_id, event_type) ordered by (ts, event_id)."""
    return """
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(event_id AS BIGINT) AS event_id
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
"""


def cf_user_items_sql(path: str) -> str:
    """A3 twin: per-user sorted distinct item list, comma-joined."""
    return f"""
WITH adj AS ({read_cf_adjacency_sql(path).replace('"user"', 'u')})
SELECT CAST(u AS BIGINT) AS "user",
       string_agg(CAST(item AS VARCHAR), ',' ORDER BY item) AS items
FROM adj GROUP BY u
"""


def metric_triple_prf_sql(gold_path: str) -> str:
    """North-rule criterion twin: micro P/R/F1 of the live pipeline's
    emitted (conv_id, subj, pred, obj) triples against the
    reference-semantics oracle gold. The oracle side evaluates gold vs
    gold, so the driver's hash compare certifies the DISTRIBUTED
    pipeline at exactly P = R = F1 = 1.0 — the >=0.95 contract with
    margin; any dropped or invented triple breaks the hash."""
    return f"""
WITH g AS (SELECT DISTINCT conv_id, subj, pred, obj
           FROM read_parquet('{gold_path}')),
 stats AS (SELECT (SELECT count(*) FROM g) AS n),
 pr AS (SELECT n AS tp, n AS n_pred, n AS n_true,
               CASE WHEN n > 0 THEN 1.0 ELSE 0.0 END AS precision,
               CASE WHEN n > 0 THEN 1.0 ELSE 0.0 END AS recall
        FROM stats)
SELECT CAST(tp AS BIGINT) AS tp, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, precision, recall,
       CASE WHEN precision + recall > 0
            THEN 2 * precision * recall / (precision + recall) ELSE 0.0 END AS f1
FROM pr
"""
