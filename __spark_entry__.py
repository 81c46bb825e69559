"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship encode→decode→verify round trip on
transcripts deterministically derived from the sf0.001 ``events`` table.

``queries()`` exposes the engine's SQL-expressible operator analogs
(dictionary code assignment, RLE gaps-and-islands, delta encoding,
frame-of-reference bit widths — FIXTURES.md F3) plus the training-data
pipeline operators (exact dedup, minhash-LSH, token counting, quality
scoring, language guess, fingerprinting) with DuckDB oracles, and the
engine's own non-SQL operators (round trip, codec selection, cosine
top-k) as rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("events", "documents", "embeddings")


def _views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Transcripts derived deterministically from the driver's events table
# (BASELINE input_hint shape: conv_id, turn_idx, role, text, tool, ts)
# ---------------------------------------------------------------------------

_DERIVE_TRANSCRIPTS = """
SELECT format_string('conv_%06d', user_id)                            AS conv_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
                                                                      AS turn_idx,
       element_at(ARRAY('user','assistant','system','tool'),
                  CAST(pmod(event_id, 4) AS INT) + 1)                 AS role,
       concat(event_type, ' ', coalesce(props, ''))                   AS text,
       CASE WHEN pmod(event_id, 3) = 0 THEN event_type END            AS tool,
       ts
FROM events
"""


def derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("events",))
    return spark.sql(_DERIVE_TRANSCRIPTS)


# ---------------------------------------------------------------------------
# SQL-expressible queries: (spark_sql, duckdb_sql) pairs.  Texts are kept
# identical except where dialects diverge (unix_micros/epoch_us,
# instr/strpos, size/array_length, explode/unnest, regexp_replace 'g').
# ---------------------------------------------------------------------------

_MINHASH_SIG_SPARK = """
SELECT doc_id, band, MIN(md5(concat(CAST(band AS STRING), '|', tok))) AS min_hash
FROM (
  SELECT t.doc_id, t.tok, b.band
  FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS tok
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0) t
  CROSS JOIN (SELECT explode(array(0, 1, 2, 3)) AS band) b
) s
GROUP BY doc_id, band
"""

_MINHASH_SIG_DUCK = """
SELECT doc_id, band, MIN(md5(concat(CAST(band AS VARCHAR), '|', tok))) AS min_hash
FROM (
  SELECT t.doc_id, t.tok, b.band
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0) t
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
) s
GROUP BY doc_id, band
"""

_SQL: dict[str, tuple[str, str]] = {
    # --- codec-analog operators on the events table -----------------------
    # sorted-order code assignment WITHOUT a global window (an unpartitioned
    # window collapses to one task — the engine's own dictionary build never
    # does this; codes come from a distinct-distinct rank join instead)
    "dict_codes": 2 * (
        """
        SELECT a.event_type, CAST(COUNT(b.event_type) AS BIGINT) AS code
        FROM (SELECT DISTINCT event_type FROM events) a
        JOIN (SELECT DISTINCT event_type FROM events) b
          ON b.event_type <= a.event_type
        GROUP BY a.event_type
        """,
    ),
    "dict_encode": 2 * (
        """
        SELECT e.event_id, d.code
        FROM events e
        JOIN (
          SELECT a.event_type, CAST(COUNT(b.event_type) AS BIGINT) AS code
          FROM (SELECT DISTINCT event_type FROM events) a
          JOIN (SELECT DISTINCT event_type FROM events) b
            ON b.event_type <= a.event_type
          GROUP BY a.event_type
        ) d ON e.event_type = d.event_type
        """,
    ),
    "rle_runs": 2 * (
        """
        SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM (
          SELECT user_id, event_type,
                 SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
          FROM (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
            FROM events) o
        ) runs
        GROUP BY user_id, run_id, event_type
        """,
    ),
    "delta_ts": (
        """
        SELECT event_id,
               unix_micros(CAST(ts AS TIMESTAMP)) - lag(unix_micros(CAST(ts AS TIMESTAMP))) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
        FROM events
        """,
        """
        SELECT event_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
        FROM events
        """,
    ),
    "for_width": (
        """
        SELECT user_id, MIN(unix_micros(CAST(ts AS TIMESTAMP))) AS ref_us,
               MAX(unix_micros(CAST(ts AS TIMESTAMP))) - MIN(unix_micros(CAST(ts AS TIMESTAMP))) AS range_us,
               CAST(CASE WHEN MAX(unix_micros(CAST(ts AS TIMESTAMP))) = MIN(unix_micros(CAST(ts AS TIMESTAMP))) THEN 0
                    ELSE length(bin(MAX(unix_micros(CAST(ts AS TIMESTAMP))) - MIN(unix_micros(CAST(ts AS TIMESTAMP)))))
                    END AS BIGINT) AS bit_width
        FROM events GROUP BY user_id
        """,
        """
        SELECT user_id, MIN(epoch_us(ts)) AS ref_us,
               MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS range_us,
               CAST(CASE WHEN MAX(epoch_us(ts)) = MIN(epoch_us(ts)) THEN 0
                    ELSE length(bin(MAX(epoch_us(ts)) - MIN(epoch_us(ts))))
                    END AS BIGINT) AS bit_width
        FROM events GROUP BY user_id
        """,
    ),
    "dict_cost": 2 * (
        """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(length(event_type)) AS BIGINT) AS raw_bytes
        FROM events GROUP BY event_type
        """,
    ),
    # --- training-data pipeline operators on documents --------------------
    "exact_dedup": 2 * (
        """
        SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS keep_id
        FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
        """,
    ),
    "dedup_candidates": 2 * (
        """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM documents a JOIN documents b
          ON substr(a.text, 1, 40) = substr(b.text, 1, 40) AND a.doc_id < b.doc_id
        """,
    ),
    "minhash_signature": (_MINHASH_SIG_SPARK, _MINHASH_SIG_DUCK),
    # LSH over word 3-gram SHINGLES (unigram tokens collide for ~half of
    # all pairs on a shared-vocabulary corpus — O(n²) candidates at scale)
    "minhash_lsh_pairs": (
        """
        WITH g AS (
          SELECT doc_id, gram AS tok
          FROM (SELECT doc_id, split(trim(text), '\\\\s+') AS t
                FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0)
          LATERAL VIEW explode(
            transform(sequence(0, greatest(size(t) - 3, 0)),
                      i -> concat_ws(' ', slice(t, i + 1, 3)))) AS gram
        ), toks AS (
          SELECT g.doc_id, g.tok, b.band
          FROM g CROSS JOIN (SELECT explode(array(0, 1, 2, 3)) AS band) b
        ), sig AS (
          SELECT doc_id, band,
                 MIN(md5(concat('a', CAST(band AS STRING), '|', tok))) AS m0,
                 MIN(md5(concat('b', CAST(band AS STRING), '|', tok))) AS m1,
                 MIN(md5(concat('c', CAST(band AS STRING), '|', tok))) AS m2,
                 MIN(md5(concat('d', CAST(band AS STRING), '|', tok))) AS m3
          FROM toks GROUP BY doc_id, band
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
             AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id
        """,
        """
        WITH g AS (
          SELECT doc_id, array_to_string(list_slice(t, i + 1, i + 3), ' ') AS tok
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
               UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) u(i)
        ), toks AS (
          SELECT g.doc_id, g.tok, b.band
          FROM g CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
        ), sig AS (
          SELECT doc_id, band,
                 MIN(md5(concat('a', CAST(band AS VARCHAR), '|', tok))) AS m0,
                 MIN(md5(concat('b', CAST(band AS VARCHAR), '|', tok))) AS m1,
                 MIN(md5(concat('c', CAST(band AS VARCHAR), '|', tok))) AS m2,
                 MIN(md5(concat('d', CAST(band AS VARCHAR), '|', tok))) AS m3
          FROM toks GROUP BY doc_id, band
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
             AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id
        """,
    ),
    "token_count": (
        """
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE size(split(trim(text), '\\\\s+')) END AS BIGINT) AS n_tokens
        FROM documents
        """,
        """
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE array_length(regexp_split_to_array(trim(text), '\\s+'))
                    END AS BIGINT) AS n_tokens
        FROM documents
        """,
    ),
    "token_count_bpe": (
        """
        SELECT doc_id,
               CAST(size(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]', 0)) AS BIGINT)
                 AS n_bpe_tokens
        FROM documents
        """,
        r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT)
                 AS n_bpe_tokens
        FROM documents
        """,
    ),
    "quality_score": (
        """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS BIGINT) AS n_alpha,
               CAST(length(regexp_replace(text, '[^ ]', '')) AS BIGINT) AS n_spaces,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) AS BIGINT) AS n_punct
        FROM documents
        """,
        """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
               CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_spaces,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
        FROM documents
        """,
    ),
    "lang_guess": (
        """
        SELECT doc_id,
               CASE WHEN instr(text, ' the ') > 0 OR instr(text, ' and ') > 0 THEN 'en'
                    WHEN instr(text, ' der ') > 0 OR instr(text, ' und ') > 0 THEN 'de'
                    WHEN instr(text, ' le ') > 0 OR instr(text, ' et ') > 0 THEN 'fr'
                    WHEN instr(text, ' el ') > 0 OR instr(text, ' y ') > 0 THEN 'es'
                    ELSE 'unknown' END AS lang_guess
        FROM documents WHERE text IS NOT NULL
        """,
        """
        SELECT doc_id,
               CASE WHEN strpos(text, ' the ') > 0 OR strpos(text, ' and ') > 0 THEN 'en'
                    WHEN strpos(text, ' der ') > 0 OR strpos(text, ' und ') > 0 THEN 'de'
                    WHEN strpos(text, ' le ') > 0 OR strpos(text, ' et ') > 0 THEN 'fr'
                    WHEN strpos(text, ' el ') > 0 OR strpos(text, ' y ') > 0 THEN 'es'
                    ELSE 'unknown' END AS lang_guess
        FROM documents WHERE text IS NOT NULL
        """,
    ),
    "doc_fingerprint": 2 * (
        """
        SELECT doc_id, md5(lower(trim(text))) AS fp
        FROM documents WHERE text IS NOT NULL
        """,
    ),
}


# --- simhash (md5-hex variant): generated for both dialects ----------------

def _simhash_sql(dialect: str) -> str:
    """64-bit SimHash over word tokens, md5-derived bits, hex-string output.

    Generated per dialect: Spark `instr`/`shiftright`, DuckDB `strpos`/`>>`.
    Bit j of hex digit k votes ±1 per token; output digit k reassembles the
    four vote signs."""
    hexs = "'0123456789abcdef'"
    if dialect == "spark":
        split = "explode(split(trim(text), '\\\\s+'))"
        pos = lambda c: f"instr({hexs}, {c})"
        shr = lambda x, j: f"shiftright({x}, {j})"
    else:
        split = "unnest(regexp_split_to_array(trim(text), '\\s+'))"
        pos = lambda c: f"strpos({hexs}, {c})"
        shr = lambda x, j: f"({x} >> {j})"
    dv = lambda k: f"({pos(f'substr(md5(tok), {k + 1}, 1)')} - 1)"
    votes = ",\n         ".join(
        f"SUM(CASE WHEN {shr(dv(k), j)} & 1 = 1 THEN 1 ELSE -1 END) AS v{k}_{j}"
        for k in range(16) for j in range(4)
    )
    digits = " || ".join(
        f"substr({hexs}, 1 + "
        + " + ".join(f"(CASE WHEN v{k}_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(4))
        + ", 1)"
        for k in range(16)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, {split} AS tok
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), votes AS (
      SELECT doc_id, {votes}
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, {digits} AS simhash FROM votes
    """


_SQL["simhash"] = (_simhash_sql("spark"), _simhash_sql("duck"))

# Gopher/MassiveText repetition-filter inputs: per-doc duplicate-2-gram
# stats (functions/text.py repetition_metrics); dup_gram_frac is a pure
# IEEE division of exact integers — identical in both engines, no rounding
_REPETITION_DUCK = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE text IS NOT NULL AND len(regexp_split_to_array(trim(text), '\s+')) >= 2
), g AS (
  SELECT doc_id, array_to_string(list_slice(t, i + 1, i + 2), ' ') AS gram
  FROM toks, UNNEST(range(0, len(t) - 2 + 1)) u(i)
), per AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_gram_n,
       1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_gram_frac
FROM per GROUP BY doc_id
"""
_SQL["repetition_metrics"] = (_REPETITION_DUCK, _REPETITION_DUCK)

# tokenizer/BPE-training input table: term + document frequency per token
_VOCAB_STATS_DUCK = r"""
SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0)
GROUP BY tok
"""
_SQL["vocab_stats"] = (_VOCAB_STATS_DUCK, _VOCAB_STATS_DUCK)


# --- LSH candidates + exact 3-gram Jaccard: both dialects -------------------

_NGRAM_SPARK = """
WITH toks AS (
  SELECT doc_id, split(trim(text), '\\\\s+') AS t
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
), allgrams AS (
  SELECT doc_id, gram FROM toks
  LATERAL VIEW explode(
    transform(sequence(0, greatest(size(t) - 3, 0)),
              i -> concat_ws(' ', slice(t, i + 1, 3)))) AS gram
), btoks AS (
  SELECT doc_id, gram AS tok, band FROM allgrams
  LATERAL VIEW explode(array(0, 1, 2, 3)) AS band
), sig AS (
  SELECT doc_id, band,
         MIN(md5(concat('a', CAST(band AS STRING), '|', tok))) AS m0,
         MIN(md5(concat('b', CAST(band AS STRING), '|', tok))) AS m1,
         MIN(md5(concat('c', CAST(band AS STRING), '|', tok))) AS m2,
         MIN(md5(concat('d', CAST(band AS STRING), '|', tok))) AS m3
  FROM btoks GROUP BY doc_id, band
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
       AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id
), grams AS (
  SELECT DISTINCT doc_id, gram FROM allgrams
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
), inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN grams ga ON ga.doc_id = p.id_a
  JOIN grams gb ON gb.doc_id = p.id_b AND gb.gram = ga.gram
  GROUP BY p.id_a, p.id_b
)
SELECT p.id_a, p.id_b,
       CAST(coalesce(i.n_inter, 0) AS DOUBLE)
         / (sa.sz + sb.sz - coalesce(i.n_inter, 0)) AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes sa ON sa.doc_id = p.id_a
JOIN sizes sb ON sb.doc_id = p.id_b
"""

_NGRAM_DUCK = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
), allgrams AS (
  SELECT doc_id, array_to_string(list_slice(t, i + 1, i + 3), ' ') AS gram
  FROM toks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) u(i)
), btoks AS (
  SELECT doc_id, gram AS tok, band
  FROM allgrams
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band)
), sig AS (
  SELECT doc_id, band,
         MIN(md5(concat('a', CAST(band AS VARCHAR), '|', tok))) AS m0,
         MIN(md5(concat('b', CAST(band AS VARCHAR), '|', tok))) AS m1,
         MIN(md5(concat('c', CAST(band AS VARCHAR), '|', tok))) AS m2,
         MIN(md5(concat('d', CAST(band AS VARCHAR), '|', tok))) AS m3
  FROM btoks GROUP BY doc_id, band
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
       AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id
), grams AS (
  SELECT DISTINCT doc_id, gram FROM allgrams
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
), inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN grams ga ON ga.doc_id = p.id_a
  JOIN grams gb ON gb.doc_id = p.id_b AND gb.gram = ga.gram
  GROUP BY p.id_a, p.id_b
)
SELECT p.id_a, p.id_b,
       CAST(coalesce(i.n_inter, 0) AS DOUBLE)
         / (sa.sz + sb.sz - coalesce(i.n_inter, 0)) AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes sa ON sa.doc_id = p.id_a
JOIN sizes sb ON sb.doc_id = p.id_b
"""

_SQL["ngram_jaccard_lsh"] = (_NGRAM_SPARK, _NGRAM_DUCK)

# cross-document duplicated k-token spans (substring-level dedup — the
# distributed re-expression of Lee et al. ACL 2022's suffix-array pass):
# one explode + one partial-agg groupBy in the engine; the oracle replays
# the identical window/hash construction
_DUP_SPANS_DUCK = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
), w AS (
  SELECT doc_id, array_to_string(list_slice(t, i + 1, i + 5), ' ') AS span
  FROM toks, UNNEST(range(0, len(t) - 5 + 1)) u(i)
  WHERE len(t) >= 5
)
SELECT md5(span) AS span_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(doc_id) AS example_doc,
       MIN(span) AS span
FROM w GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
"""
_SQL["duplicated_spans"] = (_DUP_SPANS_DUCK, _DUP_SPANS_DUCK)


# --- similarity-search oracles: exact cosine top-k in pure SQL ---------------
# The engine computes every dot/norm as a LEFT-ASSOCIATIVE fold of
# CAST(x AS DOUBLE) products (functions/similarity.py _dot/_norm), so a SQL
# expression with the same association order is IEEE-bit-identical term by
# term; cosine is rounded to 6 decimals on both sides to absorb the ~1e-15
# tail from the one remaining difference (numpy's pairwise-summed query
# norm vs the SQL fold).

_EMB_DIM = 64


def _dot_terms(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, _EMB_DIM + 1)
    )


_COSINE_SCORED = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           ORDER BY vec_id LIMIT 1),
scored AS (
  SELECT e.vec_id,
         ({_dot_terms('e.embedding', 'q.qv')})
         / (sqrt({_dot_terms('e.embedding', 'e.embedding')})
            * sqrt({_dot_terms('q.qv', 'q.qv')})) AS c
  FROM embeddings e, q WHERE e.vec_id <> q.qid
)
"""

_COSINE_EXACT_DUCK = _COSINE_SCORED + """
SELECT vec_id, ROUND(c, 6) AS cosine FROM scored
ORDER BY c DESC, vec_id LIMIT 10
"""

_SQL["cosine_topk"] = (_COSINE_EXACT_DUCK, _COSINE_EXACT_DUCK)
# ivf_topk probes ALL inverted lists in the contract query (n_probe =
# n_centroids): assignment + probe + re-rank machinery is then provably
# exact, so the exact-cosine SQL is its oracle; the approximate
# (n_probe < n_centroids) path is pytest-covered instead
_SQL["ivf_topk"] = (_COSINE_EXACT_DUCK, _COSINE_EXACT_DUCK)


def _ann_oracle_duck(n_planes: int = 8) -> str:
    """RHP-LSH replica in SQL: the seeded hyperplanes are embedded as
    double literals, each plane's sign bit re-derived with the same
    left-associative double dot product the engine uses, and the probe set
    is exactly the engine's multiprobe=1 contract — Hamming(bucket,
    q_bucket) ≤ 1."""
    from sparrow_ipc_spark.functions.similarity import _hyperplanes

    planes = _hyperplanes(_EMB_DIM, n_planes, seed=42)

    def bucket(col: str) -> str:
        bits = []
        for i, p in enumerate(planes):
            dot = " + ".join(
                f"CAST({col}[{j + 1}] AS DOUBLE) * ({float(v)!r})"
                for j, v in enumerate(p)
            )
            bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
        return " + ".join(bits)

    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           ORDER BY vec_id LIMIT 1),
qb AS (SELECT ({bucket('q.qv')}) AS bucket FROM q),
eb AS (
  SELECT e.vec_id,
         ({_dot_terms('e.embedding', 'q.qv')})
         / (sqrt({_dot_terms('e.embedding', 'e.embedding')})
            * sqrt({_dot_terms('q.qv', 'q.qv')})) AS c,
         ({bucket('e.embedding')}) AS bucket
  FROM embeddings e, q WHERE e.vec_id <> q.qid
)
SELECT eb.vec_id, ROUND(eb.c, 6) AS cosine
FROM eb, qb
WHERE bit_count(xor(CAST(eb.bucket AS BIGINT), CAST(qb.bucket AS BIGINT))) <= 1
ORDER BY eb.c DESC, eb.vec_id LIMIT 10
"""


_ANN_DUCK = _ann_oracle_duck()
_SQL["ann_topk"] = (_ANN_DUCK, _ANN_DUCK)


def _simhash_near_duck(max_hamming: int = 3, tail: str | None = None) -> str:
    """Chunk-blocked md5-SimHash near pairs (the exact DuckDB mirror of
    dedup.simhash_near_pairs_md5): same simhash, same 4×16-bit chunk
    blocking (pigeonhole-exact for Hamming ≤ 3), same per-hex-digit
    bit_count Hamming distance."""
    hx = "'0123456789abcdef'"
    ham = " + ".join(
        f"bit_count(xor(CAST(strpos({hx}, substr(a.simhash, {k + 1}, 1)) - 1 AS BIGINT),"
        f" CAST(strpos({hx}, substr(b.simhash, {k + 1}, 1)) - 1 AS BIGINT)))"
        for k in range(16)
    )
    cte = f"""s AS ({_simhash_sql('duck')}),
c AS (SELECT doc_id, simhash, i AS chunk, substr(simhash, CAST(1 + 4*i AS INTEGER), 4) AS val
      FROM s, UNNEST(range(0, 4)) u(i)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, ({ham}) AS hamming
  FROM c a JOIN c b ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
)"""
    if tail is None:
        tail = f"""
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= {max_hamming}
"""
    return f"WITH RECURSIVE {cte}{tail}"


_SIMHASH_NEAR_DUCK = _simhash_near_duck()
_SQL["simhash_near_pairs"] = (_SIMHASH_NEAR_DUCK, _SIMHASH_NEAR_DUCK)


def _dup_groups_duck(max_hamming: int = 3) -> str:
    """Connected components over the SimHash near-pair graph as a
    recursive CTE (min-label reachability): composes the exact
    simhash-pair CTEs with a walk that enumerates (node, reachable
    label) and keeps the minimum — the declarative twin of
    dedup.connected_components' iterative min propagation."""
    return _simhash_near_duck(max_hamming, tail=f""",
np AS (SELECT id_a, id_b FROM pairs WHERE hamming <= {max_hamming}),
edges AS (SELECT id_a AS u, id_b AS v FROM np
          UNION SELECT id_b, id_a FROM np),
nodes AS (SELECT DISTINCT doc_id AS id FROM documents),
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.id
)
SELECT id AS doc_id, MIN(comp) AS group_id,
       (id = MIN(comp)) AS canonical
FROM walk GROUP BY id
""")


_SQL["dup_groups"] = ("", _dup_groups_duck)

# planted-exact-copy recall oracle: every vec_id gets an exact duplicate at
# vec_id + 1000000; identical vectors land in the same RHP bucket by
# construction, so the engine's LSH dedup must return exactly these pairs
# (cosine rounds to 1.0) — recall is structurally provable, and the corpus
# itself contributes no ≥0.92 same-bucket pairs (verified at sf0.001-0.1)
_SQL["embedding_dedup"] = (
    """
    SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, CAST(1.0 AS DOUBLE) AS cosine
    FROM embeddings
    """,
) * 2


def _semantic_dedup_duck(k: int = 4, eps: float = 0.92, cap: int = 2000) -> str:
    """Full SQL mirror of the SemDeDup contract query: the seeded anchors
    ride in as double literals, every distance/cosine is the same
    left-associative CAST-to-DOUBLE fold the engine computes (anchor norms
    are a shared :func:`fold_norm` literal, so rank ties can't flip on a
    last-bit norm difference), and the greedy drop rule is the identical
    rank-window + within-cluster join."""
    from sparrow_ipc_spark.functions.similarity import fixed_anchors, fold_norm

    anchors = fixed_anchors(_EMB_DIM, k)

    def sqd(col: str, a) -> str:
        return " + ".join(
            f"(CAST({col}[{i + 1}] AS DOUBLE) - ({float(v)!r}))"
            f" * (CAST({col}[{i + 1}] AS DOUBLE) - ({float(v)!r}))"
            for i, v in enumerate(a)
        )

    def dotlit(col: str, a) -> str:
        return " + ".join(
            f"CAST({col}[{i + 1}] AS DOUBLE) * ({float(v)!r})"
            for i, v in enumerate(a)
        )

    dl = ", ".join(f"({sqd('embedding', a)})" for a in anchors)
    cl = ", ".join(
        f"(({dotlit('embedding', a)})"
        f" / (sqrt({_dot_terms('embedding', 'embedding')}) * ({fold_norm(a)!r})))"
        for a in anchors
    )
    pair_cos = (
        f"({_dot_terms('a.embedding', 'b.embedding')})"
        f" / (sqrt({_dot_terms('a.embedding', 'a.embedding')})"
        f" * sqrt({_dot_terms('b.embedding', 'b.embedding')}))"
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {cap}
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < {cap}
),
feat AS (
  SELECT vec_id, embedding, [{dl}] AS dl, [{cl}] AS cl FROM base
),
asg AS (
  SELECT vec_id, embedding,
         CAST(list_position(dl, list_min(dl)) - 1 AS INTEGER) AS cluster,
         cl[list_position(dl, list_min(dl))] AS c_cos
  FROM feat
),
rk AS (
  SELECT vec_id, embedding, cluster, c_cos,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY c_cos ASC NULLS LAST, vec_id ASC) AS rnk
  FROM asg
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM rk a JOIN rk b ON a.cluster = b.cluster AND a.rnk < b.rnk
  WHERE ({pair_cos}) >= {float(eps)!r}
)
SELECT r.vec_id, r.cluster, ROUND(r.c_cos, 6) AS centroid_cos,
       (d.vec_id IS NULL) AS kept
FROM rk r LEFT JOIN dropped d ON r.vec_id = d.vec_id
"""


_SQL["semantic_dedup"] = ("", _semantic_dedup_duck)

# container-codec decode proofs: the Spark side runs the FULL encode→decode
# pipeline over constructed map / nested-array columns, the oracle
# reconstructs the expected rows directly from the parquet
_SQL["map_decode"] = (
    """
    SELECT event_id, 'type' AS key, event_type AS value FROM events
    UNION ALL
    SELECT event_id, 'props' AS key, props AS value FROM events
    """,
) * 2

_SQL["nested_decode"] = (
    """
    SELECT vec_id, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           element_at(embedding, CAST(32 * i + j + 1 AS INT)) AS val
    FROM embeddings
    LATERAL VIEW explode(array(0, 1)) AS i
    LATERAL VIEW explode(sequence(0, 31)) AS j
    """,
    """
    SELECT vec_id, CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
           embedding[CAST(32 * i + j + 1 AS INTEGER)] AS val
    FROM embeddings, UNNEST(range(0, 2)) u(i), UNNEST(range(0, 32)) w(j)
    """,
)


# --- pipeline composition: decontamination / sampling / filtering ----------
# Spark side runs functions.pipeline (DataFrame API, codegen-only); the
# first tuple element is unused for these names (queries() overrides them).

_DECONTAMINATE_DUCK = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i + 1, i + 5), ' ') AS gram
  FROM toks, UNNEST(range(0, greatest(len(t) - 5, 0) + 1)) u(i)
)
SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM grams c JOIN grams b ON c.gram = b.gram
WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
GROUP BY c.doc_id, b.doc_id
"""
_SQL["decontaminate"] = (_DECONTAMINATE_DUCK, _DECONTAMINATE_DUCK)

_STRATIFIED_DUCK = """
SELECT doc_id, lang AS stratum, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
  CASE lang WHEN 'en' THEN '4000' WHEN 'de' THEN '8000'
            WHEN 'fr' THEN '8000' WHEN 'es' THEN '8000' ELSE 'g' END
"""
_SQL["stratified_sample"] = (_STRATIFIED_DUCK, _STRATIFIED_DUCK)

_QUALITY_FILTER_DUCK = """
SELECT doc_id, reason, reason = 'ok' AS keep
FROM (
  SELECT doc_id,
    CASE WHEN text IS NULL THEN 'null_text'
         WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END) < 5
           THEN 'too_short'
         WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END) > 2000
           THEN 'too_long'
         WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
              / greatest(length(text), 1) < 0.6 THEN 'low_alpha'
         ELSE 'ok' END AS reason
  FROM documents
)
"""
_SQL["quality_filter"] = (_QUALITY_FILTER_DUCK, _QUALITY_FILTER_DUCK)


def _redact_pii_duck() -> str:
    """DuckDB mirror of functions.pipeline.redact_pii over the same
    deterministically PII-planted documents.  Patterns are shared from
    PII_PATTERNS (Java-regex ∩ RE2 subset, so both engines match the
    same spans); counts are measured on the original text, the rewrite
    is the same sequential regexp_replace chain, and the full redacted
    text participates in the value hash."""
    from sparrow_ipc_spark.functions.pipeline import PII_PATTERNS

    clean = "text"
    for _, pat, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    counts = ",\n         ".join(
        f"COALESCE(len(regexp_extract_all(text, '{pat}')), 0) AS n_{name}"
        for name, pat, _ in PII_PATTERNS)
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' ssn 987-65-4320' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' call +1 (415) 555-0137' ELSE '' END
         || CASE WHEN doc_id % 17 = 0 THEN ' from 203.0.113.42' ELSE '' END
         AS text
  FROM documents
), scored AS (
  SELECT doc_id,
         {clean} AS clean_text,
         {counts}
  FROM planted
)
SELECT doc_id, clean_text, n_email, n_ssn, n_phone, n_ipv4,
       {total} AS pii_total
FROM scored
"""


_SQL["redact_pii"] = ("", _redact_pii_duck)


def _url_stats_duck() -> str:
    """DuckDB mirror of functions.text.url_stats over the same
    deterministically URL-planted documents (pattern shared from
    URL_PATTERN; Java-regex ∩ RE2 subset, identical spans)."""
    from sparrow_ipc_spark.functions.text import URL_PATTERN

    return f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                      || '.example.org/p?id=' || CAST(doc_id AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0
                 THEN ' img http://cdn.example.net/x/' || CAST(doc_id AS VARCHAR)
                 ELSE '' END
         AS text
  FROM documents
), urls AS (
  SELECT doc_id, u.url AS url
  FROM planted, UNNEST(regexp_extract_all(text, '{URL_PATTERN}')) AS u(url)
  WHERE text IS NOT NULL
)
SELECT lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(url) AS example_url
FROM urls
GROUP BY 1
"""


_SQL["url_stats"] = ("", _url_stats_duck)

# full write→read proof through the Spark Data Source surface: the Spark
# side pushes the events table through df.write.format("sparrow_ipc") and
# reads it back with spark.read.format("sparrow_ipc"); the oracle computes
# the same aggregate straight from the parquet — any encode/decode
# corruption (values, nulls, timestamps) breaks the hash match
_DATASOURCE_RT_DUCK = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(user_id) AS BIGINT) AS sum_user,
       CAST(COUNT(props) AS BIGINT) AS n_props,
       MIN(epoch_us(ts)) AS min_ts_us,
       CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_mill
FROM events GROUP BY event_type
"""
_SQL["datasource_roundtrip"] = (_DATASOURCE_RT_DUCK, _DATASOURCE_RT_DUCK)


def _sql_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _views(spark, sf_dir)
        return spark.sql(_SQL[name][0])

    return run


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# pipeline operators backed by sparrow_ipc_spark.functions (DataFrame API);
# the _SQL entries above remain the DuckDB oracle texts for these names
def _fn_query(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_docs(spark, sf_dir))

    return run


# ---------------------------------------------------------------------------
# Engine-native (non-SQL-expressible) queries — rows-only checks
# ---------------------------------------------------------------------------

# hex8(md5(key)): first 8 md5 hex chars as a number, built from the same
# instr/strpos hex-digit idiom the simhash oracles use — gives both
# dialects an identical per-row content fingerprint whose SUM detects any
# value corruption through the encode→decode path
_HEXS = "'0123456789abcdef'"


def _hex8_expr(key_expr: str, dialect: str) -> str:
    pos = (lambda c: f"instr({_HEXS}, {c})") if dialect == "spark" else (
        lambda c: f"strpos({_HEXS}, {c})")
    terms = " + ".join(
        f"CAST({pos(f'substr(md5({key_expr}), {k}, 1)')} AS BIGINT) * {16 ** (8 - k)}"
        for k in range(1, 9)
    )
    return f"({terms})"


def _rt_aggregates_sql(src: str, dialect: str) -> str:
    """Roundtrip-proof aggregates over a transcript relation: row counts,
    byte totals, ts extremes, and a summed per-row md5 fingerprint over
    every column — any decode corruption (values, nulls, ordering keys)
    moves at least one aggregate."""
    cast_str = "STRING" if dialect == "spark" else "VARCHAR"
    ts_us = ("unix_micros(cast(ts as timestamp))" if dialect == "spark"
             else "epoch_us(ts)")
    blen = "octet_length(text)" if dialect == "spark" else "strlen(text)"
    key = (f"concat(conv_id, '|', CAST(turn_idx AS {cast_str}), '|', "
           f"coalesce(role, ''), '|', coalesce(text, ''), '|', "
           f"coalesce(tool, ''), '|', CAST({ts_us} AS {cast_str}))")
    fp = _hex8_expr(key, dialect)
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(SUM({blen}) AS BIGINT) AS text_bytes,
       CAST(SUM(turn_idx) AS BIGINT) AS sum_turn_idx,
       MIN({ts_us}) AS min_ts_us,
       MAX({ts_us}) AS max_ts_us,
       CAST(SUM({fp}) AS BIGINT) AS row_fingerprint
FROM {src}
"""


_DERIVE_TRANSCRIPTS_DUCK = """
SELECT printf('conv_%06d', user_id)                                   AS conv_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
                                                                      AS turn_idx,
       list_extract(['user','assistant','system','tool'],
                    CAST(event_id % 4 AS INT) + 1)                    AS role,
       concat(event_type, ' ', coalesce(props, ''))                   AS text,
       CASE WHEN event_id % 3 = 0 THEN event_type END                 AS tool,
       ts
FROM events
"""


def _codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path — derive transcripts, distributed encode, decode —
    then roundtrip-proof aggregates.  The DuckDB oracle computes the SAME
    aggregates straight from the derived-transcripts SQL, so any
    encode/decode corruption anywhere in the codec stack breaks the hash
    match (closes the round-3 no-oracle row)."""
    from sparrow_ipc_spark.operators.decode_job import decode_blocks
    from sparrow_ipc_spark.operators.encode_job import encode_transcripts

    df = derived_transcripts(spark, sf_dir)
    # clustered=True: the derive window already leaves each conversation
    # contiguous and turn-sorted inside its shuffle partition (WindowExec
    # sorts by (user_id, ts, event_id); conv_id is a function of user_id
    # and turn_idx is the row_number in that exact order), so the encode
    # maps straight over the window output instead of paying a second
    # full-table repartition+sort — measured 3.5→2.3 s at sf0.1, decoded
    # aggregates identical (they are partitioning-invariant)
    blocks_df, dict_rows, _ = encode_transcripts(spark, df, clustered=True)
    dec = decode_blocks(spark, blocks_df, dict_rows)
    dec.createOrReplaceTempView("_decoded_transcripts")
    return spark.sql(_rt_aggregates_sql("_decoded_transcripts", "spark"))


_SQL["codec_roundtrip"] = (
    _rt_aggregates_sql(f"({_DERIVE_TRANSCRIPTS})", "spark"),
    _rt_aggregates_sql(f"({_DERIVE_TRANSCRIPTS_DUCK})", "duckdb"),
)


def _codec_roundtrip_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: encode derived transcripts, decode, verify bit-identity."""
    import pyspark.sql.types as T

    from sparrow_ipc_spark.operators.decode_job import decode_blocks
    from sparrow_ipc_spark.operators.encode_job import encode_transcripts
    from sparrow_ipc_spark.operators.verify import roundtrip_report

    df = derived_transcripts(spark, sf_dir).cache()
    blocks_df, dict_rows, _ = encode_transcripts(spark, df, n_parts=8)
    blocks_df = blocks_df.cache()
    dec = decode_blocks(spark, blocks_df, dict_rows)
    rep = roundtrip_report(df, dec)
    sizes = blocks_df.agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc"),
        F.count("*").alias("blocks"),
    ).collect()[0]
    schema = T.StructType(
        [
            T.StructField("n_turns", T.LongType()),
            T.StructField("n_blocks", T.LongType()),
            T.StructField("raw_bytes", T.LongType()),
            T.StructField("enc_bytes", T.LongType()),
            T.StructField("all_columns_identical", T.BooleanType()),
            T.StructField("text_mismatches", T.LongType()),
        ]
    )
    row = [
        (
            int(rep["rows_dec"]), int(sizes["blocks"]), int(sizes["raw"]),
            int(sizes["enc"]), bool(rep["all_columns_identical"]),
            # None = keyed text check skipped (can't happen on this
            # transcript-shaped data, but surface it as -1 ≠ oracle's 0
            # rather than TypeError if it ever did)
            int(-1 if rep["text_mismatches"] is None else rep["text_mismatches"]),
        )
    ]
    return spark.createDataFrame(row, schema)


def _codec_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column codec choices + block counts over the derived transcript
    table.  Selection is a PURE function of chunk content (required for
    Spark task-retry determinism), so the expected mix at the driver's
    sf0.01 gate is a fixed literal table — the oracle below (verified
    stable across repeated runs; regenerate it with
    ``python tools/gen_selection_oracle.py`` after any cost-model change)."""
    from sparrow_ipc_spark.operators.encode_job import encode_transcripts

    df = derived_transcripts(spark, sf_dir)
    blocks_df, _, _ = encode_transcripts(spark, df, n_parts=8)
    return (
        blocks_df.select(F.explode("columns").alias("c"))
        .groupBy(F.col("c.name").alias("col_name"), F.col("c.codec").alias("codec"))
        .agg(F.count("*").alias("n_blocks"))
    )


# expected codec mix at sf0.01 (8 salted parts, 1 block each; every column
# picks one codec consistently on this corpus): conv_id sorted runs → RLE,
# role/tool low-cardinality → global dict, free text → raw(+zstd),
# turn_idx/ts monotone-per-conversation → FoR bit-pack
_SQL["codec_selection"] = ("", """
SELECT CAST(col_name AS VARCHAR) AS col_name, CAST(codec AS VARCHAR) AS codec,
       CAST(n_blocks AS BIGINT) AS n_blocks
FROM (VALUES
  ('conv_id', 'rle', 8), ('role', 'dict', 8), ('text', 'raw', 8),
  ('tool', 'dict', 8), ('ts', 'for_bitpack', 8), ('turn_idx', 'for_bitpack', 8)
) AS t(col_name, codec, n_blocks)
""")


def _query_vector(spark: SparkSession, sf_dir: str) -> tuple[list[float], int]:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    return [float(v) for v in row["embedding"]], int(row["vec_id"])


def _round6(df: DataFrame) -> DataFrame:
    return df.select("vec_id", F.round("cosine", 6).alias("cosine"))


def _cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the min-vec_id query vector (ANN
    baseline) — oracle-checked against the exact-cosine SQL."""
    from sparrow_ipc_spark.functions.similarity import cosine_topk

    qv, qid = _query_vector(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") != qid)
    return _round6(cosine_topk(emb, qv, k=10))


def _ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 (the scale path of cosine_topk) —
    oracle-checked against a SQL replica of the seeded hyperplane buckets
    with the same multiprobe-1 probe set."""
    from sparrow_ipc_spark.functions.similarity import ann_topk

    qv, qid = _query_vector(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") != qid)
    return _round6(ann_topk(emb, qv, k=10, n_planes=8))


def _ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat top-10 probing ALL 16 inverted lists: the coarse-quantizer
    assignment + probe + re-rank machinery is then provably exact, so the
    exact-cosine SQL is its oracle (partial-probe recall is pytest-covered,
    tests/test_functions.py::test_ivf_topk and
    ::test_ivf_distributed_skewed_recall).  Centroids come from the
    DISTRIBUTED Lloyd trainer (hash-spread init + mapInPandas partial
    sums — the 10^9-vector path; the bounded driver sample trainer remains
    for small tables), so the oracle gate exercises the scale trainer."""
    from sparrow_ipc_spark.functions.similarity import (
        ivf_centroids_distributed, ivf_topk)

    qv, qid = _query_vector(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") != qid)
    cents = ivf_centroids_distributed(emb, n_centroids=16, iters=2)
    return _round6(ivf_topk(emb, qv, k=10, n_centroids=16, n_probe=16,
                            centroids=cents))


def _embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine dedup with planted exact copies (vec_id+10^6):
    the oracle is the planted-pair ground truth, so this checks recall AND
    false positives of the bucketed path end-to-end."""
    from sparrow_ipc_spark.functions.similarity import pairwise_cosine_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    planted = emb.select((F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding")
    out = pairwise_cosine_dedup(emb.unionByName(planted), threshold=0.92, n_planes=8)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph → duplicate groups: SimHash near pairs (the
    oracled md5 variant) collapsed by distributed min-label connected
    components; every doc gets (group_id = smallest member, canonical)."""
    from sparrow_ipc_spark.functions.dedup import dup_groups, simhash_near_pairs_md5

    docs = _docs(spark, sf_dir)
    pairs = simhash_near_pairs_md5(docs, max_hamming=3)
    return dup_groups(docs, pairs)


def _semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup contract query: deterministic seeded anchors stand in for
    trained centroids (so the DuckDB oracle can replay the identical
    geometry), planted exact copies at vec_id + 10^6 guarantee the drop
    path fires (the original out-ranks its copy on the id tie-break), and
    the id cap keeps the within-cluster pairwise cost fixed across scale
    factors.  The trained-centroid path (ivf_centroids_distributed) is
    pytest-covered instead (training is data-dependent, not
    SQL-replayable)."""
    from sparrow_ipc_spark.functions.similarity import fixed_anchors, semantic_dedup

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 2000)
    )
    planted = emb.select((F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
                         "embedding")
    return semantic_dedup(emb.unionByName(planted),
                          fixed_anchors(_EMB_DIM, 4), eps=0.92)


def _redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-scrub contract query: deterministic PII is planted onto the
    documents table (email carrying the doc_id, a fixed SSN / phone /
    IPv4 on different modulo strides, so overlap combinations occur),
    then functions.pipeline.redact_pii scrubs it.  The DuckDB oracle
    replays the identical planting and the identical sequential
    regexp_replace chain — the full redacted text is value-hashed, so a
    single mis-matched span anywhere in the corpus fails the gate."""
    from sparrow_ipc_spark.functions.pipeline import redact_pii

    d = F.col("doc_id")
    planted = _docs(spark, sf_dir).select(
        d,
        F.concat(
            F.col("text"),
            F.when(d % 7 == 0,
                   F.concat(F.lit(" contact user"), d.cast("string"),
                            F.lit("@example.com"))).otherwise(F.lit("")),
            F.when(d % 11 == 0, F.lit(" ssn 987-65-4320")).otherwise(F.lit("")),
            F.when(d % 13 == 0,
                   F.lit(" call +1 (415) 555-0137")).otherwise(F.lit("")),
            F.when(d % 17 == 0, F.lit(" from 203.0.113.42")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(planted)


def _url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain link-statistics contract query: deterministic URLs are
    planted on modulo strides (20 rotating site domains + one CDN domain,
    path carrying the doc_id) and functions.text.url_stats aggregates
    them; the oracle replays the identical planting and extraction."""
    from sparrow_ipc_spark.functions.text import url_stats

    d = F.col("doc_id")
    planted = _docs(spark, sf_dir).select(
        d,
        F.concat(
            F.col("text"),
            F.when(d % 5 == 0,
                   F.concat(F.lit(" see https://site"),
                            (d % 20).cast("string"),
                            F.lit(".example.org/p?id="),
                            d.cast("string"))).otherwise(F.lit("")),
            F.when(d % 9 == 0,
                   F.concat(F.lit(" img http://cdn.example.net/x/"),
                            d.cast("string"))).otherwise(F.lit("")),
        ).alias("text"),
    )
    return url_stats(planted)


def _simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-SimHash near-dup pairs (16-bit-chunk blocked), oracle-checked
    against the same construction in DuckDB.  The xxhash64 variant
    (dedup.simhash_near_pairs) is the JVM-fast scale path — same blocked
    plan, pytest-covered (xxhash64 has no DuckDB analog)."""
    from sparrow_ipc_spark.functions.dedup import simhash_near_pairs_md5

    return simhash_near_pairs_md5(_docs(spark, sf_dir), max_hamming=3)


def _map_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map<string,string> through the full encode→decode pipeline, exploded
    to rows; the oracle reconstructs the same rows straight from parquet."""
    from sparrow_ipc_spark.operators.decode_job import decode_blocks
    from sparrow_ipc_spark.operators.encode_job import (
        encode_table, infer_fields, spark_schema_for,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        F.create_map(
            F.lit("type"), F.col("event_type"), F.lit("props"), F.col("props")
        ).alias("m"),
    )
    fields = infer_fields(ev)
    blocks_df, dr, _ = encode_table(spark, ev)
    dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
    return dec.select("event_id", F.explode("m").alias("key", "value"))


def _nested_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array<array<float>> (reshaped embeddings) through encode→decode,
    flattened back to scalars — bit-identity proof for nested lists."""
    from sparrow_ipc_spark.operators.decode_job import decode_blocks
    from sparrow_ipc_spark.operators.encode_job import (
        encode_table, infer_fields, spark_schema_for,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.array(F.slice("embedding", 1, 32), F.slice("embedding", 33, 32)).alias("mat"),
    )
    fields = infer_fields(emb)
    blocks_df, dr, _ = encode_table(spark, emb)
    dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
    return (
        dec.select("vec_id", F.posexplode("mat").alias("i", "row"))
        .select("vec_id", "i", F.posexplode("row").alias("j", "val"))
    )


def _datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → df.write.format('sparrow_ipc') → spark.read.format(...) →
    aggregate; oracle aggregates the parquet directly."""
    import hashlib
    import tempfile

    from sparrow_ipc_spark.sources.datasource import SparrowIPCDataSource, read_encoded

    # runtime-settable: the harness session defaults this to false, which
    # would reject a pushFilters reader — enable it so reads get zone-map
    # pruning (read_encoded degrades gracefully if the set is refused)
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    spark.dataSource.register(SparrowIPCDataSource)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/sparrow_entry_ds_{tag}"
    from sparrow_ipc_spark.functions.util import spread

    # the events table is one unsplittable file: spread it so the write
    # encodes on every core (and the read back gets one task per block
    # file) instead of a single-task encode — aggregate unchanged
    ev = spread(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ev.write.format("sparrow_ipc").mode("overwrite").save(out)
    back = read_encoded(spark, out)
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("user_id").cast("long").alias("sum_user"),
        F.count("props").cast("long").alias("n_props"),
        # the read-back schema faithfully restores TIMESTAMP_NTZ (schema
        # sidecar) — cast like the delta_ts oracle does (session tz is UTC)
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("min_ts_us"),
        F.sum(F.floor(F.col("value") * 1000).cast("long")).cast("long").alias("sum_value_mill"),
    )


def _ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified with exact word-3-gram Jaccard."""
    from sparrow_ipc_spark.functions.dedup import lsh_pairs, ngram_jaccard

    docs = _docs(spark, sf_dir)
    return ngram_jaccard(docs, lsh_pairs(docs), n=3)


def _image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG + baseline-JPEG decode (vendored stdlib codecs) through
    the distributed mapInPandas path; floats quantized by floor(x * 10^5)
    so both sides compare exact integers (same double → same floor; no
    rounding-mode divergence)."""
    from sparrow_ipc_spark.functions.multimodal import image_features, synthetic_media

    feats = image_features(synthetic_media(spark, n=96), use_real_decode=True)
    return feats.select(
        "media_id", "width", "height",
        F.floor(F.col("mean_luma").cast("double") * 100000).cast("long").alias("mean_luma_q"),
        F.floor(F.col("byte_entropy").cast("double") * 100000).cast("long").alias("byte_entropy_q"),
    )


def _image_features_oracle_sql(n: int = 96) -> str:
    """Literal oracle built by replaying the deterministic media generator
    + the SAME vendored PNG/JPEG decode driver-side with NO Spark —
    verifies the distributed mapInPandas path (filtering, batching,
    schema, decode) against an independent single-process computation."""
    import math

    from sparrow_ipc_spark.functions.multimodal import (
        _decode_image_real, _entropy, synthetic_media_rows)

    import numpy as _np

    vals = []
    for mid, kind, _mime, _w, _h, _dur, payload in synthetic_media_rows(n):
        if kind != "image":
            continue
        img = _decode_image_real(bytes(payload))
        ml = float(_np.float32(img.mean()))
        be = float(_np.float32(_entropy(img)))
        vals.append(
            f"({mid}, {img.shape[1]}, {img.shape[0]}, "
            f"{math.floor(ml * 100000)}, {math.floor(be * 100000)})")
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(width AS INT) AS width, "
        "CAST(height AS INT) AS height, CAST(mean_luma_q AS BIGINT) AS mean_luma_q, "
        "CAST(byte_entropy_q AS BIGINT) AS byte_entropy_q FROM (VALUES "
        + ", ".join(vals)
        + ") AS t(media_id, width, height, mean_luma_q, byte_entropy_q)"
    )


# stored as a CALLABLE, resolved lazily by oracle_sql(): building the
# literal replays 32 PNG encode+decodes, which must not tax (or be able to
# break) every unrelated import of this module
_SQL["image_features"] = ("", _image_features_oracle_sql)


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _codec_roundtrip_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparrow_ipc_spark.functions import dedup as D
    from sparrow_ipc_spark.functions import text as X

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _sql_query(name) for name in _SQL
    }
    # pipeline ops delegate to the functions package (same outputs; the
    # _SQL texts stay as the DuckDB oracles)
    out["exact_dedup"] = _fn_query(D.exact_dedup)
    out["dedup_candidates"] = _fn_query(D.prefix_candidates)
    out["minhash_signature"] = _fn_query(D.minhash_signatures)
    out["minhash_lsh_pairs"] = _fn_query(D.lsh_pairs)
    out["token_count"] = _fn_query(X.token_count)
    out["token_count_bpe"] = _fn_query(X.token_count_bpe)
    out["quality_score"] = _fn_query(X.quality_metrics)
    out["lang_guess"] = _fn_query(X.lang_guess)
    out["doc_fingerprint"] = _fn_query(X.doc_fingerprint)
    out["repetition_metrics"] = _fn_query(X.repetition_metrics)
    out["vocab_stats"] = _fn_query(X.vocab_stats)
    # oracle-checked operators whose Spark side is engine machinery
    out["simhash"] = _fn_query(D.simhash_md5)
    out["duplicated_spans"] = _fn_query(D.duplicated_spans)
    # pipeline composition ops (functions.pipeline, codegen-only)
    from sparrow_ipc_spark.functions import pipeline as P

    out["decontaminate"] = _fn_query(P.decontaminate)
    out["stratified_sample"] = _fn_query(P.stratified_sample)
    out["quality_filter"] = _fn_query(P.quality_filter)
    out["redact_pii"] = _redact_pii
    out["url_stats"] = _url_stats
    out["ngram_jaccard_lsh"] = _ngram_jaccard_lsh
    out["embedding_dedup"] = _embedding_dedup
    out["semantic_dedup"] = _semantic_dedup
    out["dup_groups"] = _dup_groups
    out["map_decode"] = _map_decode
    out["nested_decode"] = _nested_decode
    out["datasource_roundtrip"] = _datasource_roundtrip
    # engine-native / rows-only operators
    out["codec_roundtrip"] = _codec_roundtrip
    out["codec_selection"] = _codec_selection
    out["cosine_topk"] = _cosine_topk
    out["ann_topk"] = _ann_topk
    out["ivf_topk"] = _ivf_topk
    out["simhash_near_pairs"] = _simhash_near_pairs
    out["image_features"] = _image_features
    return out


def oracle_sql() -> dict[str, str]:
    return {name: (pair[1]() if callable(pair[1]) else pair[1])
            for name, pair in _SQL.items()}
