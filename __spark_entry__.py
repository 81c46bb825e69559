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
    "dict_codes": 2 * (
        """
        SELECT event_type,
               CAST(dense_rank() OVER (ORDER BY event_type) AS BIGINT) AS code
        FROM (SELECT DISTINCT event_type FROM events) t
        """,
    ),
    "dict_encode": 2 * (
        """
        SELECT e.event_id, d.code
        FROM events e
        JOIN (SELECT event_type,
                     CAST(dense_rank() OVER (ORDER BY event_type) AS BIGINT) AS code
              FROM (SELECT DISTINCT event_type FROM events) t) d
          ON e.event_type = d.event_type
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
    "minhash_lsh_pairs": (
        """
        WITH toks AS (
          SELECT t.doc_id, t.tok, b.band
          FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS tok
                FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0) t
          CROSS JOIN (SELECT explode(array(0, 1, 2, 3)) AS band) b
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
        WITH toks AS (
          SELECT t.doc_id, t.tok, b.band
          FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0) t
          CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
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
        """
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

def _codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            int(rep["text_mismatches"]),
        )
    ]
    return spark.createDataFrame(row, schema)


def _codec_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column codec choices + bytes over the derived transcript table."""
    from sparrow_ipc_spark.operators.encode_job import encode_transcripts

    df = derived_transcripts(spark, sf_dir)
    blocks_df, _, _ = encode_transcripts(spark, df, n_parts=8)
    return (
        blocks_df.select(F.explode("columns").alias("c"))
        .groupBy(F.col("c.name").alias("col_name"), F.col("c.codec").alias("codec"))
        .agg(F.count("*").alias("n_blocks"))
    )


def _query_vector(spark: SparkSession, sf_dir: str) -> tuple[list[float], int]:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    return [float(v) for v in row["embedding"]], int(row["vec_id"])


def _cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the min-vec_id query vector (ANN baseline)."""
    from sparrow_ipc_spark.functions.similarity import cosine_topk

    qv, qid = _query_vector(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") != qid)
    return cosine_topk(emb, qv, k=10)


def _ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 (the scale path of cosine_topk)."""
    from sparrow_ipc_spark.functions.similarity import ann_topk

    qv, qid = _query_vector(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") != qid)
    return ann_topk(emb, qv, k=10, n_planes=8)


def _embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparrow_ipc_spark.functions.similarity import pairwise_cosine_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pairwise_cosine_dedup(emb, threshold=0.92, n_planes=8)


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparrow_ipc_spark.functions.dedup import simhash64

    return simhash64(_docs(spark, sf_dir))


def _ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified with exact word-3-gram Jaccard."""
    from sparrow_ipc_spark.functions.dedup import lsh_pairs, ngram_jaccard

    docs = _docs(spark, sf_dir)
    return ngram_jaccard(docs, lsh_pairs(docs), n=3)


def _image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparrow_ipc_spark.functions.multimodal import image_features, synthetic_media

    return image_features(synthetic_media(spark, n=96))


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _codec_roundtrip(spark, "/root/testdata/sf0.001")


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
    # engine-native / rows-only operators
    out["codec_roundtrip"] = _codec_roundtrip
    out["codec_selection"] = _codec_selection
    out["cosine_topk"] = _cosine_topk
    out["ann_topk"] = _ann_topk
    out["embedding_dedup"] = _embedding_dedup
    out["simhash"] = _simhash
    out["ngram_jaccard_lsh"] = _ngram_jaccard_lsh
    out["image_features"] = _image_features
    return out


def oracle_sql() -> dict[str, str]:
    return {name: pair[1] for name, pair in _SQL.items()}
