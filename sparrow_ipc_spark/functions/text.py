"""Text analysis operators: token counting, quality scoring, language
guess, document fingerprinting.  Pure built-in expressions — no Python
in the hot path; every operator stays inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# the \s+ token splitter as it must appear inside a generated SQL string
# literal (SQL literals consume one level of backslash escaping)
_WS_SQL = r"\\s+"


def token_count(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count per document (0 for empty, null for null)."""
    t = F.trim(F.col(col))
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    return df.select(F.col(id_col), n.cast("long").alias("n_tokens"))


BPE_TOKEN_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def token_count_bpe(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-style pre-tokenizer count: alnum words + individual punctuation
    marks (the standard byte-pair-encoding pre-split, public convention)."""
    c = F.col(col)
    n = F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))
    return df.select(F.col(id_col), n.cast("long").alias("n_bpe_tokens"))


def quality_metrics(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Char/alpha/space/punct counts — the integer inputs of a quality score."""
    c = F.col(col)
    return df.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_chars"),
        F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("long").alias("n_alpha"),
        F.length(F.regexp_replace(c, "[^ ]", "")).cast("long").alias("n_spaces"),
        F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", "")).cast("long").alias("n_punct"),
    )


def quality_score(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality in [0,1]: alpha ratio, word-length sanity, length."""
    m = quality_metrics(df, col, id_col)
    alpha_ratio = F.col("n_alpha") / F.greatest(F.col("n_chars"), F.lit(1))
    punct_ratio = F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1))
    len_score = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    score = (0.5 * alpha_ratio + 0.3 * (1 - punct_ratio) + 0.2 * len_score)
    return m.select(id_col, score.alias("quality"))


_LANG_MARKERS = {
    "en": (" the ", " and "),
    "de": (" der ", " und "),
    "fr": (" le ", " et "),
    "es": (" el ", " y "),
}


def lang_guess(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language guess (deterministic n-gram heuristic)."""
    c = F.col(col)
    expr: Column = F.lit("unknown")
    for lang, (a, b) in reversed(list(_LANG_MARKERS.items())):
        expr = F.when((F.instr(c, a) > 0) | (F.instr(c, b) > 0), F.lit(lang)).otherwise(expr)
    return df.where(c.isNotNull()).select(F.col(id_col), expr.alias("lang_guess"))


def doc_fingerprint(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonicalized content fingerprint (md5 of lower/trimmed text)."""
    c = F.col(col)
    return df.where(c.isNotNull()).select(
        F.col(id_col), F.md5(F.lower(F.trim(c))).alias("fp")
    )


def repetition_metrics(df: DataFrame, n: int = 2, col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition statistics (the Gopher/MassiveText
    repetitious-text filter inputs, public rules): per doc the total word
    ``n``-gram count, distinct count, the most frequent gram's count, and
    the duplicate-gram fraction.

    100 TB shape: ZERO shuffles.  Every statistic is a function of one
    document's own grams, so it is computed row-locally over the gram
    array (sort + run scan) instead of explode → groupBy(doc, gram) →
    groupBy(doc) — the former plan shuffled (doc_id, gram) cardinality
    twice for values that never needed to leave their row.  Plan is
    generated SQL over a spread scan (round-6 measurements: the Column
    build alone was seconds of py4j; a one-file input pinned the map
    stage to one core)."""
    from sparrow_ipc_spark.functions.util import ident, spread

    i, c = ident(id_col), ident(col)
    # docs with fewer than n tokens have ZERO n-grams (no truncated
    # partial gram) and are absent from the output — a repetition
    # fraction over no grams is undefined.  The trim-length guard keeps
    # n=1 correct too: split('') == [''] would otherwise count one empty
    # "gram" for an empty document.  The longest run of equal values in
    # the sorted gram array == the most frequent gram's count (grams are
    # never null: concat_ws of non-null tokens).
    spread(df).createOrReplaceTempView("_sipc_rep_in")
    return df.sparkSession.sql(f"""
      WITH b AS (
        SELECT {i}, array_sort(transform(sequence(0, size(_t) - {n}),
                                         x -> concat_ws(' ', slice(_t, x + 1, {n})))) AS _srt
        FROM (SELECT {i}, split(trim({c}), '{_WS_SQL}') AS _t FROM _sipc_rep_in
              WHERE {c} IS NOT NULL AND length(trim({c})) > 0)
        WHERE size(_t) >= {n}
      ), s AS (
        SELECT {i}, CAST(size(_srt) AS BIGINT) AS n_grams,
               CAST(size(array_distinct(_srt)) AS BIGINT) AS n_distinct,
               aggregate(_srt,
                 struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run,
                        CAST(0 AS BIGINT) AS best),
                 (acc, x) -> struct(x AS prev,
                   CASE WHEN x <=> acc.prev THEN acc.run + 1
                        ELSE CAST(1 AS BIGINT) END AS run,
                   greatest(acc.best,
                            CASE WHEN x <=> acc.prev THEN acc.run + 1
                                 ELSE CAST(1 AS BIGINT) END) AS best),
                 acc -> acc.best) AS top_gram_n
        FROM b)
      SELECT {i}, n_grams, n_distinct, top_gram_n,
             1.0 - n_distinct / n_grams AS dup_gram_frac
      FROM s""")


def vocab_stats(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary statistics: per whitespace token its total term
    frequency and document frequency — the input table of tokenizer/BPE
    training and stop-word derivation.

    One explode + one grouped aggregation (partial combine); at 100 TB the
    shuffle key is the token, bounded by vocabulary size."""
    t = F.trim(F.col(col))
    toks = (
        df.where(F.col(col).isNotNull() & (F.length(t) > 0))
        .select(F.col(id_col), F.explode(F.split(t, r"\s+")).alias("tok"))
    )
    return toks.groupBy("tok").agg(
        F.count("*").cast("long").alias("tf"),
        F.countDistinct(id_col).cast("long").alias("df"),
    )


# URL pattern in the Java-regex ∩ RE2 common subset.  The character class
# deliberately omits quotes/parens (so quoted or parenthesized URLs don't
# drag closing punctuation in) — a trailing sentence dot IS included, which
# is the standard crude-extractor trade-off; both engines of an oracle pair
# see identical spans either way.
URL_PATTERN = r"https?://[A-Za-z0-9._~:/?#@!$&*+,;=%-]+"
_DOMAIN_OF_URL = r"^[A-Za-z]+://([^/:?#]+)"


def extract_urls(df: DataFrame, col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per URL occurrence: ``(id_col, url, domain)``.  Domain is
    the lowercased authority (host) component.  Pure narrow explode —
    whole-stage codegen; the input scan is spread so the per-row regex
    work parallelizes past a one-file input (no-op on a well-partitioned
    table)."""
    from sparrow_ipc_spark.functions.util import spread

    urls = F.explode(
        F.regexp_extract_all(F.col(col), F.lit(URL_PATTERN), F.lit(0)))
    return (
        spread(df).where(F.col(col).isNotNull())
        .select(F.col(id_col), urls.alias("url"))
        .withColumn("domain",
                    F.lower(F.regexp_extract(F.col("url"),
                                             _DOMAIN_OF_URL, 1)))
    )


def url_stats(df: DataFrame, col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-domain link statistics over a web corpus — the input to
    domain-level filtering/blocklists: ``(domain, n_urls, n_docs,
    example_url)``.  One explode + one groupBy on domain; the shuffle is
    bounded by URL occurrences and map-side partial aggregation makes the
    per-domain reduce O(distinct domains)."""
    return (
        extract_urls(df, col, id_col)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_urls"),
             F.count_distinct(F.col(id_col)).alias("n_docs"),
             F.min("url").alias("example_url"))
    )
