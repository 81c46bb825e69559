"""Training-data pipeline composition operators: benchmark
decontamination, deterministic stratified sampling, quality filtering.

All pure built-in expressions (whole-stage codegen, no Python UDFs).
Scale notes per operator are in the docstrings — each is a
shuffle-bounded DataFrame plan that survives a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _word_ngrams(docs: DataFrame, n: int, id_col: str = "doc_id",
                 col: str = "text") -> DataFrame:
    """Distinct word n-grams per document: (id_col, gram).

    The DISTINCT is per document, so it runs row-locally over the gram
    array (``array_distinct``) before the explode — no shuffle; the old
    explode-then-global-``.distinct()`` paid a full (id, gram) exchange
    for a set that never crossed document boundaries."""
    t = F.split(F.trim(F.col(col)), r"\s+")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    ))
    return (
        docs.where(F.col(col).isNotNull() & (F.length(F.trim(F.col(col))) > 0))
        .select(F.col(id_col), F.explode(grams).alias("gram"))
    )


def decontaminate(docs: DataFrame, n: int = 5, bench_mod: int = 97) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥1 word ``n``-gram
    with a benchmark document (here: every ``bench_mod``-th doc stands in
    for the eval set).  Returns (corpus_id, bench_id, n_shared) pairs.

    100 TB shape: per-doc DISTINCT grams are row-local arrays
    (``array_distinct`` — no global distinct shuffle), the n-gram join is
    blocked on the gram value with the benchmark side broadcast (one
    shuffle total, for the final pair aggregation), and gram-frequency
    skew is bounded because grams are ``n`` words long (hapax-dominated
    at n ≥ 5).  Generated-SQL build over a spread scan (round-6: py4j
    build cost + one-file single-task scans dominated the wall)."""
    from sparrow_ipc_spark.functions.util import spread

    spread(docs).createOrReplaceTempView("_sipc_decon_in")
    return docs.sparkSession.sql(f"""
      WITH g AS (
        SELECT doc_id, explode(array_distinct(
                 transform(sequence(0, greatest(size(_t) - {n}, 0)),
                           x -> concat_ws(' ', slice(_t, x + 1, {n}))))) AS gram
        FROM (SELECT doc_id, split(trim(text), '\\\\s+') AS _t
              FROM _sipc_decon_in
              WHERE text IS NOT NULL AND length(trim(text)) > 0)
      )
      SELECT /*+ BROADCAST(b) */ c.doc_id AS corpus_id, b.doc_id AS bench_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM (SELECT * FROM g WHERE doc_id % {bench_mod} != 0) c
      JOIN (SELECT * FROM g WHERE doc_id % {bench_mod} = 0) b
        ON c.gram = b.gram
      GROUP BY c.doc_id, b.doc_id""")


# per-stratum keep thresholds: a doc is kept when the first 4 hex chars of
# md5(doc_id) sort below the threshold — a pure, engine-portable function
# of the id (no RNG, no sampleBy seed dependence), so the sample is
# reproducible across retries, engines, and cluster sizes
DEFAULT_STRATA_RATES = {"en": 0.25, "de": 0.5, "fr": 0.5, "es": 0.5}
FALLBACK_RATE = 1.0


def _hex_threshold(rate: float) -> str:
    # rate ≥ 1.0 → sentinel 'g', lexicographically above every 4-hex-digit
    # bucket ('f' < 'g'), so "keep everything" really keeps every row
    # (capping at 'ffff' would silently drop ~1/65536 of docs; a numeric
    # sentinel like '10000' sorts BELOW 'ffff' as a string)
    if rate >= 1.0:
        return "g"
    return format(max(0, int(rate * 65536)), "04x")


def stratified_sample(docs: DataFrame, rates: dict[str, float] | None = None,
                      stratum_col: str = "lang") -> DataFrame:
    """Deterministic stratified down-sampling by ``stratum_col``:
    keep doc when substr(md5(doc_id), 1, 4) < hex(rate · 2^16).

    The workhorse of corpus mixing (down-weight over-represented
    languages/sources).  Stateless map — no shuffle at all; the sampled
    fraction concentrates per-stratum within ±ε of the target at corpus
    scale because md5 is uniform on ids."""
    rates = rates or DEFAULT_STRATA_RATES
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = F.lit(_hex_threshold(FALLBACK_RATE))
    for stratum, rate in reversed(sorted(rates.items())):
        thr = F.when(F.col(stratum_col) == stratum,
                     F.lit(_hex_threshold(rate))).otherwise(thr)
    return (
        docs.where(h < thr)
        .select("doc_id", F.col(stratum_col).alias("stratum"), h.alias("bucket"))
    )


# PII patterns, ordered: redaction applies them SEQUENTIALLY in this order
# (email first so its digits can't be half-eaten by the phone pass; ssn
# before phone because a phone match could swallow an ssn-shaped span).
# Every pattern stays inside the Java-regex ∩ RE2 common subset — no
# lookaround, no backreferences, ASCII classes only — so a SQL oracle
# (DuckDB = RE2) replays the exact same matches.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # country code is an optional UNIT (digits + separator together):
    # a mandatory \d{1,3} prefix would otherwise eat the area code of a
    # bare 3-3-4 number like 555.867.5309 and fail the remainder
    ("phone", r"(\+?\d{1,3}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
)


def redact_pii(docs: DataFrame, col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """PII scrub — the redaction pass every training-data pipeline runs
    before anything ships to a tokenizer: emails, SSNs, phone numbers and
    IPv4 addresses replaced by typed placeholder tokens, with a per-type
    match count measured on the ORIGINAL text (counts are independent
    per pattern; the rewrite is sequential in ``PII_PATTERNS`` order, so
    downstream counts on ``clean_text`` would see zero).

    Returns ``(id_col, clean_text, n_email, n_ssn, n_phone, n_ipv4,
    pii_total)``; a NULL input row keeps a NULL ``clean_text`` and zero
    counts.

    Scale shape: one narrow projection, all JVM ``regexp_replace`` /
    ``regexp_extract_all`` inside whole-stage codegen — the per-row cost
    is the regex scans themselves, identical on 1 row or 10^12.  The
    input scan is spread (util.spread) so nine regex passes per row
    parallelize past a one-file input; on a well-partitioned table the
    operator stays exchange-free."""
    from sparrow_ipc_spark.functions.util import spread

    docs = spread(docs)
    src = F.col(col)
    counts = [
        F.coalesce(F.size(F.regexp_extract_all(src, F.lit(pat), F.lit(0))),
                   F.lit(0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = src
    for _, pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, token)
    out = docs.select(F.col(id_col), clean.alias("clean_text"), *counts)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def quality_filter(docs: DataFrame, min_tokens: int = 5, max_tokens: int = 2000,
                   min_alpha_ratio: float = 0.6) -> DataFrame:
    """Filter verdict per document with the first failing reason:
    null_text | too_short | too_long | low_alpha | ok.  Codegen-only."""
    t = F.trim(F.col("text"))
    n_tok = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    n_chars = F.length(F.col("text"))
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    reason = (
        F.when(F.col("text").isNull(), F.lit("null_text"))
        .when(n_tok < min_tokens, F.lit("too_short"))
        .when(n_tok > max_tokens, F.lit("too_long"))
        .when(alpha_ratio < min_alpha_ratio, F.lit("low_alpha"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        "doc_id", reason.alias("reason"), (reason == "ok").alias("keep")
    )
