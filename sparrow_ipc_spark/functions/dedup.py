"""Deduplication operators: exact, prefix-blocked candidates, MinHash+LSH,
SimHash, n-gram Jaccard verification.

Scale design: every operator is a shuffle-on-key groupBy/join — no
pairwise O(n²) anywhere except *within* LSH buckets (bounded by bucket
size).  Hashes are md5-based where oracle parity matters (identical in
Spark and DuckDB) and xxhash64 (JVM-side, fast) where it doesn't.

Caching note: the self-join operators persist() their signature/shingle
tables (both join sides read them; unpersisted lineage recomputes the
most expensive aggregation twice).  The returned DataFrames are lazy, so
the functions cannot unpersist inline — a long-lived session scoring many
corpora should call ``spark.catalog.clearCache()`` between corpora (or
materialize and unpersist the inputs); otherwise eviction is LRU."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

TOKEN_SPLIT = r"\s+"


def exact_dedup(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-group exact duplicate detection: (hash, count, keeper id)."""
    c = F.col(col)
    return (
        df.where(c.isNotNull())
        .groupBy(F.md5(c).alias("h"))
        .agg(F.count("*").cast("long").alias("n"), F.min(id_col).alias("keep_id"))
    )


def dedup_keep_first(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return df with exact duplicates removed (lowest id wins)."""
    w = Window.partitionBy(F.md5(F.col(col))).orderBy(id_col)
    return (
        df.where(F.col(col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def prefix_candidates(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                      prefix_len: int = 40) -> DataFrame:
    """Blocking join on a text prefix → candidate near-dup pairs."""
    a = df.select(F.col(id_col).alias("id_a"), F.substring(col, 1, prefix_len).alias("_p"))
    b = df.select(F.col(id_col).alias("id_b"), F.substring(col, 1, prefix_len).alias("_p"))
    return a.join(b, "_p").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")


def _tokens(df: DataFrame, col: str, id_col: str) -> DataFrame:
    t = F.trim(F.col(col))
    return (
        df.where(F.col(col).isNotNull() & (F.length(t) > 0))
        .select(F.col(id_col), F.explode(F.split(t, TOKEN_SPLIT)).alias("tok"))
    )


def _shingles(df: DataFrame, col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, tok) rows where tok is a word n-gram (shingle).

    MinHash-LSH MUST run over shingles, not unigrams: on a shared-vocabulary
    corpus nearly every document contains the same common words, so unigram
    token sets have high pairwise Jaccard and the banded signatures collide
    for ~half of all pairs — an O(n²) candidate set at scale.  Shingles make
    non-duplicate Jaccard tiny, so band collisions track true similarity
    (the classic Broder construction)."""
    t = F.trim(F.col(col))
    toks = df.where(F.col(col).isNotNull() & (F.length(t) > 0)).select(
        F.col(id_col), F.split(t, TOKEN_SPLIT).alias("_toks")
    )
    return toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n)),
            )
        ).alias("tok"),
    )


def minhash_signatures(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                       n_bands: int = 4) -> DataFrame:
    """One min-hash per band per doc: (id, band, min_hash).

    Band-salted md5 over word tokens — a k-mins sketch with k = n_bands.
    groupBy(id, band) runs with map-side partial MIN, so the shuffle
    carries one row per (doc, band), not per token."""
    bands = F.explode(F.array(*[F.lit(i) for i in range(n_bands)])).alias("band")
    toks = _tokens(df, col, id_col).select(id_col, "tok", bands)
    h = F.md5(F.concat(F.col("band").cast("string"), F.lit("|"), F.col("tok")))
    return (
        toks.groupBy(id_col, "band").agg(F.min(h).alias("min_hash"))
    )


def lsh_pairs(df: DataFrame, col: str = "text", id_col: str = "doc_id",
              n_bands: int = 4, rows_per_band: int = 4,
              shingle_n: int = 3) -> DataFrame:
    """Candidate pairs sharing any banded minhash bucket over word
    3-gram shingles.

    Classic banding: each band's bucket key concatenates ``rows_per_band``
    independent minhashes, so collision probability is s^r per band with
    s = SHINGLE Jaccard.  Unigram tokens flood buckets on shared-vocabulary
    corpora (measured: 51% of all pairs collide at sf0.1 — an O(n²)
    candidate set); 3-gram shingles keep s near zero for non-duplicates, so
    the candidate set tracks true near-duplicates."""
    bands = F.explode(F.array(*[F.lit(i) for i in range(n_bands)])).alias("band")
    toks = _shingles(df, col, id_col, shingle_n).select(id_col, "tok", bands)

    def _h(salt: str):
        return F.md5(
            F.concat(F.lit(salt), F.col("band").cast("string"), F.lit("|"), F.col("tok"))
        )

    aggs = [F.min(_h(chr(97 + r))).alias(f"m{r}") for r in range(rows_per_band)]
    # sig feeds BOTH sides of the self-join: without persist Spark recomputes
    # the tokenize+explode+groupBy lineage twice (once per side)
    sig = toks.groupBy(id_col, "band").agg(*aggs).persist()
    keys = ["band"] + [f"m{r}" for r in range(rows_per_band)]
    a = sig.select(F.col(id_col).alias("id_a"), *keys)
    b = sig.select(F.col(id_col).alias("id_b"), *keys)
    return (
        a.join(b, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash64(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens (xxhash64, JVM-side).

    Per token, each of the 64 hash bits votes ±1; the sign of each bit's
    vote sum forms the fingerprint.  Implemented as explode → per-bit
    conditional sums → bit reassembly; one shuffle on id."""
    toks = _tokens(df, col, id_col)
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = toks.groupBy(id_col).agg(*aggs)
    # assemble bits via shifts (2**63 would overflow a signed long literal)
    fp = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = fp.bitwiseOR(F.shiftleft(bit, i))
    return votes.select(F.col(id_col), fp.alias("simhash"))


_HEX = "0123456789abcdef"


def simhash_md5(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash with an md5-derived token hash, output as a 16-char
    hex string — the oracle-parity variant of :func:`simhash64` (md5 is the
    one hash both Spark and DuckDB evaluate identically; xxhash64 has no
    DuckDB analog).  Bit j of hex digit k votes ±1 per token; digit k of the
    output is reassembled from the four vote signs."""
    toks = _tokens(df, col, id_col)
    h = F.md5("tok")
    dvs = toks.select(
        id_col,
        *[(F.instr(F.lit(_HEX), F.substring(h, k + 1, 1)) - 1).alias(f"d{k}")
          for k in range(16)],
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col(f"d{k}"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{k}_{j}")
        for k in range(16)
        for j in range(4)
    ]
    votes = dvs.groupBy(id_col).agg(*aggs)
    digits = []
    for k in range(16):
        dig = F.lit(0)
        for j in range(4):
            dig = dig + F.when(F.col(f"v{k}_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        digits.append(F.substring(F.lit(_HEX), dig + 1, 1))
    return votes.select(F.col(id_col), F.concat(*digits).alias("simhash"))


def simhash_near_pairs(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit chunks (any equal chunk
    → candidate; a pair within Hamming distance 3 must share one of the
    four 16-bit chunks), verify Hamming ≤ max_hamming via bit_count."""
    # feeds both self-join sides: without persist Spark recomputes the
    # tokenize+explode+64-bit-sum lineage twice (same discipline as
    # lsh_pairs and simhash_near_pairs_md5)
    sh = simhash64(df, col, id_col).persist()
    chunks = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for i in range(4)
        ])
    )
    blocked = sh.select(id_col, "simhash", chunks.alias("c")).select(
        id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val")
    )
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "val")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "val")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["chunk", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs_md5(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                           max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs over the md5-derived SimHash (:func:`simhash_md5`) —
    the ORACLE-parity variant of :func:`simhash_near_pairs` (xxhash64 has
    no DuckDB analog; md5 evaluates identically in both engines).

    Same blocked shape: candidates share one of four 4-hex-digit (16-bit)
    chunks — by pigeonhole every pair within Hamming distance 3 shares a
    chunk — then exact Hamming distance summed per hex digit via
    ``bit_count(xor(digit_a, digit_b))``.  One equality-join on
    (chunk, value); no all-pairs anywhere."""
    sh = simhash_md5(df, col, id_col).persist()  # feeds both join sides
    chunk_arr = F.array(*[F.substring("simhash", 1 + 4 * i, 4) for i in range(4)])
    blocked = sh.select(F.col(id_col), "simhash",
                        F.posexplode(chunk_arr).alias("chunk", "val"))
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                       "chunk", "val")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                       "chunk", "val")
    ham = F.lit(0)
    for k in range(16):
        da = F.instr(F.lit(_HEX), F.substring("sh_a", k + 1, 1)) - 1
        db = F.instr(F.lit(_HEX), F.substring("sh_b", k + 1, 1)) - 1
        ham = ham + F.bit_count(da.bitwiseXOR(db).cast("long"))
    return (
        a.join(b, ["chunk", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame, col: str = "text",
                  id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact word n-gram Jaccard similarity for candidate pairs.

    Pairwise verify stage after blocking (LSH/prefix): set sizes via
    distinct n-grams per doc, intersection via join on n-gram."""
    t = F.trim(F.col(col))
    toks = df.where(F.col(col).isNotNull() & (F.length(t) > 0)).select(
        F.col(id_col), F.split(t, TOKEN_SPLIT).alias("_toks")
    )
    grams = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n)),
            )
        ).alias("gram"),
    ).distinct().persist()  # read 3× below (sizes + both join sides)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    ga = grams.select(F.col(id_col).alias("id_a"), "gram")
    gb = grams.select(F.col(id_col).alias("id_b"), "gram")
    inter = (
        pairs.join(ga, "id_a").join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    # LEFT join back onto the candidate set: a pair with zero shared grams
    # must verify as jaccard = 0.0, not silently vanish (callers reading
    # absence as "never scored" would mis-account candidates vs verdicts)
    return (
        pairs.select("id_a", "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
    )


def duplicated_spans(df: DataFrame, k: int = 5, col: str = "text",
                     id_col: str = "doc_id", min_docs: int = 2) -> DataFrame:
    """Cross-document duplicated k-token spans (substring-level dedup, the
    distributed re-expression of the suffix-array pass in Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022):
    every overlapping k-token window is hashed and windows occurring in
    ``>= min_docs`` DISTINCT documents are reported with document
    frequency, total occurrence count and a deterministic example.

    Scale shape: one explode + one groupBy on the span hash — map-side
    partial aggregation bounds the shuffle by the number of DISTINCT
    spans, and no join or window function appears anywhere.  md5 keeps
    the hash oracle-replicable in DuckDB."""
    t = F.trim(F.col(col))
    toks = (
        df.where(F.col(col).isNotNull() & (F.length(t) > 0))
        .select(F.col(id_col), F.split(t, TOKEN_SPLIT).alias("_toks"))
        .where(F.size("_toks") >= k)
    )
    spans = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - k),
                lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, k)),
            )
        ).alias("span"),
    )
    return (
        spans.groupBy(F.md5("span").alias("span_hash"))
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.col(id_col)).alias("example_doc"),
            F.min("span").alias("span"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def connected_components(edges: DataFrame, nodes: DataFrame,
                         id_col: str = "id", src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25,
                         driver_edge_cap: int = 2_000_000) -> DataFrame:
    """Distributed connected components by iterative min-label
    propagation: every node starts as its own component, each round takes
    the min component id over itself and its neighbors, and the loop stops
    when the (monotone non-increasing) sum of labels is unchanged.

    Returns ``(id_col, group_id)`` for EVERY node (singletons keep their
    own id).  The only driver-side data per round is one scalar aggregate.

    Scale notes: rounds = graph diameter.  Near-dup graphs are unions of
    near-cliques (diameter ~2-3), so 3-4 shuffle rounds close web-scale
    dedup graphs; for adversarial long-path graphs switch to the
    large-star/small-star alternation (Kiveris et al., SoCC 2014), which
    bounds rounds at O(log² n) with the same join+min building block.

    Two properties keep the loop scale-safe:

    * The iteration runs ONLY over nodes that appear in an edge — every
      other node is a singleton whose group is itself, attached by one
      final left join.  A web-scale corpus has billions of docs but the
      near-dup pair graph touches a small fraction of them, so the
      per-round shuffle is bounded by the pair graph, not the corpus.
    * Each round's labels are ``localCheckpoint``-ed (eager).  ``persist``
      alone caches data but the *logical plan* still deepens every round,
      and re-analysis cost grows super-linearly — measured on this repo's
      bench the un-truncated loop went 4 s → 136 s per round by iteration
      6; with lineage truncation every round is flat.
    * Two-tier execution: when the distinct edge set fits the driver
      (``driver_edge_cap``, default 2M edges ≈ tens of MB) the component
      labels come from a single union-find pass instead of ~diameter
      Spark rounds — the same local-contraction step big-graph CC systems
      use, with the iterative loop as the unbounded-scale path.  The cap
      is on EDGES (already deduplicated near-dup pairs), never on corpus
      rows, so the gate is a bounded-metadata collect.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if sym.count() <= 2 * driver_edge_cap:
        pair_rows = sym.where(F.col("u") < F.col("v")).collect()
        parent: dict = {}

        def _find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:          # path compression
                parent[x], x = r, parent[x]
            return r

        for r0 in pair_rows:
            a_, b_ = r0["u"], r0["v"]
            parent.setdefault(a_, a_)
            parent.setdefault(b_, b_)
            ra, rb = _find(a_), _find(b_)
            if ra != rb:
                parent[ra] = rb
        roots: dict = {}
        for n_ in parent:
            r_ = _find(n_)
            if r_ not in roots or n_ < roots[r_]:
                roots[r_] = n_                 # smallest member = group id
        id_type = nodes.schema[id_col].dataType
        out_schema = T.StructType([T.StructField("u", id_type),
                                   T.StructField("comp", id_type)])
        labelled_rows = [(n_, roots[_find(n_)]) for n_ in parent]
        labelled = edges.sparkSession.createDataFrame(labelled_rows, out_schema) \
            .select(F.col("u").alias(id_col), F.col("comp").alias("group_id"))
        return (
            nodes.select(F.col(id_col))
            .join(F.broadcast(labelled), id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("group_id"), F.col(id_col)).alias("group_id"))
        )
    comp = (
        sym.select("u").distinct()
        .select(F.col("u"), F.col("u").alias("comp"))
        .localCheckpoint(eager=True)
    )
    # decimal(38,0) keeps the convergence checksum exact under ANSI mode
    total = comp.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_iter):
        nbr = (
            sym.join(comp, "u")
            .select(F.col("v").alias("u"), F.col("comp"))
        )
        new = (
            comp.unionByName(nbr)
            .groupBy("u").agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        new_total = new.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
        comp = new
        if new_total == total:
            break
        total = new_total
    labelled = comp.select(F.col("u").alias(id_col), F.col("comp").alias("group_id"))
    return (
        nodes.select(F.col(id_col))
        .join(labelled, id_col, "left")
        .select(F.col(id_col),
                F.coalesce(F.col("group_id"), F.col(id_col)).alias("group_id"))
    )


def dup_groups(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Collapse a near-duplicate PAIR list into duplicate GROUPS — the
    step every dedup pipeline needs between pair generation (LSH/SimHash)
    and document selection.  ``group_id`` is the smallest member id and
    ``canonical`` marks the one row per group a keep-first policy retains.

    Returns ``(id_col, group_id, canonical boolean)`` for every document.
    """
    cc = connected_components(pairs, df.select(id_col).distinct(), id_col=id_col)
    return cc.select(
        F.col(id_col), F.col("group_id"),
        (F.col(id_col) == F.col("group_id")).alias("canonical"),
    )
