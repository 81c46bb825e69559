"""Embedding similarity search over an array<float> column.

* ``cosine_topk`` — brute-force exact top-k against one query vector:
  JVM-side ``zip_with``/``aggregate`` dot products, a single scan, no
  shuffle except the final top-k (``orderBy ... limit`` runs as a
  per-partition TakeOrdered + driver merge).
* ``rhp_buckets`` / ``ann_topk`` — random-hyperplane LSH: sign bits of
  h deterministic projections form a bucket id; candidates come from the
  query's bucket (plus optional multi-probe neighbors), then exact
  re-rank.  The scale path: bucket join instead of full scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(c):
    # square in DOUBLE (float32 squares would quantize each term to 1e-8
    # relative — double keeps the whole fold IEEE-reproducible in any
    # engine that sums CAST(x AS DOUBLE)² left-associatively)
    return F.sqrt(F.aggregate(F.col(c) if isinstance(c, str) else c,
                              F.lit(0.0).cast("double"),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors of a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    # try_divide: an all-zero vector (or zero query) yields NULL cosine —
    # sorted after every real score by desc-nulls-last — instead of a
    # fatal DIVIDE_BY_ZERO under the session's default ANSI mode
    cos = F.try_divide(_dot(F.col(vec_col), q), _norm(vec_col) * F.lit(qn))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng([seed, 862_457])
    return rng.standard_normal((n_planes, dim))


def rhp_buckets(df: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
                vec_col: str = "embedding") -> DataFrame:
    """Append a random-hyperplane LSH bucket id column ``bucket``.

    Deterministic hyperplanes (seeded) as literal arrays → the projection
    is a JVM-side aggregate per plane; bucket = sign-bit integer."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.withColumn("bucket", bucket)


def ann_topk(df: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 12,
             seed: int = 42, vec_col: str = "embedding", id_col: str = "vec_id",
             multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: restrict the exact re-rank to the query's LSH
    bucket (and, with ``multiprobe``>0, buckets at Hamming distance 1)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = (planes @ np.asarray(query_vec) >= 0).astype(np.int64)
    qbucket = int((qbits << np.arange(n_planes)).sum())
    probes = {qbucket}
    if multiprobe:
        probes |= {qbucket ^ (1 << i) for i in range(n_planes)}
    bucketed = rhp_buckets(df, dim, n_planes, seed, vec_col)
    cand = bucketed.where(F.col("bucket").isin(*[int(b) for b in probes]))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ivf_centroids(df: DataFrame, n_centroids: int = 16, seed: int = 42,
                  sample: int = 2048, iters: int = 5,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Deterministic IVF coarse quantizer: Lloyd's k-means on a bounded,
    id-ordered sample pulled to the driver (sample size is capped, never
    the table), centroids then broadcast as literals.  Determinism: sample
    = lowest ``sample`` ids, init = first ``n_centroids`` sampled vectors."""
    rows = df.orderBy(id_col).limit(sample).select(vec_col).collect()
    x = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    if len(x) == 0:
        return np.zeros((0, 0))
    c = x[: min(n_centroids, len(x))].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
        a = d.argmin(1)
        for k in range(len(c)):
            m = a == k
            if m.any():
                c[k] = x[m].mean(0)
    return c


def ivf_centroids_distributed(df: DataFrame, n_centroids: int = 16, seed: int = 42,
                              iters: int = 3, vec_col: str = "embedding",
                              id_col: str = "vec_id", init_sample: int = 1024,
                              fraction: float | None = None) -> np.ndarray:
    """Distributed Lloyd k-means over the FULL table (scale path for
    :func:`ivf_centroids`, whose bounded id-ordered driver sample
    under-represents clusters whose rows don't appear among the lowest
    ids — at 10^9+ vectors the sample-trained centroids skew and probed
    recall degrades).

    * **Init** — a hash-spread sample: ``orderBy(xxhash64(id, seed))
      limit init_sample`` (a distributed TakeOrdered, deterministic,
      bounded) pools rows from *everywhere* in the table regardless of id
      locality, then greedy farthest-point seeding picks ``n_centroids``
      spread starts (k-means‖-flavored: spread-out init from a
      distributed sample instead of first-k ids).
    * **Each Lloyd round** — centroids ride into a ``mapInPandas`` pass as
      a plain numpy closure (broadcast-sized: k×dim floats); every Arrow
      batch computes assignments and per-cluster partial (count, Σvec)
      fully vectorized (no per-row Python).  Partials are reduced IN
      SPARK: the count is packed as element 0 of the partial-sum array,
      one ``posexplode`` + ``groupBy(cluster, j).sum`` bounds the shuffle
      at k×(dim+1) rows, and the driver collects exactly k×(dim+1)
      doubles per round — never rows of the table.
    * Empty clusters keep their previous centroid.  ``fraction``
      optionally trains each round on a deterministic Bernoulli sample of
      the table (the 100 TB knob: one pass over ~0.1% is plenty to place
      16-4096 coarse centroids).

    Full-probe ``ivf_topk`` is training-independent (any partition of the
    lists reproduces the exact scan), so correctness oracles hold under
    either trainer; this one exists for probed-recall quality at scale.
    """
    import pandas as pd

    samp = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(int(init_sample))
        .collect()
    )
    x = np.asarray([list(r[1]) for r in samp], dtype=np.float64)
    if len(x) == 0:
        return np.zeros((0, 0))
    k = min(n_centroids, len(x))
    # greedy farthest-point: spread seeds even when the sample is skewed
    chosen = [0]
    d_min = ((x - x[0]) ** 2).sum(-1)
    while len(chosen) < k:
        nxt = int(d_min.argmax())
        chosen.append(nxt)
        d_min = np.minimum(d_min, ((x - x[nxt]) ** 2).sum(-1))
    c = x[chosen].copy()
    dim = c.shape[1]

    train = df.sample(fraction=fraction, seed=seed) if fraction else df
    train = train.select(vec_col)

    for _ in range(max(0, iters)):
        cc = c.copy()  # closure snapshot for this round

        def partials(batches, _c=cc):
            csq = (_c ** 2).sum(-1)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray([np.asarray(v, dtype=np.float64)
                                for v in pdf[vec_col]])
                # ||x-c||² = ||x||² − 2·x·cᵀ + ||c||²  (argmin drops ||x||²)
                a = (X @ _c.T * -2.0 + csq[None]).argmin(1)
                out = []
                for kk in np.unique(a):
                    m = a == kk
                    # element 0 = count, 1.. = Σvec → one reduce for both
                    out.append((int(kk),
                                [float(m.sum())] + X[m].sum(0).tolist()))
                yield pd.DataFrame(out, columns=["cluster", "s"])

        red = (
            train.mapInPandas(partials, "cluster int, s array<double>")
            .select("cluster", F.posexplode("s").alias("j", "v"))
            .groupBy("cluster", "j").agg(F.sum("v").alias("v"))
            .collect()
        )
        sums = np.zeros((k, dim + 1))
        for r in red:
            sums[r["cluster"], r["j"]] = r["v"]
        nonempty = sums[:, 0] > 0
        c[nonempty] = sums[nonempty, 1:] / sums[nonempty, :1]
    return c


def _sq_dist(v, centroid: np.ndarray):
    plane = F.array(*[F.lit(float(t)) for t in centroid])
    return F.aggregate(
        F.zip_with(v, plane, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"), lambda acc, t: acc + t,
    )


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Append the nearest-centroid id as ``cluster`` (JVM-side expressions;
    at scale this is the partition/bucket key for the inverted lists)."""
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn("cluster", cluster)


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` inverted lists nearest
    the query, exact cosine re-rank inside them — the classic IVF-Flat
    scale path (brute force = ``cosine_topk``; RHP-LSH = ``ann_topk``)."""
    c = centroids if centroids is not None else ivf_centroids(
        df, n_centroids, seed, vec_col=vec_col, id_col=id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((c - q[None]) ** 2).sum(-1), kind="stable")
    probes = [int(i) for i in order[: max(1, n_probe)]]
    assigned = ivf_assign(df, c, vec_col)
    cand = assigned.where(F.col("cluster").isin(probes))
    return cosine_topk(cand.drop("cluster"), query_vec, k, vec_col, id_col)


def pairwise_cosine_dedup(df: DataFrame, threshold: float = 0.95, n_planes: int = 12,
                          seed: int = 42, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Embedding near-duplicate pairs: LSH bucket join (no O(n²) scan),
    exact cosine within buckets, keep pairs ≥ threshold."""
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    b = rhp_buckets(df, dim, n_planes, seed, vec_col)
    a = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    c = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    # try_divide: zero vectors score NULL (dropped by the >= threshold
    # filter) instead of throwing under ANSI mode
    cos = F.try_divide(_dot(F.col("va"), F.col("vb")), _norm("va") * _norm("vb"))
    return (
        a.join(c, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def fixed_anchors(dim: int, k: int, seed: int = 7) -> np.ndarray:
    """Deterministic data-independent anchor points (seeded gaussian).
    They stand in for trained centroids wherever a cross-engine oracle
    needs the cluster geometry to be a pure function of (dim, k, seed) —
    the real pipeline trains with :func:`ivf_centroids_distributed`."""
    rng = np.random.default_rng([seed, 424_242])
    return rng.standard_normal((k, dim))


def fold_norm(vec) -> float:
    """Left-associative Euclidean norm (``s += v*v`` in order).  Used for
    anchor norms so the engine and a SQL oracle divide by the *same*
    double literal instead of numpy's pairwise-summed norm (whose last-bit
    difference could flip a rank tie)."""
    s = 0.0
    for v in vec:
        s += float(v) * float(v)
    return float(np.sqrt(s))


def semantic_dedup(df: DataFrame, centroids: np.ndarray, eps: float = 0.92,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   n_salts: int = 16) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) re-expressed as
    DataFrame ops: cluster every embedding to its nearest centroid, then
    inside each cluster greedily keep the farthest-from-centroid item
    first (the paper's keep rule; ties by id) and drop anything whose
    cosine to an already-kept clustermate is ``>= eps``.

    Returns every input row as ``(id_col, cluster int, centroid_cos
    double(6), kept boolean)`` — survivors are ``kept = true``.

    Plan shape / 100 TB notes:

    * Assignment + centroid cosine are pure JVM fold expressions over
      broadcast-sized centroid literals — no shuffle, whole-stage codegen.
    * One shuffle on ``cluster`` feeds BOTH the rank window and the
      within-cluster candidate join (the assignment is persisted so the
      two consumers share lineage).
    * The candidate join is keyed ``(cluster, salt)`` with ``salt =
      rnk_b % n_salts`` and the a-side replicated across salts, so the
      O(|cluster|²) pair work spreads over ``k × n_salts`` tasks instead
      of ``k`` — with a handful of clusters (tests, small corpora) a
      cluster-only key would serialize the whole join onto k cores.
      Per-row norms are computed once before the join (bit-identical to
      folding them per pair, since the fold order is unchanged).
    * The candidate join is the paper's own O(|cluster|²/k) cost: the
      scale knob is the centroid count (SemDeDup uses ~50k clusters for
      10^8 items, keeping clusters at ~10^3-10^4 rows).  Train centroids
      with :func:`ivf_centroids_distributed` and size ``k ≈ N / 5k``; a
      pathologically hot cluster should be re-split (train a sub-quantizer
      on it) rather than salted, since the drop rule needs all pairs.
    * ``try_divide`` + NULLS LAST: a zero vector ranks last and can never
      drop (NULL cosine fails ``>= eps``) instead of crashing ANSI mode.
    """
    from pyspark.sql import Window

    c = np.asarray(centroids, dtype=np.float64)
    dists = F.array(*[_sq_dist(F.col(vec_col), ck) for ck in c])
    coss = F.array(*[
        F.try_divide(_dot(F.col(vec_col), F.array(*[F.lit(float(t)) for t in ck])),
                     _norm(vec_col) * F.lit(fold_norm(ck)))
        for ck in c
    ])
    pos = F.array_position(dists, F.array_min(dists)).cast("int")
    asg = df.select(
        F.col(id_col), F.col(vec_col),
        (pos - 1).alias("cluster"),
        F.element_at(coss, pos).alias("c_cos"),
    )
    w = Window.partitionBy("cluster").orderBy(F.asc_nulls_last("c_cos"), F.asc(id_col))
    rk = (
        asg.withColumn("rnk", F.row_number().over(w))
        .withColumn("nrm", _norm(vec_col))
        .persist()
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1)))
    # explicit repartition (not left to AQE): both join inputs are tiny, so
    # the planner broadcasts b and would otherwise run the exploded pair
    # work on the a-side's few non-empty window partitions — the join
    # OUTPUT is the O(|cluster|²) surface, invisible to input-size-based
    # planning.  An explicit N is exempt from AQE coalescing.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    a = rk.select("cluster", F.col("rnk").alias("rnk_a"),
                  F.col(vec_col).alias("va"), F.col("nrm").alias("na"),
                  salts.alias("salt")).repartition(n_part, "cluster", "salt")
    b = rk.select("cluster", F.col("rnk").alias("rnk_b"),
                  F.col(id_col).alias("drop_id"), F.col(vec_col).alias("vb"),
                  F.col("nrm").alias("nb"),
                  F.pmod(F.col("rnk"), F.lit(int(n_salts))).alias("salt"))
    pc = F.try_divide(_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb"))
    dropped = (
        a.join(b, ["cluster", "salt"])
        .where(F.col("rnk_a") < F.col("rnk_b"))
        .where(pc >= F.lit(float(eps)))
        .select("drop_id")
        .distinct()
    )
    return (
        rk.join(dropped, rk[id_col] == dropped["drop_id"], "left")
        .select(F.col(id_col), F.col("cluster"),
                F.round("c_cos", 6).alias("centroid_cos"),
                F.col("drop_id").isNull().alias("kept"))
    )
