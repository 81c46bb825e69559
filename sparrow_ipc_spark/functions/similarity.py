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
