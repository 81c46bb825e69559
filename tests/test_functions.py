"""Pipeline operator tests: dedup, similarity, simhash, n-gram Jaccard,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparrow_ipc_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different text about spark encoding pipelines"),
        (4, "der schnelle braune fuchs und der faule hund"),
        (5, None),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = {r["h"]: r for r in dedup.exact_dedup(docs).collect()}
    dup_groups = [r for r in out.values() if r["n"] > 1]
    assert len(dup_groups) == 1 and dup_groups[0]["keep_id"] == 0
    kept = dedup.dedup_keep_first(docs)
    assert kept.count() == 5  # 6 non-null minus 1 dup
    assert kept.where("doc_id = 1").count() == 0


def test_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.lsh_pairs(docs).collect()}
    assert (0, 1) in pairs  # exact dup always lands in same buckets
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares most tokens


def test_ngram_jaccard(docs):
    pairs = dedup.lsh_pairs(docs)
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard(docs, pairs).collect()}
    assert jac[(0, 1)] == pytest.approx(1.0)
    if (0, 2) in jac:
        assert 0.3 < jac[(0, 2)] < 1.0


def test_simhash_near_pairs(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical fingerprint
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    ham03 = bin(sh[0] ^ sh[3]).count("1")
    assert ham02 < ham03  # near dup closer than unrelated
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             dedup.simhash_near_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0


def test_simhash_near_pairs_md5(docs):
    """The oracle-parity (md5) variant: identical behavior contract —
    exact dup at hamming 0, near dup closer than unrelated text."""
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             dedup.simhash_near_pairs_md5(docs, max_hamming=16).collect()}
    assert pairs.get((0, 1)) == 0
    if (0, 2) in pairs and (0, 3) in pairs:
        assert pairs[(0, 2)] < pairs[(0, 3)]


def test_simhash_md5_blocking_is_exhaustive(spark):
    """The 4×16-bit chunk blocking must find EVERY pair within Hamming
    distance 3 (pigeonhole) — verified against a brute-force all-pairs
    scan over the same md5 simhashes."""
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again today"
    for i in range(30):
        words = base.split()
        words[i % len(words)] = f"w{i}"          # light perturbations
        rows.append((i, " ".join(words)))
    rows += [(100, base), (101, base)]           # exact dup pair
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    sh = {r["doc_id"]: int(r["simhash"], 16)
          for r in dedup.simhash_md5(df).collect()}
    ids = sorted(sh)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(sh[a] ^ sh[b]).count("1") <= 3}
    got = {(r["id_a"], r["id_b"])
           for r in dedup.simhash_near_pairs_md5(df, max_hamming=3).collect()}
    assert got == want and (100, 101) in got


def test_repetition_metrics(spark):
    rows = [
        (0, "a b a b a b"),          # "a b" repeats heavily
        (1, "w x y z q r"),          # all 2-grams distinct
        (2, None),
        (3, ""),
        (4, "solo"),                 # < n tokens: zero 2-grams, absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.repetition_metrics(df, n=2).collect()}
    assert set(out) == {0, 1}  # null/empty/sub-n rows have no n-grams
    assert out[0]["n_grams"] == 5 and out[0]["n_distinct"] == 2
    assert out[0]["top_gram_n"] == 3  # "a b" at positions 0,2,4
    assert out[0]["dup_gram_frac"] == pytest.approx(1 - 2 / 5)
    assert out[1]["dup_gram_frac"] == pytest.approx(0.0)


def test_vocab_stats(spark):
    rows = [(0, "a a b"), (1, "b c"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["tok"]: (r["tf"], r["df"]) for r in text.vocab_stats(df).collect()}
    assert out == {"a": (2, 1), "b": (2, 2), "c": (1, 1)}


def test_text_operators(docs):
    tc = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).collect()}
    assert tc[0] == 9 and tc[6] == 0 and tc[5] is None
    lg = {r["doc_id"]: r["lang_guess"] for r in text.lang_guess(docs).collect()}
    assert lg[0] == "en" and lg[4] == "de"
    q = {r["doc_id"]: r["quality"] for r in text.quality_score(docs).collect()}
    assert 0 <= q[0] <= 1
    fps = {r["doc_id"]: r["fp"] for r in text.doc_fingerprint(docs).collect()}
    assert fps[0] == fps[1] != fps[2]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near dup of 0
    rows = [(i, [float(v) for v in base[i]]) for i in range(len(base))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_cosine_topk_exact(vectors):
    q = [float(v) for v in vectors.where("vec_id = 0").collect()[0]["embedding"]]
    top = similarity.cosine_topk(vectors.where("vec_id != 0"), q, k=3).collect()
    assert top[0]["vec_id"] == 1  # the planted near-duplicate wins
    assert top[0]["cosine"] > 0.99


def test_ann_matches_exact_top1(vectors):
    q = [float(v) for v in vectors.where("vec_id = 0").collect()[0]["embedding"]]
    rest = vectors.where("vec_id != 0")
    ann = similarity.ann_topk(rest, q, k=3, n_planes=6).collect()
    assert ann and ann[0]["vec_id"] == 1


def test_ivf_topk(vectors):
    q = [float(v) for v in vectors.where("vec_id = 0").collect()[0]["embedding"]]
    rest = vectors.where("vec_id != 0")
    c = similarity.ivf_centroids(rest, n_centroids=4, sample=64)
    # probing ALL lists must reproduce the exact top-k
    exact = [r["vec_id"] for r in similarity.cosine_topk(rest, q, k=3).collect()]
    full = [r["vec_id"] for r in
            similarity.ivf_topk(rest, q, k=3, n_probe=len(c), centroids=c).collect()]
    assert full == exact
    # limited probes still find the planted near-duplicate (its cluster is
    # the query's nearest centroid by construction)
    near = similarity.ivf_topk(rest, q, k=3, n_probe=1, centroids=c).collect()
    assert near and near[0]["vec_id"] == 1


def test_ivf_distributed_skewed_recall(spark):
    """Skewed-cluster fixture where the id-ordered driver sample of
    ``ivf_centroids`` sees ONLY the dominant cluster (all low ids), so
    partial-probe recall for a query in a minority cluster collapses; the
    distributed trainer's hash-spread init + full-table Lloyd rounds must
    recover it (recall ≥ sample trainer, and ≥0.9 absolute)."""
    rng = np.random.default_rng(11)
    mus = {"a": np.full(8, 0.0), "b": np.full(8, 20.0), "c": np.full(8, -20.0)}
    rows = []
    for i in range(180):  # dominant cluster owns every id < 180
        rows.append((i, (mus["a"] + rng.standard_normal(8)).tolist()))
    for i in range(180, 198):
        rows.append((i, (mus["b"] + rng.standard_normal(8)).tolist()))
    for i in range(198, 204):
        rows.append((i, (mus["c"] + rng.standard_normal(8)).tolist()))
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<float>").cache()
    q = (mus["c"] + 0.1).tolist()
    exact = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).collect()]

    def recall(centroids):
        got = [r["vec_id"] for r in similarity.ivf_topk(
            df, q, k=5, n_probe=1, centroids=centroids).collect()]
        return len(set(got) & set(exact)) / len(exact)

    c_sample = similarity.ivf_centroids(df, n_centroids=3, sample=128)
    c_dist = similarity.ivf_centroids_distributed(
        df, n_centroids=3, init_sample=64, iters=2)
    # the sample trainer never saw clusters b/c: all three centroids sit in a
    assert recall(c_dist) >= recall(c_sample)
    assert recall(c_dist) >= 0.9
    # full-probe remains exact regardless of trainer
    full = [r["vec_id"] for r in similarity.ivf_topk(
        df, q, k=5, n_probe=3, centroids=c_dist).collect()]
    assert full == exact
    df.unpersist()


def test_embedding_dedup(vectors):
    pairs = {(r["id_a"], r["id_b"]) for r in
             similarity.pairwise_cosine_dedup(vectors, threshold=0.98, n_planes=6).collect()}
    assert (0, 1) in pairs


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=30)
    feats = multimodal.image_features(media).collect()
    assert len(feats) == 10  # every 3rd row is an image
    assert all(0 <= r["mean_luma"] <= 255 and 0 <= r["byte_entropy"] <= 8 for r in feats)
    # deterministic fake decode → deterministic features
    feats2 = multimodal.image_features(media).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, feats2))
    resized = multimodal.resize_images(media, 8, 6).collect()
    assert all(len(r["payload"]) == 48 and r["width"] == 8 and r["height"] == 6 for r in resized)
    frames = multimodal.sample_frames(media, every_ms=1000)
    fr = frames.collect()
    assert all(len(r["frame"]) == 64 for r in fr)
    # real decode path: PNG payloads decode via the vendored codec
    # (tests/test_png.py covers it in depth); a non-PNG payload without
    # PIL must raise loudly, not silently fake
    real = multimodal.image_features(media, use_real_decode=True).collect()
    assert len(real) == 10
    junk = spark.createDataFrame(
        [(999, "image", "image/jpeg", 4, 4, None, bytearray(b"\xff\xd8junk"))],
        schema=multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception):
        multimodal.image_features(junk, use_real_decode=True).collect()
    audio = multimodal.audio_features(media).collect()
    assert len(audio) == 10  # every 3rd row is audio
    assert all(
        0 <= r["rms"] <= 1.0001 and 0 <= r["peak"] <= 1.0001
        and 0 <= r["zero_cross_rate"] <= 1 and r["n_samples"] >= 1
        for r in audio
    )
    audio2 = multimodal.audio_features(media).collect()
    assert sorted(map(tuple, audio)) == sorted(map(tuple, audio2))


def test_cosine_zero_vector_no_ansi_crash(spark):
    """An all-zero embedding must yield NULL cosine (sorted after every
    real score), not a fatal DIVIDE_BY_ZERO under the session's default
    ANSI mode (round-4 review, confirmed by repro before the fix)."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.cosine_topk(df, [1.0, 0.0], k=3).collect()
    ids = [r["vec_id"] for r in got]
    assert ids[:2] == [0, 2]  # real scores first; zero vector last (NULL)
    assert got[-1]["cosine"] is None
    pairs = similarity.pairwise_cosine_dedup(df, threshold=0.5, n_planes=2)
    pairs.collect()  # zero vector in a shared bucket must not throw


def test_image_features_null_dims_no_crash(spark):
    """MEDIA_SCHEMA declares width/height nullable → pandas delivers NaN;
    the fake decoder must default, not crash on int(NaN)."""
    m = spark.createDataFrame(
        [(1, "image", "image/png", None, None, None, bytearray(b"abcd"))],
        schema=multimodal.MEDIA_SCHEMA)
    feats = multimodal.image_features(m).collect()
    assert len(feats) == 1 and feats[0]["width"] == 1
    resized = multimodal.resize_images(m, 4, 4).collect()
    assert len(resized) == 1 and len(resized[0]["payload"]) == 16


def test_duplicated_spans(spark):
    """Cross-document duplicated k-token spans: a 5-gram shared by two
    docs is found with correct document/occurrence counts; spans inside
    only one doc (even repeated there) don't qualify."""
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"intro {shared} outro"),
        (1, f"{shared} completely other tail text"),
        (2, f"self repeat {shared.replace('alpha', 'zeta')} and self repeat "
            f"{shared.replace('alpha', 'zeta')}"),  # repeats only within doc 2
        (3, "unrelated words that never repeat anywhere else at all"),
        (4, None),
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["span"]: r for r in dedup.duplicated_spans(df, k=5).collect()}
    assert shared in out
    assert out[shared]["n_docs"] == 2 and out[shared]["n_occurrences"] == 2
    assert out[shared]["example_doc"] == 0
    # within-one-doc repetition must NOT appear (min_docs=2 is cross-doc)
    assert all(r["n_docs"] >= 2 for r in out.values())
    assert not any("zeta" in s for s in out)
    # plan shape: one aggregation, no join anywhere
    plan = dedup.duplicated_spans(df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_semantic_dedup(vectors):
    """SemDeDup drop rule on trained centroids: the planted near-dup pair
    (0, 1) loses exactly one member, everything else survives, and the
    survivor is the pair's farthest-from-centroid item (the paper's keep
    rule)."""
    cents = similarity.ivf_centroids_distributed(vectors, n_centroids=3, iters=2)
    out = similarity.semantic_dedup(vectors, cents, eps=0.95)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 20 and all(r["cluster"] >= 0 for r in rows.values())
    pair = [rows[0], rows[1]]
    assert sorted(r["kept"] for r in pair) == [False, True]
    assert rows[0]["cluster"] == rows[1]["cluster"]
    kept = next(r for r in pair if r["kept"])
    dropped = next(r for r in pair if not r["kept"])
    assert kept["centroid_cos"] <= dropped["centroid_cos"]
    others = [r for i, r in rows.items() if i > 1]
    assert all(r["kept"] for r in others)


def test_semantic_dedup_zero_vector_ranks_last(spark):
    """A zero vector must neither crash ANSI mode nor drop anything: NULL
    centroid-cosine ranks last and NULL pair-cosine fails >= eps."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.99, 0.01])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = np.asarray([[1.0, 0.0]])
    out = {r["vec_id"]: r for r in
           similarity.semantic_dedup(df, cents, eps=0.9).collect()}
    assert out[1]["kept"] and out[1]["centroid_cos"] is None
    # 2 ~ dup of 0; 2 is farther from the centroid so it out-ranks 0
    assert out[2]["kept"] and not out[0]["kept"]


def test_connected_components_chain(spark):
    """A 5-node path graph needs several propagation rounds (diameter 4):
    min-label must still flood to every member; isolated nodes keep their
    own id."""
    from sparrow_ipc_spark.functions.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (1, 0), (6, 7)], "id_a long, id_b long")
    out = {r["id"]: r["group_id"]
           for r in connected_components(edges, nodes).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 6}


def test_connected_components_distributed_path(spark):
    """driver_edge_cap=0 forces the iterative min-label loop (the
    unbounded-scale tier); must agree with the union-find tier on the
    same diameter-4 chain + singleton graph."""
    from sparrow_ipc_spark.functions.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (1, 0), (6, 7)], "id_a long, id_b long")
    out = {r["id"]: r["group_id"]
           for r in connected_components(edges, nodes,
                                         driver_edge_cap=0).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 6}


def test_connected_components_raises_when_capped(spark):
    """Exhausting max_iter before the label checksum settles must RAISE —
    silently returning capped labels hands wrong group ids downstream
    (VERDICT r5 'What's wrong' #1; diameter-4 chain with max_iter=2)."""
    import pytest

    from sparrow_ipc_spark.functions.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (1, 0)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, driver_edge_cap=0,
                             max_iter=2).collect()


def test_connected_components_rejects_non_integral_id(spark):
    """The distributed tier's decimal convergence checksum is undefined
    for non-numeric ids (NULL == NULL would 'converge' after one round
    with wrong labels — ADVICE r5): fail loudly up front."""
    import pytest

    from sparrow_ipc_spark.functions.dedup import connected_components

    nodes = spark.createDataFrame([("a",), ("b",)], "id string")
    edges = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(TypeError, match="integral id"):
        connected_components(edges, nodes, driver_edge_cap=0)


def test_dup_groups_canonical(spark):
    from sparrow_ipc_spark.functions.dedup import dup_groups

    docs = spark.createDataFrame([(i, "t") for i in range(4)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dup_groups(docs, pairs).collect()}
    assert rows[2]["canonical"] and not rows[3]["canonical"]
    assert rows[3]["group_id"] == 2
    assert all(rows[i]["canonical"] for i in (0, 1))


def test_extract_urls_and_domains(spark):
    from sparrow_ipc_spark.functions.text import extract_urls, url_stats

    rows = [
        (0, "read https://Docs.Example.org/a/b?x=1 and http://cdn.net/i.png"),
        (1, "bare text no links"),
        (2, None),
        (3, "dup https://docs.example.org/c https://docs.example.org/c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    urls = extract_urls(df).collect()
    assert {r["url"] for r in urls} == {
        "https://Docs.Example.org/a/b?x=1", "http://cdn.net/i.png",
        "https://docs.example.org/c"} | set()
    assert len(urls) == 4  # the duplicate occurrence is kept (occurrence rows)
    assert {r["domain"] for r in urls} == {"docs.example.org", "cdn.net"}
    stats = {r["domain"]: r for r in url_stats(df).collect()}
    assert stats["docs.example.org"]["n_urls"] == 3
    assert stats["docs.example.org"]["n_docs"] == 2
    assert stats["cdn.net"]["n_urls"] == 1 and stats["cdn.net"]["n_docs"] == 1
