"""Tests for training-pipeline operators: dedup, text stats, ANN recall."""

import pytest
from pyspark.sql import functions as F

from semadb_spark.operators import dedup as D
from semadb_spark.operators import textstats as TS


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("0", "the quick brown fox jumps over the lazy dog near the river bank"),
        ("1", "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
        ("2", "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup
        ("3", "completely different content about spark query engines and data"),
        ("4", "der hund und die katze sind nicht ein gutes team mit der maus"),
        ("5", "el perro es un animal que vive con la familia en la casa"),
        ("6", None),
        ("7", "numbers 123 456 789 0 1 2 3 4 5 6 7 8 9 10 11 12"),
    ]
    return spark.createDataFrame(rows, "_id string, text string")


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("x", "one two")], "_id string, text string")
    sh = df.select(D.shingles("text", 3).alias("s")).first()["s"]
    assert sh == ["one two"]


def test_exact_dedup(docs):
    out = {r["keep_id"]: r["dup_count"] for r in D.exact_dedup(docs, ["text"], "_id").collect()}
    assert out["0"] == 2  # 0 and 1 identical, keeper = min id
    assert "1" not in out


def test_duplicated_substring_spans(spark):
    """Planted shared paragraph across two docs is flagged at every window
    position inside it; unique docs and too-short docs emit nothing."""
    para = "the quick brown fox jumps over the lazy dog again and again"
    # prefix lengths 16 and 31 are congruent mod stride(5), so the stride
    # grid lands on the same paragraph offsets in both docs and the window
    # hashes collide (a misaligned prefix would shift every window)
    rows = [
        ("a", ("p" * 16) + para + " trailing a"),
        ("b", ("q" * 31) + para + " other tail"),
        ("c", "completely unrelated content that repeats nothing of note at all"),
        ("d", "tiny"),
    ]
    df = spark.createDataFrame(rows, "_id string, text string")
    out = D.duplicated_substring_spans(df, "text", "_id", window=20, stride=5)
    got = [(r["id"], r["pos"]) for r in out.collect()]
    ids = {i for i, _ in got}
    assert ids == {"a", "b"}  # only the docs sharing the paragraph
    # every flagged span's hash really does occur in both docs
    by_hash = {}
    for r in out.collect():
        by_hash.setdefault(r["win_hash"], set()).add(r["id"])
    assert all(v == {"a", "b"} for v in by_hash.values())
    # the planted paragraph is long enough that multiple strides hit it
    assert len(got) >= 6
    # positions are 1-based within each doc and windows must match exactly:
    # doc a's paragraph starts at 17, doc b's at 31 — hashes only collide
    # where the stride grid lands on the same paragraph offset in both
    texts = dict(rows)
    for r in out.collect():
        w = texts[r["id"]][r["pos"] - 1 : r["pos"] - 1 + 20]
        assert len(w) == 20


def test_minhash_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(docs, "text", "_id", 8, 4, 3).collect()}
    assert ("0", "1") in pairs  # exact dup always collides in every band
    # near-dup 2 should collide with 0/1 in at least one band
    assert any(p in pairs for p in [("0", "2"), ("1", "2")])
    # unrelated docs should not pair
    assert ("3", "4") not in pairs and ("4", "5") not in pairs


def test_ngram_jaccard_values(docs):
    cand = D.minhash_lsh_pairs(docs, "text", "_id", 8, 4, 3)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(docs, "text", "_id", cand, 3).collect()}
    assert pairs[("0", "1")] == 1.0
    for (a, b), j in pairs.items():
        assert 0.0 <= j <= 1.0


def test_simhash_near_dup_hamming(docs, spark):
    sigs = {r["_id"]: r["sh"] for r in docs.filter(F.col("text").isNotNull()).select("_id", D.simhash("text", 16, 3).alias("sh")).collect()}
    assert sigs["0"] == sigs["1"]  # identical docs -> identical simhash
    ham_near = bin(sigs["0"] ^ sigs["2"]).count("1")
    ham_far = bin(sigs["0"] ^ sigs["3"]).count("1")
    assert ham_near < ham_far  # near dup closer than unrelated


def test_simhash_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in D.simhash_pairs(docs, "text", "_id", 16, max_hamming=3).collect()}
    assert ("0", "1") in pairs


def test_embedding_neardup(spark):
    rows = [
        ("0", [1.0, 0.0, 0.0], 0),
        ("1", [0.99, 0.01, 0.0], 0),   # near dup of 0
        ("2", [0.0, 1.0, 0.0], 0),     # orthogonal
        ("3", [0.0, 0.0, 1.0], 1),     # other block
    ]
    df = spark.createDataFrame(rows, "_id string, v array<float>, blk int")
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in D.embedding_neardup_pairs(df, "v", "_id", 0.9, "blk").collect()}
    assert ("0", "1") in pairs and pairs[("0", "1")] > 0.99
    assert ("0", "2") not in pairs
    assert not any("3" in p for p in pairs)


def test_embedding_neardup_unblocked_refuses_large_frame(spark, monkeypatch):
    # without block_col the whole frame lands in one task — refuse beyond
    # the single-block ceiling instead of a silent memory cliff
    monkeypatch.setattr(D, "SINGLE_BLOCK_MAX_ROWS", 10)
    rows = [(str(i), [float(i), 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "_id string, v array<float>")
    with pytest.raises(ValueError, match="block_col"):
        D.embedding_neardup_pairs(df, "v", "_id", 0.9)
    # at or under the ceiling the unblocked oracle path still works
    assert D.embedding_neardup_pairs(df.limit(10), "v", "_id", 0.0).count() > 0


def test_detect_language(spark):
    rows = [
        ("en", "the cat and the dog is that for with"),
        ("de", "der hund und die katze ist nicht ein"),
        ("es", "el perro es un animal que la casa los"),
        ("fr", "le chien est dans une maison pour que"),
        ("und", "xyzzy plugh quux"),
    ]
    df = spark.createDataFrame(rows, "expected string, text string")
    out = df.select("expected", TS.detect_language("text").alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], f"{r['expected']} -> {r['got']}"


def test_token_count_and_quality(spark):
    df = spark.createDataFrame([("a", "Hello, world! The 42 cats."), ("b", "")], "_id string, text string")
    rows = {r["_id"]: r for r in df.select("_id", TS.token_count("text").alias("n"), TS.quality_score("text").alias("q")).collect()}
    assert rows["a"]["n"] == 5  # hello world the 42 cats
    assert rows["b"]["n"] == 0
    assert 0.0 <= rows["a"]["q"] <= 1.0


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            ("uniq", "alpha beta gamma delta"),          # all distinct
            ("loop", "spam spam spam spam"),             # one token repeated
            ("bigr", "one two one two one two"),         # dominant bigram
            ("solo", "word"),                            # <2 tokens: no bigrams
            ("none", None),                              # dropped
        ],
        "_id string, text string",
    )
    rows = {r["_id"]: r for r in TS.repetition_signals(df, "text").collect()}
    assert set(rows) == {"uniq", "loop", "bigr", "solo"}
    assert rows["uniq"]["dup_token_frac"] == 0.0
    assert rows["uniq"]["top_token_frac"] == 0.25
    assert rows["loop"]["dup_token_frac"] == 0.75
    assert rows["loop"]["top_token_frac"] == 1.0
    assert rows["loop"]["top_bigram_frac"] == 1.0  # "spam spam" x3
    # "one two" occurs 3 of 5 bigrams
    assert abs(rows["bigr"]["top_bigram_frac"] - 0.6) < 1e-12
    assert rows["solo"]["top_bigram_frac"] == 0.0
    assert rows["solo"]["n_tokens"] == 1


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            ("a", "mail me at jane.doe+x@corp.example.com today"),
            ("b", "call +44 (0)20 7946-0958 now"),
            ("c", "see https://a.example.org/p?x=1&y=2 for details"),
            ("d", "clean text with number 42"),
        ],
        "_id string, text string",
    )
    rows = {r["_id"]: r["c"] for r in df.select("_id", TS.pii_scrub("text").alias("c")).collect()}
    assert rows["a"] == "mail me at <EMAIL> today"
    assert rows["b"] == "call <PHONE> now"
    assert rows["c"] == "see <URL> for details"
    assert rows["d"] == "clean text with number 42"  # short digits untouched


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [("a", "alpha beta gamma"), ("b", "gamma beta alpha beta")], "_id string, text string"
    )
    fps = [r["fp"] for r in df.select(TS.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]  # same token set -> same fingerprint


def test_ann_recall(spark):
    import numpy as np

    from semadb_spark.operators.ann import ivf_build, ivf_search, recall_at_k, rplsh_build, rplsh_search
    from semadb_spark.operators.knn import knn_topk_batch

    rng = np.random.RandomState(7)
    centers = rng.normal(size=(8, 16)) * 3
    vecs = np.concatenate([c + rng.normal(size=(40, 16)) for c in centers])
    df = spark.createDataFrame(
        [(str(i), [float(x) for x in v]) for i, v in enumerate(vecs)], "_id string, v array<float>"
    )
    qlist = [(str(i), [float(x) for x in vecs[i]]) for i in range(10)]
    qdf = spark.createDataFrame(
        [(qid, v) for qid, v in qlist], "query_id string, query_vec array<float>"
    )
    exact = knn_topk_batch(df, "v", qdf, "euclidean", 10).select("query_id", "_id")
    approx = ivf_search(ivf_build(df, "v", "_id", nlist=8, seed=1), qlist, "euclidean", 10, nprobe=3)
    r = recall_at_k(approx, exact)
    assert r >= 0.8, f"IVF recall too low: {r}"
    lsh = rplsh_search(rplsh_build(df, "v", 16, "_id", tables=8, bits=4, seed=1), qlist, "euclidean", 10)
    r2 = recall_at_k(lsh, exact)
    assert r2 >= 0.5, f"LSH recall too low: {r2}"


def test_knn_scan_matches_batch(spark):
    import numpy as np

    from semadb_spark.operators.knn import knn_topk_batch, knn_topk_scan

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(200, 8))
    df = spark.createDataFrame(
        [(str(i), [float(x) for x in v]) for i, v in enumerate(vecs)], "_id string, v array<float>"
    ).repartition(4)
    qlist = [(str(i), [float(x) for x in vecs[i]]) for i in range(3)]
    qdf = spark.createDataFrame([(q, v) for q, v in qlist], "query_id string, query_vec array<float>")
    a = {(r["query_id"], r["_id"]) for r in knn_topk_batch(df, "v", qdf, "euclidean", 5).collect()}
    b = {(r["query_id"], r["_id"]) for r in knn_topk_scan(df, "v", qlist, "euclidean", 5).collect()}
    assert a == b


def test_embedding_neardup_lsh_blocked(spark):
    # Plant 20 near-dup pairs in 400 random vectors; the LSH-blocked variant
    # must recover them while examining far fewer candidate pairs than the
    # all-pairs O(n^2) — the property that lets it survive a 100x scale-up.
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.normal(size=(400, 16))
    rows = [(f"r{i:03d}", base[i].tolist()) for i in range(400)]
    rows += [(f"d{i:03d}", (base[i] + rng.normal(scale=1e-3, size=16)).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "_id string, v array<double>")

    from semadb_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    got = embedding_neardup_pairs_lsh(df, "v", "_id", 0.999, dim=16, tables=4, bits=6).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    planted = {(f"d{i:03d}", f"r{i:03d}") for i in range(20)}
    assert planted <= found, planted - found
    # candidate volume: sum of within-bucket pairs << all-pairs
    from semadb_spark.operators.ann import rplsh_build
    from semadb_spark.functions.distances import l2_normalize
    from pyspark.sql import functions as F

    nb = df.select("_id", l2_normalize(F.col("v")).alias("nv"))
    idx = rplsh_build(nb, "nv", 16, id_col="_id", tables=4, bits=6)
    sizes = idx.buckets.groupBy("table", "bucket").count().collect()
    examined = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
    n = 420
    assert examined < 0.25 * (n * (n - 1) // 2), examined

    # blocked result is a subset of the exact all-pairs result with equal sims
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_neardup_pairs(df, "v", "_id", 0.999).collect()
    }
    for r in got:
        assert (r["id_a"], r["id_b"]) in exact


def test_ivf_search_with_candidate_filter(spark):
    import numpy as np

    from semadb_spark.operators.ann import ivf_build, ivf_search

    rng = np.random.RandomState(12)
    X = rng.normal(size=(300, 8))
    df = spark.createDataFrame(
        [(str(i), [float(x) for x in X[i]], i % 2) for i in range(300)],
        "_id string, v array<float>, par long",
    )
    idx = ivf_build(df, "v", "_id", nlist=4, seed=2)
    even = df.filter(F.col("par") == 0).select("_id")
    res = ivf_search(idx, [("q", X[8].tolist())], "euclidean", 10,
                     nprobe=4, candidate_ids=even).collect()
    ids = [int(r["_id"]) for r in res]
    assert ids and all(i % 2 == 0 for i in ids)
    # full probe + filter == exact filtered kNN
    d = ((X[::2] - X[8]) ** 2).sum(axis=1)
    evens = np.arange(0, 300, 2)
    expected = [str(evens[j]) for j in np.lexsort((evens.astype(str), d))[:10]]
    assert {r["_id"] for r in res} == set(expected)


def test_connected_components_groups(spark):
    from semadb_spark.operators.dedup import connected_components

    # two chains and a singleton pair: {a,b,c,d} via a-b, b-c, c-d; {x,y}
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string"
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_deep_chain(spark):
    """A transitive duplicate chain far deeper than any fixed label-prop
    round budget (the round-2 silent-split failure mode): the alternating
    large-star/small-star rounds converge in O(log n), so a 200-hop path
    must come back as ONE component with the lexicographic-min label."""
    from semadb_spark.operators.dedup import connected_components

    n = 200
    ids = [f"n{i:04d}" for i in range(n)]
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], "id_a string, id_b string"
    )
    labels = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert len(labels) == n
    assert set(labels.values()) == {ids[0]}


def test_connected_components_raises_without_fixpoint(spark):
    from semadb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")],
        "id_a string, id_b string",
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        # max_iter=0 can never reach the fixpoint check -> loud error,
        # never silently-wrong labels
        connected_components(pairs, max_iter=0)


def test_pack_sequences_chunks_and_spans(spark):
    from semadb_spark.operators.packing import pack_sequences

    # 5 docs x 4 tokens, max_tokens=6: stream of 20 tokens -> seqs of 6,6,6,2
    rows = [(f"d{i}", i, "tok " * 4) for i in range(5)]
    df = spark.createDataFrame(rows, "_id string, ord long, text string")
    out = pack_sequences(df, "text", "_id", max_tokens=6, order_col="ord")
    got = {(r["_id"], r["seq_id"]): (r["doc_tok_start"], r["seq_offset"], r["n_toks"]) for r in out.collect()}
    # d1 (tokens 4..7) spans seq 0 (tokens 4,5) and seq 1 (tokens 6,7)
    assert got[("d1", 0)] == (0, 4, 2)
    assert got[("d1", 1)] == (2, 0, 2)
    # every sequence except the last is exactly full
    per_seq = out.groupBy("seq_id").agg(F.sum("n_toks").alias("t")).collect()
    sizes = {r["seq_id"]: r["t"] for r in per_seq}
    assert sizes == {0: 6, 1: 6, 2: 6, 3: 2}


def test_pack_sequences_partitioning_invariant(spark):
    from semadb_spark.operators.packing import pack_sequences

    rows = [(f"d{i:03d}", i, "w " * (1 + i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "_id string, ord long, text string")
    a = pack_sequences(df.coalesce(1), "text", "_id", 16, "ord").collect()
    b = pack_sequences(df.repartition(13), "text", "_id", 16, "ord").collect()
    key = lambda r: (r["_id"], r["seq_id"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # global stream property: sum of n_toks == total tokens
    assert sum(r["n_toks"] for r in a) == sum(1 + i % 7 for i in range(100))


def test_mixture_sample_deterministic_and_weighted(spark):
    from semadb_spark.operators.packing import mixture_sample

    rows = [(f"id{i}", "a" if i < 800 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "_id string, source string")
    # target 50/50 but b has only 200 rows -> T = 400, keep all 200 b + ~200 a
    s1 = mixture_sample(df, "source", {"a": 0.5, "b": 0.5}, "_id")
    counts = {r["source"]: r["n"] for r in s1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["b"] == 200  # binding source fully kept
    assert 140 <= counts["a"] <= 260  # hash-threshold approximates 200
    # deterministic: same input -> identical id set, any partitioning
    ids1 = sorted(r["_id"] for r in s1.select("_id").collect())
    ids2 = sorted(r["_id"] for r in mixture_sample(df.repartition(7), "source", {"a": 0.5, "b": 0.5}, "_id").select("_id").collect())
    assert ids1 == ids2
    # unknown sources are dropped
    s3 = mixture_sample(df, "source", {"a": 1.0}, "_id")
    assert s3.filter(F.col("source") == "b").count() == 0


def test_ivfpq_recall(spark):
    import numpy as np

    from semadb_spark.operators.ann import ivfpq_build, ivfpq_search, recall_at_k
    from semadb_spark.operators.knn import knn_topk_batch

    rng = np.random.RandomState(3)
    centers = rng.normal(size=(8, 16)) * 3
    vecs = np.concatenate([c + rng.normal(size=(40, 16)) for c in centers])
    df = spark.createDataFrame(
        [(str(i), [float(x) for x in v]) for i, v in enumerate(vecs)], "_id string, v array<float>"
    )
    idx = ivfpq_build(df, "v", nlist=8, num_subvectors=4, num_centroids=16, seed=5)
    queries = [(f"q{i}", [float(x) for x in vecs[i * 40]]) for i in range(5)]
    qdf = spark.createDataFrame(queries, "query_id string, query_vec array<float>")
    exact = knn_topk_batch(df, "v", qdf, "euclidean", 5).select("query_id", "_id")
    # full probe + rerank: candidate pool contains the true top-k
    approx = ivfpq_search(idx, queries, "euclidean", 5, nprobe=8, oversample=10)
    assert recall_at_k(approx, exact) >= 0.9
    # pruned probe still decent on clustered data
    approx2 = ivfpq_search(idx, queries, "euclidean", 5, nprobe=2, oversample=10)
    assert recall_at_k(approx2, exact) >= 0.5
    # oversample=0 -> raw ADC, no float traffic
    raw = ivfpq_search(idx, queries, "euclidean", 5, nprobe=8, oversample=0)
    assert raw.count() == 25


def test_ivfbq_recall(spark):
    """IVF-BQ hybrid: coarse probe + in-cell hamming + float rerank. Raw
    (oversample=0) must return hamming ints; reranked recall vs exact must
    beat the flat-BQ floor and every id must come from a probed cell."""
    import numpy as np

    from semadb_spark.operators.ann import ivfbq_build, ivfbq_search, recall_at_k
    from semadb_spark.operators.knn import knn_topk_scan

    rng = np.random.RandomState(11)
    centers = rng.normal(size=(8, 16))
    X = np.repeat(centers, 120, axis=0) + rng.normal(scale=0.2, size=(960, 16))
    df = spark.createDataFrame(
        [(str(i), [float(x) for x in X[i]]) for i in range(960)], "_id string, v array<float>"
    ).repartition(4)
    idx = ivfbq_build(df, "v", nlist=8, seed=3)
    queries = [(str(i), [float(x) for x in X[i]]) for i in range(6)]
    exact = knn_topk_scan(df, "v", queries, "euclidean", 5)
    rr = ivfbq_search(idx, queries, 5, nprobe=4, oversample=25)
    assert recall_at_k(rr, exact) >= 0.8
    raw = ivfbq_search(idx, queries, 5, nprobe=8, oversample=0)
    for r in raw.collect():
        assert float(r["_distance"]).is_integer()  # hamming counts


def test_ivfbq_fused_vs_two_phase(spark):
    """The fused single-pass kernel (keep_vectors index) must dominate the
    two-phase rerank join: same output contract (k rows per query, exact
    float distances, rank ordering) and recall >= the two-phase path at
    equal oversample — each task reranks its own full hamming pool, a
    superset of the global pool the two-phase variant reranks."""
    import numpy as np

    from semadb_spark.operators.ann import ivfbq_build, ivfbq_search, recall_at_k
    from semadb_spark.operators.knn import knn_topk_scan

    rng = np.random.RandomState(7)
    centers = rng.normal(size=(8, 16))
    X = np.repeat(centers, 100, axis=0) + rng.normal(scale=0.25, size=(800, 16))
    df = spark.createDataFrame(
        [(str(i), [float(x) for x in X[i]]) for i in range(800)],
        "_id string, v array<float>",
    ).repartition(4)
    fused_idx = ivfbq_build(df, "v", nlist=8, seed=3)
    assert "v" in fused_idx.coded.columns
    two_idx = ivfbq_build(df, "v", nlist=8, seed=3, keep_vectors=False)
    assert "v" not in two_idx.coded.columns
    queries = [(str(i), [float(x) for x in X[i]]) for i in range(8)]
    exact = knn_topk_scan(df, "v", queries, "euclidean", 5)
    fused = ivfbq_search(fused_idx, queries, 5, nprobe=4, oversample=3)
    two = ivfbq_search(two_idx, queries, 5, nprobe=4, oversample=3)
    fr = fused.collect()
    assert len(fr) == 8 * 5 and not any(float(r["_distance"]).is_integer() and r["_distance"] > 64 for r in fr)
    per_q = {}
    for r in fr:
        per_q.setdefault(r["query_id"], []).append(r["_rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    assert recall_at_k(fused, exact) >= recall_at_k(two, exact)


def test_pack_sequences_sparse_int64_keys_no_overflow(spark):
    """Sparse 64-bit order keys (snowflake/hash ids): the bucket expression
    must not overflow int64 when key span x shuffle partitions > 2^63.
    Packing output must match the same docs packed under dense keys with
    the same relative order."""
    from semadb_spark.operators.packing import pack_sequences

    # keys spread across nearly the whole int64 range, ascending
    sparse = [-(2**62) - 7, -(2**40), -1, 2**31, 2**61, 2**62 + 9001]
    rows = [(f"d{i}", k, "tok " * (3 + i)) for i, k in enumerate(sparse)]
    df = spark.createDataFrame(rows, "_id string, ord long, text string")
    out = pack_sequences(df, "text", "_id", max_tokens=5, order_col="ord")
    got = sorted(
        (r["_id"], r["seq_id"], r["doc_tok_start"], r["seq_offset"], r["n_toks"])
        for r in out.collect()
    )
    dense_rows = [(f"d{i}", i, "tok " * (3 + i)) for i in range(len(sparse))]
    dense = spark.createDataFrame(dense_rows, "_id string, ord long, text string")
    want = sorted(
        (r["_id"], r["seq_id"], r["doc_tok_start"], r["seq_offset"], r["n_toks"])
        for r in pack_sequences(dense, "text", "_id", max_tokens=5, order_col="ord").collect()
    )
    assert got == want


def test_ivfbq_threshold_provenance(spark):
    """ivfbq_build defaults to exact full-corpus mean thresholds (bq_fit,
    binary.go:152-175) and records provenance; the bounded-sample shortcut
    is opt-in, never a silent default."""
    import numpy as np

    from semadb_spark.operators.ann import ivfbq_build
    from semadb_spark.operators.quantize import bq_fit

    rng = np.random.default_rng(11)
    rows = [(str(i), rng.normal(size=4).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "_id string, v array<float>")
    idx = ivfbq_build(df, "v", nlist=4, seed=7)
    assert idx.threshold_source == "corpus_mean"
    np.testing.assert_allclose(idx.thresholds, bq_fit(df, "v"), rtol=1e-9)
    idx_s = ivfbq_build(df, "v", nlist=4, seed=7, sample_thresholds=True)
    assert idx_s.threshold_source == "sample_mean"
    idx_e = ivfbq_build(df, "v", nlist=4, seed=7, thresholds=[0.0] * 4)
    assert idx_e.threshold_source == "explicit"
    np.testing.assert_allclose(idx_e.thresholds, np.zeros(4))


def test_line_filter_c4_rules(spark):
    """C4 line cleaning: terminal punctuation + min-words + blocklist,
    empty lines dropped, counts feed page-level rules."""
    from semadb_spark.operators import textstats as ts

    page = "\n".join([
        "This is a good sentence.",     # kept
        "Buy now.",                     # < 3 words
        "Enable JavaScript to view this page.",  # blocklist (case-insensitive)
        "no terminal punctuation here", # no punct
        "",                             # empty
        'He said "stop right there."',  # kept (quote counts as terminal)
        "Accept our Cookie Policy to proceed.",  # blocklist phrase
    ])
    df = spark.createDataFrame([("d1", page), ("d2", "One two three!")],
                               "_id string, t string")
    lf = ts.line_filter("t")
    rows = {r["_id"]: r for r in df.select(
        "_id", lf["cleaned"].alias("c"), lf["n_lines"].alias("nl"),
        lf["n_kept"].alias("nk")).collect()}
    d1 = rows["d1"]
    assert d1["c"] == ("This is a good sentence.\n"
                       'He said "stop right there."')
    assert d1["nl"] == 7 and d1["nk"] == 2
    d2 = rows["d2"]
    assert d2["c"] == "One two three!" and d2["nk"] == 1


def test_duplicate_paragraphs_counts(spark):
    """Paragraph dedup: whitespace/case-normalized paragraphs count
    across docs; min_count filters; n_docs < n_total when one doc
    repeats a paragraph internally."""
    from semadb_spark.operators import dedup as dd

    rows = [
        ("a", "Shared  notice\n\nunique a\n\nShared notice"),
        ("b", "shared notice\n\nunique b"),
        ("c", "something else\n\n  SHARED NOTICE  "),
    ]
    df = spark.createDataFrame(rows, "_id string, body string")
    got = dd.duplicate_paragraphs(df, "body", "_id", min_count=2).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_total"] == 4 and r["n_docs"] == 3
    assert r["sample"] == "shared notice"


def test_ngram_contamination_overlap_and_plan(spark):
    """Decontamination: docs sharing an n-gram with the benchmark flag
    with exact hit counts; short eval items match via the whole-doc
    fallback; the benchmark side broadcasts (no corpus-side shuffle
    join)."""
    from semadb_spark.operators import dedup as dd

    docs = spark.createDataFrame([
        ("a", "alpha beta gamma delta epsilon zeta"),  # contains bench gram
        ("b", "zeta eta theta iota kappa"),            # clean
        ("c", "tiny doc"),                             # whole-doc fallback hit
        ("d", "alpha beta gamma delta epsilon"),       # exactly one gram
    ], "_id string, text string")
    bench = spark.createDataFrame(
        [("q1", "alpha beta gamma delta epsilon"), ("q2", "tiny doc")],
        "_id string, text string")
    got = {r["_id"]: r for r in dd.ngram_contamination(
        docs, bench, "text", "_id", n=5).collect()}
    assert set(got) == {"a", "c", "d"}
    # doc a: grams (a..e), (b..z) -> 1 hit of 2; doc d: 1 of 1
    assert got["a"]["n_grams"] == 2 and got["a"]["n_hits"] == 1
    assert got["d"]["n_hits"] == 1 and got["d"]["contaminated_frac"] == 1.0
    assert got["c"]["n_hits"] == 1  # whole-doc gram matched q2
    plan = dd.ngram_contamination(docs, bench, "text", "_id", n=5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_gopher_quality_flags_rules(spark):
    """Gopher rule battery: each rule trips on a crafted page and the
    conjunctive keep reflects it; a clean page keeps."""
    from semadb_spark.operators import textstats as ts

    clean = ("the quick brown fox jumps over and over again to be sure "
             "that everyone can have fun with plain words here today "
             * 3)
    symbolic = clean + " " + "#" * 40
    bullety = "the and of that\n" + "\n".join("- item %d here" % i
                                              for i in range(20))
    sparse = "word " * 10  # too few words at min_words=40
    df = spark.createDataFrame(
        [("clean", clean), ("sym", symbolic), ("bul", bullety),
         ("few", sparse)], "_id string, t string")
    g = ts.gopher_quality_flags("t", min_words=40)
    rows = {r["_id"]: r for r in df.select(
        "_id", g["keep"].alias("keep"),
        g["symbol_ratio_ok"].alias("sym_ok"),
        g["bullet_ok"].alias("bul_ok"),
        g["word_count_ok"].alias("wc_ok"),
        g["stop_hits"].alias("stop_hits")).collect()}
    assert rows["clean"]["keep"] is True
    assert rows["sym"]["sym_ok"] is False and rows["sym"]["keep"] is False
    assert rows["bul"]["bul_ok"] is False and rows["bul"]["keep"] is False
    assert rows["few"]["wc_ok"] is False and rows["few"]["keep"] is False
    assert rows["clean"]["stop_hits"] >= 2


# -- URL analysis ------------------------------------------------------------


def test_url_features_decomposition(spark):
    from semadb_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [
            ("https://User:p@WWW.Example.CO.uk:443/a/b/c?x=1&utm_source=ad#f",),
            ("HTTP://10.0.0.5:8080//double//slash?a=b&c=d",),
            ("ftp://Files.example.org",),
            ("http://localhost/x",),
            ("not a url",),
        ],
        "url string",
    )
    f = ts.url_features("url")
    rows = df.select(
        *[v.alias(k) for k, v in f.items()],
        ts.normalize_url("url").alias("norm"),
    ).collect()
    r0 = rows[0]
    assert r0["scheme"] == "https" and r0["host"] == "www.example.co.uk"
    assert r0["port"] == 443 and r0["path_depth"] == 3
    assert r0["n_query_params"] == 2 and r0["has_tracking_params"]
    # default https port stripped, fragment dropped, userinfo stripped
    assert r0["norm"] == "https://www.example.co.uk/a/b/c?x=1&utm_source=ad"
    r1 = rows[1]
    assert r1["scheme"] == "http" and r1["is_ip_host"]
    assert r1["registered_domain"] == "10.0.0.5"  # IP keeps whole literal
    assert r1["norm"] == "http://10.0.0.5:8080//double//slash?a=b&c=d"
    r2 = rows[2]
    assert r2["port"] is None and r2["norm"] == "ftp://files.example.org/"
    r3 = rows[3]
    assert r3["registered_domain"] == "localhost"  # dotless host kept whole
    r4 = rows[4]
    assert r4["scheme"] == "" and r4["norm"] is None


def test_host_stats_groups_by_registered_domain(spark):
    from semadb_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [
            ("http://a.example.com/1",),
            ("http://b.example.com/x/y?utm_id=1",),
            ("https://example.com/",),
            ("http://other.net/d/e/f",),
            ("garbage",),
        ],
        "url string",
    )
    out = {r["registered_domain"]: r for r in ts.host_stats(df, "url").collect()}
    assert set(out) == {"example.com", "other.net"}  # garbage row dropped
    ex = out["example.com"]
    assert ex["n_pages"] == 3 and ex["n_hosts"] == 3 and ex["n_tracking"] == 1
    assert abs(ex["mean_path_depth"] - (1 + 2 + 0) / 3) < 1e-9
    assert out["other.net"]["mean_path_depth"] == 3.0


# -- Encoding quality --------------------------------------------------------


def test_encoding_signals(spark):
    from semadb_spark.operators import textstats as ts

    moji = "’".encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [
            ("id0", "normal English prose, with Numbers 123 and spaces."),
            ("id1", "café " + moji + "quoted" + moji + " plus �"),
            ("id2", "\x01\x02 control \x1f heavy \x7f"),
            ("id3", "tabs\tand\nnewlines\rare fine"),
            ("id4", ""),
        ],
        "id string, text string",
    )
    s = ts.encoding_signals("text")
    rows = {r["id"]: r for r in df.select(
        "id", *[v.alias(k) for k, v in s.items()]).collect()}
    assert not rows["id0"]["encoding_suspect"]
    r1 = rows["id1"]
    assert r1["n_replacement"] == 1 and r1["mojibake_hits"] == 2
    assert r1["encoding_suspect"]
    r2 = rows["id2"]
    assert abs(r2["control_ratio"] - 4 / len("\x01\x02 control \x1f heavy \x7f")) < 1e-9
    assert r2["encoding_suspect"]
    # layout whitespace is not "control"
    assert rows["id3"]["control_ratio"] == 0.0 and not rows["id3"]["encoding_suspect"]
    assert rows["id4"]["control_ratio"] == 0.0 and not rows["id4"]["encoding_suspect"]


def test_char_class_entropy(spark):
    import math

    from semadb_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [("a", "aaaa"), ("b", "aAaA"), ("c", "a1 Bz"), ("d", "")],
        "id string, text string",
    )
    rows = {r["id"]: r["H"] for r in df.select(
        "id", ts.char_class_entropy("text").alias("H")).collect()}
    assert rows["a"] == 0.0 and rows["d"] == 0.0
    assert abs(rows["b"] - 1.0) < 1e-9  # 50/50 lower/upper = 1 bit
    # "a1 Bz": lower 2/5, upper 1/5, digit 1/5, space 1/5
    expected = -(0.4 * math.log2(0.4) + 3 * 0.2 * math.log2(0.2))
    assert abs(rows["c"] - expected) < 1e-9
    assert all(0.0 <= v <= math.log2(5) + 1e-9 for v in rows.values())


# -- Profiling ---------------------------------------------------------------


def test_profile_summary(spark):
    from semadb_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(1, "a", 2.0, ["x"]), (2, "b", None, []), (3, None, 8.0, None), (3, "b", 4.0, [])],
        "k long, s string, v double, arr array<string>",
    )
    out = {r["column"]: r for r in profile(df).collect()}
    k = out["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_str"], k["max_str"]) == ("1", "3")
    assert abs(k["mean"] - 2.25) < 1e-12
    s = out["s"]
    assert (s["n_null"], s["n_distinct"], s["min_str"], s["max_str"]) == (1, 2, "a", "b")
    assert s["mean"] is None and s["stddev"] is None
    v = out["v"]
    assert v["n_null"] == 1 and abs(v["mean"] - 14 / 3) < 1e-12
    arr = out["arr"]  # complex type: counts only
    assert arr["n_null"] == 1 and arr["n_distinct"] is None and arr["min_str"] is None


def test_histogram_buckets(spark):
    from semadb_spark.operators.profiling import histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    rows = histogram(df, "x", bins=10).orderBy("bucket").collect()
    assert len(rows) == 10
    assert [r["n"] for r in rows] == [10] * 10  # max lands in last bucket
    assert rows[0]["lo"] == 0.0 and abs(rows[-1]["hi"] - 99.0) < 1e-12
    # empty buckets materialize at n=0
    sparse = spark.createDataFrame([(0.0,), (100.0,)], "x double")
    srows = histogram(sparse, "x", bins=4).orderBy("bucket").collect()
    assert [r["n"] for r in srows] == [1, 0, 0, 1]
    # degenerate single-value range
    one = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    orows = histogram(one, "x", bins=3).orderBy("bucket").collect()
    assert orows[0]["n"] == 2 and sum(r["n"] for r in orows) == 2


def test_histogram_rejects_bad_bins(spark):
    import pytest as _pytest

    from semadb_spark.operators.profiling import histogram

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        histogram(df, "x", bins=0)


def test_quantiles_exact(spark):
    from semadb_spark.operators.profiling import quantiles

    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    rows = {r["prob"]: r["value"] for r in quantiles(df, "x").collect()}
    assert rows[0.25] == 25.0 and rows[0.5] == 50.0 and rows[0.95] == 95.0
    # interpolation between ranks
    df2 = spark.createDataFrame([(0.0,), (1.0,)], "x double")
    rows2 = {r["prob"]: r["value"] for r in quantiles(df2, "x", (0.25, 0.5)).collect()}
    assert abs(rows2[0.25] - 0.25) < 1e-12 and abs(rows2[0.5] - 0.5) < 1e-12
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantiles(df, "x", (1.5,))


def test_sample_per_group_deterministic(spark):
    from semadb_spark.operators.profiling import sample_per_group

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(60)], "id long, g string"
    )
    a = sorted(r["id"] for r in sample_per_group(df, "g", 4, "id").collect())
    b = sorted(r["id"] for r in sample_per_group(df, "g", 4, "id").collect())
    assert a == b and len(a) == 12  # exactly 4 per group, reproducible
    c = sorted(r["id"] for r in sample_per_group(df, "g", 4, "id", salt="v2").collect())
    assert c != a  # a new salt draws a different sample
    # short groups are kept whole
    tiny = spark.createDataFrame([(1, "g"), (2, "g")], "id long, g string")
    assert len(sample_per_group(tiny, "g", 10, "id").collect()) == 2


def test_histogram_all_null_column_clear_error(spark):
    import pytest as _pytest

    from semadb_spark.operators.profiling import histogram

    df = spark.createDataFrame([(None,), (None,)], "x double")
    with _pytest.raises(ValueError, match="no non-null"):
        histogram(df, "x", bins=4)
    # explicit range still works on an all-null column (all zero buckets)
    rows = histogram(df, "x", bins=2, lo=0.0, hi=1.0).collect()
    assert sorted(r["n"] for r in rows) == [0, 0]


def test_quantiles_quoted_column_name(spark):
    from semadb_spark.operators.profiling import quantiles

    df = spark.createDataFrame([(1.0,), (3.0,)], "`my col` double")
    rows = {r["prob"]: r["value"] for r in quantiles(df, "my col", (0.5,)).collect()}
    assert rows[0.5] == 2.0


# -- char n-gram LM ----------------------------------------------------------


def test_ngram_lm_fit_and_score(spark):
    import math

    from semadb_spark.operators import textstats as ts

    corpus = spark.createDataFrame(
        [("1", "the cat sat on the mat"), ("2", "the cat ran to the hat"),
         ("3", "the bat sat on the cat")],
        "_id string, text string",
    )
    model = ts.ngram_lm_fit(corpus, "text", min_count=1)
    probs = {r["gram"]: r["logp"] for r in model.collect()}
    # 'the' always follows 'th' in this corpus -> conditional prob 1
    assert abs(probs["the"]) < 1e-12
    # every logp is a valid log-probability
    assert all(p <= 1e-12 for p in probs.values())
    scored = ts.ngram_lm_score(corpus, "text", model)
    rows = {r["_id"]: r for r in scored.collect()}
    assert rows["1"]["n_grams"] == len("the cat sat on the mat") - 2
    assert all(r["perplexity"] >= 1.0 - 1e-9 for r in rows.values())
    # in-domain text scores FAR better than alien text
    alien = spark.createDataFrame([("x", "zzqj wvxk pfff qqqq")], "_id string, text string")
    ax = ts.ngram_lm_score(alien, "text", model).collect()[0]
    assert ax["perplexity"] > 100 * max(r["perplexity"] for r in rows.values())
    assert abs(ax["avg_logp"] - (-16.0)) < 1e-9  # pure OOV
    # short text degenerates to zero grams -> absent from the result
    short = spark.createDataFrame([("s", "ab")], "_id string, text string")
    assert ts.ngram_lm_score(short, "text", model).collect() == []


def test_ngram_lm_word_unit_parity(spark):
    """unit='word' (CCNet/KenLM-style shingles) against a hand-rolled
    Python reference: bigram logp = ln(count(w1 w2) / count(w1)) and the
    per-doc average with OOV fill."""
    import math
    from collections import Counter

    from semadb_spark.operators import textstats as ts

    texts = {"1": "The cat sat on the mat", "2": "the cat ran to the hat",
             "3": "a bat sat on the cat"}
    corpus = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "_id string, text string")
    model = ts.ngram_lm_fit(corpus, "text", n=2, min_count=1, unit="word")
    got = {r["gram"]: r["logp"] for r in model.collect()}

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts.values():
        w = t.lower().split()
        uni.update(w)
        bi.update(" ".join(p) for p in zip(w, w[1:]))
    want = {g: math.log(c / uni[g.split()[0]]) for g, c in bi.items()}
    assert got.keys() == want.keys()
    assert all(abs(got[g] - want[g]) < 1e-12 for g in want)

    scored = {r["_id"]: r for r in
              ts.ngram_lm_score(corpus, "text", model, n=2, unit="word").collect()}
    for k, t in texts.items():
        w = t.lower().split()
        grams = [" ".join(p) for p in zip(w, w[1:])]
        exp = sum(want.get(g, -16.0) for g in grams) / len(grams)
        assert scored[k]["n_grams"] == len(grams)
        assert abs(scored[k]["avg_logp"] - exp) < 1e-9
    # a 1-word doc has zero bigrams -> absent from the result
    one = spark.createDataFrame([("s", "hello")], "_id string, text string")
    assert ts.ngram_lm_score(one, "text", model, n=2, unit="word").collect() == []


def test_ngram_lm_word_broadcast_guard(spark):
    """The model-size guard at a synthetic large-vocab corpus: with the
    threshold forced below the vocab size the fit/score joins fall back
    from broadcast to shuffle joins, and the numbers do not move."""
    from semadb_spark.operators import textstats as ts

    # 400 distinct words -> 399 distinct bigrams, every prefix unique
    text = " ".join(f"w{i:04d}" for i in range(400))
    corpus = spark.createDataFrame(
        [("1", text), ("2", text)], "_id string, text string")
    guarded_model = ts.ngram_lm_fit(
        corpus, "text", n=2, min_count=1, unit="word", max_broadcast_rows=1)
    open_model = ts.ngram_lm_fit(
        corpus, "text", n=2, min_count=1, unit="word",
        max_broadcast_rows=10**9)
    gm = {r["gram"]: r["logp"] for r in guarded_model.collect()}
    om = {r["gram"]: r["logp"] for r in open_model.collect()}
    assert gm == om and len(gm) == 399

    g_plan = ts.ngram_lm_score(
        corpus, "text", guarded_model, n=2, unit="word",
        max_broadcast_rows=1,
    )._jdf.queryExecution().executedPlan().toString()
    o_plan = ts.ngram_lm_score(
        corpus, "text", open_model, n=2, unit="word",
        max_broadcast_rows=10**9,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in g_plan  # guard tripped: no broadcast
    assert "BroadcastHashJoin" in o_plan      # under threshold: broadcast
    g_rows = sorted(ts.ngram_lm_score(
        corpus, "text", guarded_model, n=2, unit="word",
        max_broadcast_rows=1).collect())
    o_rows = sorted(ts.ngram_lm_score(
        corpus, "text", open_model, n=2, unit="word").collect())
    assert g_rows == o_rows


def test_ngram_lm_rejects_bad_n(spark):
    import pytest as _pytest

    from semadb_spark.operators import textstats as ts

    df = spark.createDataFrame([("1", "abc")], "_id string, text string")
    with _pytest.raises(ValueError):
        ts.ngram_lm_fit(df, "text", n=1)


def test_histogram_plan_broadcasts_counts(spark):
    from semadb_spark.operators.profiling import histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    plan = histogram(df, "x", bins=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan  # the spine must never sort-merge


def test_lm_score_plan_broadcasts_model(spark):
    from semadb_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [("1", "the cat sat"), ("2", "the mat sat")], "_id string, text string")
    model = ts.ngram_lm_fit(docs, "text", min_count=1)
    plan = ts.ngram_lm_score(docs, "text", model) \
        ._jdf.queryExecution().executedPlan().toString()
    # the corpus-side model join broadcasts; fit-internal joins are
    # model-sized and irrelevant to corpus scale
    assert "SortMergeJoin" not in plan.split("BroadcastExchange")[0]
    assert "BroadcastHashJoin" in plan


# -- chunking ----------------------------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    from semadb_spark.operators import textstats as ts

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([("d", text), ("e", "   "), ("f", None)],
                               "_id string, text string")
    rows = [r.asDict() for r in ts.chunk_documents(
        df, "text", chunk_tokens=4, overlap_tokens=1).orderBy("chunk_idx").collect()]
    assert all(r["_id"] == "d" for r in rows)  # empty/null docs emit nothing
    # stride 3 over 10 tokens -> starts 0,3,6 (a start at 9 would be a
    # pure suffix repeat: its only token already sits in the chunk at 6)
    assert [r["chunk_text"] for r in rows] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4]
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    # token conservation: chunks cover the doc exactly once plus overlaps
    assert sum(r["n_chunk_tokens"] for r in rows) - (len(rows) - 1) * 1 == 10
    # no overlap: exact partition of the token stream
    flat = ts.chunk_documents(df, "text", chunk_tokens=4).collect()
    assert sum(r["n_chunk_tokens"] for r in flat) == 10


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from semadb_spark.operators import textstats as ts

    df = spark.createDataFrame([("d", "a b")], "_id string, text string")
    with _pytest.raises(ValueError):
        ts.chunk_documents(df, "text", chunk_tokens=0)
    with _pytest.raises(ValueError):
        ts.chunk_documents(df, "text", chunk_tokens=4, overlap_tokens=4)


def test_chunk_documents_no_shuffle(spark):
    from semadb_spark.operators import textstats as ts

    df = spark.createDataFrame([("d", "a b c")], "_id string, text string")
    plan = ts.chunk_documents(df, "text", chunk_tokens=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- DSIR importance resampling ---------------------------------------------


@pytest.fixture(scope="module")
def dsir_frames(spark):
    """Target: short docs about cats; raw: mostly dog docs + the cat docs."""
    cats = [(f"c{i}", "the cat sat on the warm mat near the cat door")
            for i in range(5)]
    dogs = [(f"d{i}", "a dog ran across the wide park chasing a loud ball")
            for i in range(15)]
    other = [("x0", None), ("x1", "")]
    target = spark.createDataFrame(cats, "_id string, text string")
    raw = spark.createDataFrame(cats + dogs + other, "_id string, text string")
    return target, raw


def test_dsir_fit_table_is_bucket_bounded(spark, dsir_frames):
    from semadb_spark.operators import selection as sel

    target, raw = dsir_frames
    tbl = sel.dsir_fit(target, raw, "text", buckets=64)
    rows = tbl.collect()
    assert len(rows) == 64  # dense spine: EXACTLY buckets rows, always
    assert {r["bucket"] for r in rows} == set(range(64))
    assert all(r["log_ratio"] is not None for r in rows)


def test_dsir_score_ranks_target_like_docs_higher(spark, dsir_frames):
    from semadb_spark.operators import selection as sel

    target, raw = dsir_frames
    tbl = sel.dsir_fit(target, raw, "text", buckets=256)
    scored = {r["_id"]: r for r in
              sel.dsir_score(raw, "text", tbl, buckets=256).collect()}
    # no-gram docs produce no row (ngram_lm_score contract)
    assert "x0" not in scored and "x1" not in scored
    cat = scored["c0"]["logw_per_gram"]
    dog = scored["d0"]["logw_per_gram"]
    assert cat > dog  # target-distribution docs carry higher weight
    # identical docs score identically; n_grams = unigrams + bigrams
    assert scored["c1"]["logw"] == scored["c0"]["logw"]
    assert scored["c0"]["n_grams"] == 11 + 10


def test_dsir_sample_is_deterministic_and_weight_biased(spark, dsir_frames):
    from semadb_spark.operators import selection as sel

    target, raw = dsir_frames
    tbl = sel.dsir_fit(target, raw, "text", buckets=256)
    scored = sel.dsir_score(raw, "text", tbl, buckets=256).cache()
    a = {r["_id"] for r in sel.dsir_sample(scored, 8, seed=3).collect()}
    b = {r["_id"] for r in sel.dsir_sample(scored, 8, seed=3).collect()}
    assert a == b and len(a) == 8  # without replacement, seed-stable
    c = {r["_id"] for r in sel.dsir_sample(scored, 8, seed=4).collect()}
    assert a != c  # a new seed redraws
    # cats are 5/20 of the pool but upweighted: every draw keeps them all
    assert sum(1 for i in a if i.startswith("c")) == 5
    scored.unpersist()


def test_dsir_score_plan_broadcasts_table(spark, dsir_frames):
    from semadb_spark.operators import selection as sel

    target, raw = dsir_frames
    tbl = sel.dsir_fit(target, raw, "text", buckets=64)
    plan = sel.dsir_score(raw, "text", tbl, buckets=64) \
        ._jdf.queryExecution().executedPlan().toString()
    # corpus-side: one broadcast join on the bounded table, then one agg
    # exchange on the doc id — never a sort-merge against the corpus
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("BroadcastExchange")[0]


def test_dsir_sample_plan_is_take_ordered(spark, dsir_frames):
    from semadb_spark.operators import selection as sel

    target, raw = dsir_frames
    tbl = sel.dsir_fit(target, raw, "text", buckets=64)
    scored = sel.dsir_score(raw, "text", tbl, buckets=64)
    plan = sel.dsir_sample(scored, 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


def test_dsir_validation_errors(spark, dsir_frames):
    from semadb_spark.operators import selection as sel

    target, raw = dsir_frames
    with pytest.raises(ValueError, match="n must be"):
        sel.dsir_fit(target, raw, "text", n=0)
    with pytest.raises(ValueError, match="buckets"):
        sel.dsir_fit(target, raw, "text", buckets=1)
    with pytest.raises(ValueError, match="unit"):
        sel.dsir_fit(target, raw, "text", unit="byte")
    tbl = sel.dsir_fit(target, raw, "text")
    with pytest.raises(ValueError, match="k must be"):
        sel.dsir_sample(sel.dsir_score(raw, "text", tbl), 0)
