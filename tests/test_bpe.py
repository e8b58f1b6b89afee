"""BPE tokenizer: fit determinism, encode round-trip, plan shape."""

import random
from collections import Counter

import pytest

from semadb_spark.operators import bpe as B


def _naive_merges(word_counts, num_merges):
    """Textbook full-recount reference for the incremental fit."""
    seqs, freqs = [], []
    for w, c in word_counts:
        if not w:
            continue
        chars = list(w)
        chars[-1] = chars[-1] + B._EOW
        seqs.append(chars)
        freqs.append(c)
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for s, c in zip(seqs, freqs):
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        joined = pair[0] + pair[1]
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == pair[0] and s[i + 1] == pair[1]:
                    s[i : i + 2] = [joined]
                else:
                    i += 1
        merges.append(pair)
    return merges


def test_incremental_fit_matches_naive_recount():
    rng = random.Random(7)
    for trial in range(20):
        vocab = [
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(3, 40))
        ]
        wc = [(w, rng.randint(1, 9)) for w in sorted(set(vocab))]
        assert B._bpe_merges_py(wc, 25) == _naive_merges(wc, 25), (trial, wc)


def test_classic_example_merges():
    # Sennrich's example family: 'est</w>' dominates
    wc = [("lowest", 6), ("newest", 5), ("low", 7), ("new", 4)]
    merges = B._bpe_merges_py(wc, 4)
    # (l,o) leads at 13 (lowest 6 + low 7); then (e,s)/(es,t</w>) at 11,
    # the (e,s) vs (s,t</w>) tie broken lexicographically
    assert merges[:3] == [("l", "o"), ("e", "s"), ("es", "t</w>")]


def test_fit_stops_when_all_pairs_unique():
    wc = [("abc", 1), ("xyz", 1)]
    assert B._bpe_merges_py(wc, 10) == []  # nothing occurs twice


def test_encode_word_replays_trainer_segmentation():
    wc = [("lowest", 6), ("newest", 5), ("low", 7), ("new", 4)]
    merges = B._bpe_merges_py(wc, 50)
    ranks = {m: i for i, m in enumerate(merges)}
    # replay every training word through the encoder: tokens must join
    # back to word + EOW
    for w, _ in wc:
        toks = B._encode_word(w, ranks)
        assert "".join(toks) == w + B._EOW


def test_bpe_fit_and_encode_spark(spark):
    rows = [
        ("0", "low low low lower lowest"),
        ("1", "new newer newest newest"),
        ("2", "the lowest newest low"),
        ("3", None),
    ]
    df = spark.createDataFrame(rows, "_id string, text string")
    merges = B.bpe_fit(df, "text", num_merges=30, min_count=1)
    assert merges and all(len(m) == 2 for m in merges)
    out = B.bpe_encode(df, "text", merges).orderBy("_id").collect()
    assert [r["_id"] for r in out] == ["0", "1", "2", "3"]
    # round-trip: concatenated tokens restore the normalized words
    for r in out[:3]:
        words = r["text"].lower().split()
        assert "".join(r["bpe_tokens"]) == "".join(w + B._EOW for w in words)
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
    assert out[3]["bpe_tokens"] == [] and out[3]["n_bpe_tokens"] == 0
    # common training words compress below character count
    low = next(r for r in out if r["_id"] == "0")
    assert low["n_bpe_tokens"] < sum(len(w) + 1 for w in low["text"].split())


def test_bpe_word_counts_prune_and_cap(spark):
    df = spark.createDataFrame(
        [("a", "x x x y y z")], "_id string, text string")
    wc = {r["word"]: r["count"]
          for r in B.bpe_word_counts(df, "text", min_count=2).collect()}
    assert wc == {"x": 3, "y": 2}  # z pruned by min_count
    capped = B.bpe_word_counts(df, "text", min_count=1, max_word_rows=2)
    assert [r["word"] for r in capped.collect()] == ["x", "y"]  # top-by-count
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # deterministic head, no sort


def test_bpe_encode_no_shuffle_and_keep_cols(spark):
    df = spark.createDataFrame(
        [("a", "low low", 5)], "_id string, text string, n int")
    merges = [("l", "o"), ("lo", "w</w>")]
    enc = B.bpe_encode(df, "text", merges, keep_cols=["_id", "n"])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # embarrassingly parallel
    row = enc.first()
    assert row["_id"] == "a" and row["n"] == 5
    assert row["bpe_tokens"] == ["low</w>", "low</w>"]
    assert "text" not in enc.columns


def test_bpe_validation(spark):
    df = spark.createDataFrame([("a", "x")], "_id string, text string")
    with pytest.raises(ValueError, match="num_merges"):
        B.bpe_fit(df, "text", num_merges=0)
    with pytest.raises(ValueError, match="min_count"):
        B.bpe_word_counts(df, "text", min_count=0)
    with pytest.raises(ValueError, match="max_word_rows"):
        B.bpe_word_counts(df, "text", max_word_rows=0)
    with pytest.raises(ValueError, match="shadows"):
        B.bpe_encode(df.withColumnRenamed("_id", "bpe_tokens"),
                     "text", [("a", "b")])


def test_chunk_documents_bpe_tokens_col(spark):
    from semadb_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [("a", "low low lower low")], "_id string, text string")
    merges = [("l", "o"), ("lo", "w</w>")]
    enc = B.bpe_encode(df, "text", merges)
    out = ts.chunk_documents(
        enc, "text", tokens_col="bpe_tokens", join_sep="",
        chunk_tokens=3, overlap_tokens=1,
    ).orderBy("chunk_idx").collect()
    toks = enc.first()["bpe_tokens"]
    n = len(toks)  # low</w> x2, lo,w,e,r</w>, low</w> = 7 bpe tokens
    assert n == 7
    # token conservation: sum sizes - (k-1)*overlap == n
    sizes = [r["n_chunk_tokens"] for r in out]
    assert sum(sizes) - (len(out) - 1) * 1 == n
    # chunk_text glued with "" keeps the </w> boundaries readable
    assert out[0]["chunk_text"] == "low</w>low</w>lo"


def test_pack_sequences_precomputed_counts(spark):
    from semadb_spark.operators import packing as pk

    df = spark.createDataFrame(
        [("0", "three words here", 5), ("1", "two words", 7),
         ("2", "one", None)],
        "_id string, text string, n_bpe_tokens int")
    out = pk.pack_sequences(
        df, "text", max_tokens=8, order_col="_id",
        n_tokens_col="n_bpe_tokens",
    ).orderBy("_id", "seq_id").collect()
    # doc0: 5 toks -> seq0[0:5); doc1: 7 toks -> seq0[5:8) + seq1[0:4);
    # doc2: NULL count -> dropped
    got = [(r["_id"], r["seq_id"], r["seq_offset"], r["n_toks"]) for r in out]
    assert got == [("0", 0, 0, 5), ("1", 0, 5, 3), ("1", 1, 0, 4)]


def test_pack_sequences_counts_with_null_text(spark):
    """With n_tokens_col set, rows whose TEXT is null but whose count is
    non-null must still pack (ADVICE r12: the int-order bounds agg used to
    filter on text_col, dropping such rows from [lo,hi] and early-returning
    empty on an all-null-text corpus)."""
    from semadb_spark.operators import packing as pk

    df = spark.createDataFrame(
        [(0, None, 5), (1, None, 7), (2, "has text", 4)],
        "ord int, text string, n_bpe_tokens int",
    )
    out = pk.pack_sequences(
        df, "text", id_col="ord", max_tokens=8, order_col="ord",
        n_tokens_col="n_bpe_tokens",
    ).orderBy("ord", "seq_id").collect()
    got = [(r["ord"], r["seq_id"], r["seq_offset"], r["n_toks"]) for r in out]
    # 5 + 7 + 4 = 16 tokens -> exactly two full 8-token sequences
    assert got == [(0, 0, 0, 5), (1, 0, 5, 3), (1, 1, 0, 4), (2, 1, 4, 4)]

    all_null = spark.createDataFrame(
        [(0, None, 3), (1, None, 6)], "ord int, text string, n int"
    )
    out2 = pk.pack_sequences(
        all_null, "text", id_col="ord", max_tokens=4, order_col="ord",
        n_tokens_col="n",
    ).orderBy("ord", "seq_id").collect()
    assert [(r["ord"], r["seq_id"], r["n_toks"]) for r in out2] == [
        (0, 0, 3), (1, 0, 1), (1, 1, 4), (1, 2, 1)
    ]
