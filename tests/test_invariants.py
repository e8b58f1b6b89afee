"""Property-based invariants (SURVEY §5 test plan): randomized inputs via
hypothesis, small example counts since every example runs Spark jobs.

- hybrid score of an overlap row = weighted sum of branch scores (B3)
- pre-filtered kNN results ⊆ filter set, and are exactly the exact-kNN of
  the filtered subset (R4: pre-filter semantics, not post-filter)
- containsAll results ⊆ containsAny results for the same values (F7/F8)
- multi-key sort puts missing values last regardless of direction (P2)
- update-merge is idempotent: applying the same batch twice == once (W2)
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from semadb_spark.collection import apply_update_merge
from semadb_spark.operators.knn import knn_topk
from semadb_spark.plans.compiler import SearchEngine

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

DOC_SCHEMA = {
    "vec": {"type": "vectorFlat", "vectorFlat": {"vectorSize": 4, "distanceMetric": "euclidean"}},
    "cat": {"type": "string", "string": {"caseSensitive": False}},
    "num": {"type": "integer", "integer": {}},
    "labels": {"type": "stringArray", "stringArray": {"caseSensitive": False}},
}


def _mk_docs(spark, seed, n=40, with_nulls=False):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        num = None if (with_nulls and i % 7 == 0) else int(rng.integers(0, 50))
        rows.append(
            Row(
                _id=f"{i:03d}",
                vec=[float(x) for x in rng.random(4)],
                cat=f"c{int(rng.integers(0, 4))}",
                num=num,
                labels=[f"l{int(x)}" for x in rng.integers(0, 6, size=3)],
            )
        )
    schema = "_id string, vec array<float>, cat string, num bigint, labels array<string>"
    return spark.createDataFrame(rows, schema)


@settings(**SETTINGS)
@given(seed=st.integers(0, 10_000), w1=st.floats(0.1, 3), w2=st.floats(0.1, 3))
def test_hybrid_score_is_weighted_sum(spark, seed, w1, w2):
    docs = _mk_docs(spark, seed)
    eng = SearchEngine(docs, DOC_SCHEMA)
    qv = [0.5, 0.5, 0.5, 0.5]
    res = eng.search(
        {
            "query": {
                "property": "_or",
                "_or": [
                    {"property": "vec", "vectorFlat": {"vector": qv, "operator": "near", "limit": 40, "weight": w1}},
                    {"property": "vec", "vectorFlat": {"vector": qv, "operator": "near", "limit": 40, "weight": w2}},
                ],
            },
            "limit": 40,
        }
    ).collect()
    # every row appears in both branches (same vector query) -> hybrid score
    # = w1*(-d) + w2*(-d)
    docs_v = {r._id: np.asarray(r.vec, dtype=np.float64) for r in docs.collect()}
    for r in res:
        d = float(((docs_v[r._id] - np.asarray(qv)) ** 2).sum())
        assert r._hybridScore == pytest.approx(-(w1 + w2) * d, rel=1e-6, abs=1e-9)


@settings(**SETTINGS)
@given(seed=st.integers(0, 10_000), cut=st.integers(5, 45))
def test_prefilter_knn_equals_knn_of_filtered_subset(spark, seed, cut):
    docs = _mk_docs(spark, seed)
    eng = SearchEngine(docs, DOC_SCHEMA)
    qv = [0.2, 0.8, 0.2, 0.8]
    res = eng.search(
        {
            "query": {
                "property": "vec",
                "vectorFlat": {
                    "vector": qv,
                    "operator": "near",
                    "limit": 10,
                    "filter": {"property": "num", "integer": {"operator": "lessThan", "value": cut}},
                },
            },
            "limit": 10,
        }
    ).collect()
    subset = docs.filter(F.col("num") < cut)
    want = knn_topk(subset, "vec", qv, "euclidean", 10).collect()
    assert [r._id for r in res] == [r._id for r in want]
    # subset property: every result satisfies the filter
    allowed = {r._id for r in subset.collect()}
    assert {r._id for r in res} <= allowed


@settings(**SETTINGS)
@given(seed=st.integers(0, 10_000), vals=st.lists(st.sampled_from(["l0", "l1", "l2", "l3"]), min_size=1, max_size=3, unique=True))
def test_contains_all_subset_of_contains_any(spark, seed, vals):
    docs = _mk_docs(spark, seed)
    eng = SearchEngine(docs, DOC_SCHEMA)

    def ids(op):
        res = eng.search(
            {"query": {"property": "labels", "stringArray": {"operator": op, "value": vals}}, "limit": 100}
        )
        return {r._id for r in res.collect()}

    assert ids("containsAll") <= ids("containsAny")


@settings(**SETTINGS)
@given(seed=st.integers(0, 10_000), descending=st.booleans())
def test_sort_missing_last(spark, seed, descending):
    docs = _mk_docs(spark, seed, with_nulls=True)
    eng = SearchEngine(docs, DOC_SCHEMA)
    res = eng.search(
        {
            "query": {"property": "cat", "string": {"operator": "startsWith", "value": "c"}},
            "select": ["num"],
            "sort": [{"property": "num", "descending": descending}],
            "limit": 100,
        }
    ).collect()
    nums = [r.num for r in res]
    seen_null = False
    for v in nums:
        if v is None:
            seen_null = True
        else:
            assert not seen_null, "non-null after null: missing must sort last"
    assert None in nums  # fixture guarantees some nulls


@settings(**SETTINGS)
@given(seed=st.integers(0, 10_000))
def test_update_merge_idempotent(spark, seed):
    docs = _mk_docs(spark, seed, n=20)
    rng = np.random.default_rng(seed + 1)
    upd = spark.createDataFrame(
        [
            Row(_id=f"{i:03d}", cat="_delete" if i % 5 == 0 else f"u{int(rng.integers(0,9))}")
            for i in range(0, 20, 2)
        ]
    )
    once = apply_update_merge(docs, upd)
    twice = apply_update_merge(once, upd)
    assert once.exceptAll(twice).count() == 0 and twice.exceptAll(once).count() == 0


def test_topk_scan_boundary_ties_resolve_by_id(spark):
    """The k-boundary tie class must resolve by id ascending EXACTLY — a
    batch-local cut that keeps an arbitrary tied member (bare argpartition)
    silently swaps ids at the boundary (round-4 knn_jaccard oracle flake).
    Corpus: many identical vectors spread across partitions, so every
    distance ties and only the id tiebreak orders them."""
    from semadb_spark.operators.knn import knn_topk_scan

    rows = [Row(_id=f"{i:04d}", v=[1.0, 0.0]) for i in range(200)]
    df = spark.createDataFrame(rows).repartition(8)
    for metric, q in [("euclidean", [0.0, 0.0]), ("hamming", [3, 0]), ("jaccard", [3, 0])]:
        got = [
            r["_id"]
            for r in knn_topk_scan(df, "v", [("q", q)], metric, 10)
            .orderBy("_rank")
            .collect()
        ]
        assert got == [f"{i:04d}" for i in range(10)], (metric, got)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "aa", "bb", "zz"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_repetition_signals_match_counter_reference(spark, docs):
    """The zero-shuffle sorted-run mode count must equal the obvious
    Counter-based definition for arbitrary token multisets (the fold is the
    subtle part: longest equal-run of the sorted gram array == count of the
    most frequent gram)."""
    from collections import Counter

    from semadb_spark.operators.textstats import repetition_signals

    rows = [Row(_id=str(i), text=" ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "_id string, text string")
    got = {r["_id"]: r for r in repetition_signals(df, "text").collect()}
    for i, toks in enumerate(docs):
        rid = str(i)
        if not toks:
            assert rid not in got
            continue
        r = got[rid]
        uni = Counter(toks)
        bigr = Counter(
            f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)
        )
        assert r["n_tokens"] == len(toks)
        assert r["dup_token_frac"] == (len(toks) - len(uni)) / len(toks)
        assert r["top_token_frac"] == max(uni.values()) / len(toks)
        expect_b = (
            max(bigr.values()) / sum(bigr.values()) if bigr else 0.0
        )
        assert r["top_bigram_frac"] == expect_b


def test_idx_cache_lru_evicts_and_rebuilds(spark):
    """The entry module's artifact cache is LRU-bounded (reference caps its
    shard cache, singleServer.yaml:61): filling past the cap evicts the
    oldest entry, unpersists its frames, and a later request rebuilds it
    correctly."""
    import __spark_entry__ as em

    saved_cache, saved_max = dict(em._IDX_CACHE), em._IDX_CACHE_MAX
    em._IDX_CACHE.clear()
    try:
        em._IDX_CACHE_MAX = 2
        builds = []

        def make(tag):
            def build():
                builds.append(tag)
                # distinct row count per tag: same-shaped plans canonicalize
                # to ONE CacheManager entry (rename-only variants share it),
                # which would let a later rebuild re-cache an evicted
                # frame's entry and make this test lie
                df = spark.range(3 + len(tag) * ord(tag[0]))
                df.persist().count()
                return df

            return build

        a = em._cached_index("a", "/x", make("a"))
        em._cached_index("b", "/x", make("b"))
        assert em._cached_index("a", "/x", make("a")) is a  # hit, no rebuild
        em._cached_index("c", "/x", make("c"))  # evicts b (a was refreshed)
        assert ("b", "/x") not in em._IDX_CACHE
        assert builds == ["a", "b", "c"]
        em._cached_index("b", "/x", make("b"))  # rebuilds cleanly
        assert builds == ["a", "b", "c", "b"]
        assert len(em._IDX_CACHE) == 2
        # evicted frame was unpersisted
        assert not (a.storageLevel.useMemory or a.storageLevel.useDisk)
    finally:
        em._IDX_CACHE.clear()
        em._IDX_CACHE.update(saved_cache)
        em._IDX_CACHE_MAX = saved_max


def test_ratio_band_survives_uniform_noise_window():
    """Noise-normalized pin bands (r11): in a synthetic 2x-slowdown window
    that shifts EVERY row uniformly (this host's documented whole-window
    noise mode, COVERAGE.md r10 ledger), an absolute pin trips and forces
    re-measure churn, while the ratio band — measured against a same-run
    reference row that slowed by the same factor — passes. A REAL kernel
    regression (only the measured row slows) still trips the ratio band."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _below_band

    # calm window: quantized leg 2.7s, float reference 2.4s (ratio 0.89)
    assert not _below_band(2.7, pin_sec=3.0)
    assert not _below_band(2.7, ref_sec=2.4, min_ratio=0.45)
    # uniform 2x window: both rows slow together
    assert _below_band(5.4, pin_sec=2.5)  # abs pin (2x rule) churns
    assert not _below_band(5.4, ref_sec=4.8, min_ratio=0.45)  # ratio passes
    # uniform 4x window: ratio still passes, churn-free
    assert not _below_band(10.8, ref_sec=9.6, min_ratio=0.45)
    # real regression: only the measured row slows 3x -> ratio trips
    assert _below_band(8.1, ref_sec=2.4, min_ratio=0.45)
    # both styles combined: either tripping re-measures
    assert _below_band(8.1, pin_sec=10.0, ref_sec=2.4, min_ratio=0.45)
    assert _below_band(25.0, pin_sec=10.0, ref_sec=24.0, min_ratio=0.45)


def test_qps_best_of_notes_25pct_pin_miss():
    """r11 "what's wrong" #1: hybrid_local_1m mp8 missed its 120-QPS pin
    by ~43% three committed runs in a row and the old 0.5x trip-wire
    stayed silent. The tightened note_ratio (0.75 default) must note any
    >25% miss — here a ~66-QPS loop against pin 120 (0.55x: silent
    before, noted now) — re-measuring to max_passes first, and must stay
    quiet inside the band."""
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import qps_best_of

    qps, passes, note = qps_best_of(
        10, lambda: time.sleep(0.15), pin=120.0,
        min_passes=2, max_passes=3, band_backoff_sec=0)
    assert qps < 0.75 * 120.0
    assert passes == 3  # a miss re-measures to max_passes before noting
    assert note == "below_pinned_band:120.0qps_after_3_passes"
    # inside the band (>= 0.75x pin): no note, stops at min_passes.
    # sleep(0.05) -> ~200 QPS nominal leaves 2x headroom over the 90-QPS
    # band edge so scheduler jitter can't flake the assertion
    qps2, passes2, note2 = qps_best_of(
        10, lambda: time.sleep(0.05), pin=120.0,
        min_passes=2, max_passes=3, band_backoff_sec=0)
    assert note2 is None and passes2 == 2 and qps2 >= 0.75 * 120.0


def test_bench_detail_degraded_run_guard(tmp_path, monkeypatch):
    """VERDICT r12 directive #2: a run whose median per-query warm ratio
    vs the committed incumbent exceeds 1.3 must not overwrite it — the
    r12 snapshot replaced a clean 16.2 s run with a host-contended 27.6 s
    one. Within-band runs and force-override still write in place."""
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _detail_write_path

    inc = tmp_path / "BENCH_DETAIL.json"
    inc.write_text(_json.dumps({"queries": {"a": 1.0, "b": 2.0, "c": 0.5}}))
    # uniform 2x degradation -> guarded to the _DEGRADED sibling
    path, med = _detail_write_path(str(inc), {"a": 2.0, "b": 4.0, "c": 1.0})
    assert path.endswith("BENCH_DETAIL_DEGRADED.json") and med == 2.0
    # within noise -> writes in place
    path2, _ = _detail_write_path(str(inc), {"a": 1.1, "b": 2.1, "c": 0.55})
    assert path2 == str(inc)
    # one slow outlier among fast queries -> median protects (no guard)
    path3, _ = _detail_write_path(str(inc), {"a": 9.0, "b": 2.0, "c": 0.5})
    assert path3 == str(inc)
    # explicit force writes in place even when degraded
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE_DETAIL", "1")
    path4, _ = _detail_write_path(str(inc), {"a": 2.0, "b": 4.0, "c": 1.0})
    assert path4 == str(inc)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE_DETAIL")
    # no incumbent -> writes in place
    path5, _ = _detail_write_path(str(tmp_path / "nope.json"), {"a": 2.0})
    assert path5 == str(tmp_path / "nope.json")
    # a different-scale run never replaces the incumbent, even when its
    # per-query ratios look great (a tiny-sf smoke is faster everywhere)
    inc.write_text(_json.dumps(
        {"sf": 0.1, "queries": {"a": 1.0, "b": 2.0, "c": 0.5}}))
    path6, _ = _detail_write_path(
        str(inc), {"a": 0.1, "b": 0.2, "c": 0.05}, sf=0.01)
    assert path6.endswith("BENCH_DETAIL_DEGRADED.json")
    path7, _ = _detail_write_path(
        str(inc), {"a": 1.0, "b": 2.0, "c": 0.5}, sf=0.1)
    assert path7 == str(inc)


def test_budget_skip_guard(monkeypatch):
    """_skip_for_budget skips a block whose estimate exceeds the remaining
    global budget and admits one that fits; every deep-block guard key has
    a full-scale estimate in EST_SEC (a missing key would KeyError the run
    at the guard site, not degrade it)."""
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    monkeypatch.setattr(bench, "BENCH_BUDGET_SEC", 1000.0)
    monkeypatch.setattr(bench, "_T0", time.time() - 900.0)  # 100s remain
    assert bench._skip_for_budget("deep_block", est_sec=500.0) is True
    assert bench._skip_for_budget("cheap_block", est_sec=50.0) is False
    assert bench._budget_tight() is True  # < 240s left
    monkeypatch.setattr(bench, "_T0", time.time())  # full budget again
    assert bench._skip_for_budget("deep_block", est_sec=500.0) is False
    assert bench._budget_tight() is False
    # the guard sites in main() index EST_SEC with these exact keys
    for key in ("vector_10m", "docs_10m", "hybrid_local_1m"):
        assert key in bench.EST_SEC and bench.EST_SEC[key] > 0


def test_gate_budget_and_oracle_key_contract():
    """Driver contract structure, no Spark needed: exactly 50 merged gates
    (budget assert intact), every oracle key names a gate, and merge=False
    keeps every leg addressable (superset of the merged set minus combos)."""
    import __spark_entry__ as em

    merged = em.queries()
    assert len(merged) == 50
    oracles = em.oracle_sql()
    unknown = set(oracles) - set(merged)
    assert not unknown, f"oracle keys without a gate: {sorted(unknown)}"
    legs = em.queries(merge=False)
    # every base leg the combos absorbed is still addressable for bench
    for name in ("lm_perplexity", "lm_word_perplexity", "chunk_docs",
                 "dsir_weights", "dsir_select", "bpe_segment",
                 "contamination_flags", "asof_fwd_events"):
        assert name in legs and callable(legs[name])


def test_best_of_materialize_false_skips_final_recompute():
    """r13: the docs_1m/docs_10m linearity loops discard best_of's
    returned frame immediately, yet best_of always rebuilt + persisted it
    once more after timing — a full extra untimed pass per leg (~half the
    docs_10m block's wall-clock). materialize=False must return
    (None, best_sec) and run make() exactly once per timed pass; the
    default path keeps the extra materialization for callers that use
    the frame."""
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import best_of

    class FakeFrame:
        runs = 0

        def persist(self):
            return self

        def count(self):
            FakeFrame.runs += 1
            # fixed per-pass cost so the improving->extend rule (>10%
            # faster) can't fire on scheduler jitter and add passes
            time.sleep(0.05)
            return 1

        def unpersist(self, blocking=False):
            return self

    def make():
        return FakeFrame()

    FakeFrame.runs = 0
    frame, dt = best_of(2, make, materialize=False)
    assert frame is None and dt is not None
    assert FakeFrame.runs == 2  # timed passes only, no extra recompute

    FakeFrame.runs = 0
    frame, dt = best_of(2, make)
    assert frame is not None
    assert FakeFrame.runs == 3  # 2 timed + 1 returned materialization
