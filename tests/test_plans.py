"""Physical-plan regression tests: the scale posture (COVERAGE.md §Scale).

These assert the *plan shape* Catalyst produces for our operators, so a
refactor can't silently drop predicate pushdown, column pruning, the
distributed top-k pre-trim, or the broadcast merge join. The reference gets
the equivalents from hand-coded strategies (filter-first design
models/search.go:9-15, partial decode shard/index/utils.go:10-26, per-shard
top-k cluster/actions.go:267-299); for us they must fall out of the plan.
"""

import os

import pytest
from pyspark.sql import functions as F

from semadb_spark.plans import SearchEngine

SCHEMA = {
    "cat": {"type": "string", "string": {"caseSensitive": True}},
    "size": {"type": "integer"},
    "vec": {"type": "vectorFlat", "vectorFlat": {"vectorSize": 2, "distanceMetric": "euclidean"}},
}


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "tbl.parquet")
    spark.range(2000).select(
        F.col("id").cast("string").alias("_id"),
        F.concat(F.lit("cat"), (F.col("id") % 7).cast("string")).alias("cat"),
        (F.col("id") % 100).alias("size"),
        F.array((F.col("id") % 13).cast("float"), (F.col("id") % 17).cast("float")).alias("vec"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(table):
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {"query": {"property": "cat", "string": {"operator": "equals", "value": "cat3"}}, "limit": 10}
    )
    plan = _plan(res)
    # equals filter pushed into the parquet scan, not evaluated post-read
    assert "PushedFilters: [" in plan and "EqualTo(cat,cat3)" in plan, plan


def test_column_pruning_reaches_scan(table):
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {
            "query": {"property": "size", "integer": {"operator": "greaterThan", "value": 90}},
            "select": ["size"],
            "limit": 10,
        }
    )
    plan = _plan(res)
    # partial-decode analogue: untouched wide column never read from parquet
    assert "payload" not in plan, plan
    assert "vec" not in plan.split("ReadSchema")[1].split("\n")[0], plan


def test_limit_becomes_distributed_topk(table):
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {
            "query": {"property": "size", "integer": {"operator": "lessThan", "value": 90}},
            "sort": [{"property": "size", "descending": True}],
            "limit": 20,
        }
    )
    # per-partition top-k + merge (the reference's Poisson-trimmed scatter
    # P5/P6, cluster/actions.go:267-299, done natively by Spark)
    assert "TakeOrderedAndProject" in _plan(res), _plan(res)


def test_knn_prefilter_pushed_to_scan(table):
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {
            "query": {
                "property": "vec",
                "vectorFlat": {
                    "vector": [1.0, 2.0],
                    "operator": "near",
                    "limit": 5,
                    "filter": {"property": "cat", "string": {"operator": "equals", "value": "cat1"}},
                },
            },
            "limit": 5,
        }
    )
    plan = _plan(res)
    # R4 pre-filter semantics: the filter constrains the scan feeding the
    # distance top-k (filter-first, search.go:58-66) — pushed to parquet
    assert "EqualTo(cat,cat1)" in plan, plan


def test_update_merge_broadcasts_small_updates(spark, table):
    from semadb_spark.collection import apply_update_merge

    upd = spark.range(5).select(
        F.col("id").cast("string").alias("_id"), F.lit("catX").alias("cat")
    )
    plan = _plan(apply_update_merge(table, upd))
    # W2 merge joins the (small) update batch without shuffling the table
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_default_limit_no_global_window(table):
    # A request with no limit gets the reference default 10
    # (httpapi/v2/handlers.go:442-445) and must compile to a distributed
    # TakeOrderedAndProject with NO single-partition row_number window —
    # the round-1 unlimited-query scale killer.
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {"query": {"property": "size", "integer": {"operator": "lessThan", "value": 90}}}
    )
    plan = _plan(res)
    assert "TakeOrderedAndProject" in plan, plan
    assert "row_number" not in plan and "Window" not in plan, plan
    assert res.count() == 10


def test_offset_zero_with_limit_skips_window(table):
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {
            "query": {"property": "size", "integer": {"operator": "lessThan", "value": 90}},
            "limit": 25,
        }
    )
    plan = _plan(res)
    assert "Window" not in plan, plan
    assert res.count() == 25


def test_explicit_null_limit_returns_all(table):
    # engine extension: explicit null limit = full result set (batch mode)
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {"query": {"property": "size", "integer": {"operator": "lessThan", "value": 10}}, "limit": None}
    )
    assert res.count() == 200  # 2000 rows, size = id % 100 < 10
    assert "Window" not in _plan(res)


def test_all_ranked_query_skips_backfill_scan(table):
    # r13: when every leg of the query is ranked, the leftover filter-set
    # is empty by construction (ids == ranked ids); _assemble must skip
    # the anti-join + second table scan + union that would materialize it.
    eng = SearchEngine(table, SCHEMA)
    single = eng.search(
        {"query": {"property": "vec", "vectorFlat": {"vector": [1.0, 2.0], "operator": "near", "limit": 5}}}
    )
    plan = _plan(single)
    assert "LeftAnti" not in plan, plan
    assert "Union" not in plan, plan
    assert single.count() == 5
    # mixed ranked + pure _or still backfills score-less filter rows
    mixed = eng.search(
        {
            "query": {
                "property": "_or",
                "_or": [
                    {"property": "vec", "vectorFlat": {"vector": [1.0, 2.0], "operator": "near", "limit": 5}},
                    {"property": "size", "integer": {"operator": "lessThan", "value": 3}},
                ],
            },
            "limit": None,
        }
    )
    mplan = _plan(mixed)
    assert "Union" in mplan, mplan
    null_score_rows = mixed.filter(F.col("_hybridScore") == 0.0).count()
    assert null_score_rows > 0  # filter-only rows survive with no score


def test_batch_mode_skips_global_sort(table):
    # r13: explicit null limit + no sort keys = batch mode; the default
    # ranked-first presentation order is pagination plumbing, and a global
    # sort of an unbounded result is a full extra exchange at scale.
    eng = SearchEngine(table, SCHEMA)
    res = eng.search(
        {"query": {"property": "size", "integer": {"operator": "lessThan", "value": 10}}, "limit": None}
    )
    plan = _plan(res)
    assert "Sort [" not in plan, plan
    assert res.count() == 200
    # an explicit sort key keeps the global order even when unlimited
    ordered = eng.search(
        {
            "query": {"property": "size", "integer": {"operator": "lessThan", "value": 10}},
            "limit": None,
            "sort": [{"property": "size", "descending": True}],
        }
    )
    oplan = _plan(ordered)
    assert "Sort [" in oplan, oplan
    top = ordered.select("size").head()["size"]
    assert top == 9


def test_ranked_backfill_broadcasts_without_aqe_help(spark, table):
    # The ranked frame is bounded by branch limits, so the backfill join
    # must broadcast BY HINT — not by AQE's runtime size estimate (which a
    # 100 TB scan can't rely on pre-shuffle).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        eng = SearchEngine(table, SCHEMA)
        res = eng.search(
            {
                "query": {
                    "property": "_and",
                    "_and": [
                        {"property": "vec", "vectorFlat": {"vector": [1.0, 2.0], "operator": "near", "limit": 5}},
                        {"property": "size", "integer": {"operator": "lessThan", "value": 50}},
                    ],
                },
                "limit": 5,
            }
        )
        plan = _plan(res)
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        # the _and intersection may keep fewer than the 5 ranked rows
        assert 1 <= res.count() <= 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bq_rerank_pool_broadcasts(spark, table):
    # bq_topk_batch's candidate pool (queries x k x oversample rows) must
    # broadcast into the float-vector join — a shuffle of the full table to
    # meet a bounded pool would be the 100TB scale killer
    import numpy as np

    from semadb_spark.operators.quantize import bq_fit, bq_encode, bq_topk_batch

    vecs = table.select("_id", F.col("vec").cast("array<float>").alias("v"))
    thr = bq_fit(vecs, "v")
    codes = bq_encode(vecs, "v", thr).select("_id", "bq_code")
    out = bq_topk_batch(
        codes, "bq_code", vecs, "v", [("q0", [1.0, 2.0])], thr, 5, oversample=4
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_explain_surfaces_plan_markers(table):
    """SearchEngine.explain must return the physical plan for a request with
    the load-bearing markers readable (pushdown at the scan, pagination
    pre-trim) in every explain mode a user would reach for."""
    eng = SearchEngine(table, SCHEMA)
    req = {
        "query": {
            "property": "cat",
            "string": {"operator": "equals", "value": "cat3"},
        },
        "limit": 5,
    }
    formatted = eng.explain(req)
    assert "PushedFilters" in formatted, formatted
    assert "TakeOrderedAndProject" in formatted, formatted
    simple = eng.explain(req, mode="simple")
    assert "TakeOrderedAndProject" in simple, simple
    with pytest.raises(Exception):
        eng.explain(req, mode="not-a-mode")


def test_text_batch_broadcasts_query_terms(spark, tmp_path_factory):
    """text_search_batch must broadcast the tiny (query_id, term) frame into
    the posting join — a shuffle of the posting table keyed by term to meet
    a handful of query terms would be the 100TB scale killer."""
    from semadb_spark.operators.text_search import build_text_index, text_search_batch

    path = str(tmp_path_factory.mktemp("textb") / "docs.parquet")
    spark.range(500).select(
        F.col("id").cast("string").alias("_id"),
        F.concat(
            F.lit("alpha beta gamma doc "), F.col("id").cast("string")
        ).alias("text"),
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    idx = build_text_index(docs, "text")
    out = text_search_batch(
        docs, "text", [("q0", "alpha beta"), ("q1", "gamma")],
        doc_terms=idx, num_docs=500, limit=5,
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rplsh_filtered_candidate_ids(spark):
    """R4 pre-filter on the RP-LSH route: filtered results are a subset of
    the unfiltered search, every row satisfies the filter, and the
    candidate restriction happens BEFORE the rerank join (left-semi on the
    bucket-candidate ids — the same optimistic filtered-ANN shape as
    ivf_search). Keeps the four ANN routes API-symmetric."""
    import numpy as np

    from semadb_spark.operators.ann import rplsh_build, rplsh_search

    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(300, 8))
    df = spark.createDataFrame(
        [(str(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "_id string, v array<float>",
    )
    idx = rplsh_build(df, "v", 8, "_id", tables=8, bits=4, seed=3)
    qlist = [(str(i), [float(x) for x in vecs[i]]) for i in range(5)]
    # filter: even ids only
    allowed = {str(i) for i in range(0, 300, 2)}
    cand = df.select("_id").filter(F.col("_id").cast("long") % 2 == 0)
    unfiltered = rplsh_search(idx, qlist, "euclidean", 10).collect()
    filtered = rplsh_search(idx, qlist, "euclidean", 10,
                            candidate_ids=cand).collect()
    assert filtered, "filtered search returned nothing"
    f_pairs = {(r["query_id"], r["_id"]) for r in filtered}
    u_pairs = {(r["query_id"], r["_id"]) for r in unfiltered}
    assert all(r["_id"] in allowed for r in filtered)
    # subset of the unfiltered candidates restricted to allowed ids
    u_allowed = {(q, i) for q, i in u_pairs if i in allowed}
    # every unfiltered hit that satisfies the filter must survive (the
    # pre-filter only removes candidates, never adds or reorders the rest)
    assert u_allowed <= f_pairs


def test_all_ranked_bool_folds_idset_into_merge(table):
    # r13: an _and/_or whose every child is ranked folds the id-set
    # machinery into the merge aggregation — membership count per id
    # replaces the broadcast semi-join intersection (_and) and the
    # union+distinct set (_or), and the post-merge bounding join
    # disappears. Mixed ranked+pure conjunctions keep the semi-join path.
    eng = SearchEngine(table, SCHEMA)
    both = eng.search(
        {
            "query": {
                "property": "_and",
                "_and": [
                    {"property": "vec", "vectorFlat": {"vector": [1.0, 2.0], "operator": "near", "limit": 5}},
                    {"property": "vec", "vectorFlat": {"vector": [1.0, 2.0], "operator": "near", "limit": 5}},
                ],
            },
            "limit": None,
        }
    )
    plan = _plan(both)
    assert "LeftSemi" not in plan, plan
    rows = both.collect()
    assert len(rows) == 5  # identical legs: intersection is the leg itself
    # merge semantics intact: hybrid score is the SUM of both legs, and
    # the first-non-null distance survives (search.go:255-289)
    single = eng.search(
        {"query": {"property": "vec", "vectorFlat": {"vector": [1.0, 2.0], "operator": "near", "limit": 5}}}
    ).collect()
    sscore = {r["_id"]: r["_hybridScore"] for r in single}
    sdist = {r["_id"]: r["_distance"] for r in single}
    for r in rows:
        assert abs(r["_hybridScore"] - 2 * sscore[r["_id"]]) < 1e-9
        assert r["_distance"] == sdist[r["_id"]]
    # ranked + pure conjunction still intersects via the broadcast
    # semi-join accumulator (the fold must not fire)
    mixed = eng.search(
        {
            "query": {
                "property": "_and",
                "_and": [
                    {"property": "vec", "vectorFlat": {"vector": [1.0, 2.0], "operator": "near", "limit": 5}},
                    {"property": "size", "integer": {"operator": "lessThan", "value": 50}},
                ],
            },
            "limit": None,
        }
    )
    assert "LeftSemi" in _plan(mixed)
    assert mixed.count() <= 5
