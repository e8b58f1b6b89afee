"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports ``vector_qps`` (batch kNN queries/sec via the scale-path
partition-local top-k scan) — the comparable number against the reference's
ann-benchmarks QPS table (BASELINE.md), measured batch-style per
BASELINE.json's batch-first north star.

MEASUREMENT HISTORY (round-4 root cause of the r2/r3 QPS swings): the old
best-of-N loop persisted an identical plan every pass without unpersisting
between passes. Spark's CacheManager resolves cache entries by analyzed
plan, so pass 2+ read pass 1's InMemoryRelation instead of recomputing —
"best of 3" was really "fastest cache read". That artifact produced r2's
1254 QPS angular row and r3's 4248 QPS euclidean row; the r3 angular 214.5
"regression" was the same loop accidentally measuring honest recomputes
(the new BQ/PQ blocks' unpersists invalidated the shared entry). Honest
steady-state for the r3 kernel was ~385 QPS (tools/repro_angular.py);
best_of below now unpersists between passes, and the round-4 kernels
(mapInArrow + per-task trim, operators/ann.py) earn the throughput back
for real.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


BENCH_QUERIES = [
    # relational-shaped operator throughput
    "filter_bool_compose",
    "filter_int_range",
    "shaping_sort_page",
    "agg_events_rollup",
    # vector search
    "knn_euclidean",
    "knn_batch",
    "knn_filtered",
    "knn_hamming",
    "ann_ivf_topk",
    "ann_ivf_recall",
    "ann_lsh_topk",
    "ann_vamana_recall",
    "bq_hamming_topk",
    "bq_rerank_recall",
    "pq_recall",
    "quantized_bq_serving",
    "quantized_autofit_serving",
    # text search + hybrid
    "text_tfidf_any",
    "text_tfidf_unicode",
    "vamana_graph_route_recall",
    "hybrid_or",
    # pipeline operators
    "dedup_exact",
    "dedup_substring",
    "dedup_ngram_jaccard",
    "dedup_components",
    "embed_neardup",
    "lang_id_counts",
    "quality_scores",
    "token_count_by_source",
    "fingerprint_docs",
    "repetition_signals",
    "pii_scrub",
    "pack_sequences",
    "mixture_sample",
    # write path
    "dml_update_merge",
    # multimodal
    "multimodal_image_meta",
]

# Round-11 additions, timed and reported per-query but EXCLUDED from the
# headline total so `value` stays comparable with BENCH_r01..r10 (same
# query set; the driver-facing gates merged into 50 union-tag combos, so
# bench runs queries(merge=False) to keep these names addressable).
NEW_PIPELINE_QUERIES = [
    "warc_ingest",
    "url_features",
    "host_stats",
    "encoding_quality",
    "profile_docs",
    "histogram_events",
    "quantiles_events",
    "stratified_sample_docs",
    "sessionize_events",
    "asof_join_events",
    "rolling_events",
    "c4_line_filter",
    "dedup_paragraphs",
    "gopher_quality",
    "contamination_flags",
    "lm_perplexity",
    "lm_word_perplexity",
    "asof_fwd_events",
    "chunk_docs",
    "dsir_weights",
    "dsir_select",
]

VECTOR_QPS_BATCH = 512  # queries in the throughput batch (batch-first regime)

# ---------------------------------------------------------------------------
# Wall-clock budget + per-block telemetry (round 13, VERDICT r12 directive
# #1): the r12 driver bench died rc=124 ~80 min in with Python-worker
# crashes in the docs_10m block — the harness had outgrown the driver's
# budget and the crash had no traceback. Three defenses, all active by
# default:
#   (a) every block prints `# [t+..s +..s rss=..g]` so the next slow run
#       names its hog from the log alone;
#   (b) a global wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default
#       60 min — the r13 warm full run measured ~53 min of blocks and the
#       r12 driver kill landed ≈80 min in, so 60 min of blocks + startup
#       still clears the driver's window with >10 min slack): once
#       exceeded, optional deep blocks record
#       {"skipped": "budget"} instead of running, and the band-miss
#       re-measure loops stop extending passes — the run ALWAYS completes
#       and prints its JSON line, degrading measurement depth rather than
#       being killed mid-write;
#   (c) the bench session enables the Python-worker faulthandler and
#       bounds Arrow record batches (see get_spark extra_conf below) so a
#       worker OOM names itself and large-text 10M batches stay bounded.
_T0 = time.time()
_LAST_MARK = [_T0]
BENCH_BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "3600"))


def _mem_gb() -> tuple[float, float]:
    """(driver RSS GiB, host used GiB) — cheap /proc reads."""
    rss = used = 0.0
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    rss = int(line.split()[1]) / 1048576.0
                    break
        total = avail = 0
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total = int(line.split()[1])
                elif line.startswith("MemAvailable:"):
                    avail = int(line.split()[1])
        used = (total - avail) / 1048576.0
    except OSError:
        pass
    return rss, used


def _mark(name: str) -> None:
    now = time.time()
    rss, used = _mem_gb()
    print(
        f"# [t+{now - _T0:.0f}s +{now - _LAST_MARK[0]:.0f}s "
        f"rss={rss:.1f}g used={used:.1f}g] {name}",
        file=sys.stderr,
        flush=True,
    )
    _LAST_MARK[0] = now


def _budget_remaining() -> float:
    return BENCH_BUDGET_SEC - (time.time() - _T0)


def _budget_tight() -> bool:
    """True once the band-miss re-measure loops should stop extending."""
    return _budget_remaining() < 240.0


EST_SEC = {
    # conservative full-scale wall-clock estimates per deep block (warm
    # /tmp: sidecars present). Used only to decide whether a block still
    # fits the remaining budget; a skipped block records
    # {"skipped": "budget"} and the run completes green. One-time fixture
    # builds are charged ON TOP by the artifact-aware helpers below — the
    # r13 baseline run proved the flat numbers catastrophically low on a
    # fresh /tmp (docs_10m est 900 s, actual cold >2400 s: 10M fixture
    # synth+write, WARC export, text-index build all first-time).
    "vector_10m": 1200.0,
    "docs_10m": 900.0,
    "hybrid_local_1m": 480.0,
}

# one-time sidecar build surcharges (fresh /tmp), measured r13 cold run
# (docs_10m block marker: 2983 s total = 1375 s timed legs + 26 s WARC
# export + ~1580 s fixture synth+write+count)
_COLD_SEC = {
    "docs10m_fixture": 1600.0,  # 10M-doc synth + parquet write + count
    "warc10m_fixture": 60.0,    # 10M-record WARC export (measured 26 s)
    "textidx10m_build": 700.0,  # ~400M-posting text index build
}


def _est_docs10m(rows: int) -> float:
    """Budget estimate for the docs_10m+text_10m branch: warm-legs base
    plus a surcharge per absent one-time artifact, so a fresh /tmp skips
    the block instead of blowing the budget mid-block (r12's rc=124)."""
    est = EST_SEC["docs_10m"]
    docs_path = f"/tmp/semadb_bench_docs_{rows}.parquet"
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        est += _COLD_SEC["docs10m_fixture"]
    if not os.path.exists(os.path.join(f"/tmp/semadb_bench_warc_{rows}", "_FIXTURE_DONE")):
        est += _COLD_SEC["warc10m_fixture"]
    est += _est_textidx10m(rows) - 120.0  # text serving base is inside EST_SEC
    return est


def _est_textidx10m(rows: int) -> float:
    """Estimate for the text_10m sub-block alone (serving passes + build
    surcharge when the index artifact is absent)."""
    tidx = f"/tmp/semadb_bench_textidx_{rows}.parquet"
    est = 120.0  # warm serving passes
    if not (
        os.path.exists(tidx + ".meta.json")
        and os.path.exists(os.path.join(tidx, "_SUCCESS"))
    ):
        est += _COLD_SEC["textidx10m_build"]
    return est


def _skip_for_budget(block: str, est_sec: float) -> bool:
    """True (and logs) when ``block`` would overrun the global budget."""
    rem = _budget_remaining()
    if rem < est_sec:
        print(
            f"# budget: skipping {block} (est {est_sec:.0f}s > remaining"
            f" {rem:.0f}s of {BENCH_BUDGET_SEC:.0f}s)",
            file=sys.stderr,
            flush=True,
        )
        return True
    return False


def _warc_fixture(spark, docs_df, n_rows: int, stats: dict) -> str:
    """One-time WARC export of a bench doc corpus (conversion records, one
    gzip member per record — the Common Crawl layout) for the end-to-end
    curate pass; the export itself is the write_warc scale evidence. The
    build is recorded in ``stats`` when it happens; subsequent calls are
    path lookups, so the timed curate pass that triggers the first build
    self-heals via best-of-N (the clean read-only pass wins the min)."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from semadb_spark.sources.warc import write_warc

    path = f"/tmp/semadb_bench_warc_{n_rows}"
    marker = _os.path.join(path, "_FIXTURE_DONE")
    if not _os.path.exists(marker):
        t0 = _time.time()
        # the synthetic corpus has no stopwords and no sentence
        # punctuation, so the raw texts die at the Gopher stopword rule
        # and the curate pass would never feed its one exchange (the
        # dedup groupBy). A fixed stopword-bearing, punctuation-terminated
        # tail lets every row exercise every stage; dedup work is
        # unchanged (the tail is identical on all rows, sha2 stays
        # per-document distinct exactly where the corpus is).
        tail = F.lit(" and that is the point of it.")
        write_warc(
            docs_df.select(
                F.lit("conversion").alias("warc_type"),
                F.lit("text/plain").alias("content_type"),
                F.col("_id").alias("target_uri"),
                F.concat(F.col("text"), tail).alias("text"),
            ),
            path,
        )
        stats["warc_fixture_write_sec"] = round(_time.time() - t0, 2)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def _curate_pipe(spark, warc_dir: str):
    """WARC-read -> curate_corpus (encoding -> C4 -> Gopher -> exact
    dedup), one DataFrame flow — the crawl-shaped end-to-end pipeline."""
    from pyspark.sql import functions as F

    from semadb_spark.pipeline import curate_corpus
    from semadb_spark.sources.warc import read_wet

    docs = read_wet(spark, warc_dir).select(
        F.col("target_uri").alias("_id"), "text"
    )
    # gopher_min_words matched to the ~25-token synthetic docs (default 40
    # would zero the corpus); everything else runs the published defaults
    return curate_corpus(
        docs, "text", "_id", collect_stats=False, gopher_min_words=10,
    )[0]


def _timed(action) -> float:
    """Wall-clock one call of ``action()``."""
    import time as _time

    t0 = _time.time()
    action()
    return _time.time() - t0


def _below_band(best_dt, pin_sec=None, ref_sec=None, min_ratio=None):
    """Band decision shared by the measurement loops (unit-tested in
    tests/test_invariants.py). Two pin styles:

    - absolute (``pin_sec``): best pass must be within 2x of the pinned
      seconds. Catches collapses, but a uniformly-noisy window (this
      host's documented 2x whole-window mode, COVERAGE.md r10 ledger)
      trips it and forces re-measure churn even though nothing regressed.
    - ratio (``ref_sec``/``min_ratio``, r11): best pass must keep at least
      ``min_ratio`` of a SAME-RUN reference row's throughput
      (ratio = ref_sec / best_dt for equal query counts). A noisy window
      slows both sides, so the ratio band passes without churn; a REAL
      kernel regression moves only the measured row and still trips it.
    """
    if min_ratio is not None and ref_sec is not None:
        if (ref_sec / best_dt) < min_ratio:
            return True
    if pin_sec is not None and best_dt > 2.0 * pin_sec:
        return True
    return False


def _detail_write_path(detail_path: str, timings: dict,
                       max_median_ratio: float = 1.3,
                       sf: float | None = None) -> tuple[str, float]:
    """Where to write this run's BENCH_DETAIL — the degraded-run guard's
    decision, extracted for testing. Returns (path, median_ratio): the
    incumbent path when the run is within ``max_median_ratio`` of the
    committed incumbent's per-query warm medians (or there is no usable
    incumbent, or SPARK_GRAFT_BENCH_FORCE_DETAIL=1), else the
    ``_DEGRADED`` sibling path. A run at a DIFFERENT scale factor than
    the incumbent never replaces it (a tiny-sf smoke run is faster on
    every query, so the ratio check alone would wave it through)."""
    try:
        with open(detail_path) as f:
            incumbent = json.load(f)
        inc_sf = incumbent.get("sf")
        if (sf is not None and inc_sf is not None and float(inc_sf) != float(sf)
                and os.environ.get("SPARK_GRAFT_BENCH_FORCE_DETAIL") != "1"):
            return detail_path.replace(".json", "_DEGRADED.json"), 0.0
        inc_q = incumbent.get("queries", {})
        ratios = sorted(
            timings[k] / inc_q[k]
            for k in timings
            if k in inc_q and inc_q[k] and timings[k]
        )
        med = ratios[len(ratios) // 2] if ratios else 1.0
    except (OSError, ValueError, KeyError, TypeError, ZeroDivisionError):
        return detail_path, 1.0
    if (
        med > max_median_ratio
        and os.environ.get("SPARK_GRAFT_BENCH_FORCE_DETAIL") != "1"
    ):
        return detail_path.replace(".json", "_DEGRADED.json"), med
    return detail_path, med


def best_of(n, make, pin_sec=None, pass_times=None, ref_sec=None,
            min_ratio=None, band_backoff_sec=0.0, materialize=True):
    """Best-of-n runs of ``make() -> DataFrame``; returns (frame, best_sec).

    ``pass_times``: optional list — every pass's seconds is appended, so a
    row can publish its full measurement trace (VERDICT r9 directive #3:
    a loose pin band can hide a real regression unless the per-pass times
    are visible in the committed row).

    The first pass measures JIT warm-up, not throughput, and the host is
    shared, so min-of-N is the stable steady-state estimator. ``n`` is the
    MINIMUM pass count; while passes keep improving by >10% the loop takes
    extra passes (hard cap 8) — a virtualized host's noisy-neighbor window
    can span several seconds, and without the extension a 3-pass block that
    lands entirely inside one slow window reports a 4-5x-pessimistic
    number (observed: the same angular IVF kernel measured 2447 and then
    511 QPS in consecutive runs with zero code change).

    ``pin_sec`` is a repro-pinned per-pass band (seconds): while the best
    pass sits >2x above it, the loop KEEPS measuring up to the cap — the
    improving-only extension cannot escape a window whose passes are
    uniformly slow (r9: an in-bench window recorded the vamana_10m row at
    198.7 QPS while the same artifact served 712 in isolation minutes
    later; all its passes were ~20 s, so no pass "improved"). A row still
    above the band after the cap should carry an explicit note.

    ``ref_sec``/``min_ratio`` (r11) is the NOISE-NORMALIZED band: the best
    pass must keep ``min_ratio`` of a same-run reference row's throughput
    (see :func:`_below_band`). Prefer it for rows whose absolute QPS
    swings with the host's whole-window noise mode. ``band_backoff_sec``
    sleeps between band-miss re-measures (same rationale as qps_best_of).

    CRITICAL measurement honesty: each timed pass must unpersist before the
    next starts. Spark's CacheManager matches cache entries by analyzed
    PLAN, so persisting an identical plan while a prior pass's cache entry
    is still live makes every later pass a cache READ, not a recompute —
    exactly the artifact that inflated the round-2 1M-vector QPS rows
    (r2 angular "1254 QPS" vs ~385 honest; see VERDICT round 3 item 2).
    The returned frame is materialized once more after timing, untimed —
    UNLESS ``materialize=False`` (r13): callers that only want the timing
    (the docs_1m/docs_10m linearity loops discarded the frame immediately)
    then get ``(None, best_sec)`` and skip a full extra untimed
    recompute per leg — at 10M that recompute was ~half the block's
    wall-clock with zero effect on any recorded number.
    """
    import time as _time

    best_dt = None
    passes = 0
    improving = False
    below_band = False
    while passes < n or (
        passes < 8 and (improving or below_band) and not _budget_tight()
    ):
        if below_band and band_backoff_sec and not _budget_tight():
            _time.sleep(band_backoff_sec)
        cand = make()
        t0 = _time.time()
        cand.persist().count()
        dt = _time.time() - t0
        cand.unpersist(blocking=True)
        if pass_times is not None:
            pass_times.append(round(dt, 2))
        improving = best_dt is not None and dt < best_dt * 0.9
        if best_dt is None or dt < best_dt:
            best_dt = dt
        below_band = _below_band(best_dt, pin_sec, ref_sec, min_ratio)
        passes += 1
    if not materialize:
        return None, best_dt
    frame = make()
    frame.persist().count()
    return frame, best_dt


def qps_best_of(n_queries, run_pass, pin=None, min_passes=2, max_passes=8,
                band_backoff_sec=2.0, note_ratio=0.75):
    """Serving-loop QPS as BEST-of-N passes, with a pinned-band guard.

    Round-8 lesson (VERDICT r8 "what's wrong" #1): the text_10m 1-client
    row was the MEAN of 3 consecutive passes — a measurement that lands
    inside one of this host's multi-second noisy-neighbor windows
    underreports a latency-bound loop 2-5x, and the committed row (18.2
    QPS) came in ~2x below the same round's isolation median (37.0,
    tools/repro_text16c.py) with no ledger entry. Best-of-N matches the
    headline warm-query policy; additionally, when a repro-pinned band
    ``pin`` (QPS) is supplied, the loop KEEPS re-measuring (up to
    ``max_passes``) while the best pass sits below ``note_ratio`` x pin,
    and returns a note naming the pin when even the best pass stays
    below — so a collapsed row can never land in BENCH_r{N}.json
    silently again.

    Round-12 tightening (VERDICT r11 "what's wrong" #1): the original
    trip-wire only fired below 0.5 x pin, so hybrid_local_1m mp8 missed
    its 120-QPS pin by ~43% in three consecutive committed runs
    (66.9/68.2/71.4) with band_passes reading healthy. ``note_ratio``
    (default 0.75) makes any >25% pin miss re-measure AND note.

    Noise windows can outlast back-to-back re-measures (r9: one run's
    text_10m legs sat ~4x below band for all passes while an isolation
    run minutes later was in band), so band-miss re-measures sleep
    ``band_backoff_sec`` between passes — spreading the re-measures in
    time costs seconds and raises the odds of escaping a transient
    window.

    Returns (qps, passes, note|None)."""
    import time as _time

    best_dt = None
    passes = 0
    while passes < max_passes:
        t0 = _time.time()
        run_pass()
        dt = _time.time() - t0
        if best_dt is None or dt < best_dt:
            best_dt = dt
        passes += 1
        if passes >= min_passes and (
            pin is None
            or n_queries / best_dt >= note_ratio * pin
            or _budget_tight()
        ):
            break
        if passes >= min_passes and band_backoff_sec and not _budget_tight():
            _time.sleep(band_backoff_sec)
    qps = round(n_queries / best_dt, 1)
    note = None
    if pin is not None and qps < note_ratio * pin:
        note = f"below_pinned_band:{pin}qps_after_{passes}_passes"
    return qps, passes, note


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from semadb_spark import get_spark
    from semadb_spark.operators.knn import knn_topk_scan

    # Crash-proofing (VERDICT r12 directive #1/#3): faulthandler makes a
    # worker OOM/segfault print a Python traceback instead of the bare
    # "Python worker exited unexpectedly"; the Arrow batch bound caps the
    # rows a single mapInPandas/mapInArrow batch materializes, so 32
    # concurrent workers over the 10M-doc corpus cannot spike memory on a
    # loaded host (the r12 driver-run crash mode). 4096 rows x ~2 KiB doc
    # text ~= 8 MiB/batch/worker — bounded, and large enough that the
    # vectorized kernels keep their amortization.
    spark = get_spark(
        app_name="semadb-bench",
        cpus=cpus,
        extra_conf={
            "spark.python.worker.faulthandler.enabled": "true",
            "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
        },
    )

    # warm the JVM + file listing + codegen paths shared across queries so
    # per-query timings measure the operator, not one-time session setup
    for t in ("lineitem", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    from semadb_spark.functions.analyzer import tokenize

    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.explode(tokenize("text"))
    ).count()
    _mark("session_warm")

    # Two-pass timing per query: the first (cold) run pays one-time codegen
    # and index build; the second (warm) run is steady-state — the number
    # comparable to the reference's published QPS, which is measured with a
    # full in-memory cache and excludes index build / cold start
    # (BASELINE.md caveats, reference README.md:198,204). Both are reported.
    qs = entrymod.queries(merge=False)
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        # warm = min of two passes: a single pass is at the mercy of the
        # shared host's noisy-neighbor windows (one observed window turned
        # a 1.0s warm query into 5.7s while its neighbors stayed fast)
        dt = min(
            _timed(lambda: qs[name](spark, sf_dir).count()),
            _timed(lambda: qs[name](spark, sf_dir).count()),
        )
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: warm {dt:.2f}s / cold {cold[name]:.2f}s ({n} rows)", file=sys.stderr)
    _mark("headline_sf01")

    # new-in-r11 pipeline queries: one timed pass each, reported per-query
    # and as their own subtotal, NOT in the legacy-comparable headline
    pipeline_new = 0.0
    for name in NEW_PIPELINE_QUERIES:
        qs[name](spark, sf_dir).count()  # cold/codegen pass
        dt = min(
            _timed(lambda: qs[name](spark, sf_dir).count()),
            _timed(lambda: qs[name](spark, sf_dir).count()),
        )
        timings[name] = round(dt, 3)
        pipeline_new += dt
        print(f"# {name}: warm {dt:.2f}s (new, excluded from headline)", file=sys.stderr)
    _mark("pipeline_new")

    # WARC sink timed row (VERDICT r13 directive #3): the warc_ingest gate's
    # warm passes measure the PARSER only since r13 (the export became a
    # session-cached built artifact), which left write_warc with no per-round
    # warm-world signal — the 1M/10M fixture exports only time it when /tmp
    # is cold. One timed export of the sf0.1 gate corpus per run (cold, once;
    # a fresh target dir so nothing is reused), then removed. Same record
    # recipe as the warc_ingest gate (response + conversion per doc).
    import shutil
    import tempfile

    from semadb_spark.sources.warc import write_warc as _ww

    _docs_we = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("_id", F.col("doc_id").cast("string"))
        .filter(F.col("text").isNotNull())
    )
    _we_head = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nServer: gate\r\n\r\n"
    _we_uri = F.concat(F.lit("http://corpus.invalid/doc/"), F.col("_id"))
    _we_frame = _docs_we.select(
        F.lit("response").alias("warc_type"),
        _we_uri.alias("target_uri"),
        F.lit("application/http; msgtype=response").alias("content_type"),
        F.encode(F.concat(F.lit(_we_head), F.col("text")), "utf-8").alias("block"),
        F.lit(None).cast("string").alias("text"),
    ).unionByName(
        _docs_we.select(
            F.lit("conversion").alias("warc_type"),
            _we_uri.alias("target_uri"),
            F.lit("text/plain").alias("content_type"),
            F.lit(None).cast("binary").alias("block"),
            F.concat(F.lit("extracted "), F.col("text")).alias("text"),
        )
    ).repartition(4)
    _we_dir = tempfile.mkdtemp(prefix="warc_export_row_")
    t0 = time.time()
    _ww(_we_frame, _we_dir)
    warc_export_sec = round(time.time() - t0, 3)
    shutil.rmtree(_we_dir, ignore_errors=True)
    print(f"# warc_export_sec: {warc_export_sec}", file=sys.stderr)
    _mark("warc_export")

    # ann-benchmarks-scale vector block: replicate the embeddings table to
    # ~1M vectors (glove-100-angular, the reference's headline row, is
    # 1.18M x 100d) and measure (a) IVF index build — the north-star batch
    # workload, (b) IVF batch serving QPS, (c) recall@10 vs the exact scan
    # on the same corpus, (d) exact-scan batch QPS. Corpus setup is one-time
    # and untimed (parquet in /tmp, reused).
    from semadb_spark.operators.ann import ivf_build, ivf_search, recall_at_k

    target_rows = int(os.environ.get("SPARK_GRAFT_BENCH_VEC_ROWS", 1_000_000))
    big_path = f"/tmp/semadb_bench_emb_{target_rows}.parquet"
    if not os.path.exists(os.path.join(big_path, "_SUCCESS")):
        emb0 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        reps = max(1, target_rows // emb0.count())
        (
            emb0.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
            .select(
                (F.col("vec_id") * reps + F.col("rep")).cast("string").alias("_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (x + F.sin((F.col("rep") + 1) * (i + 1)) * F.lit(0.03)).cast("float"),
                ).alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(big_path)
        )
    big = spark.read.parquet(big_path)
    big_n = big.count()

    t0 = time.time()
    index = ivf_build(big, "embedding", "_id", nlist=128, seed=42)
    index.assigned.persist().count()
    build_1m = round(time.time() - t0, 3)

    # 4096-query batch: per-query work is bounded (nprobe cells, per-task
    # top-k), so the larger batch amortizes the fixed per-job cost — the
    # batch-throughput regime BASELINE.json's north star names. 1024-batch
    # measures ~1000 QPS on the same kernel purely from job overhead.
    qrows_1m = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(4096).collect()
    qlist_1m = [(str(i), [float(x) for x in r["embedding"]]) for i, r in enumerate(qrows_1m)]
    approx, ivf_dt = best_of(
        5,
        lambda: ivf_search(
            index, qlist_1m, "euclidean", 10, nprobe=8, compute_dtype="float32"
        ),
    )

    from semadb_spark.operators.knn import knn_topk_scan as _scan

    exact, exact_dt = best_of(
        3, lambda: _scan(big, "embedding", qlist_1m[:64], "euclidean", 10)
    )
    qids64 = {q[0] for q in qlist_1m[:64]}
    recall = recall_at_k(approx.filter(F.col("query_id").isin(qids64)), exact)
    vector_1m = {
        "rows": big_n,
        "dim": len(qlist_1m[0][1]),
        "ivf_build_sec": build_1m,
        "ivf_qps": round(len(qlist_1m) / ivf_dt, 1),
        "ivf_recall_at10": round(recall, 4),
        "exact_scan_qps": round(64 / exact_dt, 1),
    }
    print(f"# vector_1m: {vector_1m}", file=sys.stderr)
    _mark("vector_1m")

    # release the euclidean block's persisted frames so the later blocks
    # measure themselves, not its storage pressure
    approx.unpersist()
    exact.unpersist()
    index.assigned.unpersist()

    # glove-100-angular-LIKE block: the container has no network/h5py for
    # the real ann-benchmarks HDF5 (S6 loader stays import-gated), so this
    # closes the "64d synthetic is easier" caveat as far as possible
    # locally: 1M x 100d HIERARCHICAL clustered mixture — 1024 coarse
    # centers x 64 subcenters each, point noise on top, l2-normalized,
    # cosine metric. Real embedding corpora (and glove) have neighbor
    # structure at multiple scales; the round-3 flat mixture's top-10
    # neighbors differed by pure full-rank iid noise, which NO code with
    # m bytes/vector can rank (raw ADC recall 0.073 was a fixture artifact,
    # VERDICT r3 item 3) — subcluster structure is the regime PQ exists for.
    import numpy as np

    ang_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ANG_ROWS", 1_000_000))
    ang_path = f"/tmp/semadb_bench_angh_{ang_rows}.parquet"
    if not os.path.exists(os.path.join(ang_path, "_SUCCESS")):
        import pandas as pd

        rng0 = np.random.RandomState(7)
        centers = rng0.normal(size=(1024, 100))
        # 8192 offset vectors indexed by (center, sub) so subcenters are
        # effectively unique (no factorizable grid an encoder could exploit)
        sub_offsets = rng0.normal(scale=0.30, size=(8192, 100))

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                rng = np.random.RandomState(int(ids[0]) % (2**31))
                c = ids % 1024
                sub = (ids // 1024) % 64
                v = (
                    centers[c]
                    + sub_offsets[(c * 64 + sub) % 8192]
                    + rng.normal(scale=0.05, size=(len(ids), 100))
                )
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {"_id": ids.astype(str), "embedding": list(v.astype(np.float32))}
                )

        (
            spark.range(ang_rows)
            .repartition(cpus)
            .mapInPandas(gen, "_id string, embedding array<float>")
            .write.mode("overwrite")
            .parquet(ang_path)
        )
    ang = spark.read.parquet(ang_path)
    ang_n = ang.count()
    t0 = time.time()
    ang_index = ivf_build(ang, "embedding", "_id", nlist=128, seed=42)
    ang_index.assigned.persist().count()
    ang_build = round(time.time() - t0, 3)
    # one-time disk artifact of the same index (seeded build -> identical
    # centroids every round) for the hybrid_1m block's serving-from-
    # artifact vector leg; written untimed, reused across rounds
    ivf1m_path = f"/tmp/semadb_bench_ivf1m_{ang_rows}.parquet"
    if not os.path.exists(os.path.join(ivf1m_path, "_SUCCESS")):
        (
            ang_index.assigned.repartition(cpus, "centroid_id")
            .sortWithinPartitions("centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(ivf1m_path)
        )
    # 4096 perturbed-corpus-point queries, shared by the angular IVF row and
    # the BQ block (batch-throughput regime, same rationale as the euclidean
    # block's 4096 batch)
    aq_rows = ang.limit(4096).collect()
    rngq = np.random.RandomState(99)
    aq = []
    for i, r in enumerate(aq_rows):
        v = np.asarray(r["embedding"], dtype=np.float64) + rngq.normal(scale=0.05, size=100)
        v /= np.linalg.norm(v)
        aq.append((str(i), v.tolist()))
    ang_approx, ang_dt = best_of(
        5,
        lambda: ivf_search(
            ang_index, aq, "cosine", 10, nprobe=8, compute_dtype="float32"
        ),
    )
    ang_exact, ang_exact_dt = best_of(
        3, lambda: _scan(ang, "embedding", aq[:64], "cosine", 10)
    )
    aq64 = {q[0] for q in aq[:64]}
    ang_recall = recall_at_k(ang_approx.filter(F.col("query_id").isin(aq64)), ang_exact)
    vector_1m_angular = {
        "rows": ang_n,
        "dim": 100,
        "ivf_build_sec": ang_build,
        "ivf_qps": round(len(aq) / ang_dt, 1),
        "ivf_recall_at10": round(ang_recall, 4),
        "exact_scan_qps": round(64 / ang_exact_dt, 1),
    }
    print(f"# vector_1m_angular: {vector_1m_angular}", file=sys.stderr)
    _mark("vector_1m_angular")
    ang_approx.unpersist()
    ang_index.assigned.unpersist()

    # v2-BQ-comparable block (reference mnist-784-euclidean v2-BQ: 0.667
    # recall / 2369.7 QPS single-thread, BASELINE.md), on the SAME clustered
    # 1M x 100d corpus as the angular/PQ blocks. Rounds 2-3 ran BQ on the
    # replicated 64d corpus, whose 64-bit codes carry ~1000-way ties (a
    # fixture artifact, the BQ twin of VERDICT r3's PQ item 3): no bounded
    # rerank pool recovers recall from a tie class that large; a 784d
    # mnist-shaped corpus was tried and is bandwidth-infeasible for the
    # honesty row (98 bytes/row x 1M x 1024 queries of flat popcount).
    # Clustered 100-bit codes discriminate, which is the regime BQ is for.
    # Raw FLAT hamming over all codes = the recall-honesty row; the SERVED
    # row is the FUSED IVF-BQ kernel (operators/ann.py _ivfbq_search_fused):
    # probe nprobe/nlist cells, hamming-prefilter in-batch, exact-rerank the
    # survivors in the same Arrow batch — one distributed pass, no rerank
    # join. 4096-query batch: the per-query work is bounded, so the larger
    # batch amortizes the fixed per-job cost — the batch-throughput regime
    # BASELINE.json's north star names (recall scored on the same 64
    # ground-truth queries either way).
    from semadb_spark.operators.ann import ivfbq_build, ivfbq_search
    from semadb_spark.operators.quantize import encode_bits_np

    t0 = time.time()
    bq_index = ivfbq_build(ang, "embedding", "_id", nlist=128, seed=42)
    bq_index.coded.persist().count()
    bq_build = round(time.time() - t0, 3)
    bq_qmat = np.asarray([q[1] for q in aq[:1024]], dtype=np.float64)
    bq_qcodes = encode_bits_np(bq_qmat, bq_index.thresholds)
    bq_code_queries = [(aq[i][0], bq_qcodes[i].tolist()) for i in range(1024)]
    flat_codes = bq_index.coded.select("_id", "bq_code")
    raw_approx, raw_dt = best_of(
        3, lambda: _scan(flat_codes, "bq_code", bq_code_queries, "hamming", 10)
    )
    raw_recall = recall_at_k(
        raw_approx.filter(F.col("query_id").isin(aq64)), ang_exact
    )
    bq_approx, bq_dt = best_of(
        5,
        lambda: ivfbq_search(
            bq_index, aq, 10, nprobe=4, oversample=2, rerank_metric="cosine"
        ),
    )
    bq_recall = recall_at_k(bq_approx.filter(F.col("query_id").isin(aq64)), ang_exact)
    vector_1m_bq = {
        "rows": ang_n,
        "dim": 100,
        "bits": 100,
        "bq_build_sec": bq_build,
        "bq_qps": round(len(aq) / bq_dt, 1),
        "bq_recall_at10": round(bq_recall, 4),
        "raw_hamming_qps": round(len(bq_code_queries) / raw_dt, 1),
        "raw_hamming_recall_at10": round(raw_recall, 4),
    }
    print(f"# vector_1m_bq: {vector_1m_bq}", file=sys.stderr)
    _mark("vector_1m_bq")
    raw_approx.unpersist()
    bq_approx.unpersist()
    bq_index.coded.unpersist()

    # v2-PQ-comparable block (reference glove-100 v2-PQ: 0.526 recall /
    # 628.6 QPS single-thread, BASELINE.md): 20x256 codebooks (5 dims per
    # subvector — the resolution 100d needs; the r3 m=10 setting was part
    # of the weak-recall story), full-corpus batched ADC for the raw-recall
    # row, and IVF-PQ for the SERVED row: probe nprobe/nlist of the cells,
    # ADC-score only those cells' codes (m bytes per row), exact-rerank a
    # bounded broadcast pool — the scan never touches the full corpus
    # (operators/ann.py ivfpq_search).
    from semadb_spark.operators.ann import ivfpq_build, ivfpq_search
    from semadb_spark.operators.quantize import pq_adc_topk_batch

    t0 = time.time()
    ivfpq = ivfpq_build(
        ang, "embedding", "_id", nlist=128, num_subvectors=20,
        num_centroids=256, metric="cosine", seed=42, sample_cap=65_536,
    )
    ivfpq.coded.persist().count()
    pq_build = round(time.time() - t0, 3)
    # raw full-corpus ADC: the recall-honesty row (is the code resolution
    # itself sound?). 256 queries bound the q x n x m scan cost; recall is
    # scored on the 64 ground-truth queries either way. NOTE the reference's
    # v2-PQ QPS is Vamana GRAPH search over ADC distances (search.go beam
    # over ~searchSize nodes), not a corpus scan — the served IVF-PQ row
    # below is the comparable number.
    pq_codes = ivfpq.coded.select("_id", "pq_code")
    pq_approx, pq_dt = best_of(
        3, lambda: pq_adc_topk_batch(pq_codes, "pq_code", ivfpq.books, aq[:256], 10)
    )
    pq_recall = recall_at_k(pq_approx.filter(F.col("query_id").isin(aq64)), ang_exact)
    pq_rr, pq_rr_dt = best_of(
        5,
        lambda: ivfpq_search(ivfpq, aq, "cosine", 10, nprobe=2, oversample=3),
    )
    pq_rr_recall = recall_at_k(pq_rr.filter(F.col("query_id").isin(aq64)), ang_exact)
    vector_1m_pq = {
        "rows": ang_n,
        "dim": 100,
        "m": 20,
        "pq_build_sec": pq_build,
        "pq_adc_qps": round(len(aq[:256]) / pq_dt, 1),
        "pq_adc_recall_at10": round(pq_recall, 4),
        "pq_qps": round(len(aq) / pq_rr_dt, 1),
        "pq_recall_at10": round(pq_rr_recall, 4),
    }
    print(f"# vector_1m_pq: {vector_1m_pq}", file=sys.stderr)
    _mark("vector_1m_pq")
    pq_rr.unpersist()
    pq_approx.unpersist()
    ivfpq.coded.unpersist()

    # vamana_1m (VERDICT r4 directive #4): the reference's serving engine IS
    # Vamana (v2 rows, README.md:191-196); this row serves the 64-query set
    # from the PACKED persisted artifact (vamana_pack layout: per-shard CSR
    # + vector blobs, partitionBy("cent") — routing prunes directories) —
    # built ONCE by tools/build_vamana_1m.py and reused across rounds, as
    # the directive specifies; build_sec comes from the build-time sidecar.
    # IVF remains the default vectorVamana route (3.8x the baseline QPS at
    # recall 1.0); this closes the W7/R2 parity story with a number for the
    # graph route itself.
    from tools.build_vamana_1m import ensure_vamana_1m

    from semadb_spark.operators.vamana import vamana_serve_packed

    vam_meta = ensure_vamana_1m(spark, ang_path)
    vam_disk = spark.read.parquet("/tmp/semadb_bench_vamana_1m.parquet")
    vam_cents = np.asarray(vam_meta["centroids"], dtype=np.float64)
    vam_dtype = vam_meta.get("pack_dtype", "float64")
    # full 4096-query batch, same batch-throughput regime as the IVF rows;
    # the batched beam kernel advances every routed query together per
    # shard (one gathered einsum per step). Recall vs the exact oracle is
    # measured on the first 64 queries (ang_exact covers those).
    def _vam1m_serve():
        return vamana_serve_packed(
            vam_disk, aq, 10, metric="cosine",
            search_size=int(vam_meta["search_size"]),
            centroids=vam_cents, nprobe=4,
            dtype=vam_dtype, kernel="batched", compute_dtype="float32",
            n_seeds=64,
        )

    # cold-path story (VERDICT r8 directive #5): the FIRST batch on a
    # fresh session pays parquet footer opens + whole-stage codegen +
    # query-LUT build — the reference documents its own 1-10 s cold start
    # (README.md:204); this records ours next to the warm row.
    # pinned band: committed r8/r9 runs serve this batch in ~2.8 s/pass
    # (1448-1455 QPS); isolation repro tools/repro_vamana.py
    vam_cold = _timed(lambda: _vam1m_serve().count())
    vam_frame, vam_dt = best_of(2, _vam1m_serve, pin_sec=4.0)
    vam_recall = recall_at_k(vam_frame.filter(F.col("query_id").isin(aq64)), ang_exact)
    vamana_1m = {
        "rows": vam_meta["rows"],
        "dim": 100,
        "build_sec": vam_meta["build_sec"],
        "build_once": True,
        "build_mode": vam_meta.get("build_mode", "insert"),
        "qps": round(len(aq) / vam_dt, 1),
        "cold_first_batch_sec": round(vam_cold, 2),
        "recall_at10": round(vam_recall, 4),
        "degree_bound": vam_meta["degree_bound"],
        "serving": "packed CSR+vector blobs, cent-partition routed, batched beams",
        "note": (
            "build_once: build_sec is the one-time artifact build from the "
            "sidecar, amortized across rounds, NOT per-round cost"
        ),
    }
    if vam_dt > 2.0 * 4.0:
        vamana_1m["qps_note"] = "below_pinned_band:4s_per_pass"
    print(f"# vamana_1m: {vamana_1m}", file=sys.stderr)
    _mark("vamana_1m")
    vam_frame.unpersist()

    # quantized-through-graph serving (VERDICT r6 directives #2/#4): the
    # reference's v2-BQ/v2-PQ architecture — the quantizer's distance runs
    # INSIDE the Vamana beam (vamana.go:257-259) — with the asymmetric
    # byte-LUT twist: the query stays float (margin-weighted bit
    # disagreement for BQ, ADC tables for PQ), which is what keeps graph
    # navigation viable through quantization (symmetric hamming measured
    # 0.23-0.33 recall on this corpus; see COVERAGE.md). Coded artifacts
    # derive once from the packed 1M graph and cache in /tmp.
    from tools.repro_quantized_graph import BQ_PATH, PQ_PATH, ensure_code_artifacts

    qg_side = ensure_code_artifacts(spark, ang_path, vam_meta)
    quant_graph_1m = {}
    # RATIO-pinned bands (r11, VERDICT r10 directive #1 + #6): the r10 dip
    # (bq_adc 1509->1339, pq 1290->1022 across committed runs) bisected to
    # NO code change — r9 code reproduced 734 QPS in the same r11 window
    # where r11 code measured 854-940 (tools/repro_quantized_graph.py,
    # same artifact, recalls bit-identical). The quantized beams are
    # byte-LUT-gather (memory-latency) bound, so noisy-neighbor windows
    # hit them HARDER than the GEMM-bound float beam — an absolute pin
    # here would force 8-pass churn every noisy window. The pinned signal
    # is the ratio to the float row measured seconds earlier in the SAME
    # window: committed history bq_adc/float 0.88 (r9) / 0.84 (r10 run2)
    # / 0.73 (r10 driver) / 0.60 (r11 isolation, both code versions);
    # pq/float 0.75 / 0.64 / 0.59 / 0.63. Band 0.45 tolerates the
    # measured window spread and still trips on any real kernel
    # regression (which would move ONLY the quantized legs).
    QG_MIN_RATIO = 0.45
    for qg_name, qg_path, qg_kw, qg_base in (
        (
            "bq_adc",
            BQ_PATH,
            {"beam_on": "bq_adc", "thresholds": qg_side["thresholds"]},
            "mnist v2-BQ 2369.7 @ 0.667",
        ),
        (
            "pq",
            PQ_PATH,
            {"beam_on": "pq", "books": qg_side["books"]},
            "glove-100 v2-PQ 628.6 @ 0.526",
        ),
    ):
        qg_disk = spark.read.parquet(qg_path)
        qg_passes: list = []
        qg_frame, qg_dt = best_of(
            3,
            lambda: vamana_serve_packed(
                qg_disk, aq, 10, metric="cosine",
                search_size=int(vam_meta["search_size"]),
                centroids=vam_cents, nprobe=4, dtype=vam_dtype,
                kernel="batched", compute_dtype="float32", n_seeds=64,
                oversample=4, **qg_kw,
            ),
            pass_times=qg_passes,
            ref_sec=vam_dt, min_ratio=QG_MIN_RATIO, band_backoff_sec=2.0,
        )
        qg_recall = recall_at_k(
            qg_frame.filter(F.col("query_id").isin(aq64)), ang_exact
        )
        qg_ratio = round(vam_dt / qg_dt, 3)
        quant_graph_1m[qg_name] = {
            "qps": round(len(aq) / qg_dt, 1),
            "recall_at10": round(qg_recall, 4),
            "baseline": qg_base,
            "ratio_band": [QG_MIN_RATIO, "vs vamana_1m float row, same run"],
            "ratio_vs_float": qg_ratio,
            "band_passes": len(qg_passes),
            "pass_sec": qg_passes,
        }
        if qg_ratio < QG_MIN_RATIO:
            quant_graph_1m[qg_name]["qps_note"] = (
                f"below_ratio_band:{QG_MIN_RATIO}x_float_after_"
                f"{len(qg_passes)}_passes"
            )
        qg_frame.unpersist()
    print(f"# quant_graph_1m: {quant_graph_1m}", file=sys.stderr)
    _mark("quant_graph_1m")

    # 10M scale-proof block (VERDICT r4 directive #1): the 100 TB posture is
    # design-argued at 1M; this measures it one decade up. Same clustered
    # angular mixture (tools/gen_clustered_corpus.py, one-time fixture),
    # nlist scaled 128 -> 1024 with the corpus so per-query probe work stays
    # ~constant (rows/cell 7.8k -> 9.8k) — the way a real deployment scales
    # IVF. Serving is DISK-BACKED: the index artifact is written
    # partitionBy("centroid_id") and read back per pass, never persisted, so
    # the QPS row pays the real parquet decode a 1000-executor cluster
    # would. Build-time scaling is normalized as million (row x centroid)
    # assignment pairs per second — the unit that is invariant to the nlist
    # change (10M x 1024 is 80x the 1M x 128 assignment work).
    tenm_rows = int(os.environ.get("SPARK_GRAFT_BENCH_10M_ROWS", 10_000_000))
    vector_10m = {}
    vamana_10m: dict = {}
    if tenm_rows > 0 and _skip_for_budget("vector_10m+vamana_10m",
                                          EST_SEC["vector_10m"]):
        vector_10m = {"skipped": "budget"}
        vamana_10m = {"skipped": "budget"}
        tenm_rows = 0
    if tenm_rows > 0:
        from tools.gen_clustered_corpus import generate as _gen_corpus

        path10 = _gen_corpus(spark, tenm_rows)
        big10 = spark.read.parquet(path10)
        n10 = big10.count()
        nlist10 = 1024
        t0 = time.time()
        # coarse fit on a 64k sample: cell assignment is what costs at this
        # scale; centroid quality converges far below the default cap and
        # recall is measured downstream either way
        idx10 = ivf_build(
            big10, "embedding", "_id", nlist=nlist10, seed=42, max_iter=10,
            sample_cap=65_536,
        )
        ivf10_path = f"/tmp/semadb_bench_ivf_{tenm_rows}_{nlist10}.parquet"
        # repartition ON the partition column before partitionBy: without it
        # every input task writes a file into every one of the 1024 cell
        # directories (~40k tiny files — slow to write AND to decode at
        # serve time); with it each task owns a few whole cells
        (
            idx10.assigned.repartition(cpus * 2, "centroid_id")
            .sortWithinPartitions("centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(ivf10_path)
        )
        build10 = round(time.time() - t0, 3)
        from semadb_spark.operators.ann import IVFIndex

        served10 = IVFIndex(
            idx10.centroids,
            spark.read.parquet(ivf10_path),
            "embedding",
            "_id",
        )
        q10_rows = big10.limit(4096).collect()
        rng10 = np.random.RandomState(1234)
        aq10 = []
        for i, r in enumerate(q10_rows):
            v = np.asarray(r["embedding"], dtype=np.float64) + rng10.normal(
                scale=0.05, size=100
            )
            v /= np.linalg.norm(v)
            aq10.append((str(i), v.tolist()))
        approx10, dt10 = best_of(
            3,
            lambda: ivf_search(
                served10, aq10, "cosine", 10, nprobe=8, compute_dtype="float32"
            ),
        )
        # small batch: 64 queries probe ~half the 1024 cells, so this row
        # shows the partition pruning a low-concurrency serving tier gets
        # (the 4096 batch necessarily touches every cell)
        small10, small10_dt = best_of(
            3,
            lambda: ivf_search(
                served10, aq10[:64], "cosine", 10, nprobe=8,
                compute_dtype="float32",
            ),
        )
        small10.unpersist()
        exact10, exact10_dt = best_of(
            2, lambda: _scan(big10, "embedding", aq10[:64], "cosine", 10)
        )
        aq10_64 = {q[0] for q in aq10[:64]}
        recall10 = recall_at_k(
            approx10.filter(F.col("query_id").isin(aq10_64)), exact10
        )
        # normalized assignment throughput for the linearity note (the 1M
        # angular build above ran nlist=128 on the same generator's corpus)
        vector_10m = {
            "rows": n10,
            "dim": 100,
            "nlist": nlist10,
            "ivf_build_sec": build10,
            "ivf_qps": round(len(aq10) / dt10, 1),
            # 64batch is LOW-CONCURRENCY semantics (64 in-flight queries
            # probe ~half the 1024 cells -> partition pruning shows, but
            # fixed per-pass overhead amortizes over 64 not 4096; read as
            # ~per-batch latency, never as single-query latency or as
            # contradicting ivf_qps)
            "ivf_qps_64batch": round(64 / small10_dt, 1),
            "ivf_recall_at10": round(recall10, 4),
            "exact_scan_qps": round(64 / exact10_dt, 1),
            "serving": "disk-backed parquet, partition-pruned, never cached",
            "build_mrc_per_sec": round(n10 * nlist10 / build10 / 1e6, 1),
            "build_mrc_per_sec_1m_block": round(
                ang_n * 128 / ang_build / 1e6, 1
            ),
        }
        print(f"# vector_10m: {vector_10m}", file=sys.stderr)
        _mark("vector_10m")
        approx10.unpersist()

        # vamana_10m (VERDICT r6 directive #3): the GRAPH route's decade
        # proof. Serves the packed 10M artifact built once by
        # tools/build_vamana_10m.py (a ~1.3h sidecar, like text_10m's
        # build-once index); skipped with a note when the artifact is
        # absent so the row never silently reports a partial build.
        # Routing: 640 centroids at 10M vs 64 at 1M keeps rows/cent
        # constant, so per-probe beam work is scale-invariant by
        # construction; recall is measured against the same exact-scan
        # oracle. Serving params come from tools/sweep_vamana10m.py's
        # measured frontier on this artifact: nprobe=1 wins (646.8 QPS @
        # 0.9781 vs 529.1 @ 0.9797 at the old nprobe=4) because a 4096-
        # query batch touches every cent partition regardless, so the
        # batch is artifact-transfer-bound and extra probes only add
        # near-duplicate candidates; trimming search_size below 75 lost
        # recall without QPS gain (same reason — the beam is not the
        # bottleneck).
        from tools.build_vamana_10m import ART_PATH as VAM10_ART
        from tools.build_vamana_10m import META_PATH as VAM10_META

        from tools.build_vamana_10m import VERSION as VAM10_VERSION

        vam10_meta = None
        if os.path.exists(os.path.join(VAM10_ART, "_SUCCESS")) and os.path.exists(
            VAM10_META
        ):
            with open(VAM10_META) as f:
                vam10_meta = json.load(f)
            # the artifact is built at a fixed 10M; if the bench corpus was
            # resized via SPARK_GRAFT_BENCH_10M_ROWS the recall oracle and
            # the artifact would come from different corpora — skip rather
            # than report a silently meaningless number. Same for a
            # builder-version mismatch.
            if vam10_meta.get("rows") != n10 or vam10_meta.get("version") != VAM10_VERSION:
                vamana_10m = {
                    "skipped": (
                        f"artifact rows/version {vam10_meta.get('rows')}/"
                        f"{vam10_meta.get('version')} != bench corpus "
                        f"{n10} / builder v{VAM10_VERSION}"
                    )
                }
                vam10_meta = None
        else:
            vamana_10m = {
                "skipped": "artifact absent - run tools/build_vamana_10m.py"
            }
        if vam10_meta is not None:
            vam10_disk = spark.read.parquet(VAM10_ART)
            vam10_cents = np.asarray(vam10_meta["centroids"], dtype=np.float64)

            def _vam10_serve():
                return vamana_serve_packed(
                    vam10_disk, aq10, 10, metric="cosine",
                    search_size=int(vam10_meta["search_size"]),
                    centroids=vam10_cents, nprobe=1,
                    dtype=vam10_meta.get("pack_dtype", "float64"),
                    kernel="batched", compute_dtype="float32", n_seeds=64,
                )

            # TRUE-cold first batch (r10): earlier rounds measured
            # "session-cold" with whatever page-cache state the bench left
            # behind; now the artifact is explicitly fadvise-EVICTED and
            # the open-time readahead races the first scan — the serving
            # story a fresh node actually runs
            # (Collection.prefetch_vamana_index). Measured in isolation:
            # un-knobbed true-cold 34.2 s (scan-speed IO), prefetch-raced
            # 13.9 s, warm 6-7 s.
            # r12 isolation bisect (tools/repro_cold10m.py, 4 trials on the
            # same artifact): cold_best 10.9 s — r10's 15.5 confirmed and
            # beaten, r11's 32.8/46.2 were IO windows (trial 0 caught one
            # live: probe 276.8 MB/s vs 1178-1312 calm; cold 22.8 s but
            # ratio 1.2 — storage-explained). Ratio semantics: ~1 in slow
            # windows (IO-bound), ceiling ~2.7 when storage is fast (the
            # decode/compute bound). Band upper 3.5 = regression tripwire.
            COLD10M_RATIO_BAND = [1.0, 3.5]
            from tools.repro_cold10m import evict as _evict
            from tools.repro_cold10m import io_probe as _io_probe

            _art_bytes = _evict(VAM10_ART)
            # IO-NORMALIZED cold band (r12, VERDICT r11 directive #1): a
            # raw sequential re-read probe of an evicted ~512 MB artifact
            # slice measures what the storage delivers in THIS window;
            # cold_sec is then judged as a ratio over the artifact's
            # IO-floor seconds, so a slow-IO window (absolute cold 2-3x
            # up, probe MB/s down by the same factor) stays in band while
            # a code/layout regression (ratio drift) trips it. Band from
            # tools/repro_cold10m.py isolation trials.
            _probe_mbps = _io_probe(VAM10_ART)
            from semadb_spark.operators.vamana import prefetch_packed_artifact

            prefetch_packed_artifact(VAM10_ART, threads=12)
            vam10_cold = _timed(lambda: _vam10_serve().count())
            _io_floor = _art_bytes / (_probe_mbps * (1 << 20))
            vam10_cold_ratio = vam10_cold / _io_floor
            # Pinned band (tightened r10 per VERDICT r9 #1): the measured
            # warm band is ~5.5-6.5 s/pass (712 QPS re-pinned r9, 749.8
            # committed r8), so pin 6.0 -> miss threshold 12 s; the old
            # 8 s pin accepted down to ~256 QPS, loose enough for a real
            # ~20% regression to land silently. Per-pass seconds are
            # published in the row so the trace is auditable either way.
            # r11: the absolute pin alone let a 10.25 s/pass slow-IO
            # window land at 399 QPS without a note (isolation minutes
            # later: 823, r10 band) — 10.25 sits inside the 2x miss
            # threshold. The RATIO band vs the same-run 1M float row
            # catches exactly this: committed history 10M/1M qps ratio
            # 0.52 (r10) / 0.42 (r9); the 399-QPS window measured 0.225.
            vam10_passes: list = []
            vam10_frame, vam10_dt = best_of(
                2, _vam10_serve, pin_sec=6.0, pass_times=vam10_passes,
                ref_sec=vam_dt, min_ratio=0.3, band_backoff_sec=3.0,
            )
            vam10_recall = recall_at_k(
                vam10_frame.filter(F.col("query_id").isin(aq10_64)), exact10
            )
            vamana_10m = {
                "rows": vam10_meta["rows"],
                "build_sec": vam10_meta["build_sec"],
                "build_once": True,
                "qps": round(len(aq10) / vam10_dt, 1),
                "cold_first_batch_sec": round(vam10_cold, 2),
                "cold_method": "fadvise-evicted + open-time readahead",
                "cold_probe_mbps": round(_probe_mbps, 1),
                "cold_io_floor_sec": round(_io_floor, 2),
                "cold_ratio_vs_io_floor": round(vam10_cold_ratio, 2),
                "cold_ratio_band": COLD10M_RATIO_BAND,
                "recall_at10": round(vam10_recall, 4),
                "nprobe": 1,
                "pack_dtype": vam10_meta.get("pack_dtype", "float64"),
                "serving": "disk-backed packed blobs, cent-partition routed",
                "pass_sec": vam10_passes,
                "ratio_band": [0.3, "vs vamana_1m float row, same run"],
                "ratio_vs_1m": round(vam_dt / vam10_dt, 3),
            }
            if vam10_dt > 2.0 * 6.0:
                vamana_10m["qps_note"] = "below_pinned_band:6s_per_pass"
            elif (vam_dt / vam10_dt) < 0.3:
                vamana_10m["qps_note"] = "below_ratio_band:0.3x_1m_row"
            if vam10_cold_ratio > COLD10M_RATIO_BAND[1]:
                vamana_10m["cold_note"] = (
                    f"cold_ratio {vam10_cold_ratio:.2f} above the "
                    f"{COLD10M_RATIO_BAND} isolation band - not explained "
                    "by storage rate; investigate"
                )
            vam10_frame.unpersist()

            # CODE-DOMAIN candidate generation (rerank="none"): the
            # 100 TB posture row. Beams run on BQ margin LUTs over the
            # baked codes and the float blobs are column-pruned out of
            # the scan entirely, so a saturating batch transfers codes +
            # int16 CSR + ids instead of the vector payload. Code
            # distances shortlist well but final-rank poorly (full-scan
            # raw hamming@10 is ~0.27 at 1M), so this row serves k=100
            # shortlists and scores recall@10-in-100 — the fraction of
            # the true top-10 a downstream exact reranker would receive.
            from tools.build_vamana_10m import ensure_vamana_10m_codes
            from tools.build_vamana_10m import BQ_ART_PATH as VAM10_BQ
            from tools.build_vamana_10m import PQ_ART_PATH as VAM10_PQ

            side10 = ensure_vamana_10m_codes(spark, path10, vam10_meta)
            vamana_10m["code_domain"] = {}
            for cd_name, cd_path, cd_kw in (
                ("pq", VAM10_PQ, {"beam_on": "pq", "books": side10["books"]}),
                ("bq_adc", VAM10_BQ,
                 {"beam_on": "bq_adc", "thresholds": side10["thresholds"]}),
            ):
                cd_disk = spark.read.parquet(cd_path)
                cd_frame, cd_dt = best_of(
                    3,
                    lambda: vamana_serve_packed(
                        cd_disk, aq10, 100, metric="cosine",
                        search_size=128,
                        centroids=vam10_cents, nprobe=1,
                        dtype=vam10_meta.get("pack_dtype", "float64"),
                        kernel="batched", compute_dtype="float32",
                        n_seeds=64, rerank="none", **cd_kw,
                    ),
                )
                cd_recall = recall_at_k(
                    cd_frame.filter(F.col("query_id").isin(aq10_64)), exact10
                )
                vamana_10m["code_domain"][cd_name] = {
                    "qps": round(len(aq10) / cd_dt, 1),
                    "recall10_in_100": round(cd_recall, 4),
                }
                cd_frame.unpersist()
            vamana_10m["code_domain"]["note"] = (
                "k=100 candidate gen, rerank=none, vecs column-pruned"
            )

            # driver-local POINT-READ tier (vamana_serve_local, r9): one
            # query at a time straight off the packed artifact with
            # pyarrow + the NumPy beam — no Spark job, so the ~150 ms
            # 1-task floor that caps engine point-reads at ~2-7 QPS never
            # applies. The latency twin of the text serving-tier rows;
            # measured 74 QPS / 13.5 ms/q in isolation (pin 40).
            from semadb_spark.operators.vamana import vamana_serve_local

            pkw = dict(
                metric="cosine",
                search_size=int(vam10_meta["search_size"]),
                centroids=vam10_cents, nprobe=1,
                dtype=vam10_meta.get("pack_dtype", "float64"), n_seeds=64,
            )
            point_queries = aq10[:64]
            ex_sets: dict = {}
            for r in exact10.select("query_id", "_id").collect():
                ex_sets.setdefault(r["query_id"], set()).add(r["_id"])
            p_hits = p_tot = 0
            for qid, v in point_queries:  # warm decode + recall in one pass
                got = {i for i, _ in vamana_serve_local(VAM10_ART, v, 10, **pkw)}
                p_hits += len(got & ex_sets.get(qid, set()))
                p_tot += len(ex_sets.get(qid, set()))

            def _point_pass():
                for _qid, v in point_queries:
                    vamana_serve_local(VAM10_ART, v, 10, **pkw)

            point_qps, _, point_note = qps_best_of(
                len(point_queries), _point_pass, pin=40.0
            )
            # per-query latency distribution (VERDICT r12 directive #5):
            # the tail matters for a serving row, not just the inverse QPS
            p_lat = sorted(
                _timed(lambda: vamana_serve_local(VAM10_ART, v, 10, **pkw))
                for _qid, v in point_queries
            )
            vamana_10m["point_read"] = {
                "qps_1client": point_qps,
                "latency_ms": round(1000.0 / max(point_qps, 0.001), 1),
                "latency_ms_p50": round(p_lat[len(p_lat) // 2] * 1000, 2),
                "latency_ms_p99": round(
                    p_lat[min(len(p_lat) - 1, int(len(p_lat) * 0.99))] * 1000,
                    2,
                ),
                "recall_at10": round(p_hits / max(p_tot, 1), 4),
            }
            if point_note:
                vamana_10m["point_read"]["note"] = point_note

            # process-parallel point-read pool (VectorServePool, r10): 16
            # worker processes with cent-affinity dispatch over the same
            # immutable artifact — the reference's concurrent-search
            # deployment (shard/shard.go:329-472 one goroutine/request,
            # cluster/actions.go:321-351 shard-owner fan-out). Affinity
            # means each cent partition is decoded by exactly ONE worker,
            # so pool warm-up costs the same decode work as one client.
            # Pin 400 QPS: TextServePool scaled its 1-client row ~12x at
            # 16 workers; 80 QPS 1-client here puts the floor well above
            # 400 unless dispatch overhead dominates.
            from semadb_spark.operators.vamana import VectorServePool

            mp_queries = [v for _qid, v in aq10[:256]]
            try:
                with VectorServePool(VAM10_ART, workers=16, **pkw) as vpool:
                    vpool.search_many(mp_queries, 10)  # warm worker caches
                    mp_qps, _, mp_note = qps_best_of(
                        len(mp_queries),
                        lambda: vpool.search_many(mp_queries, 10),
                        pin=400.0,
                    )
                vamana_10m["point_read"]["qps_mp16"] = mp_qps
                if mp_note:
                    vamana_10m["point_read"]["note_mp16"] = mp_note
            except Exception as e:  # a worker-spawn failure must not
                # take the whole bench down with it — record and move on
                vamana_10m["point_read"]["note_mp16"] = (
                    f"pool_error:{type(e).__name__}"
                )

            # QUANTIZED point-read (r10): the same driver-local path over
            # the BQ-coded artifact — bq_adc byte-LUT beam on the baked
            # codes + exact float rerank, no Spark job (the reference's
            # vamana.go:257-259 lifecycle in one process). Isolation
            # measured 38.6 QPS / 25.9 ms/q; pin 20.
            try:
                bq_kw = dict(pkw, thresholds=side10["thresholds"])
                for _qid, v in point_queries[:16]:
                    vamana_serve_local(VAM10_BQ, v, 10, **bq_kw)  # warm
                bq_pt_qps, _, bq_pt_note = qps_best_of(
                    len(point_queries),
                    lambda: [
                        vamana_serve_local(VAM10_BQ, v, 10, **bq_kw)
                        for _qid, v in point_queries
                    ],
                    pin=20.0,
                )
                vamana_10m["point_read"]["qps_1client_bq_adc"] = bq_pt_qps
                if bq_pt_note:
                    vamana_10m["point_read"]["note_bq_adc"] = bq_pt_note
            except Exception as e:
                vamana_10m["point_read"]["note_bq_adc"] = (
                    f"error:{type(e).__name__}"
                )
        print(f"# vamana_10m: {vamana_10m}", file=sys.stderr)
        _mark("vamana_10m")
        exact10.unpersist()

    # vector throughput: batch of exact top-10 over the embeddings table via
    # the partition-local scan (the serving-shaped workload)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).withColumn(
        "_id", F.col("vec_id").cast("string")
    )
    qrows = emb.limit(VECTOR_QPS_BATCH).select("_id", "embedding").collect()
    qlist = [(r["_id"], [float(x) for x in r["embedding"]]) for r in qrows]
    scan_frame, dt = best_of(
        3, lambda: knn_topk_scan(emb, "embedding", qlist, "euclidean", 10)
    )
    scan_frame.unpersist()
    timings["vector_batch_scan"] = round(dt, 3)
    vector_qps = round(len(qlist) / dt, 1)
    total += dt

    # 1M-document text-pipeline block: the LLM-data-prep operators at 200x
    # the sf0.1 documents table — throughput evidence for the 100 TB
    # posture (these are the ops a pre-training pipeline runs corpus-wide).
    # Corpus: mostly-unique token-soup docs (~40 tokens from md5 chains of
    # (doc, rep)) with the original text kept on reps 0/1 only, planting
    # exactly one exact-duplicate partner per source doc. Giant replicated
    # near-dup groups would be pathological for LSH pair enumeration
    # (buckets of 200 → O(200^2) pairs/bucket), which no real corpus has.
    docs1m_rows = int(os.environ.get("SPARK_GRAFT_BENCH_DOC_ROWS", 1_000_000))
    docs1m_path = f"/tmp/semadb_bench_docs_{docs1m_rows}.parquet"
    if not os.path.exists(os.path.join(docs1m_path, "_SUCCESS")):
        src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        d_reps = max(2, docs1m_rows // src.count())
        soup = F.concat_ws(
            " ",
            *[
                F.regexp_replace(
                    F.md5(F.concat_ws("_", "doc_id", "rep", F.lit(j))),
                    "(.{4})",
                    "$1 ",
                )
                for j in range(5)
            ],
        )
        (
            src.crossJoin(spark.range(d_reps).withColumnRenamed("id", "rep"))
            .select(
                (F.col("doc_id") * d_reps + F.col("rep")).alias("doc_id"),
                F.when(F.col("rep") < 2, F.col("text")).otherwise(soup).alias("text"),
                "lang",
                "source",
            )
            .repartition(cpus)
            .write.mode("overwrite")
            .parquet(docs1m_path)
        )
    from semadb_spark.operators import dedup as dedup_ops
    from semadb_spark.operators import packing as pk_ops
    from semadb_spark.operators import selection as sel_ops
    from semadb_spark.operators import textstats as ts_ops

    d1m = spark.read.parquet(docs1m_path).withColumn(
        "_id", F.col("doc_id").cast("string")
    )
    d1m_n = d1m.count()
    docs_1m: dict[str, float] = {"rows": d1m_n}
    _warc_fixture(spark, d1m, d1m_n, docs_1m)  # untimed one-time export
    for key, make in (
        ("exact_dedup", lambda: dedup_ops.exact_dedup(d1m, ["text"], "_id")),
        (
            # production fast path: JVM-native xxhash64 signatures (~2x the
            # md5 path at 1M). The md5 path exists for DuckDB-oracle
            # portability and stays hash-verified by the sf0.01 gate.
            "minhash_lsh",
            lambda: dedup_ops.minhash_lsh_pairs(
                d1m, "text", "_id", num_hashes=16, bands=4, hash_fn="xxhash64"
            ),
        ),
        ("repetition", lambda: ts_ops.repetition_signals(d1m, "text")),
        (
            "pack",
            lambda: pk_ops.pack_sequences(
                d1m, "text", "_id", max_tokens=2048, order_col="doc_id"
            ),
        ),
        (
            "quality_langid",
            lambda: d1m.select(
                "_id",
                ts_ops.detect_language("text").alias("lang_id"),
                ts_ops.quality_score("text").alias("quality"),
            ),
        ),
        (
            # r11: char-trigram LM quality proxy — fit on a 2% hash-sample
            # (the model converges on a fraction of the corpus; CCNet fits
            # its LM on a reference slice, not the target), score ALL docs
            "lm_score",
            lambda: ts_ops.ngram_lm_score(
                d1m, "text",
                ts_ops.ngram_lm_fit(
                    d1m.where(F.xxhash64("_id") % 50 == 0), "text",
                    min_count=2,
                ),
            ),
        ),
        (
            # r11: 128-token overlap-16 chunking (pre-embedding fan-out)
            "chunk",
            lambda: ts_ops.chunk_documents(
                d1m, "text", chunk_tokens=128, overlap_tokens=16
            ),
        ),
        (
            # r12: DSIR data selection end-to-end — ratio table fit from
            # hash-samples (target 0.1%, raw 5%: the bucket distributions
            # converge on a fraction of the corpus, same argument as the
            # LM fit sample), then score ALL 1M docs and Gumbel-top-k the
            # 10k keepers. Dominant cost = the 1M-doc score pass (explode
            # + broadcast bucket join + one groupBy).
            "dsir",
            lambda: sel_ops.dsir_sample(
                sel_ops.dsir_score(
                    d1m, "text",
                    sel_ops.dsir_fit(
                        d1m.where(F.xxhash64("_id") % 1000 == 0),
                        d1m.where(F.xxhash64("_id") % 20 == 0),
                        "text",
                    ),
                ),
                10_000,
            ),
        ),
        (
            # r12: eval-overlap decontamination (GPT-3 appendix-C shape) —
            # the eval side is a ~1k-doc hash-sample of the corpus itself
            # (guaranteed hits on the duplicated real-text rows), reduced
            # to distinct 13-grams and broadcast
            "contamination",
            lambda: dedup_ops.ngram_contamination(
                d1m,
                d1m.where(F.xxhash64("_id") % 1009 == 0).select("text"),
                "text", "_id",
            ),
        ),
        (
            # r12: curate_corpus END-TO-END off a WARC read — the full
            # crawl-shaped pipeline (WARC parse -> encoding -> C4 ->
            # Gopher -> exact dedup) in one DataFrame flow. The WARC
            # fixture is the same corpus exported once through write_warc
            # (itself the scale evidence for the sink).
            "curate_warc",
            lambda: _curate_pipe(spark, _warc_fixture(spark, d1m, d1m_n, docs_1m)),
        ),
    ):
        _, p_dt = best_of(2, make, materialize=False)
        docs_1m[f"{key}_sec"] = round(p_dt, 2)
        docs_1m[f"{key}_docs_per_sec"] = round(d1m_n / p_dt)
    print(f"# docs_1m: {docs_1m}", file=sys.stderr)
    _mark("docs_1m")

    # text search at 1M documents: index build (the reference's batch
    # insert+index path is its north-star workload) + TF-IDF serving from
    # the persisted posting table. The reference publishes no text-search
    # QPS row, so this block is scale evidence rather than a baseline
    # comparison. Build = tokenize + posting agg + WRITE of the
    # term-bucket-partitioned layout (the serving artifact, what
    # Collection.build_text_index persists) — the honest end-to-end
    # index-build cost.
    from semadb_spark.functions.hashing import md5_hash64
    from semadb_spark.operators.text_search import (
        TERM_BUCKETS,
        build_text_index,
        text_serve,
    )

    text_idx_path = f"/tmp/semadb_bench_textidx_{docs1m_rows}.parquet"
    t0 = time.time()
    (
        build_text_index(d1m, "text")
        .withColumn(
            "term_bucket", F.pmod(md5_hash64(F.col("term")), F.lit(TERM_BUCKETS))
        )
        .repartition("term_bucket")
        # sort by (partition col, term): the partitionBy writer re-sorts by
        # its partition columns with an UNSTABLE sort, so sorting by term
        # alone gets destroyed at write time (observed: row-group stats
        # spanning the full term range = zero pruning); leading with the
        # partition column makes the writer's sort a no-op and the term
        # order survives into row-group stats, which prune isin(term)
        .sortWithinPartitions("term_bucket", "term")
        .write.mode("overwrite")
        # 1 MB row groups: point queries decode whole row groups, so the
        # group size IS the per-term read cost (the 8 MB default packed a
        # whole 625k-row bucket into one group = zero pruning)
        .option("parquet.block.size", 1024 * 1024)
        .partitionBy("term_bucket")
        .parquet(text_idx_path)
    )
    text_build = round(time.time() - t0, 3)
    text_disk = spark.read.parquet(text_idx_path)
    text_disk.createOrReplaceTempView("bench_postings")
    text_postings = text_disk.count()
    text_queries = [
        ("spark query", "containsAny"),
        ("window merge stream", "containsAny"),
        ("data join", "containsAll"),
        ("table scan filter", "containsAny"),
        ("shuffle partition", "containsAll"),
        ("index search", "containsAny"),
        ("batch row group", "containsAny"),
        ("sort spill", "containsAny"),
    ]

    # single-query serving via text_serve (one spark.sql call per query,
    # term-bucket partition pruning, stored num_docs counter — scores
    # parity-tested against text_search). Two regimes:
    #   - sequential 1 client: LATENCY-bound — this host's floor for ANY
    #     1-task Spark job is ~150 ms (tools/repro_text.py measures a bare
    #     rdd.count() at the same cost), so this number is job overhead,
    #     not query work;
    #   - 16 concurrent clients: the serving-throughput regime a real tier
    #     runs — the scheduler pipelines the tiny per-query jobs.
    def _serve(args):
        qtext, op = args
        return text_serve(
            spark, "bench_postings", qtext, op, limit=75, num_docs=d1m_n
        ).count()

    for q in text_queries:
        _serve(q)  # warm codegen + file listing
    t1 = time.time()
    for q in text_queries:
        _serve(q)
    seq_dt = time.time() - t1
    # driver-local 1-client serving (text_serve_local): NO Spark job — the
    # ~150 ms 1-task job floor is the host's, not the query's; a serving
    # node reads the pruned term-bucket row groups point-wise with pyarrow
    # and scores in numpy (parity-tested against text_serve). This is the
    # 1-client number a real serving tier gets from the same artifact.
    from semadb_spark.operators.text_search import text_serve_local

    for q, op in text_queries:
        text_serve_local(text_idx_path, q, op, limit=75, num_docs=d1m_n)

    def _local_pass_1m():
        for q, op in text_queries:
            text_serve_local(text_idx_path, q, op, limit=75, num_docs=d1m_n)

    local_qps_1m, _, _ = qps_best_of(len(text_queries), _local_pass_1m)
    from concurrent.futures import ThreadPoolExecutor

    # 16-client row REDEFINED r14 (VERDICT r13 directive #4): each client
    # thread serves through its OWN local engine handle on the immutable
    # posting artifact (text_serve_local's row-group index is per-thread;
    # numpy/pyarrow release the GIL) — the Spark-SQL thread path serializes
    # in the scheduler (r13: 16 threads added nothing over 1 client) and is
    # kept for continuity under the _sql key.
    q64 = text_queries * 8

    def _serve_local_1m(args):
        qtext, op = args
        return text_serve_local(
            text_idx_path, qtext, op, limit=75, num_docs=d1m_n
        )

    with ThreadPoolExecutor(16) as ex:
        list(ex.map(_serve_local_1m, q64))  # warm per-thread handles
        conc_qps_1m, _, _ = qps_best_of(
            len(q64), lambda: list(ex.map(_serve_local_1m, q64))
        )
    with ThreadPoolExecutor(16) as ex:
        conc_qps_1m_sql, _, _ = qps_best_of(
            len(q64), lambda: list(ex.map(_serve, q64))
        )
    # batched serving: 64 queries in ONE job (text_search_batch reads each
    # posting row once for the whole batch) — the batch-first regime the
    # vector QPS rows measure; wall time barely moves from 8 to 64 queries
    # because the posting scan dominates and is shared
    import itertools

    from semadb_spark.operators.text_search import text_search_batch

    vocab = ["spark", "query", "stream", "join", "filter", "scan", "merge", "sort"]
    batch64 = [
        (f"b{i}", " ".join(p))
        for i, p in enumerate(
            itertools.islice(itertools.permutations(vocab, 2), 56)
        )
    ] + [(f"q{i}", q) for i, (q, _op) in enumerate(text_queries)]
    batch_frame, tb_dt = best_of(
        2,
        lambda: text_search_batch(
            d1m,
            "text",
            batch64,
            "containsAny",
            limit=75,
            doc_terms=text_disk,
            num_docs=d1m_n,
        ),
    )
    batch_frame.unpersist()
    text_1m = {
        "rows": d1m_n,
        "postings": text_postings,
        "index_build_sec": text_build,
        # metric break note: rounds <=4 published a 1-client sequential
        # text_search number under the key "search_qps"; the concurrent
        # number now carries the client count in its key so cross-round
        # compact-line comparisons can't read the change as a speedup
        "search_qps_16c": conc_qps_1m,
        "search_qps_16c_sql": conc_qps_1m_sql,
        "search_16c_note": (
            "16c redefined r14: per-thread local engine handles "
            "(VERDICT r13 #4); _sql keeps the old Spark-SQL thread path"
        ),
        "search_clients": 16,
        # 1-client via the driver-local pyarrow path (no Spark job; the
        # serving-tier story for single bounded queries); the _sql key keeps
        # the old Spark-SQL 1-client number for continuity — it is pinned at
        # the host's ~150 ms 1-task job floor (tools/repro_text.py)
        "search_qps_1client": local_qps_1m,
        "search_qps_1client_sql": round(len(text_queries) / seq_dt, 1),
        "batch_qps": round(len(batch64) / tb_dt, 1),
    }
    print(f"# text_1m: {text_1m}", file=sys.stderr)
    _mark("text_1m")

    # hybrid at 1M (VERDICT r4 directive #6): pre-filter + vector + text
    # composed over the 1M corpus, BOTH legs served from persisted
    # artifacts (the cent-partitioned IVF parquet + the term-bucket posting
    # parquet). Entity k carries text from the docs fixture and the
    # embedding from the angular fixture (same 0..1M id space). Semantics
    # are the compiler's _or merge: candidate pre-filter intersects both
    # legs BEFORE scoring (R4), scores combine as w_t*score - w_v*distance
    # summed per id (B3) — those semantics are oracle-gated at sf0.01
    # (hybrid_or, knn_filtered); this block is the wall-clock evidence that
    # the merge adds no blowup at 1M: hybrid_sec vs the sum of standalone
    # legs.
    from semadb_spark.operators.ann import IVFIndex as _IVFIndex
    from semadb_spark.operators.text_search import text_search_batch as _tsb

    hyb_index = _IVFIndex(
        ang_index.centroids, spark.read.parquet(ivf1m_path), "embedding", "_id"
    )
    hyb_flt = d1m.filter(F.col("doc_id") % 3 == 0).select("_id")
    hq_vec = [(f"h{i}", aq[i][1]) for i in range(8)]
    hq_text = [(f"h{i}", text_queries[i][0]) for i in range(8)]

    def leg_vec():
        return ivf_search(
            hyb_index, hq_vec, "cosine", 50, nprobe=8,
            compute_dtype="float32", candidate_ids=hyb_flt,
        )

    def leg_text():
        return _tsb(
            d1m, "text", hq_text, "containsAny", limit=50,
            doc_terms=text_disk, num_docs=d1m_n, candidate_ids=hyb_flt,
        )

    vf, hyb_vec_dt = best_of(2, leg_vec)
    vf.unpersist()
    tf, hyb_text_dt = best_of(2, leg_text)
    tf.unpersist()

    def composed():
        from pyspark.sql import Window as _W

        v = leg_vec().select(
            "query_id", F.col("_id").alias("id"),
            (F.lit(-0.7) * F.col("_distance")).alias("_h"),
        )
        t = leg_text().select(
            "query_id", "id", (F.lit(0.3) * F.col("_score")).alias("_h")
        )
        u = (
            v.unionByName(t)
            .groupBy("query_id", "id")
            .agg(F.sum("_h").alias("_hybridScore"))
        )
        w_h = _W.partitionBy("query_id").orderBy(
            F.col("_hybridScore").desc(), F.col("id").asc()
        )
        return (
            u.withColumn("_rn", F.row_number().over(w_h))
            .filter(F.col("_rn") <= 10)
            .drop("_rn")
        )

    hyb_frame, hyb_dt = best_of(2, composed)
    hyb_frame.unpersist()
    hybrid_1m = {
        "rows": d1m_n,
        "queries": 8,
        "leg_vector_sec": round(hyb_vec_dt, 3),
        "leg_text_sec": round(hyb_text_dt, 3),
        "hybrid_sec": round(hyb_dt, 3),
        "blowup_vs_legs": round(hyb_dt / (hyb_vec_dt + hyb_text_dt), 2),
    }
    print(f"# hybrid_1m: {hybrid_1m}", file=sys.stderr)
    _mark("hybrid_1m")

    # r13: the three local-serving blocks run BEFORE docs_10m+text_10m so
    # the wall-clock budget protects these bounded, high-value rows (the
    # r12-directive hybrid_local_1m mp8 reproduction among them) and any
    # budget skips land in the 10M doc legs, which degrade per-leg with
    # explicit {leg}_skipped records instead of vanishing whole rows.
    # hybrid point-read serving (Collection.search_local, r10): the whole
    # compiled query lifecycle in ONE process — filter legs off resident
    # columns, text legs off the persisted posting index, vector legs as a
    # cached-matrix exact scan, hybrid merge + shaping in pandas (the
    # reference's request lifecycle, shard/shard.go:329-472). Engine
    # point-reads on the SAME tree pay the ~150 ms/job scheduler floor per
    # leg (~0.3-2 QPS); this row is the structural answer. Build-once
    # 200k-row collection sidecar (tools/build_hybrid_coll.py); request
    # mix = text+vector _or, filter+vector _and, filter+text _and, and a
    # three-leg kitchen sink, all derived deterministically from meta.
    hybrid_local: dict = {}
    from semadb_spark import Collection as SColl
    from tools.build_hybrid_coll import bench_requests, ensure_hybrid_coll

    hpath, hmeta = ensure_hybrid_coll(spark, sf_dir=sf_dir)
    hcoll = SColl.open(spark, hpath)
    hreqs = bench_requests(hmeta)
    for r in hreqs[:8]:
        hcoll.search_local(r)  # warm resident columns + vec matrix + index
    # pin 25 QPS: isolation best-of-4 measured 30.8 QPS on this host
    # (text legs read-bound); below half of pin keeps re-measuring + notes
    hl_qps, hl_passes, hl_note = qps_best_of(
        len(hreqs), lambda: [hcoll.search_local(r) for r in hreqs], pin=25.0
    )
    # the same tree through the Spark engine, for the ratio story (2
    # requests, warm): this is the engine's documented point-read floor,
    # not a regression — batches amortize it, point reads don't
    hcoll.search(hreqs[0]).collect()
    t0 = time.time()
    for r in hreqs[:2]:
        hcoll.search(r).collect()
    engine_ms = (time.time() - t0) * 1000 / 2
    # process-parallel tier (HybridServePool, r10): 8 workers, each with
    # the whole snapshot resident (Collection.open_local, no JVM).
    # 8 workers, not 16: the exact vector legs are memory-bandwidth bound
    # (isolation: 180.3 QPS @ 8 vs 97.0 @ 16 on 32 cores). Pin 80.
    try:
        with hcoll.open_search_pool(workers=8, warm_requests=hreqs[:4]) as hpool:
            hpool.search_many(hreqs)  # warm every worker's resident state
            hp_qps, hp_passes, hp_note = qps_best_of(
                len(hreqs), lambda: hpool.search_many(hreqs), pin=80.0
            )
    except Exception as e:  # worker-spawn failure must not kill the bench
        hp_qps, hp_passes, hp_note = None, 0, f"pool_error:{type(e).__name__}"
    hybrid_local = {
        "rows": hmeta["rows"],
        "qps_1client": hl_qps,
        "qps_mp8": hp_qps,
        "ms_per_query": round(1000.0 / max(hl_qps, 0.001), 1),
        "engine_ms_per_query": round(engine_ms, 1),
        "speedup_vs_engine": round(engine_ms * hl_qps / 1000.0, 1),
        "band_passes": [hl_passes, hp_passes],
    }
    if hl_note:
        hybrid_local["qps_note"] = hl_note
    if hp_note:
        hybrid_local["qps_mp8_note"] = hp_note
    print(f"# hybrid_local: {hybrid_local}", file=sys.stderr)
    _mark("hybrid_local")

    # IVF local point-read serving (r12, VERDICT r11 directive #5): an
    # IVF-indexed collection used to fall back to the ~150 ms/job Spark
    # floor under route="auto" (~7 QPS); the local tier now serves the
    # probe route in-process (parity-tested vs the engine). Build-once
    # sidecar = the 200k hybrid snapshot + an IVF artifact
    # (tools/build_ivf_coll.py); isolation measured 72.9 QPS / 13.7 ms.
    ivf_local: dict = {}
    from tools.build_ivf_coll import ensure_ivf_coll, ivf_requests

    ipath, imeta = ensure_ivf_coll(spark, sf_dir=sf_dir)
    icoll = SColl.open(spark, ipath)
    ireqs = ivf_requests(imeta)
    for r in ireqs[:8]:
        icoll.search(r, route="auto")  # warm the resident IVF state
    iv_qps, iv_passes, iv_note = qps_best_of(
        len(ireqs), lambda: [icoll.search(r, route="auto") for r in ireqs],
        pin=50.0,
    )
    # local_served: the probe state is resident in THIS process — the
    # route="auto" Spark fallback never fired for the mix
    ieng = getattr(icoll, "_local_engine_cache", None)
    ivf_local = {
        "rows": imeta["rows"],
        "nlist": imeta["nlist"],
        "qps_1client": iv_qps,
        "ms_per_query": round(1000.0 / max(iv_qps, 0.001), 1),
        "local_served": bool(ieng and ieng[1].ivf and ieng[1]._ivf_cache),
        "band_passes": iv_passes,
        "pin": 50.0,
    }
    if iv_note:
        ivf_local["qps_note"] = iv_note
    # single-query latency histogram (VERDICT r12 directive #5): the
    # reference's published QPS are 1-thread serving-latency inverses
    # (README.md:191-196, ~1 ms/query); this records our point-read
    # distribution, not just the mean, so the tail is honest too
    lat = sorted(
        _timed(lambda: icoll.search(r, route="auto"))
        for _ in range(2) for r in ireqs
    )
    ivf_local["latency_ms"] = {
        "p50": round(lat[len(lat) // 2] * 1000, 2),
        "p90": round(lat[int(len(lat) * 0.90)] * 1000, 2),
        "p99": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1000, 2),
        "n": len(lat),
    }
    print(f"# ivf_local: {ivf_local}", file=sys.stderr)
    _mark("ivf_local")

    # hybrid serving at 1M (r11, VERDICT r10 directive #3): 5x the 200k
    # snapshot, SAME request mix, vector legs through the packed Vamana
    # beam (vector_mode="graph") instead of the exact scan — the
    # exact-scan legs are the measured memory-bandwidth wall past ~200k
    # rows x 8 workers, and the packed beam is the fix the vector tier
    # already proved at 1M/10M. Build-once sidecar
    # (tools/build_hybrid_coll.py, rows=1M: text index + packed graph).
    hybrid_local_1m: dict = {}
    # pins from r11 isolation on the v6 clustered artifact (24.2 QPS
    # 1-client / 158.7 mp8 at graph_nprobe=1; the directive's bar was
    # mp8 >= the 200k row's 80 pin — cleared ~2x). graph_nprobe=1 is the
    # point-read serving config (the same choice the proven vamana_10m
    # point_read row makes); isolation recall-vs-full-probe beam 0.894
    # on the clustered corpus (1.000 at nprobe 2).
    HYBRID1M_PIN_1C = 18.0
    HYBRID1M_PIN_MP8 = 120.0
    h1_rows = int(os.environ.get("SPARK_GRAFT_BENCH_HYBRID_1M_ROWS", 1_000_000))
    if h1_rows > 0 and _skip_for_budget("hybrid_local_1m",
                                        EST_SEC["hybrid_local_1m"]):
        hybrid_local_1m = {"skipped": "budget"}
        h1_rows = 0
    if h1_rows > 0:
        h1path, h1meta = ensure_hybrid_coll(spark, sf_dir=sf_dir, rows=h1_rows)
        h1coll = SColl.open(spark, h1path)
        h1reqs = bench_requests(h1meta)
        for r in h1reqs[:8]:
            h1coll.search_local(r, vector_mode="graph", graph_nprobe=1)
        h1_qps, h1_passes, h1_note = qps_best_of(
            len(h1reqs),
            lambda: [h1coll.search_local(r, vector_mode="graph",
                                         graph_nprobe=1)
                     for r in h1reqs],
            pin=HYBRID1M_PIN_1C,
        )
        try:
            with h1coll.open_search_pool(
                workers=8, vector_mode="graph", graph_nprobe=1,
                warm_requests=h1reqs[:4],
                # decode the whole packed artifact per worker at spawn:
                # without it the pool RAMPS for many passes while workers
                # lazily fault cents in (measured 40 -> 93 QPS over five
                # cold-cache rounds; steady state never arrived inside
                # the bench window after the 10M blocks evicted the page
                # cache — the r12 mp8 band miss)
                preload=True,
            ) as h1pool:
                h1pool.search_many(h1reqs)  # warm every worker
                h1p_qps, h1p_passes, h1p_note = qps_best_of(
                    len(h1reqs), lambda: h1pool.search_many(h1reqs),
                    pin=HYBRID1M_PIN_MP8,
                )
        except Exception as e:
            h1p_qps, h1p_passes, h1p_note = (
                None, 0, f"pool_error:{type(e).__name__}"
            )
        hybrid_local_1m = {
            "rows": h1meta["rows"],
            "vector_mode": "graph",
            "graph_nprobe": 1,
            "leg_recall_vs_fullprobe_iso": 0.894,
            "qps_1client": h1_qps,
            "qps_mp8": h1p_qps,
            "ms_per_query": round(1000.0 / max(h1_qps, 0.001), 1),
            "band_passes": [h1_passes, h1p_passes],
            "pins": [HYBRID1M_PIN_1C, HYBRID1M_PIN_MP8],
        }
        # Ratio-pin vs the SAME-RUN 200k mp8 row (quant-graph idiom,
        # VERDICT r11 directive #2): a whole-host noise window slows both
        # pools together, so the ratio separates "window" from "1M-path
        # regression". Band floor 0.6 (isolation 158.7/180.3 = 0.88 with
        # differential-noise headroom — latency-bound loops lose ~40% in
        # windows while GEMM loops lose ~12%, COVERAGE.md r11 bisect).
        H1M_MP8_MIN_RATIO = 0.6
        if h1p_qps is not None and hp_qps:
            mp8_ratio = round(h1p_qps / hp_qps, 3)
            hybrid_local_1m["qps_mp8_ratio_vs_200k"] = mp8_ratio
            hybrid_local_1m["mp8_ratio_band"] = [
                H1M_MP8_MIN_RATIO, "vs same-run hybrid_local 200k mp8"]
            if mp8_ratio < H1M_MP8_MIN_RATIO:
                h1p_note = (h1p_note + ";" if h1p_note else "") + (
                    f"below_mp8_ratio_band:{H1M_MP8_MIN_RATIO}x_200k")
            elif h1p_note:
                h1p_note += ";ratio_band_green_vs_same_run_200k(window)"
        if h1_note:
            hybrid_local_1m["qps_note"] = h1_note
        if h1p_note:
            hybrid_local_1m["qps_mp8_note"] = h1p_note
        print(f"# hybrid_local_1m: {hybrid_local_1m}", file=sys.stderr)
        _mark("hybrid_local_1m")

    # 10M-document decade proof for the pipeline + text operators (VERDICT
    # r5 directive #2): the ANN side got its 10M measurement in round 5;
    # this gives dedup/repetition/packing and the text index the same. The
    # corpus is the docs_1m soup recipe at 10x (one-time fixture). Pipeline
    # ops run ONE pass each (no best_of: at this scale a second pass would
    # double bench wall-clock without changing the linearity conclusion —
    # compare docs_per_sec against docs_1m for the rough-linearity check).
    docs10m_rows = int(os.environ.get("SPARK_GRAFT_BENCH_10M_DOCS", 10_000_000))
    docs_10m: dict = {}
    text_10m: dict = {}
    if docs10m_rows > 0 and _skip_for_budget("docs_10m+text_10m",
                                             _est_docs10m(docs10m_rows)):
        docs_10m = {"skipped": "budget"}
        text_10m = {"skipped": "budget"}
        docs10m_rows = 0
    if docs10m_rows > 0:
        docs10m_path = f"/tmp/semadb_bench_docs_{docs10m_rows}.parquet"
        if not os.path.exists(os.path.join(docs10m_path, "_SUCCESS")):
            src10 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            d_reps10 = max(2, docs10m_rows // src10.count())
            soup10 = F.concat_ws(
                " ",
                *[
                    F.regexp_replace(
                        F.md5(F.concat_ws("_", "doc_id", "rep", F.lit(j))),
                        "(.{4})",
                        "$1 ",
                    )
                    for j in range(5)
                ],
            )
            (
                src10.crossJoin(
                    spark.range(d_reps10).withColumnRenamed("id", "rep")
                )
                .select(
                    (F.col("doc_id") * d_reps10 + F.col("rep")).alias("doc_id"),
                    F.when(F.col("rep") < 2, F.col("text"))
                    .otherwise(soup10)
                    .alias("text"),
                    "lang",
                    "source",
                )
                .repartition(cpus * 4)
                .write.mode("overwrite")
                .parquet(docs10m_path)
            )
        d10 = spark.read.parquet(docs10m_path).withColumn(
            "_id", F.col("doc_id").cast("string")
        )
        d10_n = d10.count()
        docs_10m = {"rows": d10_n}
        _warc_fixture(spark, d10, d10_n, docs_10m)  # untimed one-time export
        for key, make in (
            (
                "minhash_lsh",
                lambda: dedup_ops.minhash_lsh_pairs(
                    d10, "text", "_id", num_hashes=16, bands=4,
                    hash_fn="xxhash64",
                ),
            ),
            ("repetition", lambda: ts_ops.repetition_signals(d10, "text")),
            (
                "pack",
                lambda: pk_ops.pack_sequences(
                    d10, "text", "_id", max_tokens=2048, order_col="doc_id"
                ),
            ),
            # r12 (VERDICT r11 directive #4): the round-11 operators get
            # the same decade proof — identical recipes to the docs_1m
            # rows so the linearity field compares like with like
            (
                "lm_score",
                lambda: ts_ops.ngram_lm_score(
                    d10, "text",
                    ts_ops.ngram_lm_fit(
                        d10.where(F.xxhash64("_id") % 50 == 0), "text",
                        min_count=2,
                    ),
                ),
            ),
            (
                "chunk",
                lambda: ts_ops.chunk_documents(
                    d10, "text", chunk_tokens=128, overlap_tokens=16
                ),
            ),
            (
                "contamination",
                lambda: dedup_ops.ngram_contamination(
                    d10,
                    d10.where(F.xxhash64("_id") % 1009 == 0).select("text"),
                    "text", "_id",
                ),
            ),
            (
                "dsir",
                lambda: sel_ops.dsir_sample(
                    sel_ops.dsir_score(
                        d10, "text",
                        sel_ops.dsir_fit(
                            d10.where(F.xxhash64("_id") % 1000 == 0),
                            d10.where(F.xxhash64("_id") % 20 == 0),
                            "text",
                        ),
                    ),
                    100_000,
                ),
            ),
            (
                "curate_warc",
                lambda: _curate_pipe(
                    spark, _warc_fixture(spark, d10, d10_n, docs_10m)
                ),
            ),
        ):
            # per-leg budget gate (r13): the block-level estimate cannot
            # see leg-level drift, and one slow leg must degrade the
            # MEASUREMENT (later legs skipped, run completes green) rather
            # than overrun the driver's wall clock (r12's rc=124). The
            # leg's own estimate is its measured 1M time scaled by the
            # row ratio with 40% headroom.
            leg_est = (
                docs_1m.get(f"{key}_sec", 30.0)
                * (d10_n / max(docs_1m.get("rows", d10_n // 10), 1))
                * 1.4
            )
            if _budget_remaining() < leg_est + 180.0:
                docs_10m[f"{key}_skipped"] = "budget"
                print(
                    f"# budget: skipping docs_10m leg {key} (est"
                    f" {leg_est:.0f}s > remaining"
                    f" {_budget_remaining():.0f}s)",
                    file=sys.stderr, flush=True,
                )
                continue
            _, p_dt = best_of(1, make, materialize=False)
            # r14 noise tripwire (VERDICT r13 directive #2): the 10M legs
            # were the only rows with NO noise defense — one timed pass, so
            # a multi-minute noisy-neighbor window lands straight in the
            # linearity record (this round's diagnosis: repetition_10m
            # measured 229.6 s in-bench vs 57-75 s isolated, same code;
            # System.gc()/session-state ruled out, fresh-JVM-after-load
            # fast). A leg whose linearity lands above 1.25 re-measures once
            # (budget-gated, same philosophy as qps_best_of's band
            # re-measure) and records the min plus both pass times. A
            # genuinely sublinear leg records two slow passes honestly.
            lin0 = docs_1m[f"{key}_docs_per_sec"] / max(d10_n / p_dt, 1)
            pass_times = [round(p_dt, 2)]
            if lin0 > 1.25 and _budget_remaining() > leg_est + 180.0:
                _, p_dt2 = best_of(1, make, materialize=False)
                pass_times.append(round(p_dt2, 2))
                p_dt = min(p_dt, p_dt2)
                docs_10m[f"{key}_passes"] = pass_times
            docs_10m[f"{key}_sec"] = round(p_dt, 2)
            docs_10m[f"{key}_docs_per_sec"] = round(d10_n / p_dt)
            docs_10m[f"{key}_linearity_vs_1m"] = round(
                docs_1m[f"{key}_docs_per_sec"] / max(d10_n / p_dt, 1), 2
            )
        print(f"# docs_10m: {docs_10m}", file=sys.stderr)
        _mark("docs_10m")

        if _budget_remaining() < _est_textidx10m(docs10m_rows) + 120.0:
            # r13: the text_10m sub-block gets its own artifact-aware
            # gate — a cold index build (~700 s) must not start when
            # the docs legs already consumed the budget
            text_10m = {"skipped": "budget"}
            print("# budget: skipping text_10m", file=sys.stderr, flush=True)
        else:
            # 10M text index: ~40 tokens/doc -> ~400M posting rows. Built ONCE
            # (an index is an artifact, same policy as the vamana_1m build);
            # build_sec comes from the sidecar, flagged build_once. Smaller
            # parquet row groups than the 1M index: with term-sorted rows the
            # pyarrow/Spark readers then prune to a few hundred-k rows per
            # queried term instead of multi-M.
            tidx10_path = f"/tmp/semadb_bench_textidx_{docs10m_rows}.parquet"
            tidx10_meta = tidx10_path + ".meta.json"
            if not (
                os.path.exists(tidx10_meta)
                and os.path.exists(os.path.join(tidx10_path, "_SUCCESS"))
            ):
                t0 = time.time()
                (
                    build_text_index(d10, "text")
                    .withColumn(
                        "term_bucket",
                        F.pmod(md5_hash64(F.col("term")), F.lit(TERM_BUCKETS)),
                    )
                    .repartition("term_bucket")
                    # lead with the partition column (see the 1M block note).
                    # 1 MB row groups: a point query decodes whole row groups
                    # (no page-level pruning in the readers), so at ~400M
                    # postings the group size IS the per-term read cost —
                    # 1 MB keeps it at ~100k rows instead of ~1.1M
                    .sortWithinPartitions("term_bucket", "term")
                    .write.mode("overwrite")
                    .option("parquet.block.size", 1024 * 1024)
                    .partitionBy("term_bucket")
                    .parquet(tidx10_path)
                )
                t_build10 = round(time.time() - t0, 3)
                with open(tidx10_meta, "w") as fh:
                    json.dump(
                        {
                            "build_sec": t_build10,
                            "postings": spark.read.parquet(tidx10_path).count(),
                        },
                        fh,
                    )
            with open(tidx10_meta) as fh:
                tmeta10 = json.load(fh)
            text_disk10 = spark.read.parquet(tidx10_path)
            text_disk10.createOrReplaceTempView("bench_postings_10m")

            def _serve10(args):
                qtext, op = args
                return text_serve(
                    spark, "bench_postings_10m", qtext, op, limit=75,
                    num_docs=d10_n,
                ).count()

            # Repro-pinned bands for the 10M serving rows (qps_best_of docstring
            # has the round-8 story): isolation medians from
            # tools/repro_text16c.py (~37 QPS for both the 1-client local path
            # and the 16-thread Spark-SQL path) and
            # tools/repro_text_multiproc.py (250.8 @ 8 procs, 401.5 @ 16). A
            # best pass >2x below a pin keeps re-measuring and, failing that,
            # lands with an explicit note instead of silently.
            # r10 re-pin: the factorize + fingerprint-TTL fixes nearly doubled
            # the 1-client point-read path (committed 59.7-68.7 vs r9's 37.9),
            # so the old 37-QPS pin would let a real regression back to r9
            # levels land silently. 16c stays lower (the Spark-SQL thread path
            # didn't change); mp16 follows the 373-401 committed band.
            TEXT10M_PIN_1C = 55.0
            TEXT10M_PIN_16C = 40.0
            TEXT10M_PIN_MP16 = 320.0
            for q in text_queries:
                _serve10(q)  # warm file listing + codegen
            with ThreadPoolExecutor(16) as ex:
                conc10_sql_qps, _conc10_sql_passes, conc10_sql_note = (
                    qps_best_of(
                        len(q64), lambda: list(ex.map(_serve10, q64)),
                        pin=TEXT10M_PIN_16C,
                    )
                )

            # 16-client row REDEFINED r14 (VERDICT r13 directive #4): one
            # local engine handle per client thread on the immutable index
            # (same redefinition as text_1m; the Spark-SQL thread path
            # serializes and keeps its number under the _sql key).
            def _serve_local_10m(args):
                qtext, op = args
                return text_serve_local(
                    tidx10_path, qtext, op, limit=75, num_docs=d10_n
                )

            with ThreadPoolExecutor(16) as ex:
                list(ex.map(_serve_local_10m, q64))  # warm per-thread handles
                conc10_qps, conc10_passes, conc10_note = qps_best_of(
                    len(q64), lambda: list(ex.map(_serve_local_10m, q64)),
                    pin=TEXT10M_PIN_16C,
                )
            for q, op in text_queries:
                text_serve_local(tidx10_path, q, op, limit=75, num_docs=d10_n)

            def _local_pass_10m():
                for q, op in text_queries:
                    text_serve_local(tidx10_path, q, op, limit=75, num_docs=d10_n)

            local10_qps, local10_passes, local10_note = qps_best_of(
                len(text_queries), _local_pass_10m, pin=TEXT10M_PIN_1C
            )
            # process-parallel serving tier (TextServePool, promoted from
            # tools/repro_text_multiproc.py in r9): one worker process per
            # client, each with its own ParquetFile handles on the immutable
            # artifact — the GIL-free shape a real tier deploys.
            from semadb_spark.operators.text_search import TextServePool

            with TextServePool(tidx10_path, num_docs=d10_n, workers=16) as pool:
                pool.search_many(text_queries, limit=75)  # warm every worker
                mp_qps, mp_passes, mp_note = qps_best_of(
                    len(q64),
                    lambda: pool.search_many(q64, limit=75),
                    pin=TEXT10M_PIN_MP16,
                )
            text_10m = {
                "rows": d10_n,
                "postings": tmeta10["postings"],
                "index_build_sec": tmeta10["build_sec"],
                "build_once": True,
                "search_qps_16c": conc10_qps,
                "search_qps_16c_sql": conc10_sql_qps,
                "search_16c_note": (
                    "16c redefined r14: per-thread local engine handles "
                    "(VERDICT r13 #4); _sql keeps the Spark-SQL thread path"
                ),
                "search_qps_1client": local10_qps,
                "search_qps_multiproc": mp_qps,
                "multiproc_workers": 16,
                "band_passes": [local10_passes, conc10_passes, mp_passes],
            }
            for key, note in (
                ("search_qps_1client", local10_note),
                ("search_qps_16c", conc10_note),
                ("search_qps_16c_sql", conc10_sql_note),
                ("search_qps_multiproc", mp_note),
            ):
                if note:
                    text_10m[f"{key}_note"] = note
            print(f"# text_10m: {text_10m}", file=sys.stderr)
            _mark("text_10m")


    # Full detail (cold timings, all vector-block fields) goes to a file +
    # stderr; the FINAL stdout line is a compact summary kept well under the
    # driver's 2000-char tail window (round 2's full line overflowed it and
    # the driver recorded "parsed": null).
    detail = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "pipeline_new_sec": round(pipeline_new, 3),
        "queries": timings,
        "cold_queries": cold,
        "warc_export_sec": warc_export_sec,
        "timing": "warm steady-state (cold incl. codegen+index-build in cold_queries)",
        "sf": sf,
        "vector_qps": vector_qps,
        "vector_1m": vector_1m,
        "vector_1m_bq": vector_1m_bq,
        "vector_1m_angular": vector_1m_angular,
        "vector_1m_pq": vector_1m_pq,
        "vamana_1m": vamana_1m,
        "quant_graph_1m": quant_graph_1m,
        "vector_10m": vector_10m,
        "vamana_10m": vamana_10m,
        "docs_1m": docs_1m,
        "hybrid_1m": hybrid_1m,
        "text_1m": text_1m,
        "docs_10m": docs_10m,
        "text_10m": text_10m,
        "hybrid_local": hybrid_local,
        "hybrid_local_1m": hybrid_local_1m,
        "ivf_local": ivf_local,
        "cpus": cpus,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    # Degraded-run guard (VERDICT r12 directive #2): the r12 end-of-round
    # snapshot overwrote a clean committed run (headline 16.2 s) with a
    # host-contended one (27.6 s, every query 1.2-2.3x slower). A run whose
    # MEDIAN per-query warm ratio vs the incumbent exceeds 1.3 is host
    # noise, not code — keep the incumbent and park the new run beside it
    # (BENCH_DETAIL_DEGRADED.json) for inspection. Override with
    # SPARK_GRAFT_BENCH_FORCE_DETAIL=1 (e.g. after a known slowdown-for-
    # correctness change). The stdout/stderr JSON lines always carry the
    # CURRENT run either way — only the committed file is guarded.
    write_path, med = _detail_write_path(detail_path, timings, sf=sf)
    if write_path != detail_path:
        detail["degraded_vs_incumbent_median_ratio"] = round(med, 3)
        print(
            f"# detail guard: median per-query ratio {med:.2f} > 1.3 vs "
            f"committed incumbent - writing {write_path} instead",
            file=sys.stderr,
        )
    with open(write_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail, separators=(",", ":")), file=sys.stderr)
    print(f"# full detail: {write_path}", file=sys.stderr)
    # compact stdout line: per-query map FIRST-CLASS (the judge diffs
    # per-query regressions from BENCH_r{N}.json alone — VERDICT r6 #5),
    # every block trimmed to qps/recall (build times, linearity detail and
    # notes live in the now-COMMITTED BENCH_DETAIL.json)
    def _qr(qps, recall):
        return {"qps": qps, "recall": recall}

    compact = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "pipeline_new_sec": round(pipeline_new, 3),
        "sf": sf,
        "cpus": cpus,
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "warc_export_sec": warc_export_sec,
        "vector_qps": vector_qps,
        "vector_1m": _qr(vector_1m["ivf_qps"], vector_1m["ivf_recall_at10"]),
        "vector_1m_bq": _qr(vector_1m_bq["bq_qps"], vector_1m_bq["bq_recall_at10"]),
        "vector_1m_angular": _qr(
            vector_1m_angular["ivf_qps"], vector_1m_angular["ivf_recall_at10"]
        ),
        "vector_1m_pq": _qr(vector_1m_pq["pq_qps"], vector_1m_pq["pq_recall_at10"]),
        "vector_10m": (
            _qr(vector_10m["ivf_qps"], vector_10m["ivf_recall_at10"])
            if "ivf_qps" in vector_10m
            else vector_10m
        ),
        "vamana_1m": _qr(vamana_1m["qps"], vamana_1m["recall_at10"]),
        "quant_graph_1m": {
            n: _qr(v["qps"], v["recall_at10"]) for n, v in quant_graph_1m.items()
        },
        "vamana_10m": (
            {
                **_qr(vamana_10m["qps"], vamana_10m["recall_at10"]),
                **(
                    {
                        "pt_qps": vamana_10m["point_read"]["qps_1client"],
                        "pt_mp16": vamana_10m["point_read"].get("qps_mp16"),
                    }
                    if "point_read" in vamana_10m
                    else {}
                ),
                **(
                    {"note": vamana_10m["qps_note"]}
                    if "qps_note" in vamana_10m
                    else {}
                ),
            }
            if "qps" in vamana_10m
            else vamana_10m
        ),
        "docs_1m": {
            "lsh_sec": docs_1m["minhash_lsh_sec"],
            "rep_sec": docs_1m["repetition_sec"],
            "pack_sec": docs_1m["pack_sec"],
        },
        "text_1m": {
            "qps_1c": text_1m["search_qps_1client"],
            "qps_16c": text_1m["search_qps_16c"],
            "batch_qps": text_1m["batch_qps"],
        },
        "hybrid_1m": {"blowup_vs_legs": hybrid_1m["blowup_vs_legs"]},
        "docs_10m": {
            k.replace("minhash_lsh", "lsh")
            .replace("repetition", "rep")
            .replace("docs_per_sec", "dps")
            .replace("linearity_vs_1m", "lin"): v
            for k, v in docs_10m.items()
            if "sec" not in k or k.endswith("dps")
        },
        "text_10m": {
            "qps_1c": text_10m.get("search_qps_1client"),
            "qps_16c": text_10m.get("search_qps_16c"),
            "qps_mp16": text_10m.get("search_qps_multiproc"),
            **{
                k.replace("search_qps_", "").replace("1client", "1c"): v
                for k, v in text_10m.items()
                if k.endswith("_note")
            },
        },
        "hybrid_local": {
            k: v
            for k, v in hybrid_local.items()
            if k in ("qps_1client", "qps_mp8", "engine_ms_per_query",
                     "qps_note", "qps_mp8_note")
        },
        "hybrid_local_1m": {
            k: v
            for k, v in hybrid_local_1m.items()
            if k in ("qps_1client", "qps_mp8", "qps_mp8_ratio_vs_200k",
                     "qps_note", "qps_mp8_note", "skipped")
        },
        "ivf_local": {
            k: v
            for k, v in ivf_local.items()
            if k in ("qps_1client", "local_served", "qps_note")
        },
        "detail": "BENCH_DETAIL.json (committed)",
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) >= 1900:
        # stay under the driver's 2000-char tail window rather than
        # overflow it: keep the SLOWEST queries (the regression-relevant
        # tail) and note the cut
        keep = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:20]
        )
        compact["queries"] = {k: round(v, 2) for k, v in keep.items()}
        compact["queries"]["_rest_see"] = "BENCH_DETAIL.json"
        line = json.dumps(compact, separators=(",", ":"))
    # the fixed 20-query trim can still overflow as optional blocks
    # accumulate: keep dropping the fastest remaining query entries (and
    # then whole optional blocks) until the line fits
    while len(line) >= 1900 and len(compact["queries"]) > 3:
        fastest = min(
            (k for k in compact["queries"] if not k.startswith("_")),
            key=lambda k: compact["queries"][k],
            default=None,
        )
        if fastest is None:
            break
        del compact["queries"][fastest]
        line = json.dumps(compact, separators=(",", ":"))
    for blk in ("text_10m", "docs_10m", "hybrid_1m", "text_1m"):
        if len(line) < 1900:
            break
        compact.pop(blk, None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
