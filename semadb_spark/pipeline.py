"""End-to-end corpus curation: the canonical web-crawl cleaning recipe
(C4 / Gopher / RefinedWeb lineage) composed from this repo's gated
operators into one DataFrame pipeline.

``curate_corpus`` chains: encoding screen → C4 line cleaning → Gopher
quality rules → exact dedup (content-hash, keep lowest id) — each stage
a pure DataFrame transform, so Catalyst fuses the per-document stages
into one scan and the only shuffle in the whole recipe is the dedup
groupBy. Near-duplicate removal stays a separate pass by design
(MinHash/SimHash band blocking has its own shuffle profile; feed
``drop_ids`` with the output of ``operators.dedup`` when fuzzy dedup is
wanted).

Scale: stage predicates are Column expressions (no UDFs); stats
collection is opt-in because each count is a job — at 100 TB you run
``collect_stats=False`` and read the counts off the sink's metrics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semadb_spark.operators.textstats import (
    encoding_signals,
    gopher_quality_flags,
    let_bound,
    line_filter,
)


def curate_corpus(df, text_col: str = "text", id_col: str = "_id", *,
                  min_line_words: int = 3, gopher_min_words: int = 40,
                  max_control_ratio: float = 0.01,
                  require_terminal_punct: bool = True,
                  drop_ids=None, collect_stats: bool = True,
                  select_target=None, select_k: int | None = None,
                  dsir_buckets: int = 10_000, dsir_seed=0):
    """Run the standard curation recipe; returns ``(curated_df, stats)``.

    Stages (each drops rows, the survivors flow on):

    1. **encoding**: drop docs whose bytes look damaged
       (``encoding_signals``: replacement chars, mojibake markers, or a
       control-char ratio above ``max_control_ratio``).
    2. **line_clean**: C4 line filtering rewrites ``text_col`` to the
       surviving lines; pages keeping zero lines drop out. Corpora with
       no sentence punctuation (transcripts, keyword dumps) need
       ``require_terminal_punct=False`` or this stage zeroes them.
    3. **gopher**: the Rae et al. 2021 rule battery
       (``gopher_quality_flags(..., min_words=gopher_min_words)``) —
       only ``keep`` pages survive.
    4. **exact_dedup**: one row_number window over sha2(text): exactly
       one row per identical cleaned text survives — the one with the
       smallest ``id_col`` (min in the column's own type — lexicographic
       for strings, numeric for numbers). Correct even under duplicate
       ids, and the pipeline is scanned ONCE (a min-id semi-join would
       recompute every upstream stage for both join inputs).
    5. **drop_ids** (optional): anti-join against a caller-supplied
       one-column DataFrame of ids — the hook for fuzzy-dedup output
       (``dedup_components`` canonical-loser sets, contamination hits).
    6. **dsir_select** (optional): pass ``select_target`` (a DataFrame of
       documents shaped like the distribution you want more of) AND
       ``select_k`` to finish with DSIR importance resampling
       (:mod:`semadb_spark.operators.selection`): fit the hashed-n-gram
       ratio table target-vs-survivors, score every survivor, keep the
       Gumbel top-``select_k`` — cleaning decides what is *broken*, this
       stage decides what is *wanted* when the clean pool still exceeds
       the training budget. The draw is md5-seeded (``dsir_seed``), so
       reruns keep the same sample.

    ``stats`` maps stage name → surviving row count (empty dict when
    ``collect_stats=False``; each count is one Spark job).
    """
    if (select_target is None) != (select_k is None):
        raise ValueError(
            "select_target and select_k must be passed together"
        )
    stats: dict[str, int] = {}

    def note(name, frame):
        if collect_stats:
            stats[name] = frame.count()
        return frame

    cur = df.filter(F.col(text_col).isNotNull())
    note("input", cur)

    # let-bound (r14, textstats.let_bound): the suspect flag embeds the
    # control ratio, so the naive two-term filter ran the control-char
    # regexp_replace over the full text twice per row. Same predicate,
    # one evaluation; the 0.01 literal mirrors encoding_signals'
    # encoding_suspect threshold.
    enc = encoding_signals(text_col)
    cur = cur.filter(
        let_bound(
            F.struct(
                enc["n_replacement"].alias("nr"),
                enc["mojibake_hits"].alias("mh"),
                enc["control_ratio"].alias("cr"),
            ),
            lambda e: ~(
                (e["nr"] > 0) | (e["mh"] > 0) | (e["cr"] > 0.01)
            ) & (e["cr"] <= max_control_ratio),
        )
    )
    note("encoding", cur)

    # the kept-lines ARRAY is materialized once (attribute) and both the
    # page-drop test and the rejoined text derive from it — the previous
    # cleaned/n_kept pair re-ran the whole per-line filter twice per row
    # (r14, see line_filter's kept_lines note)
    lf = line_filter(text_col, min_words=min_line_words,
                     require_terminal=require_terminal_punct)
    cur = (
        cur.withColumn("__ka", lf["kept_lines"])
        .filter(F.size("__ka") > 0)
        .withColumn(text_col, F.array_join("__ka", "\n"))
        .drop("__ka")
    )
    note("line_clean", cur)

    g = gopher_quality_flags(text_col, min_words=gopher_min_words)
    cur = cur.filter(g["keep"])
    note("gopher", cur)

    # row_number over the content-hash window, NOT a min-id groupBy +
    # semi-join back: the join form scans the whole upstream pipeline
    # TWICE (both join inputs derive from `cur` — measured 164 s for the
    # WARC-fed 1M bench pass, halved by this), and it relied on unique
    # ids. One shuffle on the hash, each row scanned once, exactly one
    # survivor per identical cleaned text even under duplicate ids.
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(
        F.col(id_col).asc()
    )
    cur = (
        cur.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    note("exact_dedup", cur)

    if drop_ids is not None:
        flt = drop_ids.select(
            F.col(drop_ids.columns[0]).cast("string").alias("__did")
        )
        cur = cur.join(
            flt, cur[id_col].cast("string") == flt["__did"], "left_anti"
        )
        note("drop_ids", cur)

    if select_target is not None:
        from semadb_spark.operators.selection import (
            dsir_fit,
            dsir_sample,
            dsir_score,
        )

        table = dsir_fit(select_target, cur, text_col,
                         buckets=dsir_buckets, seed=dsir_seed)
        scored = dsir_score(cur, text_col, table, id_col=id_col,
                            buckets=dsir_buckets, seed=dsir_seed)
        picked = dsir_sample(scored, select_k, id_col=id_col,
                             seed=dsir_seed).select(id_col)
        cur = cur.join(picked, id_col, "left_semi")
        note("dsir_select", cur)

    return cur, stats
