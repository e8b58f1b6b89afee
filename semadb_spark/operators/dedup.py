"""Deduplication operators for large-scale text/embedding corpora.

Beyond the reference's surface (north-star pipeline additions, SURVEY.md §7
M8): exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-duplicate detection.

Scale design notes:
- Signatures (MinHash/SimHash) are computed **per row with array higher-order
  functions** — no explode/groupBy shuffle for signature building; the only
  shuffle is the LSH band bucket join, which groups ~duplicate docs only.
- All hashing uses the engine-portable md5-prefix hash
  (:mod:`semadb_spark.functions.hashing`) so the DuckDB oracle reproduces
  results bit-for-bit. Swap in ``F.xxhash64`` for ~3x faster hashing when
  oracle parity is not needed.
- Pair enumeration always emits ``id_a < id_b`` so outputs are canonical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semadb_spark.functions.analyzer import tokenize
from semadb_spark.functions.distances import with_l2_normalized
from semadb_spark.functions.hashing import md5_hash64


def shingles(c: Column | str, k: int = 3) -> Column:
    """Distinct token k-shingles (word n-grams joined by space); documents
    shorter than k tokens collapse to one whole-document shingle.

    The token array is let-bound (1-element array + transform) so the
    tokenizer evaluates ONCE per row: HOF lambdas get no codegen CSE, and
    referencing the tokenize tree inside the per-gram lambda re-ran the
    whole analyser per gram (~200x per doc; measured 9.6s -> 0.6s for the
    shingle pass over 100k docs)."""
    c = F.col(c) if isinstance(c, str) else c

    def grams(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))

    return F.array_distinct(
        F.element_at(
            F.transform(F.array(tokenize(c, remove_stopwords=False)), grams), 1
        )
    )


# -- exact dedup --------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with the
    smallest id as keeper. -> (content_hash, keep_id, dup_count)."""
    h = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_cols]))
    return (
        df.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def duplicate_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 2,
    sep: str = "\n\n",
) -> DataFrame:
    """Paragraph-level exact dedup (the RefinedWeb/FineWeb boilerplate
    pass): split each document on ``sep``, normalize (trim, collapse
    whitespace, casefold), and count corpus-wide occurrences per distinct
    paragraph. -> (para_md5, n_total, n_docs, sample) for paragraphs seen
    at least ``min_count`` times — repeated navigation/footer/licence
    paragraphs, the units page-level exact dedup can't see.

    Scale shape: explode + one groupBy on the paragraph hash — the same
    single-shuffle plan as :func:`exact_dedup`, O(paragraphs) not
    O(pairs); ``sample`` is the min-normalized-text per hash, so the
    output is deterministic under any partitioning."""
    para = F.explode(F.split(F.col(text_col), sep)).alias("para")
    norm = F.lower(F.regexp_replace(F.trim(F.col("para")), r"\s+", " "))
    return (
        df.select(F.col(id_col).alias("_did"), para)
        .select("_did", norm.alias("norm"))
        .filter(F.col("norm") != "")
        .groupBy(F.md5("norm").alias("para_md5"))
        .agg(
            F.count("*").alias("n_total"),
            F.countDistinct("_did").alias("n_docs"),
            F.min(F.substring("norm", 1, 40)).alias("sample"),
        )
        .filter(F.col("n_total") >= min_count)
    )


def ngram_contamination(
    df: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Pile eval-overlap
    pass): flag corpus documents sharing any token ``n``-gram with an
    evaluation set. -> (id, n_grams, n_hits, contaminated_frac) for
    documents with at least one hit; n=13 is the published default.

    Scale shape: the benchmark side reduces to DISTINCT n-grams and
    BROADCASTS (eval sets are thousands of rows against a 100 TB corpus);
    the corpus side explodes each document's distinct n-grams —
    O(corpus tokens) rows into a map-side hash join, then one groupBy on
    the document id. No corpus-vs-corpus pairing anywhere. Both sides use
    :func:`shingles` (documents shorter than ``n`` tokens collapse to a
    whole-document gram on both sides, so short eval items still match
    verbatim copies)."""
    bench_g = (
        bench.select(F.explode(shingles(bench_text_col, n)).alias("g"))
        .distinct()
    )
    corpus = df.select(
        F.col(id_col).alias("_did"), shingles(text_col, n).alias("gs")
    ).select("_did", F.size("gs").alias("n_grams"), F.explode("gs").alias("g"))
    hits = (
        corpus.join(F.broadcast(bench_g), "g")
        .groupBy("_did", "n_grams")
        .agg(F.count("*").alias("n_hits"))
    )
    return hits.select(
        F.col("_did").alias(id_col),
        "n_grams",
        "n_hits",
        (F.col("n_hits") / F.col("n_grams")).alias("contaminated_frac"),
    )


# -- substring (window) dedup -------------------------------------------------


def duplicated_substring_spans(
    df: DataFrame,
    text_col: str,
    id_col: str = "_id",
    window: int = 32,
    stride: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring-duplication detection at window granularity (the
    train-set dedup of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499 — their suffix-array pass
    finds repeated spans; this is the distributable windowed form): every
    ``window``-char substring starting at 1, 1+stride, 1+2*stride, ... is
    hashed, and spans whose hash occurs in >= ``min_docs`` DISTINCT
    documents are flagged. -> (id, pos, win_hash), one row per duplicated
    span occurrence, 1-based ``pos``.

    Scale shape: pure Catalyst — per-row window extraction is an array
    higher-order function (no Python), and the WHOLE operator is one
    shuffle + one sorted pass: spans exchange once on ``win_hash`` (sorted
    by ``id`` within the hash), ``dense_rank`` numbers the distinct docs in
    stream order and ``max(rank)`` over the hash group is the distinct-doc
    count — no second corpus scan, no join-back (the join-back form
    computed the span subtree twice: once under the count-distinct
    aggregate, once as the probe side). Work is O(corpus_chars/stride),
    never O(docs^2); a repeated boilerplate paragraph lands in one sorted
    hash group however many documents carry it, and WindowExec's external
    sorter spills oversized groups rather than materializing them. md5
    keeps the hash engine-portable for the DuckDB oracle; callers at scale
    can swap xxhash64.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be positive")
    t = F.col(text_col)
    wins = F.transform(
        F.sequence(F.lit(1), F.length(t) - F.lit(window - 1), F.lit(stride)),
        lambda p: F.struct(
            p.alias("pos"), F.substring(t, p, F.lit(window)).alias("win")
        ),
    )
    spans = (
        df.filter(t.isNotNull() & (F.length(t) >= window))
        .select(F.col(id_col).alias("id"), F.explode(wins).alias("s"))
        .select("id", F.col("s.pos").alias("pos"), F.md5(F.col("s.win")).alias("win_hash"))
    )
    by_hash = Window.partitionBy("win_hash")
    return (
        spans.withColumn("_dr", F.dense_rank().over(by_hash.orderBy("id")))
        .withColumn("_n_docs", F.max("_dr").over(by_hash))
        .filter(F.col("_n_docs") >= min_docs)
        .select("id", "pos", "win_hash")
    )


# -- MinHash + LSH ------------------------------------------------------------


def _seeded_hash(seed: int):
    # NB: must return a SINGLE-arg lambda — F.transform treats a two-arg
    # lambda (even via default args) as (element, index).
    return lambda s: md5_hash64(s, seed)


_MAX_LONG = (1 << 62) - 1

# Unblocked embedding_neardup_pairs ceiling: one task holds n vectors plus
# the n^2 GEMM output (20k x 20k doubles ~ 3.2 GB) — beyond this, the
# RP-LSH-blocked variant is the right tool.
SINGLE_BLOCK_MAX_ROWS = 20_000


_MERSENNE31 = (1 << 31) - 1
_MASK31 = (1 << 31) - 1


def minhash_coeffs(num_hashes: int, seed: int = 12345) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the Carter-Wegman universal family
    h_i(x) = (a_i * x + b_i) mod (2^31 - 1) with x < 2^31.

    a_i*x + b_i < 2^62: overflow-safe in both Spark (long) and DuckDB
    (BIGINT, which *errors* on overflow). The modulus must be far smaller
    than a_i*x so the product wraps many times — a near-wrapless variant
    (e.g. mod 2^61-1) is piecewise-monotone in x, which correlates the
    per-seed minima and floods LSH buckets with false candidate pairs."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE31) | 1, rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]


def minhash_signature_array(
    c: Column, num_hashes: int, k: int = 3, hash_fn: str = "md5"
) -> Column:
    """Per-row MinHash signature as ONE array<long> column.

    Performance notes (bench-driven):
    - One expression tree so tokenization/shingling evaluates once per row —
      CollapseProject would otherwise re-evaluate the whole pipeline once per
      signature column, and HOFs get no codegen CSE (measured ~50x slowdown).
    - ONE md5 per shingle; the k-hash family is universal hashing
      h_i = (a_i * x + b_i) mod 2^61-1 over a 31-bit reduction x of the
      digest (pairwise independent across i — a correlated family like
      h1 + i*h2 floods LSH buckets with false candidate pairs).
    Elementwise min-fold: acc[i] = min(acc[i], h_i(shingle)).
    """
    sh = shingles(c, k)
    coeffs = minhash_coeffs(num_hashes)
    if hash_fn == "xxhash64":
        # production fast path: JVM-native xxhash64, ~3x faster than the
        # md5-prefix hash but not reproducible in the DuckDB oracle
        base = F.transform(sh, lambda s: F.xxhash64(s).bitwiseAND(F.lit(_MASK31)))
    elif hash_fn == "md5":
        base = F.transform(sh, lambda s: md5_hash64(s).bitwiseAND(F.lit(_MASK31)))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn}")
    # Let-bind the md5 array (1-element array + transform), then take each
    # minimum as its own cheap arithmetic pass over the bound value. This
    # allocates O(num_hashes) arrays per row; the previous shape (array[8]
    # per shingle + zip_with min-fold) allocated O(shingles) arrays and ran
    # ~3x slower in interpreted HOF evaluation.
    return F.element_at(
        F.transform(
            F.array(base),
            lambda xs: F.array(
                *[
                    F.array_min(
                        F.transform(
                            xs, lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(_MERSENNE31)
                        )
                    )
                    for a, b in coeffs
                ]
            ),
        ),
        1,
    )


def minhash_signature(c: Column, num_hashes: int, k: int = 3) -> list[Column]:
    """Signature as separate h0..h{n-1} columns (thin wrapper over the array
    form; prefer :func:`minhash_signature_array` in plans)."""
    sig = minhash_signature_array(c, num_hashes, k)
    return [F.element_at(sig, i + 1).alias(f"h{i}") for i in range(num_hashes)]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs -> (id_a, id_b).

    Pipeline: shingle -> minhash (rows stay put) -> band keys -> explode bands
    (xB rows) -> self-join on (band, key). Only same-bucket rows meet in the
    join, so shuffle volume is O(corpus x bands), not O(n^2).
    """
    rows_per_band = num_hashes // bands
    # Parallelize: tiny single-file inputs arrive as one partition, and the
    # signature computation is CPU-bound — spread rows before computing. The
    # explicit partition count stops AQE from coalescing the small shuffle
    # back to one task (the bytes are tiny but the compute is not).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt")).repartition(
        n_parts, F.col("id")
    )

    # Let-binding trick: wrap the signature in a 1-element array and derive
    # all band keys inside one transform lambda, so the whole shingle+hash
    # pipeline evaluates ONCE per row. (HOF expressions are codegen-fallback:
    # no common-subexpression elimination — referencing the signature
    # expression once per band key measured ~50x slower.)
    def band_keys(sig: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "_",
                        *[
                            F.element_at(sig, b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    ).alias("key"),
                )
                for b in range(bands)
            ]
        )

    band_structs = F.flatten(
        F.transform(
            F.array(minhash_signature_array(F.col("_txt"), num_hashes, k, hash_fn)),
            band_keys,
        )
    )
    banded = base.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # One shuffle: group each (band, bucket) and enumerate in-bucket pairs
    # (a self-join would re-evaluate the whole signature pipeline per branch).
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    candidates: DataFrame,
    k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    -> (id_a, id_b, jaccard). Candidate sets are tiny by construction
    (post-LSH), so the corpus is semi-joined down to the candidate ids
    BEFORE any shingling — at 100 TB the expensive tokenize/shingle pass
    touches O(|candidates|) documents, never the corpus. The candidate id
    set broadcasts (it's bounded by the dedup rate); the shingle frame is
    computed once and broadcast into both sides of the pair join.
    """
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sets = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        # corpus -> candidates first: the whole point of LSH pre-filtering
        .join(F.broadcast(cand_ids), "id", "left_semi")
        # parallelize shingle compute on small inputs (explicit count: AQE
        # would coalesce the tiny-by-bytes, heavy-by-CPU shuffle to 1 task)
        .repartition(df.sparkSession.sparkContext.defaultParallelism, F.col("id"))
        .select("id", shingles(F.col("_txt"), k).alias("sh"))
        # sets feeds BOTH broadcast sides of the pair join below; without a
        # persist the full corpus->candidate semi-join + shingle pass runs
        # twice (once per broadcast). The frame is bounded by the candidate
        # set, so caching it is safe at any corpus size, and Spark's
        # CacheManager resolves by analyzed plan, so repeated calls over the
        # same inputs share one entry instead of leaking.
        .persist()
    )
    out = (
        candidates.join(
            F.broadcast(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")),
            "id_a",
        )
        .join(
            F.broadcast(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .select("id_a", "id_b", "jaccard")
    )
    # threshold BEFORE materializing: the checkpoint below runs a full job,
    # so pruning first means sub-threshold pairs are never stored
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    # EAGER semantics (deliberate API contract): this call materializes the
    # bounded pair frame (one row per surviving candidate pair) via
    # localCheckpoint so the shingle cache can be released immediately
    # instead of stranding executor storage until session end — the
    # lazy-return alternative would leak one persisted frame per call site
    # that never re-invokes the same plan. Consequences callers should know:
    # the Spark job runs at call time even if the result is never used, and
    # lineage is cut (executor loss after the call cannot recompute the
    # result; re-run the verify pass instead).
    out = out.localCheckpoint(eager=True)
    sets.unpersist()
    return out


# -- SimHash ------------------------------------------------------------------


def simhash(c: Column | str, bits: int = 16, k: int = 3) -> Column:
    """Per-row SimHash over token shingles (no shuffle).

    bit_i(simhash) = 1 iff sum over shingles of (+1 / -1 for hash bit i) > 0.
    """
    c = F.col(c) if isinstance(c, str) else c
    hashes = F.transform(shingles(c, k), lambda s: md5_hash64(s))

    # Single fold producing all bit votes at once (one shingle pass per row).
    # bitwiseAND instead of shiftright: F.shiftright's int arg breaks py4j
    # conversion inside higher-order-function lambdas.
    def bit_votes(h: Column) -> Column:
        return F.array(
            *[
                F.when(h.bitwiseAND(F.lit(1 << i)) != 0, F.lit(1)).otherwise(F.lit(-1))
                for i in range(bits)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, b: a + b),
    )
    # Fold votes -> signature in ONE pass over the votes array: HOF
    # expressions are codegen-fallback (no common-subexpression elimination),
    # so referencing `votes` per bit would re-run the whole shingle fold.
    bit_weights = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    return F.aggregate(
        F.zip_with(
            votes,
            bit_weights,
            lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 16,
    max_hamming: int = 2,
    k: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Blocks on the top half of the simhash (near-dups almost always share it
    at max_hamming <= bits/4), turning the O(n^2) compare into a bucket join.
    """
    half = bits // 2
    sigs = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits, k).alias("sig")
    ).withColumn("block", F.shiftright("sig", half))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "hamming", F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming"
        )
    )


# -- embedding near-dup -------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold -> (id_a, id_b, cos_sim).

    Within-block pair similarities are computed by a NumPy GEMM per block
    (``applyInPandas``): one ``V @ V.T`` instead of an interpreted
    higher-order-function dot per pair. ``block_col`` is any coarse grouping
    (a label, an IVF centroid id); each block must fit one worker's memory.
    Without ``block_col`` everything lands in ONE block — only for small
    frames or as the oracle for the blocked variants. For the scale path
    with no natural block column, use :func:`embedding_neardup_pairs_lsh`,
    which blocks on random-projection buckets. To keep the single-block
    path from silently routing an arbitrarily large frame onto one worker
    (an O(n^2) matrix in one task's memory), it refuses above
    ``SINGLE_BLOCK_MAX_ROWS`` rows — the check is a bounded early-stop
    count, not a full scan.
    """
    import numpy as np
    import pandas as pd

    if block_col is None:
        n = df.limit(SINGLE_BLOCK_MAX_ROWS + 1).count()
        if n > SINGLE_BLOCK_MAX_ROWS:
            raise ValueError(
                f"embedding_neardup_pairs without block_col routes the whole "
                f"frame into one worker's memory; > {SINGLE_BLOCK_MAX_ROWS} "
                f"rows — use embedding_neardup_pairs_lsh (RP-LSH blocked) or "
                f"pass block_col"
            )

    base = with_l2_normalized(
        df, F.col(vec_col).cast("array<double>"), "v"
    ).select(
        F.col(id_col).alias("id"),
        "v",
        (F.col(block_col) if block_col else F.lit(0)).alias("blk"),
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        V = np.stack(pdf["v"].to_numpy())
        ids = pdf["id"].astype(str).to_numpy()
        S = V @ V.T  # one GEMM per block — the SIMD analogue
        ia, ib = np.triu_indices(n, 1)
        sims = S[ia, ib]
        keep = sims >= threshold
        out = pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cos_sim": sims[keep]}
        )
        swap = out["id_a"] > out["id_b"]  # canonical id_a < id_b
        out.loc[swap, ["id_a", "id_b"]] = out.loc[swap, ["id_b", "id_a"]].values
        return out

    # Explicit repartition: blocks are tiny in bytes but heavy in CPU; AQE
    # would coalesce the shuffle to one task.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        base.repartition(n_parts, "blk")
        .groupBy("blk")
        .applyInPandas(block_pairs, "id_a string, id_b string, cos_sim double")
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    dim: int,
    tables: int = 4,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Scale path: near-dup pairs blocked on random-projection LSH buckets.

    Candidate pairs are enumerated only within (table, bucket) groups —
    O(sum of bucket^2) work instead of O(n^2); near-identical vectors share
    all sign bits, so true near-dups land in the same bucket in (almost)
    every table. Pick ``bits`` ~ log2(n/target_bucket_size) so buckets stay
    worker-sized as n grows. A pair found in several tables is deduped by
    (id_a, id_b); cosine values for the same pair are GEMM-batch equal up to
    ulp, so first() is stable for any practical threshold.
    """
    from semadb_spark.operators.ann import rplsh_build

    base = with_l2_normalized(
        df, F.col(vec_col).cast("array<double>"), "__nv"
    ).select(
        F.col(id_col).cast("string").alias(id_col),
        "__nv",
    )
    idx = rplsh_build(base, "__nv", dim, id_col=id_col, tables=tables, bits=bits, seed=seed)
    blocked = idx.buckets.join(base, id_col).select(
        F.col(id_col).alias("id"),
        F.col("__nv").alias("v"),
        F.concat_ws("_", "table", "bucket").alias("blk"),
    )
    import numpy as np
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        V = np.stack(pdf["v"].to_numpy())
        ids = pdf["id"].astype(str).to_numpy()
        S = V @ V.T
        ia, ib = np.triu_indices(n, 1)
        sims = S[ia, ib]
        keep = sims >= threshold
        out = pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cos_sim": sims[keep]}
        )
        swap = out["id_a"] > out["id_b"]
        out.loc[swap, ["id_a", "id_b"]] = out.loc[swap, ["id_b", "id_a"]].values
        return out

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    pairs = (
        blocked.repartition(n_parts, "blk")
        .groupBy("blk")
        .applyInPandas(block_pairs, "id_a string, id_b string, cos_sim double")
    )
    return pairs.groupBy("id_a", "id_b").agg(F.first("cos_sim").alias("cos_sim"))


# -- dedup groups (connected components) --------------------------------------


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., SoCC'14): every node connects its
    strictly-larger neighbours to the minimum of its closed neighbourhood."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges large→small; every node connects its
    smaller-or-equal neighbours (and itself) to the neighbourhood minimum."""
    oriented = (
        edges.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
    relinked = (
        oriented.join(mins, "a")
        .filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    self_links = mins.select(F.col("a"), F.col("m").alias("b"))
    return relinked.unionByName(self_links).distinct()


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 60
) -> DataFrame:
    """Duplicate-group assignment: connected components over the candidate
    pair graph -> (id, comp) where ``comp`` is the component's minimum id —
    the canonical keeper a training pipeline retains.

    Alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): converges in O(log n)
    rounds regardless of component diameter — the planet-scale standard,
    replacing min-label propagation whose round count grows with graph
    diameter (a >max_iter duplicate chain silently returned split labels).
    Each round is two groupBy/join passes over the (pairs-sized) edge
    frame; the corpus itself is never touched. At the fixpoint every
    component is a star centred on its minimum id. Raises RuntimeError if
    ``max_iter`` rounds pass without a fixpoint (with the default 60 that
    would take a graph beyond ~2^60 nodes — i.e. it only fires on a bug).

    localCheckpoint (not persist) per round: iterative algorithms grow the
    logical plan every round, and re-analyzing the nested plan quickly
    dominates the actual work (round-2 bench: 23s -> ~2s at sf0.1).
    """
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    nodes = (
        e.select("a")
        .unionByName(e.select(F.col("b").alias("a")))
        .distinct()
        .localCheckpoint()
    )
    edges = e.distinct().localCheckpoint()
    prev_cnt = edges.count()
    for _ in range(max_iter):
        edges_new = _small_star(_large_star(edges)).localCheckpoint()
        cnt = edges_new.count()
        if cnt == prev_cnt and edges_new.exceptAll(edges).isEmpty():
            edges = edges_new
            break
        edges, prev_cnt = edges_new, cnt
    else:
        raise RuntimeError(
            f"connected_components did not reach a fixpoint in {max_iter} "
            "star rounds — this indicates a bug, not a deep graph"
        )
    # fixpoint edges are (member -> component min) stars; roots and any
    # nodes whose component collapsed early label themselves
    labels = edges.select(F.col("a").alias("id"), F.col("b").alias("comp"))
    roots = nodes.join(
        labels.select(F.col("id").alias("a")), "a", "left_anti"
    ).select(F.col("a").alias("id"), F.col("a").alias("comp"))
    return labels.unionByName(roots)
