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

from semadb_spark.functions.analyzer import tokenize
from semadb_spark.functions.distances import l2_normalize
from semadb_spark.functions.hashing import md5_hash64


def shingles(c: Column | str, k: int = 3) -> Column:
    """Distinct token k-shingles (word n-grams joined by space); documents
    shorter than k tokens collapse to one whole-document shingle."""
    c = F.col(c) if isinstance(c, str) else c
    toks = tokenize(c, remove_stopwords=False)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(
        F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))
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


# -- MinHash + LSH ------------------------------------------------------------


def _seeded_hash(seed: int):
    # NB: must return a SINGLE-arg lambda — F.transform treats a two-arg
    # lambda (even via default args) as (element, index).
    return lambda s: md5_hash64(s, seed)


def minhash_signature(c: Column, num_hashes: int, k: int = 3) -> list[Column]:
    """Per-row MinHash signature columns h0..h{n-1} (min of seeded hashes over
    the shingle set) — computed without any shuffle."""
    sh = shingles(c, k)
    return [
        F.array_min(F.transform(sh, _seeded_hash(seed))).alias(f"h{seed}")
        for seed in range(num_hashes)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs -> (id_a, id_b).

    Pipeline: shingle -> minhash (rows stay put) -> band keys -> explode bands
    (xB rows) -> self-join on (band, key). Only same-bucket rows meet in the
    join, so shuffle volume is O(corpus x bands), not O(n^2).
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("id"), *minhash_signature(F.col(text_col), num_hashes, k)
    )
    band_keys = [
        F.concat_ws(
            "_", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sigs.select("id", *band_keys).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
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

    -> (id_a, id_b, jaccard). The shingle-set frame joins in twice; candidate
    sets are small post-LSH, so both joins broadcast at typical dedup rates.
    """
    sets = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    )
    out = (
        candidates.join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .select("id_a", "id_b", "jaccard")
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


# -- SimHash ------------------------------------------------------------------


def simhash(c: Column | str, bits: int = 16, k: int = 3) -> Column:
    """Per-row SimHash over token shingles (no shuffle).

    bit_i(simhash) = 1 iff sum over shingles of (+1 / -1 for hash bit i) > 0.
    """
    c = F.col(c) if isinstance(c, str) else c
    hashes = F.transform(shingles(c, k), lambda s: md5_hash64(s))

    def _vote(i: int):
        mask = 1 << i
        # bitwiseAND instead of shiftright: F.shiftright's int arg breaks
        # py4j conversion inside higher-order-function lambdas.
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    acc = F.lit(0).cast("long")
    for i in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote(i))
        acc = acc + F.when(vote > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


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

    With ``block_col`` (e.g. a cluster/LSH bucket id) the self-join is
    per-block; without it this is a full O(n^2) cross join — only for small
    frames or as the oracle for the blocked variant.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        l2_normalize(F.col(vec_col).cast("array<double>")).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = (F.col("a.blk") == F.col("b.blk")) & cond
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, cond)
        .withColumn("cos_sim", dot)
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
    )
