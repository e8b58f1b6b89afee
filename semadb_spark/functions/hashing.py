"""Engine-portable hashing primitives.

MinHash / SimHash / fingerprinting need hash functions that the DuckDB
correctness oracle can reproduce bit-for-bit. Spark's ``hash()``/``xxhash64``
and DuckDB's ``hash()`` are different algorithms, so we standardize on
**md5-prefix hashing**: ``h_seed(s) = int64(first 15 hex chars of
md5(seed || ':' || s))`` — a 60-bit positive value computable identically in
both engines:

- Spark : ``conv(substring(md5(concat(seed, ':', s)), 1, 15), 16, 10)::long``
- DuckDB: ``('0x' || substr(md5(seed || ':' || s), 1, 15))::BIGINT``

md5 is ~3x slower than xxhash64 but still JVM-side / vectorized; for the
non-oracle hot path callers may swap in ``F.xxhash64`` freely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_CHARS = 15  # 60 bits, always fits a signed int64


def md5_hash64(c: Column | str, seed: int | str | None = None) -> Column:
    """Portable 60-bit hash of a string column (optionally seeded)."""
    c = F.col(c) if isinstance(c, str) else c
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, HASH_HEX_CHARS), 16, 10).cast("long")


def md5_hash64_py(s: str, seed: int | str | None = None) -> int:
    """Driver-side twin of :func:`md5_hash64` — same 60-bit value, so a
    query can compute partition keys (e.g. term buckets) for literal
    strings without a Spark job."""
    import hashlib

    if seed is not None:
        s = f"{seed}:{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:HASH_HEX_CHARS], 16)


def duckdb_md5_hash64_sql(col_sql: str, seed: int | str | None = None) -> str:
    """Matching DuckDB SQL expression for :func:`md5_hash64`."""
    if seed is not None:
        col_sql = f"('{seed}:' || {col_sql})"
    return f"('0x' || substr(md5({col_sql}), 1, {HASH_HEX_CHARS}))::BIGINT"


def md5_bit(c: Column, bit: int, seed: int | str | None = None) -> Column:
    """Bit ``bit`` (0-based from LSB, < 60) of the portable hash — used by
    SimHash."""
    return F.shiftright(md5_hash64(c, seed), bit).bitwiseAND(F.lit(1))


def md5_hash_pair(hex_col: Column) -> Column:
    """(h1, h2) struct from one md5 hex digest: chars 1-15 and 17-31 as
    independent 60-bit values. Feeds Kirsch-Mitzenmacher double hashing
    (h_i = h1 + i*h2), giving a k-hash family from a single md5 — 8x fewer
    digests than per-seed hashing, still DuckDB-reproducible."""
    return F.struct(
        F.conv(F.substring(hex_col, 1, HASH_HEX_CHARS), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(hex_col, 17, HASH_HEX_CHARS), 16, 10).cast("long").alias("h2"),
    )


def duckdb_md5_pair_sql(part: int, md5_sql: str) -> str:
    """DuckDB SQL for h1 (part=1) / h2 (part=2) of :func:`md5_hash_pair`."""
    start = 1 if part == 1 else 17
    return f"('0x' || substr({md5_sql}, {start}, {HASH_HEX_CHARS}))::BIGINT"
