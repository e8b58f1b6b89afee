"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016).

The pipeline's token counts (packing, chunking, Gopher rules) run on
whitespace tokens; a real LLM pipeline budgets in BPE tokens. This module
fits a merge table on the corpus and encodes documents with it, using the
architecture every production BPE trainer uses (GPT-2's included):

- **Fit never iterates over the corpus.** One Spark scan collapses the
  corpus to a ``(word, count)`` frequency table — bounded by ``min_count``
  and a deterministic ``max_word_rows`` cap (top rows by count, then word;
  an open web corpus has an unbounded tail of misspellings/URLs, and the
  cap is what makes the driver step safe at 100 TB). The merge loop then
  runs driver-side over THAT table: its cost is O(vocab · merges),
  independent of corpus size — iterating pair-counts over the raw corpus
  would be ``num_merges`` full scans for identical results, because pair
  statistics only depend on word frequencies.
- **Encode is the sanctioned Arrow path.** Applying a ranked merge table
  is an inherently iterative per-word procedure (merge the lowest-rank
  adjacent pair until none applies) that no Column/HOF expression tree can
  express; ``bpe_encode`` ships the merge ranks to executors inside an
  Arrow-batched ``mapInPandas`` kernel with a per-batch word cache (Zipf:
  a batch of documents repeats a tiny set of distinct words, so the
  per-word loop runs once per DISTINCT word, not once per occurrence).

Determinism: pair-count ties break on the lexicographically smallest pair,
so the same corpus always yields the same merge table in either the Spark
fit or the pure-Python reference twin (`_bpe_merges_py`, the test oracle).

End-of-word handling uses the classic ``</w>`` suffix marker on a word's
last symbol, so merges never cross word boundaries and round-tripping is
exact: ``"".join(tokens).replace("</w>", " ")`` restores the normalized
words.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_fit", "bpe_encode", "bpe_word_counts"]

_EOW = "</w>"


def bpe_word_counts(df: DataFrame, text_col: str, *, min_count: int = 2,
                    max_word_rows: int = 1_000_000,
                    lowercase: bool = True) -> DataFrame:
    """The fit's corpus pass: ``(word, count)`` for the whitespace
    vocabulary, pruned to ``count >= min_count`` and capped at
    ``max_word_rows`` rows (ordered by count desc, word asc — a
    deterministic head, compiled to ``TakeOrderedAndProject``). One
    explode + one groupBy; this is the ONLY part of the fit that touches
    the corpus."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_word_rows < 1:
        raise ValueError(f"max_word_rows must be >= 1, got {max_word_rows}")
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    toks = F.filter(F.split(text, "\\s+"), lambda w: w != "")
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_word_rows)
    )


def _bpe_merges_py(word_counts: list[tuple[str, int]],
                   num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency table (pure Python —
    doubles as the test oracle for the Spark-fed fit). Words start as
    character sequences with ``</w>`` appended to the final character;
    each round merges the most frequent adjacent symbol pair (ties: the
    lexicographically smallest pair) everywhere it occurs. Stops early
    when no pair occurs twice."""
    seqs: list[list[str]] = []
    freqs: list[int] = []
    for w, c in word_counts:
        if not w:
            continue
        chars = list(w)
        chars[-1] = chars[-1] + _EOW
        seqs.append(chars)
        freqs.append(c)

    def word_pairs(s):
        return Counter(zip(s, s[1:]))

    # incremental pair statistics (the learn_bpe trick): a full recount
    # per round is O(vocab·len) × merges; instead each round touches only
    # the words that CONTAIN the merged pair, via a pair -> word-ids index
    pairs: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (s, c) in enumerate(zip(seqs, freqs)):
        for p, k in word_pairs(s).items():
            pairs[p] += k * c
            where.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # every remaining pair is unique — merging it memorizes
        pair = best[0]
        joined = pair[0] + pair[1]
        for wi in list(where.get(pair, ())):
            s, c = seqs[wi], freqs[wi]
            before = word_pairs(s)
            i = 0
            while i < len(s) - 1:
                if s[i] == pair[0] and s[i + 1] == pair[1]:
                    s[i : i + 2] = [joined]
                else:
                    i += 1
            after = word_pairs(s)
            for p in before.keys() | after.keys():
                delta = after.get(p, 0) - before.get(p, 0)
                if delta:
                    pairs[p] += delta * c
                    if pairs[p] <= 0:
                        del pairs[p]
                if after.get(p, 0):
                    where.setdefault(p, set()).add(wi)
                elif p in where:
                    where[p].discard(wi)
        where.pop(pair, None)
        pairs.pop(pair, None)
        merges.append(pair)
    return merges


def bpe_fit(df: DataFrame, text_col: str, *, num_merges: int = 200,
            min_count: int = 2, max_word_rows: int = 1_000_000,
            lowercase: bool = True) -> list[tuple[str, str]]:
    """Fit a BPE merge table on the corpus: one Spark scan to the bounded
    word-frequency table (:func:`bpe_word_counts`), then the driver-side
    merge loop (:func:`_bpe_merges_py` — O(vocab · merges), corpus-size
    independent). Returns the ranked merge list for :func:`bpe_encode`."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    wc = bpe_word_counts(
        df, text_col, min_count=min_count, max_word_rows=max_word_rows,
        lowercase=lowercase,
    )
    rows = [(r["word"], int(r["count"])) for r in wc.collect()]
    return _bpe_merges_py(rows, num_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply the ranked merges to one word: repeatedly merge the
    lowest-rank adjacent pair until no mergeable pair remains — the
    standard BPE inference loop (identical to the trainer's replay, so
    training-set words encode to their final trainer segmentation)."""
    if not word:
        return []
    s = list(word)
    s[-1] = s[-1] + _EOW
    while len(s) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def bpe_encode(df: DataFrame, text_col: str, merges, *,
               out_col: str = "bpe_tokens", lowercase: bool = True,
               keep_cols=None) -> DataFrame:
    """Encode each document with a fitted merge table →
    ``(keep_cols..., out_col: array<string>, n_bpe_tokens: long)``.
    ``keep_cols`` defaults to every input column.

    Arrow-batched ``mapInPandas`` (the per-word merge loop is genuinely
    inexpressible as Column ops — see module docstring); the merge ranks
    ride the closure (a merge table is KBs), and a PER-PARTITION dict
    caches each distinct word's segmentation so the loop cost is per
    distinct word (partition scope beats per-batch for hit rate; Zipf
    means the head dominates every batch). The cache is size-capped —
    when an open-web tail pushes past the cap it is dropped wholesale
    (the Zipf head repopulates in one batch; LRU bookkeeping would cost
    more than re-segmenting the tail). Scale shape: embarrassingly
    parallel, zero shuffles, bounded worker memory."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    if keep_cols is None:
        keep_cols = list(df.columns)
    for c in (out_col, "n_bpe_tokens"):
        if c in keep_cols:
            raise ValueError(f"output column {c!r} shadows an input column")
    scan_cols = list(keep_cols)
    if text_col not in scan_cols:
        scan_cols.append(text_col)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keep_cols).schema.fields
    )
    out_schema = f"{fields}, {out_col} array<string>, n_bpe_tokens long"

    max_cache_words = 1_000_000  # ~tens of MB worst case per worker

    def encode(batches):
        cache: dict[str, list[str]] = {}

        def enc_text(text):
            if text is None:
                return []
            toks: list[str] = []
            for w in (text.lower() if lowercase else text).split():
                seg = cache.get(w)
                if seg is None:
                    if len(cache) >= max_cache_words:
                        cache.clear()
                    seg = _encode_word(w, ranks)
                    cache[w] = seg
                toks.extend(seg)
            return toks

        for pdf in batches:
            encoded = pdf[text_col].map(enc_text)
            out = pdf[keep_cols].copy()
            out[out_col] = encoded
            out["n_bpe_tokens"] = encoded.map(len)
            yield out

    return df.select(*scan_cols).mapInPandas(encode, out_schema)
