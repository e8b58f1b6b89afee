"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, zero shuffles until the caller
aggregates) with engine-portable semantics for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from semadb_spark.functions.analyzer import ENGLISH_STOPWORDS, tokenize

# Marker function words per language for the n-gram/stopword-hit heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "that", "for", "with"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que"),
    "fr": ("le", "la", "les", "est", "une", "dans", "que", "pour"),
}


def token_count(c: Column | str) -> Column:
    """Whitespace/punctuation token count (stopwords kept)."""
    return F.size(tokenize(c, remove_stopwords=False))


def detect_language(c: Column | str) -> Column:
    """Stopword-hit language heuristic -> 'de'/'en'/'es'/'fr' or 'und'.

    Score per language = distinct marker words present; highest wins, ties
    broken by language code ascending; zero hits -> 'und'.
    """
    c = F.col(c) if isinstance(c, str) else c
    toks = F.array_distinct(tokenize(c, remove_stopwords=False))
    langs = sorted(LANG_MARKERS)
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS[lang]]))
        )
        for lang in langs
    }
    # chained argmax: first language (ascending) whose score >= all later ones
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = langs[langs.index(lang) + 1 :]
        cond = F.lit(True)
        for other in later:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    all_zero = F.lit(True)
    for lang in langs:
        all_zero = all_zero & (scores[lang] == 0)
    return F.when(all_zero, F.lit("und")).otherwise(expr)


def quality_features(c: Column | str) -> dict[str, Column]:
    """Quality signals: lengths, mean token length, stopword ratio, digit and
    punctuation character ratios."""
    c = F.col(c) if isinstance(c, str) else c
    toks = tokenize(c, remove_stopwords=False)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    alnum_chars = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    digit_chars = F.length(F.regexp_replace(c, "[^0-9]", ""))
    stop = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    safe_tok = F.when(n_tok > 0, n_tok.cast("double")).otherwise(F.lit(1.0))
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": F.when(n_tok > 0, alnum_chars.cast("double") / safe_tok).otherwise(F.lit(0.0)),
        "stopword_ratio": n_stop.cast("double") / safe_tok,
        "digit_ratio": digit_chars.cast("double") / safe_chars,
        "punct_ratio": (n_chars - alnum_chars - F.length(F.regexp_replace(c, "[^ ]", ""))).cast("double") / safe_chars,
    }


def quality_score(c: Column | str) -> Column:
    """Scalar quality score in [0,1]: rewards mid-length docs with healthy
    stopword ratios and low digit noise (heuristic in the C4/Gopher-rule
    spirit, simplified to stay engine-portable)."""
    f = quality_features(c)
    len_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_ok = F.when((f["stopword_ratio"] >= 0.05) & (f["stopword_ratio"] <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    digit_ok = F.lit(1.0) - F.least(f["digit_ratio"] * 2, F.lit(1.0))
    return (len_ok + stop_ok + digit_ok) / 3


def fingerprint(c: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (classic key-collision / clustering fingerprint)."""
    toks = F.array_sort(F.array_distinct(tokenize(c, remove_stopwords=False)))
    return F.md5(F.concat_ws(" ", toks))


def let_bound(bound: Column, body) -> Column:
    """Let-bind ``bound`` so ``body(var)`` evaluates it ONCE per row no
    matter how many times the body references it: HOF lambdas get no CSE
    and no codegen, so referencing a non-trivial expression N times inside
    one output column costs N full evaluations (guide §1.2 step 2). The
    1-element-array + transform idiom from :func:`~semadb_spark.operators.
    dedup.shingles`; bind a struct to share several subexpressions."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def _bigrams(toks: Column) -> Column:
    """ARRAY<STRING> tokens -> ARRAY<STRING> of space-joined word bigrams.

    Guarded for <2 tokens: Spark's ``sequence(0, -1)`` counts *down*, so the
    naive form would fabricate bigrams for single-token docs.
    """
    mk = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    return F.when(F.size(toks) >= 2, mk).otherwise(
        F.array().cast("array<string>")
    )


def _max_run(sorted_arr: Column) -> Column:
    """Occurrence count of the most frequent element of a SORTED array =
    its longest equal-run. One linear JVM fold per row (no shuffle)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_signals(df, text_col: str, id_col: str = "_id"):
    """Gopher-style repetition quality signals, one row per document:

    - ``n_tokens``
    - ``dup_token_frac``  — 1 - distinct/total tokens (vocabulary collapse)
    - ``top_token_frac``  — occurrences of the most frequent token / total
    - ``top_bigram_frac`` — occurrences of the most frequent word bigram /
      total bigrams (0.0 when the doc has < 2 tokens)

    Repetition filters in the Gopher/MassiveText data-prep recipe (Rae et
    al. 2021, table A1) — the standard pre-training cut for boilerplate and
    degenerate generations.

    Scale shape: **zero shuffles.** Every signal is per-document, so it is
    computed per-row with array expressions: distinct count via
    ``array_distinct``, mode count as the longest run of the sorted gram
    array (``array_sort`` + one linear fold). A 100 TB corpus is a pure
    embarrassingly-parallel scan — no gram explosion crossing the wire
    (the earlier explode+groupBy shape shuffled every token of the corpus
    twice). Per-doc cost is O(n log n) in the doc's own length, not the
    O(n^2) of naive per-token HOF counting. Stopwords kept: repetition of
    function words is exactly what these signals measure.
    """
    toks = tokenize(text_col, remove_stopwords=False)
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_rid"), toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    # bigram array materialized as an ATTRIBUTE before the stats projection:
    # referencing the transform expression in two output columns (size +
    # max-run) evaluated it twice per row — HOF lambdas get no CSE and no
    # codegen, so that was two full bigram constructions per document
    # (same no-CSE discipline as _gram_rows' __norm; guide §1.2 step 2).
    # CollapseProject keeps the staging projection because the producer is
    # non-cheap and referenced twice. Values unchanged.
    staged = base.withColumn("_bg", _bigrams(F.col("toks")))
    stats = staged.select(
        "_rid",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        _max_run(F.array_sort("toks")).alias("top_c"),
        F.size("_bg").cast("long").alias("nb"),
        _max_run(F.array_sort("_bg")).alias("top_b"),
    )
    n = F.col("n_tokens").cast("double")
    return stats.select(
        F.col("_rid").alias(id_col),
        F.col("n_tokens"),
        ((n - F.col("n_distinct")) / n).alias("dup_token_frac"),
        (F.col("top_c") / n).alias("top_token_frac"),
        F.when(
            F.col("nb") > 0, F.col("top_b").cast("double") / F.col("nb")
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


# PII redaction patterns. Conservative regex subset (char classes,
# bounded repeats, alternation — no backrefs/lookaround) so Java regex
# (Spark), RE2 (DuckDB), and Python `re` all match byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # URLs first: an email-shaped userinfo inside a URL belongs to the URL
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # phone-ish: optional +country, then >= 7 digits among separators
    (r"\+?[0-9][0-9().\-\s]{5,}[0-9]", "<PHONE>"),
)


def pii_scrub(c: Column | str) -> Column:
    """Redact emails, URLs, and phone-like digit runs with typed
    placeholders — the standard pre-training PII scrub pass (C4-style).

    Pure Column expressions (sequential JVM ``regexp_replace``), so the
    scrub runs inside whole-stage codegen with zero shuffles at any corpus
    size.
    """
    c = F.col(c) if isinstance(c, str) else c
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# C4's line-level blocklist terms (Raffel et al. 2020 §2.2): lines carrying
# these are web boilerplate, not prose. Lowercase substrings.
LINE_BLOCKLIST: tuple[str, ...] = ("javascript", "cookie policy", "lorem ipsum")


def line_filter(
    c: Column | str,
    min_words: int = 3,
    blocklist: tuple[str, ...] = LINE_BLOCKLIST,
    require_terminal: bool = True,
) -> dict[str, Column]:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, public
    heuristics) -> {"cleaned", "n_lines", "n_kept"}.

    A line survives iff it ends in a terminal punctuation mark
    (``. ! ? "``; waived when ``require_terminal=False`` — transcript /
    keyword corpora have no sentence punctuation and would zero out),
    carries at least ``min_words`` whitespace-separated words, and
    contains no blocklist phrase (case-insensitive). The
    survivors re-join with newlines; n_lines/n_kept feed page-level
    drop rules (C4 discards pages with too few surviving sentences).

    Pure higher-order Column expressions (filter/size/array_join over the
    split lines), so the pass runs inside whole-stage codegen with zero
    shuffles at any corpus size — the 100 TB shape for a per-document
    cleaning operator.
    """
    c = F.col(c) if isinstance(c, str) else c
    lines = F.split(c, "\n")

    def keep(x: Column) -> Column:
        t = F.trim(x)
        ends = t.rlike('[.!?"]$') if require_terminal else F.lit(True)
        words = F.size(F.filter(F.split(t, " +"), lambda w: w != ""))
        ok = ends & (words >= F.lit(min_words))
        low = F.lower(x)
        for term in blocklist:
            ok = ok & ~low.contains(term)
        return ok

    kept = F.filter(lines, keep)
    return {
        "cleaned": F.array_join(kept, "\n"),
        "n_lines": F.size(lines),
        "n_kept": F.size(kept),
        # the surviving-lines ARRAY itself: consumers needing several of
        # the above should materialize this once (withColumn) and derive
        # the rest from the attribute — selecting "cleaned" and "n_kept"
        # as separate expressions re-runs the whole line filter per column
        "kept_lines": kept,
    }


# Gopher quality-filter function words (Rae et al. 2021, table A1 rule set:
# "contains at least 2 of ..."): the published list.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_flags(
    c: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> dict[str, Column]:
    """The Gopher repetition-free quality rules (Rae et al. 2021 §A.1.1,
    public) as pure Column expressions -> per-rule boolean flags, the
    measured values, and the conjunctive ``keep``.

    Rules: whitespace word count within bounds; mean word length within
    [3, 10]; symbol-to-word ratio (# and ellipsis) <= 0.1; <= 90% of
    lines starting with a bullet; <= 30% ending with an ellipsis; >= 80%
    of words containing an alphabetic character; >= 2 distinct hits from
    the published stop-list. Zero shuffles — per-document codegen at any
    corpus size, like :func:`line_filter`.
    """
    c = F.col(c) if isinstance(c, str) else c
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wlen = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double") / safe_n
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3 + (F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit(""))))
    symbol_ratio = (n_hash + n_ell).cast("double") / safe_n
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(
        F.filter(
            lines,
            lambda x: F.trim(x).rlike(r"^[-*•]"),
        )
    ).cast("double") / n_lines
    ellipsis_frac = F.size(
        F.filter(
            lines,
            lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"),
        )
    ).cast("double") / n_lines
    alpha_frac = F.size(
        F.filter(words, lambda w: F.lower(w).rlike("[a-z]"))
    ).cast("double") / safe_n
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tokenize(c, remove_stopwords=False)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "n_words": n_words,
        "mean_word_len": mean_wlen,
        "symbol_ratio": symbol_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stop_hits": stop_hits,
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mean_wlen >= min_mean_word_len)
        & (mean_wlen <= max_mean_word_len),
        "symbol_ratio_ok": symbol_ratio <= max_symbol_ratio,
        "bullet_ok": bullet_frac <= max_bullet_frac,
        "ellipsis_ok": ellipsis_frac <= max_ellipsis_frac,
        "alpha_ok": alpha_frac >= min_alpha_word_frac,
        "stopword_ok": stop_hits >= min_stop_hits,
    }
    # ``keep`` as a single LET-BOUND expression: the naive conjunction of
    # the seven flag expressions re-evaluates ``words`` (a whitespace split
    # of the whole document) four times and ``lines`` twice per row — HOF
    # bodies get no CSE (guide §1.2 step 2; this predicate is the hot path
    # of curate_corpus at 10M docs). Each sub-rule below is the SAME
    # expression as its flags[...] twin, reading the split arrays from the
    # lambda variable instead; the conjunction order is identical.
    def _keep(e):
        w, li = e["w"], e["l"]
        nw = F.size(w)
        safe = F.greatest(nw, F.lit(1))
        mean = F.aggregate(
            w, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double") / safe
        sym = (n_hash + n_ell).cast("double") / safe
        nl = F.greatest(F.size(li), F.lit(1))
        bull = F.size(
            F.filter(li, lambda x: F.trim(x).rlike(r"^[-*•]"))
        ).cast("double") / nl
        ell = F.size(
            F.filter(li, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))
        ).cast("double") / nl
        alpha = F.size(
            F.filter(w, lambda t: F.lower(t).rlike("[a-z]"))
        ).cast("double") / safe
        return (
            F.lit(True)
            & ((nw >= min_words) & (nw <= max_words))
            & ((mean >= min_mean_word_len) & (mean <= max_mean_word_len))
            & (sym <= max_symbol_ratio)
            & (bull <= max_bullet_frac)
            & (ell <= max_ellipsis_frac)
            & (alpha >= min_alpha_word_frac)
            & (stop_hits >= min_stop_hits)
        )

    flags["keep"] = let_bound(
        F.struct(words.alias("w"), lines.alias("l")), _keep
    )
    return flags


# -- URL analysis (CCNet / RefinedWeb-style provenance features) -------------
#
# Training-data pipelines filter and deduplicate by URL before they ever
# touch page text (CCNet partitions by domain; RefinedWeb's first stage is
# URL filtering). These are pure Column expressions — zero shuffles, engine-
# portable regexes (same semantics in Java regex and RE2: no-match
# regexp_extract returns '') — so Catalyst keeps them inside the scan's
# codegen stage. The registered-domain heuristic is last-two-labels: the
# public-suffix list is a moving external artifact, so ccTLD second-level
# registries (e.g. .co.uk) group at the ccTLD — documented, deterministic,
# and oracle-checkable.

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = "://(?:[^/?#@]*@)?([^/?#]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"
_PARAM_RE = "[^&=]+=[^&]*"
_IP_RE = "^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def url_features(c: Column | str) -> dict[str, Column]:
    """Decompose an absolute URL column into provenance features:
    scheme/host/port/path plus depth, query-param count, last-two-label
    registered domain, IP-literal flag, and a ``utm_`` tracking flag.
    Userinfo is stripped from the authority; '' (not NULL) marks absent
    parts, matching regexp_extract's no-match value in both engines."""
    c = F.col(c) if isinstance(c, str) else c
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    hostport = F.regexp_extract(c, _HOSTPORT_RE, 1)
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.nullif(
        F.regexp_extract(hostport, ":([0-9]+)$", 1), F.lit("")
    ).cast("int")
    path = F.regexp_extract(c, _PATH_RE, 1)
    path_depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    query = F.regexp_extract(c, _QUERY_RE, 1)
    n_params = F.size(F.regexp_extract_all(query, F.lit(_PARAM_RE), 0))
    is_ip = host.rlike(_IP_RE)
    reg_domain = F.when(is_ip | ~host.contains("."), host).otherwise(
        F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    )
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "path_depth": path_depth,
        "query": query,
        "n_query_params": n_params,
        "registered_domain": reg_domain,
        "is_ip_host": is_ip,
        "has_tracking_params": c.rlike("[?&]utm_[a-zA-Z]+="),
    }


def normalize_url(c: Column | str) -> Column:
    """Canonical URL for exact URL-level dedup: lowercased scheme + host,
    default port stripped (http:80 / https:443 / ftp:21), empty path
    becomes '/', query kept verbatim, fragment dropped. Rows without a
    scheme://host shape normalize to NULL (not comparable)."""
    c = F.col(c) if isinstance(c, str) else c
    f = url_features(c)
    keep_port = f["port"].isNotNull()
    for sch, dp in sorted(_DEFAULT_PORTS.items()):
        keep_port = keep_port & ~(
            (f["scheme"] == sch) & (f["port"] == int(dp))
        )
    out = F.concat(
        f["scheme"], F.lit("://"), f["host"],
        F.when(keep_port, F.concat(F.lit(":"), f["port"].cast("string"))
               ).otherwise(F.lit("")),
        F.when(f["path"] == "", F.lit("/")).otherwise(f["path"]),
        F.when(f["query"] != "", F.concat(F.lit("?"), f["query"])
               ).otherwise(F.lit("")),
    )
    return F.when((f["scheme"] != "") & (f["host"] != ""), out)


def host_stats(df, url_col: str):
    """Per-registered-domain corpus stats: page count, distinct hosts,
    tracking-URL count, mean path depth. One groupBy on the domain — the
    CCNet shard-by-domain shape, scale-safe at any corpus size (domain
    cardinality is orders of magnitude below page count; a pathological
    single-domain crawl skews one reducer, which AQE splits)."""
    f = url_features(url_col)
    return (
        df.select(
            f["registered_domain"].alias("registered_domain"),
            f["host"].alias("host"),
            f["path_depth"].alias("path_depth"),
            f["has_tracking_params"].cast("int").alias("trk"),
        )
        .where(F.col("registered_domain") != "")
        .groupBy("registered_domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("trk").alias("n_tracking"),
            F.avg("path_depth").alias("mean_path_depth"),
        )
    )


# -- Encoding quality (mojibake / control-char / entropy signals) ------------

# UTF-8-decoded-as-Latin-1 artifacts: curly quote, double quote, en dash,
# ellipsis, accented vowels, NBSP. Built programmatically (the Latin-1
# renderings contain C1 control characters that must not appear as source
# literals): each marker is the mojibake spelling of one common char.
MOJIBAKE_MARKERS: tuple[str, ...] = tuple(
    ch.encode("utf-8").decode("latin-1")
    for ch in "\u2019\u201c\u2013\u2026\u00e9\u00fc\u00f1\u00a0"
)

_CONTROL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def _count_occurrences(c: Column, marker: str) -> Column:
    return (F.length(c) - F.length(F.replace(c, F.lit(marker)))) / len(marker)


def encoding_signals(c: Column | str) -> dict[str, Column]:
    """Encoding-health signals per document: U+FFFD replacement-char count,
    control-char ratio (tab/newline/CR excluded — legitimate layout),
    non-ASCII ratio, mojibake marker hits, and a boolean suspect flag.
    All counting is length-difference arithmetic on JVM strings — zero
    shuffles, no UDFs, stays inside scan codegen."""
    c = F.col(c) if isinstance(c, str) else c
    n = F.length(c)
    safe_n = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    n_repl = n - F.length(F.replace(c, F.lit("\ufffd")))
    n_ctrl = n - F.length(F.regexp_replace(c, _CONTROL_CLASS, ""))
    n_non_ascii = n - F.length(F.regexp_replace(c, "[^\\x00-\\x7f]", ""))
    hits = None
    for m in MOJIBAKE_MARKERS:
        term = _count_occurrences(c, m)
        hits = term if hits is None else hits + term
    hits = hits.cast("long")
    return {
        "n_replacement": n_repl.cast("long"),
        "control_ratio": n_ctrl.cast("double") / safe_n,
        "non_ascii_ratio": n_non_ascii.cast("double") / safe_n,
        "mojibake_hits": hits,
        "encoding_suspect": (n_repl > 0) | (hits > 0)
        | (n_ctrl.cast("double") / safe_n > 0.01),
    }


# four named character classes for the entropy partition; "other" is the
# complement, so the five-way split is exhaustive by construction
_ENTROPY_CLASSES: tuple[tuple[str, str], ...] = (
    ("lower", "[a-z]"),
    ("upper", "[A-Z]"),
    ("digit", "[0-9]"),
    ("space", "[ \\t\\n\\r]"),
)


def char_class_entropy(c: Column | str) -> Column:
    """Shannon entropy (bits, in [0, log2 5]) of the five-way character
    class distribution lower/upper/digit/whitespace/other. Degenerate
    streams (base64 blobs, digit dumps, whitespace runs) score near 0;
    prose sits around 1.2-1.8 — a cheap screen for non-linguistic content
    that needs no tokenizer and no shuffle."""
    import math

    c = F.col(c) if isinstance(c, str) else c
    n = F.length(c)
    counts = []
    covered = None
    for _, cls in _ENTROPY_CLASSES:
        cnt = n - F.length(F.regexp_replace(c, cls, ""))
        counts.append(cnt)
        covered = cnt if covered is None else covered + cnt
    counts.append(n - covered)
    safe_n = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    ent = F.lit(0.0)
    for cnt in counts:
        p = cnt.cast("double") / safe_n
        ent = ent + F.when(cnt > 0, -p * F.log(p)).otherwise(F.lit(0.0))
    return ent / math.log(2.0)


# -- Character n-gram language model (CCNet-style perplexity proxy) ----------


def _gram_rows(df, text_col: str, k: int, extra=(), unit: str = "char"):
    """(extra..., gram) rows: normalization materialized ONCE per row
    before the per-index loop — inlining the regexp/split into the
    transform lambda re-evaluates it for EVERY gram (no CSE inside
    lambda bodies), turning an O(len·k) pass into O(len²).

    ``unit="char"``: k-char substrings of the lowercased,
    whitespace-collapsed text. ``unit="word"``: k-word shingles
    (space-joined) of the lowercased whitespace-tokenized text — the
    CCNet/KenLM-style unit."""
    if unit == "char":
        norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
        grams = _char_grams_attr("__norm", k)
    elif unit == "word":
        norm = F.filter(
            F.split(F.lower(F.col(text_col)), "\\s+"), lambda w: w != ""
        )
        grams = _word_grams_attr("__norm", k)
    else:
        raise ValueError(f"unit must be 'char' or 'word', got {unit!r}")
    return (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("__norm", norm)
        .select(*extra, F.explode(grams).alias("gram"))
    )


def _char_grams_attr(attr: str, k: int) -> Column:
    """ARRAY<STRING> of all k-char substrings of an already-normalized
    ATTRIBUTE column (lowercase + collapsed whitespace materialized by
    the caller, e.g. ``_gram_rows``' ``__norm`` — O(1) per-element access
    inside the lambda; see the no-CSE note there). Guarded for texts
    shorter than k (Spark's sequence() counts DOWN on a negative span)."""
    t = F.col(attr)
    mk = F.transform(
        F.sequence(F.lit(1), F.length(t) - (k - 1)),
        lambda i: F.substring(t, i, k),
    )
    return F.when(F.length(t) >= k, mk).otherwise(
        F.array().cast("array<string>")
    )


def _word_grams_attr(attr: str, k: int) -> Column:
    """ARRAY<STRING> of all k-word shingles (space-joined) of an
    already-tokenized ATTRIBUTE column (array<string> of lowercase words
    materialized by the caller — same no-CSE discipline as
    ``_char_grams_attr``). Guarded for documents shorter than k words."""
    w = F.col(attr)
    n = F.size(w)
    mk = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(w, i, k), " "),
    )
    return F.when(n >= k, mk).otherwise(F.array().cast("array<string>"))


# Word-unit models can be corpus-sized (a web-scale word 5-gram table is
# GBs); past this row count the model/prefix join falls back from
# broadcast to a shuffle join. ~500k rows of short strings + a double is
# ~tens of MB — the conventional broadcast comfort zone.
_LM_BROADCAST_ROWS = 500_000


def _maybe_broadcast(frame, max_rows):
    """(frame-or-broadcast(frame), did_broadcast). ``max_rows=None`` =
    broadcast unconditionally (the char-unit case, bounded by
    construction); otherwise one count() decides — a cheap extra job at
    fit time, never in the per-query path."""
    if max_rows is None:
        return F.broadcast(frame), True
    if frame.count() <= max_rows:
        return F.broadcast(frame), True
    return frame, False


def _lm_guard_rows(unit: str, max_broadcast_rows):
    if max_broadcast_rows is not None:
        return int(max_broadcast_rows)
    # char n-gram space is ≤ |alphabet|^n, naturally tiny; word space is
    # unbounded and MUST be guarded by default
    return None if unit == "char" else _LM_BROADCAST_ROWS


def ngram_lm_fit(df, text_col: str, *, n: int = 3, min_count: int = 2,
                 unit: str = "char", max_broadcast_rows: int | None = None):
    """Fit a conditional n-gram model over the corpus: one row per
    surviving gram with ``logp = ln(count(gram) / count(prefix))`` where
    prefix is the gram's first n-1 units. The classic cheap
    language-model quality proxy — ``unit="char"`` (default trigram)
    captures "does this look like language X" with no external model
    artifact; ``unit="word"`` is the CCNet/KenLM-style filter (word
    5-gram in the paper; word grams are space-joined shingles of the
    lowercased whitespace tokenization).

    Scale shape: two explode+groupBy passes over the corpus (gram and
    prefix counts) joined on the prefix — fit is a one-time batch job;
    ``min_count`` bounds the model to grams with real support. The
    prefix join broadcasts only while the prefix table is small: char
    space is ≤ |alphabet|ⁿ (always broadcast); word space is unbounded,
    so past ``max_broadcast_rows`` (default ``_LM_BROADCAST_ROWS``) the
    join falls back to a shuffle join — at 100 TB a word model is
    corpus-sized and broadcasting it would OOM every executor.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    grams = _gram_rows(df, text_col, n, unit=unit)
    cnt_n = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c_gram"))
    cnt_p = (
        _gram_rows(df, text_col, n - 1, unit=unit)
        .withColumnRenamed("gram", "prefix")
        .groupBy("prefix").agg(F.count(F.lit(1)).alias("c_prefix"))
    )
    cnt_p, _ = _maybe_broadcast(cnt_p, _lm_guard_rows(unit, max_broadcast_rows))
    if unit == "char":
        prefix = F.substring("gram", 1, n - 1)
    else:
        # words contain no spaces post-tokenization, so the prefix is the
        # gram minus its last space-joined word
        prefix = F.array_join(F.slice(F.split(F.col("gram"), " "), 1, n - 1), " ")
    return (
        cnt_n.filter(F.col("c_gram") >= min_count)
        .withColumn("prefix", prefix)
        .join(cnt_p, "prefix")
        .select(
            "gram",
            F.log(F.col("c_gram").cast("double") / F.col("c_prefix").cast("double")).alias("logp"),
        )
    )


def ngram_lm_score(df, text_col: str, model, *, id_col: str = "_id",
                   n: int = 3, oov_logp: float = -16.0, unit: str = "char",
                   max_broadcast_rows: int | None = None):
    """Score each document against a fitted model: mean conditional
    log-probability per gram (unseen grams get ``oov_logp``) and the
    derived perplexity ``exp(-avg_logp)``. Degenerate/wrong-language
    text scores high-perplexity — the CCNet keep/cut axis. ``unit`` and
    ``n`` must match the fit call.

    One explode + model join + groupBy on the doc id — no UDFs anywhere.
    A char model is broadcast unconditionally (bounded by construction);
    a word model broadcasts only up to ``max_broadcast_rows`` (default
    ``_LM_BROADCAST_ROWS``), past which the gram rows shuffle-join it —
    one extra exchange, but the only plan that survives a corpus-sized
    model.
    """
    model, _ = _maybe_broadcast(model, _lm_guard_rows(unit, max_broadcast_rows))
    grams = _gram_rows(
        df, text_col, n, extra=(F.col(id_col).alias("__sid"),), unit=unit
    )
    scored = (
        grams.join(model, "gram", "left")
        .groupBy("__sid")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.avg(F.coalesce("logp", F.lit(float(oov_logp)))).alias("avg_logp"),
        )
    )
    return scored.select(
        F.col("__sid").alias(id_col),
        "n_grams",
        "avg_logp",
        F.exp(-F.col("avg_logp")).alias("perplexity"),
    )


# -- Document chunking (pre-embedding / context-window splitting) ------------


def chunk_documents(df, text_col: str, id_col: str = "_id", *,
                    chunk_tokens: int = 128, overlap_tokens: int = 0,
                    tokens_col: str | None = None, join_sep: str = " "):
    """Split documents into whitespace-token windows of ``chunk_tokens``
    with ``overlap_tokens`` carried between consecutive chunks — the
    standard pre-embedding step (RAG indexing, long-doc encoders). A
    chunk is only started while it contributes new tokens (a trailing
    window shorter than the overlap would be a pure suffix repeat), so
    token conservation holds exactly:
    ``sum(chunk sizes) - (n_chunks-1)·overlap == doc tokens``.
    One output row per chunk: (id, chunk_idx, n_chunk_tokens,
    chunk_text); original casing/punctuation preserved (this is a
    splitter, not an analyzer), whitespace normalized to single spaces
    inside a chunk. Whitespace-only documents produce no rows.

    ``tokens_col`` switches the unit from whitespace words to a
    pre-tokenized ``array<string>`` column (e.g. ``bpe_tokens`` from
    :func:`semadb_spark.operators.bpe.bpe_encode` — chunk budgets in
    REAL model tokens); ``text_col`` is then ignored. ``join_sep`` is
    the chunk_text glue — pass ``""`` for BPE tokens, whose ``</w>``
    markers already encode the word boundaries.

    Pure Column expressions: tokenize + sequence(stride) + slice +
    explode — zero shuffles, the chunk fan-out happens inside the scan
    stage at any corpus size.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    # token array materialized as a column BEFORE the windowing lambda:
    # referencing the split+filter expression inside transform would
    # re-tokenize the document once per chunk (no CSE in lambda bodies —
    # same hazard the n-gram path hit)
    if tokens_col is not None:
        src_col = tokens_col
        toks_expr = F.col(tokens_col)
    else:
        src_col = text_col
        toks_expr = F.filter(
            F.split(F.trim(F.col(text_col)), "\\s+"), lambda w: w != ""
        )
    toks = F.col("__toks")
    n = F.size(toks)
    last_start = F.greatest(n - 1 - overlap_tokens, F.lit(0))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), last_start, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.slice(toks, s + 1, chunk_tokens).alias("toks"),
        ),
    )
    return (
        df.filter(F.col(src_col).isNotNull())
        .withColumn("__toks", toks_expr)
        .select(F.col(id_col).alias(id_col), F.explode(chunks).alias("ch"))
        .select(
            id_col,
            F.col("ch.chunk_idx").cast("int").alias("chunk_idx"),
            F.size("ch.toks").alias("n_chunk_tokens"),
            F.array_join("ch.toks", join_sep).alias("chunk_text"),
        )
    )
