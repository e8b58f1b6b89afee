"""semadb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Semafind/semadb.

The reference (read-only at /root/reference) is a Go hybrid vector / text /
filter search engine. This package re-expresses its entire query algebra —
*filter → rank (vector/text) → boolean-compose → hybrid-merge → select /
sort / paginate* — as Spark DataFrame operators compiled from the same JSON
query-tree API (reference ``models/search.go:54-65``), plus batch index
construction (quantizers, posting lists, LSH/IVF) and large-scale
training-data pipeline operators (dedup, similarity search, text analysis).

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join choice.
- Pure filters stay single-scan Column predicates (no shuffle).
- Ranked searches are bounded top-k; batched via per-partition partial top-k.
- Python appears only in Arrow-batched pandas UDF kernels (the SIMD analogue).
"""

from semadb_spark.session import get_spark


def __getattr__(name):
    # Lazy top-level exports: keep `import semadb_spark` light (no compiler /
    # collection imports unless used).
    if name == "Collection":
        from semadb_spark.collection import Collection

        return Collection
    if name == "SearchEngine":
        from semadb_spark.plans.compiler import SearchEngine

        return SearchEngine
    if name == "IndexSchema":
        from semadb_spark.schema import IndexSchema

        return IndexSchema
    if name in ("Workspace", "UserPlan"):
        from semadb_spark import tenancy

        return getattr(tenancy, name)
    if name == "TextServePool":
        from semadb_spark.operators.text_search import TextServePool

        return TextServePool
    if name == "curate_corpus":
        from semadb_spark.pipeline import curate_corpus

        return curate_corpus
    if name in ("read_warc", "read_wet", "write_warc", "stream_warc"):
        from semadb_spark.sources import warc

        return getattr(warc, name)
    if name in ("dsir_fit", "dsir_score", "dsir_sample"):
        from semadb_spark.operators import selection

        return getattr(selection, name)
    if name in ("bpe_fit", "bpe_encode", "bpe_word_counts"):
        from semadb_spark.operators import bpe

        return getattr(bpe, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_spark", "Collection", "SearchEngine", "IndexSchema", "Workspace",
    "UserPlan", "TextServePool", "curate_corpus", "read_warc", "read_wet",
    "write_warc", "stream_warc", "dsir_fit", "dsir_score", "dsir_sample",
    "bpe_fit", "bpe_encode", "bpe_word_counts",
]
__version__ = "0.1.0"
