"""ann-benchmarks HDF5 loader (the S6 path, internal/loadhdf5/loadhdf5.go:30-71).

The reference loads the `train` dataset from an ann-benchmarks HDF5 file and
L2-normalizes every vector when the dataset name contains "angular" (cosine
metrics assume pre-normalized inputs, loadhdf5.go:57-61). Import-gated:
``h5py`` is not part of this engine's pinned dependencies, so the function
raises a clear ImportError where it isn't installed; the Spark-side shape
(chunked createDataFrame -> parquet landing) is real.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_hdf5(
    spark: SparkSession,
    path: str,
    dataset: str = "train",
    normalize: bool | None = None,
    chunk_rows: int = 100_000,
) -> DataFrame:
    """HDF5 vector file -> DataFrame(_id string, vector array<float>).

    ``normalize=None`` auto-detects from the filename like the reference
    (any "angular" dataset is normalized). Rows stream driver-side in
    ``chunk_rows`` slices — for real corpora convert to parquet once and
    read that instead (this is a bench-ingest path, not a query path).
    """
    try:
        import h5py  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without h5py
        raise ImportError(
            "load_hdf5 requires the optional h5py dependency "
            "(pip install h5py); convert the file to parquet externally "
            "or install it"
        ) from e
    import numpy as np

    if normalize is None:
        normalize = "angular" in os.path.basename(path)
    out: DataFrame | None = None
    with h5py.File(path, "r") as f:
        ds = f[dataset]
        for start in range(0, ds.shape[0], chunk_rows):
            block = np.asarray(ds[start : start + chunk_rows], dtype=np.float64)
            if normalize:
                norms = np.linalg.norm(block, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                block = block / norms
            chunk = spark.createDataFrame(
                [(str(start + i), [float(x) for x in row]) for i, row in enumerate(block)],
                "_id string, vector array<float>",
            )
            out = chunk if out is None else out.unionByName(chunk)
    assert out is not None, "empty HDF5 dataset"
    return out.select("_id", F.col("vector").cast("array<float>").alias("vector"))
