"""Shared plumbing for the process-parallel point-read serving pools.

Both serving pools (:class:`~semadb_spark.operators.text_search.TextServePool`
and :class:`~semadb_spark.operators.vamana.VectorServePool`) deploy the same
shape: N worker processes point-reading one IMMUTABLE on-disk artifact, the
Python twin of the reference's one-goroutine-per-request serving over shared
shard state (shard/shard.go:329-472). The start-method policy and executor
construction live here so the two pools cannot drift.
"""

from __future__ import annotations


def choose_start_method() -> str:
    """Pick the multiprocessing start method for a serving pool.

    - Prefer forkserver/spawn: the opening process often holds a live JVM
      gateway (the SparkSession that built the artifact), and fork()ing a
      multi-threaded JVM-attached interpreter can inherit held locks.
      Workers need no parent state — each pool's initializer re-opens the
      artifact per process.
    - BUT forkserver/spawn both re-import the parent's __main__ (guarded by
      __mp_main__), which is impossible for stdin/REPL parents
      (FileNotFoundError '<stdin>'). For those, fall back to fork —
      acceptable because an interactive parent initiates the fork from its
      only running thread.
    """
    import multiprocessing
    import os
    import sys

    main_file = getattr(sys.modules.get("__main__"), "__file__", None)
    importable_main = main_file is not None and os.path.exists(main_file)
    avail = multiprocessing.get_all_start_methods()
    if importable_main and "forkserver" in avail:
        return "forkserver"
    if importable_main:
        return "spawn"
    return "fork"


def make_worker_executor(workers: int, initializer, initargs,
                         start_method: str | None = None):
    """ProcessPoolExecutor with the serving-pool start-method policy."""
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor

    if start_method is None:
        start_method = choose_start_method()
    return ProcessPoolExecutor(
        int(workers),
        mp_context=multiprocessing.get_context(start_method),
        initializer=initializer,
        initargs=initargs,
    )
