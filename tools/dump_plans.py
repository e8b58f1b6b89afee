"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [names...]
  e.g. python tools/dump_plans.py r13/_before        # all queries
       python tools/dump_plans.py r13 lm_perplexity  # writes plans/r13/lm_perplexity.txt

Writes plans/<tag>/<query>{suffix}.txt where suffix comes from --suffix
(default empty). The driver-facing judge reads these files to check plan
claims (Exchange count, join strategy, PushedFilters) against the code.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="subdirectory under plans/, e.g. r13")
    ap.add_argument("names", nargs="*")
    ap.add_argument("--suffix", default="", help="filename suffix, e.g. _before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from semadb_spark import get_spark

    spark = get_spark(app_name="plan-dump")
    qs = entrymod.queries(merge=False)
    names = args.names or list(qs)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in-file
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# {name}: {time.time()-t0:.1f}s -> {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
