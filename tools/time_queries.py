"""Time declared queries bench-style (warm + best-of-N collect) and/or
with the noop sink (guide §1.4) — the focused measurement harness for
optimization rounds.

Usage: python tools/time_queries.py [--noop] [--n N] query [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from ecommerce_data_pipeline_23a91a05i4_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    n = 5
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    queries = entry_mod.queries()
    out = {}
    for name in args:
        df = queries[name](spark, sf_dir)

        def action():
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()

        spark.sparkContext.setJobDescription(f"time: {name}")
        action()  # warm
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            action()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(runs), "runs": runs}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
