"""Isolated per-query timing for A/B comparisons (guide §1).

Runs the named queries with bench.py's exact methodology (collect() on
local[$SPARK_GRAFT_CPUS], warmup query first, release_all between
trials, best-of-N + median) and prints one JSON line per query. Unlike
bench.py it runs ONLY the named queries, so an A/B pair of invocations
(old code / new code) costs seconds, not a full headline sweep; unlike
tools/bench_profile.py it skips the event log, so the timing has no
listener overhead.

Usage: python tools/ab_queries.py [--trials N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    trials = 5
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i : i + 2]
    if not args:
        print("usage: ab_queries.py [--trials N] query ...", file=sys.stderr)
        sys.exit(2)

    from conversation_analysis_tools_spark.operators.cache import release_all
    from conversation_analysis_tools_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["group_counts"](spark, sf_dir).collect()  # JVM/codegen warmup

    for name in args:
        runs = []
        for _ in range(trials):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            runs.append(time.time() - t0)
            release_all()
        runs.sort()
        print(
            json.dumps(
                {
                    "query": name,
                    "best": round(runs[0], 3),
                    "median": round(runs[len(runs) // 2], 3),
                    "runs": [round(r, 3) for r in runs],
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
