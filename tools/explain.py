#!/usr/bin/env python
"""Print ray.data execution stats for one or more named driver queries.

    python tools/explain.py [sf_dir] query [query ...]

Runs each query against sf_dir (default /root/testdata/sf0.01),
consumes it, and prints `Dataset.stats()` — per-operator wall time,
remote time, block/row counts.  The profiling loop behind every
perf note in BASELINE.md."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    if not names:
        print(__doc__)
        sys.exit(2)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    import __ray_entry__ as E

    qs = E.queries()
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}")
            continue
        t0 = time.time()
        out = qs[name](sf_dir)
        if hasattr(out, "stats"):
            n = out.count()
            print(f"=== {name}: {time.time() - t0:.2f}s, {n} rows")
            print(out.stats())
        else:
            df = out.to_pandas() if hasattr(out, "to_pandas") else out
            print(f"=== {name}: {time.time() - t0:.2f}s, {len(df)} rows "
                  "(driver-side table; no dataset stats)")
    ray.shutdown()


if __name__ == "__main__":
    main()
