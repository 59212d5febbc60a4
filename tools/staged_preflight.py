"""Compare-verify the STAGED wave entries (suite modules not yet
imported by ``load_all`` — see ``pipeline14.py``'s module docstring)
through the driver-equivalent gate, without touching the live registry
ordering the driver sees.

Usage:
    python tools/staged_preflight.py [--sf /root/testdata/sf0.01]

Imports the staged module (which registers its entries into REGISTRY for
THIS process only), then runs each through ``tests/_compare.py`` exactly
like ``window_preflight.py`` does.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

STAGED_MODULES = [
    "opteryx_spark.suite.pipeline14",
    "opteryx_spark.suite.pipeline15",
    "opteryx_spark.suite.pipeline16",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))

    import importlib

    import duckdb

    from _compare import compare  # tests/_compare.py
    from opteryx_spark.session import get_session
    from opteryx_spark.suite import REGISTRY, load_all

    load_all()  # fill REGISTRY with the LIVE set first, so the diff is staged-only
    before = set(REGISTRY)
    for mod in STAGED_MODULES:
        importlib.import_module(mod)
    staged = [n for n in REGISTRY if n not in before]
    if not staged:
        print("no staged entries found")
        return 1

    spark = get_session(shuffle_partitions=8)
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(args.sf, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    failures = 0
    for i, name in enumerate(staged, 1):
        qd = REGISTRY[name]
        t0 = time.time()
        try:
            if qd.oracle is None:
                n = qd.spark(spark, args.sf).count()
                print(f"ROWS   {i}/{len(staged)} {name} rows={n} {time.time() - t0:.1f}s")
                continue
            compare(qd.spark(spark, args.sf), con, qd.oracle, name)
            print(f"PASS   {i}/{len(staged)} {name} {time.time() - t0:.1f}s")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL   {i}/{len(staged)} {name} {time.time() - t0:.1f}s: {exc}")
            traceback.print_exc(limit=3)
    print(f"DONE {len(staged) - failures}/{len(staged)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
