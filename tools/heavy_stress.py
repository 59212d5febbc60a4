"""Scale-stress the heavy operator family past sf1 (VERDICT r9 #3).

Builds ``.data/sf5`` (50x FK-consistent replication of sf0.1 via
``make_sf1.build``) if missing, then runs the scale-critical entries ONCE
each, recording wall time plus per-query Spark stage metrics (shuffle
read/write bytes, spill, task counts) pulled from the live UI REST API —
the empirical evidence behind the "would this survive 100x" claim.

Super-linearity check: each entry's sf5 time is compared against 5x its
sf1 time (linear expectation); anything >2x over the linear projection is
flagged LOUDLY in the log.

Usage: python tools/heavy_stress.py [--out PREFLIGHT_HEAVY_r10.log]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF5_DIR = os.path.join(REPO, ".data", "sf5")
SF1_DIR = os.path.join(REPO, ".data", "sf1")

# the scale-critical family (VERDICT r9 #3) + this round's anomaly subject
HEAVY = [
    "dedup_minhash_lsh_candidates",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "events_sessionize",
    "dedup_fuzzy_keepers",
    "events_scd2_history",
]


def _stages(spark) -> dict[int, dict]:
    """stageId -> metrics via the in-process AppStatusStore (the UI and
    its REST API are disabled in this environment)."""
    try:
        sc = spark.sparkContext
        jvm = sc._jvm
        store = sc._jsc.sc().statusStore()
        stages = store.stageList(
            jvm.java.util.ArrayList(),      # all statuses
            False, False,
            sc._gateway.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
        out = {}
        it = stages.iterator()
        while it.hasNext():
            s = it.next()
            out[s.stageId()] = {
                "shuffleReadBytes": s.shuffleReadBytes(),
                "shuffleWriteBytes": s.shuffleWriteBytes(),
                "memoryBytesSpilled": s.memoryBytesSpilled(),
                "diskBytesSpilled": s.diskBytesSpilled(),
                "numCompleteTasks": s.numCompleteTasks(),
            }
        return out
    except Exception:
        return {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "PREFLIGHT_HEAVY_r10.log"))
    ap.add_argument("--replicas", type=int, default=50)
    args = ap.parse_args()

    from opteryx_spark.session import get_session
    from opteryx_spark.suite import load_all

    spark = get_session(app_name="heavy-stress-sf5")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    if not os.path.isdir(SF5_DIR):
        from make_sf1 import build

        t0 = time.perf_counter()
        tmp = SF5_DIR + ".building"
        build(spark, "/root/testdata/sf0.1", tmp, replicas=args.replicas)
        os.rename(tmp, SF5_DIR)
        print(f"built sf5 in {time.perf_counter() - t0:.0f}s", flush=True)

    # library-default fuzzy dedup: the suite entry pins unique_texts=False
    # + portable_hash so its DuckDB oracle can replay member-level LSH —
    # O(copies²) per near-dup group BY CONSTRUCTION on the 50x-replicated
    # corpus.  The path a user gets (auto routing) clusters at the
    # exemplar level; measure it separately.
    from opteryx_spark.operators import dedup as _D
    from opteryx_spark.suite._util import t as _t

    def _fuzzy_auto(spark, sf):
        return _D.fuzzy_dedup(_t(spark, sf, "documents"), "doc_id", "text")

    import types as _types

    reg = dict(reg)
    reg["dedup_fuzzy_keepers_auto"] = _types.SimpleNamespace(spark=_fuzzy_auto)
    heavy = HEAVY + ["dedup_fuzzy_keepers_auto"]

    # sf1 reference times for the linearity check (one run each, same session)
    sf1_t: dict[str, float] = {}
    if os.path.isdir(SF1_DIR):
        for name in heavy:
            t0 = time.perf_counter()
            # count(), matching the sf5 measurement below: several heavy
            # entries return corpus-scale pair sets, and a driver collect
            # would time row serialization, not the distributed plan
            reg[name].spark(spark, SF1_DIR).count()
            sf1_t[name] = time.perf_counter() - t0

    lines = [f"# heavy-stress sf5 (replicas={args.replicas}) — {time.strftime('%Y-%m-%d %H:%M')}"]
    for name in heavy:
        before = _stages(spark)
        t0 = time.perf_counter()
        n_rows = reg[name].spark(spark, SF5_DIR).count()
        wall = time.perf_counter() - t0
        after = _stages(spark)
        new = [s for sid, s in after.items() if sid not in before]
        sh_r = sum(s.get("shuffleReadBytes", 0) for s in new)
        sh_w = sum(s.get("shuffleWriteBytes", 0) for s in new)
        spill_m = sum(s.get("memoryBytesSpilled", 0) for s in new)
        spill_d = sum(s.get("diskBytesSpilled", 0) for s in new)
        tasks = sum(s.get("numCompleteTasks", 0) for s in new)
        line = (
            f"{name}: sf5 {wall:.1f}s rows={n_rows} stages={len(new)} "
            f"tasks={tasks} shuffleR={sh_r / 1e6:.1f}MB shuffleW={sh_w / 1e6:.1f}MB "
            f"spillMem={spill_m / 1e6:.1f}MB spillDisk={spill_d / 1e6:.1f}MB"
        )
        if name in sf1_t:
            linear = 5.0 * sf1_t[name]
            ratio = wall / linear if linear > 0 else float("inf")
            line += f" | sf1={sf1_t[name]:.1f}s linear5x={linear:.1f}s ratio={ratio:.2f}"
            if ratio > 2.0:
                line += "  << SUPER-LINEAR: investigate"
        print(line, flush=True)
        lines.append(line)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
