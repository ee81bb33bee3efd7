"""Phase profile of q_small_sources (r14 optimization round): attribute
the slot's wall between driver-side source STAGING (to_json/to_text
writes, the six write_root_flat calls with their pure-Python/reference
compressors, the lakehouse create+upsert) and the actual gated READ +
aggregate plan, so the optimization targets the right half.

Usage: python scripts/profile_small_sources_r14.py [sf_dir]
Prints one JSON line with per-phase seconds (min of reps where timed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from dask_awkward_sandbox_spark.plans import QUERIES
    from dask_awkward_sandbox_spark.session import get_spark

    spark = get_spark("profile-small-sources")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (codegen + JIT) at tiny SF, then two full passes at target
    for _ in range(2):
        QUERIES["q_small_sources"](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    QUERIES["q_small_sources"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float] = {}

    # full slot, min of 3
    samples = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES["q_small_sources"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(time.perf_counter() - t0)
    out["full_slot_min3"] = round(min(samples), 3)

    # build-only (plan construction = all driver-side staging + eager
    # writes; no final action)
    samples = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES["q_small_sources"](spark, SF_DIR)
        samples.append(time.perf_counter() - t0)
    out["build_only_min3"] = round(min(samples), 3)

    out["action_only_est"] = round(out["full_slot_min3"] - out["build_only_min3"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
