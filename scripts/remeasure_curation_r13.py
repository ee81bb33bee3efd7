"""One-off r13 re-measure: q_corpus_curation moved 1.91s (r11 driver)
-> 5.26s (r12 driver), 2.76x raw against a ~1.35x box band, with zero
r12 commits touching plans/llm.py:q_corpus_curation or
functions/quality_filters.py — driver artifact and same-round local
clean runs disagree (VERDICT r12, "What's wrong" #3).

Protocol (the scripts/remeasure_r12.py treatment):
1. q1 control min-of-3 on a fresh session -> box factor vs the r01
   0.769s record (bench.Q1_CONTROL_R01).
2. q_corpus_curation ISOLATED min-of-5 (clearCache per rep).
3. Session-aging attribution: one bench-style pass (3 reps each) over
   the headliners that PRECEDE the slot in bench.HEADLINERS order,
   then q_corpus_curation min-of-3 again — if the aged wall leaves
   the isolated band, the preceding panel (not the slot) is the
   cause, the q_lm_perplexity/aged-heap pattern.

Results merge into SCALE_SF10.json under
``corpus_curation_remeasure_r13``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
SLOT = "q_corpus_curation"


def _wall(spark, fn, d, reps):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    import bench
    from dask_awkward_sandbox_spark.plans import QUERIES
    from dask_awkward_sandbox_spark.session import get_spark

    spark = get_spark("curation-remeasure")
    spark.sparkContext.setLogLevel("ERROR")

    q1 = _wall(spark, QUERIES["q1_pricing_summary"], SF, 3)
    box = round(q1 / bench.Q1_CONTROL_R01, 3)
    isolated = _wall(spark, QUERIES[SLOT], SF, 5)
    print(f"# q1 {q1}s box_factor {box}; {SLOT} isolated min-of-5 {isolated}s",
          file=sys.stderr)

    preceding = []
    for name in bench.HEADLINERS:
        if name == SLOT:
            break
        preceding.append(name)
    t0 = time.perf_counter()
    for name in preceding:
        _wall(spark, QUERIES[name], SF, 3)
    aging_s = round(time.perf_counter() - t0, 1)
    aged = _wall(spark, QUERIES[SLOT], SF, 3)
    print(f"# after {len(preceding)} preceding headliners x3 ({aging_s}s): "
          f"{SLOT} min-of-3 {aged}s", file=sys.stderr)

    out = {
        "q1_control": q1,
        "box_factor": box,
        "isolated_min5": isolated,
        "aged_min3_after_preceding_panel": aged,
        "preceding_headliners": len(preceding),
        "r11_driver": 1.91,
        "r12_driver": 5.263,
    }
    print(json.dumps({SLOT: out}))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SF10.json",
    )
    if os.path.isfile(path):
        rec = json.load(open(path))
        rec["corpus_curation_remeasure_r13"] = out
        json.dump(rec, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
