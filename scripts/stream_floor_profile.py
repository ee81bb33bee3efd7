"""Per-batch floor attribution for the streaming gate slots (r15,
verdict item 6): run q_stream_sessionize / q_stream_dedup and dump each
micro-batch's StreamingQueryProgress durationMs breakdown plus the
state-operator commit times, so the artifact carries WHERE the
structured-streaming wall goes (addBatch compute vs offset-log/commit
fixed cost) instead of a prose claim.

Usage: python scripts/stream_floor_profile.py [SF_DIR] [OUT_JSON]

The queries are run exactly as registered (the slot functions
themselves); progress is harvested from every active/finished stream
the session saw. The replay contracts pin the batch COUNT (two-file
late-merge for sessionize, two-batch store + replay-twice curation for
dedup), so the lever this profile arbitrates is per-batch cost only.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_floor.json"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dask_awkward_sandbox_spark.plans import QUERIES
    from dask_awkward_sandbox_spark.session import get_spark

    spark = get_spark("dwax-stream-floor")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    for slot in ("q_stream_sessionize", "q_stream_dedup"):
        # harvest per-batch progress via a listener: the slot functions
        # run their streams to completion internally, so recentProgress
        # on the returned frame is not reachable — the listener sees
        # every batch of every stream the call starts
        from pyspark.sql.streaming import StreamingQueryListener

        batches: list[dict] = []

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                row = {
                    "name": p.name,
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
                try:
                    row["stateOperators"] = [
                        {
                            "operatorName": getattr(s, "operatorName", None),
                            "commitTimeMs": getattr(s, "commitTimeMs", None),
                            "numRowsTotal": getattr(s, "numRowsTotal", None),
                        }
                        for s in p.stateOperators
                    ]
                except Exception:
                    pass
                batches.append(row)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        listener = _L()
        spark.streams.addListener(listener)
        try:
            t0 = time.perf_counter()
            QUERIES[slot](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 3)
            # listener delivery is async — give the bus a moment
            time.sleep(2.0)
        finally:
            spark.streams.removeListener(listener)
        tot_batches = len(batches)
        tot_addbatch = sum(b["durationMs"].get("addBatch", 0) for b in batches)
        tot_trigger = sum(
            b["durationMs"].get("triggerExecution", 0) for b in batches
        )
        out[slot] = {
            "wall_s": wall,
            "n_batches": tot_batches,
            "sum_triggerExecution_ms": tot_trigger,
            "sum_addBatch_ms": tot_addbatch,
            "non_stream_ms": round(wall * 1000 - tot_trigger),
            "batches": batches,
        }
        print(
            slot,
            "wall",
            wall,
            "batches",
            tot_batches,
            "trigger_ms",
            tot_trigger,
            "addBatch_ms",
            tot_addbatch,
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print("written", out_path, flush=True)


if __name__ == "__main__":
    main()
