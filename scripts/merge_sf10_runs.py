"""Min-merge two same-tree runs of scripts/scale_probe_sf10.py (r15).

The sandbox's block device is bistable (see OPTIMIZATION_r15.md): a
single probe run can land individual cells in a slow-I/O window and
record 5-8x inflated walls (q_sort_argsort read 108.9s in one run and
~15s in the r13 record with byte-identical plans). The repo-wide
methodology is min-of-reps for exactly this reason; this script extends
it across two full probe runs of the SAME tree: every timed cell takes
the per-slot minimum of the two runs, growth factors are recomputed
from the merged walls, and a `merged_from` note records the provenance.
Plan-stability booleans must agree between runs (they are
data/plan-derived, not timing) — a mismatch aborts.

Usage: python scripts/merge_sf10_runs.py RUN1.json RUN2.json OUT.json
"""
from __future__ import annotations

import json
import sys


def merge_walls(a: dict, b: dict) -> dict:
    out = {}
    for k in a:
        va, vb = a.get(k), b.get(k)
        if isinstance(va, (int, float)) and isinstance(vb, (int, float)):
            out[k] = round(min(va, vb), 3)
        else:
            out[k] = va if va is not None else vb
    for k in b:
        out.setdefault(k, b[k])
    return out


def main() -> None:
    r1 = json.load(open(sys.argv[1]))
    r2 = json.load(open(sys.argv[2]))
    out = dict(r1)

    for block in ("sf1", "sf10"):
        out[block] = merge_walls(r1[block], r2[block])
    out["growth_sf10_vs_sf1"] = {
        k: round(out["sf10"][k] / out["sf1"][k], 2)
        for k in out["sf1"]
        if isinstance(out["sf1"].get(k), (int, float))
        and isinstance(out["sf10"].get(k), (int, float))
        and out["sf1"][k]
    }
    if r1.get("plan_stable") != r2.get("plan_stable"):
        diff = {
            k: (r1["plan_stable"].get(k), r2["plan_stable"].get(k))
            for k in r1.get("plan_stable", {})
            if r1["plan_stable"].get(k) != r2.get("plan_stable", {}).get(k)
        }
        raise SystemExit(f"plan_stable disagrees between runs: {diff}")

    # the sorted-table primary cells for the two window slots
    if "window_slots_plain" in r1 and "window_slots_plain" in r2:
        wp = {}
        for slot in r1["window_slots_plain"]:
            m = merge_walls(
                r1["window_slots_plain"][slot], r2["window_slots_plain"][slot]
            )
            if m.get("sf1"):
                m["growth"] = round(m["sf10"] / m["sf1"], 2)
            wp[slot] = m
        out["window_slots_plain"] = wp
    if "sorted_table_build_s" in r1 and "sorted_table_build_s" in r2:
        out["sorted_table_build_s"] = merge_walls(
            r1["sorted_table_build_s"], r2["sorted_table_build_s"]
        )

    out["merged_from"] = (
        "min-of-two full probe runs on the identical tree (r15; the "
        "repo's min-of-reps methodology extended across runs because "
        "single cells land in multi-minute slow-I/O windows — "
        "plan-stability fields verified equal between runs)"
    )
    json.dump(out, open(sys.argv[3], "w"), indent=1)
    print("merged ->", sys.argv[3])
    worst = sorted(
        out["growth_sf10_vs_sf1"].items(), key=lambda kv: -kv[1]
    )[:8]
    print("worst growth:", worst)


if __name__ == "__main__":
    main()
