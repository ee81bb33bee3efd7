"""Dump .explain("formatted") for the given slots to a directory.

Usage: python scripts/dump_plans.py OUTDIR slot1,slot2,... [SUFFIX]

Writes OUTDIR/<slot>_<SUFFIX>.txt (default suffix 'after'). Plan-only
(no execution), so it is cheap and safe to run on a busy box. The
package imported is whatever PYTHONPATH resolves — point it at a
worktree to capture a historical tree's plans.
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    outdir, slots = sys.argv[1], sys.argv[2].split(",")
    suffix = sys.argv[3] if len(sys.argv) > 3 else "after"
    os.makedirs(outdir, exist_ok=True)
    from dask_awkward_sandbox_spark.plans import QUERIES
    from dask_awkward_sandbox_spark.session import get_spark

    spark = get_spark("dwax-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    state = os.environ.get("DWAX_PLAN_STATE", suffix)
    for name in slots:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        header = (
            f"# {name} — .explain('formatted') at {sf_dir} "
            f"({suffix}, repo state: {state})\n"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(header + txt)
        print(name, "ok", flush=True)


if __name__ == "__main__":
    main()
