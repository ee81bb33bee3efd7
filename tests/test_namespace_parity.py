"""Flat-namespace parity vs the reference's export list: every name
`import dask_awkward as dak` exposes must resolve here too, except
exactly the four documented dask/awkward in-memory interop
constructors (SURVEY §3 — neither library ships with a Spark
cluster). Parsed from the reference's __init__ so a new reference
export or an accidental de-export here fails this test."""

from __future__ import annotations

import re

REFERENCE_INIT = "/root/reference/src/dask_awkward/__init__.py"

DOCUMENTED_NON_GOALS = {
    "from_awkward",
    "from_dask_array",
    "to_dask_array",
    "to_dask_bag",
}


def _reference_exports() -> set[str]:
    src = open(REFERENCE_INIT).read()
    names: set[str] = set()
    for line in re.findall(r"from [\w\.]+ import \(?([^)\n]+)\)?", src):
        for tok in line.split(","):
            tok = tok.strip()
            if " as " in tok:
                tok = tok.split(" as ")[1].strip()
            if tok and tok.isidentifier():
                names.add(tok)
    for block in re.findall(r"from [\w\.]+ import \(([^)]+)\)", src, re.S):
        for tok in block.split(","):
            tok = tok.strip()
            if " as " in tok:
                tok = tok.split(" as ")[1].strip()
            if tok and tok.isidentifier():
                names.add(tok)
    return names


def test_every_reference_export_resolves():
    import dask_awkward_sandbox_spark as dwax

    missing = sorted(
        n for n in _reference_exports()
        if n not in dir(dwax) and n not in DOCUMENTED_NON_GOALS
    )
    assert not missing, f"reference exports without a flat-namespace analogue: {missing}"


def test_non_goals_are_actually_absent():
    """If one of the documented non-goals gains an implementation,
    this reminds us to take it off the exception list."""
    import dask_awkward_sandbox_spark as dwax

    present = sorted(n for n in DOCUMENTED_NON_GOALS if n in dir(dwax))
    assert not present, f"update DOCUMENTED_NON_GOALS: {present}"
