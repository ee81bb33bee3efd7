"""ROOT (HEP TTree) ingestion — the reference's uproot capability.

Parity: the reference itself ships no ROOT code — uproot supplies the
byte-level decode and dask-awkward supplies the partitioned-source
machinery around it (`tests/test_inspect.py:85-95` drives
``uproot.dask({nano_dy.root: "Events"})`` then column-projects;
`src/dask_awkward/layers/layers.py:143` AwkwardInputLayer is the
"one task per (file, entry-range), projection pushed into the IO
function" half). This module is that second half re-done for Spark,
for real: driver-side entry-range planning, the task-list DataFrame,
the executor-side Arrow hand-off, and branch pruning are all
implemented and tested. Only the TTree byte decode is delegated to a
pluggable backend:

- ``UprootBackend`` — the production path; uproot is NOT in this
  container, so it raises ``DecodeUnavailable`` with a clear message
  (same gate as functions/multimodal.py's PIL/ffmpeg decode).
- ``RawRootBackend`` (r8) — REAL byte decode for flat-branch files:
  TFile header + TKey chain + uncompressed/zlib baskets per the
  public format (io/rootfile.py); jagged + LZ4/ZSTD stay gated.
- ``SyntheticNanoBackend`` — a deterministic nanoAOD-shaped fake
  (content is a pure function of (path, entry index)) with the same
  contract, so the planning/pruning/Arrow plumbing runs end-to-end
  in tests and demos without uproot.

Scale design (100 TB of TTrees): planning touches metadata only —
one ``num_entries`` call per file, O(files) driver work, never
O(bytes). One Spark task per (file, entry-range) slice; ``step_size``
is the task-size knob (~100k events is a sane unit; at 1000
executors you want files*steps >> cores, which HEP datasets give you
for free). Branch pruning reaches the backend, so only the requested
TBranch baskets are ever read — the ROOT analogue of parquet column
pruning (uproot reads per-branch basket byte ranges, untouched
branches cost zero IO). Decode streams Arrow record batches
executor-side; raw bytes never visit the driver.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterable, Protocol, Sequence

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from dask_awkward_sandbox_spark.functions.multimodal import DecodeUnavailable


class RootBackend(Protocol):
    """Decode contract: everything from_root needs from a ROOT lib.

    ``read`` must return exactly the requested branches (in request
    order) as an Arrow table whose schema matches ``arrow_schema``
    for the same branch list — jagged branches as ``list<...>``.
    Instances are pickled into the executor closure, so backends
    must be small and serializable (open files lazily per call).
    """

    def num_entries(self, path: str, tree: str) -> int: ...

    def arrow_schema(self, path: str, tree: str, branches: Sequence[str] | None) -> pa.Schema: ...

    def read(
        self, path: str, tree: str, branches: Sequence[str] | None, start: int, stop: int
    ) -> pa.Table: ...


class UprootBackend:
    """uproot-backed decode. The import is deferred to call time so
    the class (and its clear error) exists in every container; on a
    box with uproot installed this is the real production path."""

    def _uproot(self):
        try:
            import uproot  # noqa: F401
        except ImportError as e:
            raise DecodeUnavailable(
                "ROOT decode requires uproot (pip install uproot awkward); "
                "not in this container — pass backend=SyntheticNanoBackend(...) "
                "for the deterministic demo backend"
            ) from e
        return uproot

    def num_entries(self, path: str, tree: str) -> int:
        up = self._uproot()
        with up.open(path) as f:
            return int(f[tree].num_entries)

    def _arrays(self, path, tree, branches, start, stop):
        up = self._uproot()
        import awkward as ak

        with up.open(path) as f:
            arr = f[tree].arrays(
                expressions=list(branches) if branches is not None else None,
                entry_start=start,
                entry_stop=stop,
                library="ak",
            )
        return ak.to_arrow_table(arr, extensionarray=False)

    def arrow_schema(self, path, tree, branches):
        return self._arrays(path, tree, branches, 0, 0).schema

    def read(self, path, tree, branches, start, stop):
        return self._arrays(path, tree, branches, start, stop)


class RawRootBackend:
    """REAL byte-level decode for flat-branch ROOT files (r8; the
    r6/r7 verdicts' "minimal uncompressed-basket reader" — the
    BMP/WAV-codec precedent applied to TTrees). io/rootfile.py holds
    the format layer: TFile header walk, TKey chain, big-endian basket
    arrays, all four compression framings (ZL/L4/ZS/XZ), embedded
    TTree streamer walk, leaf-counter jagged branches, simple
    containers (vector<basic>/vector<vector<basic>>/vector<string>)
    via basket entry-offset tables, and (r12) user-class branches via
    StreamerInfo records — unsplit objects surface as struct columns
    and member-wise TClonesArray as array<struct>. Classes with
    non-basic members, object-wise clones streams, and counter-less
    variable branches stay gated behind DecodeUnavailable with
    pointers at the uproot backend.

    Flat branches are the nanoAOD scalar surface (event ids, counts,
    HLT flags, MET): per-branch baskets decode independently, so
    branch pruning here literally skips the untouched branches'
    bytes. The per-(file, entry-range) slice contract matches the
    other backends: ``read`` decodes only the requested branches and
    returns rows [start, stop).

    Scale note: this backend re-reads the file per task (executors
    have no shared handle) — fine for the many-files HEP layout where
    a task's file IS its slice; a 100 TB dataset wants step_size ≈
    file entries so each file is touched once.
    """

    def num_entries(self, path, tree):
        f = self._open(path, tree)
        return f.num_entries()

    @staticmethod
    def _open(path, tree):
        from dask_awkward_sandbox_spark.io.rootfile import RootFlatFile

        f = RootFlatFile(path)
        # zero-entry files hold branch keys but no baskets, so no
        # basket carries the tree name — accept them vacuously (they
        # report 0 entries and contribute no tasks, the plan_tasks
        # contract the other backends honor); a wrong tree name on a
        # file WITH data still errors
        if f.trees and tree not in f.trees:
            raise KeyError(f"no tree {tree!r} in {path}; have {sorted(f.trees)}")
        return f

    _ARROW = {
        "B": pa.int8(), "b": pa.uint8(), "S": pa.int16(), "s": pa.uint16(),
        "I": pa.int32(), "i": pa.uint32(), "L": pa.int64(), "l": pa.uint64(),
        "F": pa.float32(), "D": pa.float64(), "O": pa.bool_(),
    }

    @classmethod
    def _schema_of(cls, f, branches):
        names = list(branches) if branches is not None else sorted(f.branches)
        # a branch whose class has no fully-basic streamer opens fine
        # but cannot be REQUESTED — directed error over a bare KeyError
        for b in names:
            if b in f.unresolved:
                from .rootfile import DecodeUnavailable

                raise DecodeUnavailable(f.unresolved[b])
        unknown = [b for b in names if b not in f.branches]
        if unknown:
            raise KeyError(f"unknown branches {unknown}; have {sorted(f.branches)}")
        # jagged branches surface as list<elem>: leaf-counter ("x[n]/D",
        # lengths from the counter branch) and simple-container
        # TBranchElement (r10: vector<float> etc., lengths from the
        # basket entry-offset tables); r11 adds list<list<elem>>
        # (vector<vector<basic>>) and list<string> (vector<string>)
        def _typ(n):
            if n in f.objects:
                # r12: unsplit user-class branch -> one struct per entry
                return pa.struct(
                    [(m, cls._ARROW[l]) for m, l in f.streamers[f.objects[n]]]
                )
            if n in f.clones:
                # r12: TClonesArray -> list<struct> per entry
                return pa.list_(
                    pa.struct(
                        [(m, cls._ARROW[l]) for m, l in f.streamers[f.clones[n]]]
                    )
                )
            if n in f.nested_vectors:
                return pa.list_(pa.list_(cls._ARROW[f.branches[n]]))
            if n in f.string_vectors:
                return pa.list_(pa.string())
            if n in f.cstrings:
                # r12: TLeafC "name/C" — one string per entry
                return pa.string()
            if n in f.counters or n in f.vectors or n in f.fixed_lens:
                # fixed-size ("pos[3]/D") branches surface as lists of
                # constant length k (r11) — uproot's regular-array
                # analogue
                return pa.list_(cls._ARROW[f.branches[n]])
            return cls._ARROW[f.branches[n]]

        return pa.schema([(n, _typ(n)) for n in names])

    def arrow_schema(self, path, tree, branches):
        return self._schema_of(self._open(path, tree), branches)

    def read(self, path, tree, branches, start, stop):
        import numpy as np

        # ONE parse per task (r8 review: read() previously re-opened
        # the file through arrow_schema, key-walking it twice)
        f = self._open(path, tree)
        schema = self._schema_of(f, branches)
        cols = {}
        for n in schema.names:
            if n in f.objects:
                mem = f.object_members(n)
                cols[n] = pa.StructArray.from_arrays(
                    [pa.array(mem[m][start:stop]) for m, _ in f.streamers[f.objects[n]]],
                    names=[m for m, _ in f.streamers[f.objects[n]]],
                )
                continue
            if n in f.clones:
                mem = f.clones_members(n)
                off = np.zeros(f.num_entries() + 1, dtype=np.int64)
                np.cumsum(f.branch_lengths(n), out=off[1:])
                lo, hi = int(off[start]), int(off[stop])
                members = f.streamers[f.clones[n]]
                cols[n] = pa.ListArray.from_arrays(
                    pa.array(off[start : stop + 1] - lo, type=pa.int32()),
                    pa.StructArray.from_arrays(
                        [pa.array(mem[m][lo:hi]) for m, _ in members],
                        names=[m for m, _ in members],
                    ),
                )
                continue
            vals = f.branch_array(n)
            if n in f.cstrings:
                cols[n] = pa.array(list(vals[start:stop]), type=pa.string())
                continue
            if n in f.nested_vectors:
                # list<list<T>>: outer offsets over inner-vector counts,
                # inner offsets over element counts — both off the
                # decoded length tables, entry slice [start, stop)
                outer = f.branch_lengths(n)
                inner = f.branch_inner_lengths(n)
                oout = np.zeros(f.num_entries() + 1, dtype=np.int64)
                np.cumsum(outer, out=oout[1:])
                oin = np.zeros(len(inner) + 1, dtype=np.int64)
                np.cumsum(inner, out=oin[1:])
                ilo, ihi = int(oout[start]), int(oout[stop])
                vlo, vhi = int(oin[ilo]), int(oin[ihi])
                inner_arr = pa.ListArray.from_arrays(
                    pa.array(oin[ilo : ihi + 1] - vlo, type=pa.int32()),
                    pa.array(vals[vlo:vhi]),
                )
                cols[n] = pa.ListArray.from_arrays(
                    pa.array(oout[start : stop + 1] - ilo, type=pa.int32()),
                    inner_arr,
                )
            elif n in f.string_vectors:
                outer = f.branch_lengths(n)
                oout = np.zeros(f.num_entries() + 1, dtype=np.int64)
                np.cumsum(outer, out=oout[1:])
                lo, hi = int(oout[start]), int(oout[stop])
                cols[n] = pa.ListArray.from_arrays(
                    pa.array(oout[start : stop + 1] - lo, type=pa.int32()),
                    pa.array(list(vals[lo:hi]), type=pa.string()),
                )
            elif n in f.counters or n in f.vectors or n in f.fixed_lens:
                # offsets from the lengths' cumsum (counter branch,
                # basket offset tables, or constant fixed size); entry
                # slice [start, stop) maps to value slice via the offsets
                off = np.zeros(f.num_entries() + 1, dtype=np.int64)
                np.cumsum(f.branch_lengths(n), out=off[1:])
                lo, hi = int(off[start]), int(off[stop])
                if hi - lo > 2**31 - 1:
                    # ListArray offsets are int32; a single task slice
                    # holding >= 2^31 values needs a smaller step_size
                    # (per-slice bound, not a file bound)
                    raise ValueError(
                        f"branch {n!r}: entry slice [{start}, {stop}) holds "
                        f"{hi - lo} values — over the int32 list-offset "
                        "bound; lower step_size so each task slice stays "
                        "under 2^31 values"
                    )
                cols[n] = pa.ListArray.from_arrays(
                    pa.array(off[start : stop + 1] - lo, type=pa.int32()),
                    pa.array(vals[lo:hi]),
                )
            else:
                cols[n] = vals[start:stop]
        return pa.table(cols, schema=schema)


class SyntheticNanoBackend:
    """Deterministic nanoAOD-shaped decode fake — the testable stand-in
    the container allows (same policy as multimodal's BMP/WAV codecs:
    plumbing real, external-lib decode replaced by a pure function).

    Branches mirror a nanoAOD Events tree slice: scalar ``event`` /
    ``nMuon``, jagged ``Muon_pt`` / ``Muon_eta`` with len == nMuon.
    Every value is a pure function of (path, entry index), so tests
    and demos can recompute expected results driver-side.
    """

    BRANCHES = ("event", "nMuon", "Muon_pt", "Muon_eta")

    def __init__(self, entries_per_file: dict[str, int]):
        self.entries = dict(entries_per_file)

    def num_entries(self, path, tree):
        if tree != "Events":
            raise KeyError(f"no tree {tree!r} (synthetic files have only 'Events')")
        return self.entries[path]

    def _fields(self, branches):
        types = {
            "event": pa.int64(),
            "nMuon": pa.int32(),
            "Muon_pt": pa.list_(pa.float64()),
            "Muon_eta": pa.list_(pa.float64()),
        }
        names = list(branches) if branches is not None else list(self.BRANCHES)
        unknown = [b for b in names if b not in types]
        if unknown:
            raise KeyError(f"unknown branches {unknown}; have {list(types)}")
        return [(n, types[n]) for n in names]

    def arrow_schema(self, path, tree, branches):
        return pa.schema(self._fields(branches))

    @staticmethod
    def row(path: str, i: int) -> dict:
        """The per-entry content formula, exposed so tests recompute
        expectations without duplicating it."""
        seed = zlib.crc32(path.encode()) & 0xFFFF
        n = (i + seed) % 4
        return {
            "event": seed * 1_000_000 + i,
            "nMuon": n,
            "Muon_pt": [((i * 7 + j * 3 + seed) % 500) / 10.0 + 0.5 for j in range(n)],
            "Muon_eta": [(((i + j * 5 + seed) % 100) - 50) / 10.0 for j in range(n)],
        }

    def read(self, path, tree, branches, start, stop):
        fields = self._fields(branches)
        rows = [self.row(path, i) for i in range(start, stop)]
        return pa.table(
            {name: [r[name] for r in rows] for name, _ in fields},
            schema=pa.schema(fields),
        )


def plan_tasks(
    files: Sequence[str], tree: str, backend: RootBackend, step_size: int
) -> list[tuple[str, int, int]]:
    """Driver-side slicing: one metadata call per file, then pure
    arithmetic. Empty files contribute no tasks."""
    if step_size <= 0:
        raise ValueError("step_size must be positive")
    tasks: list[tuple[str, int, int]] = []
    for path in files:
        n = backend.num_entries(path, tree)
        for start in range(0, n, step_size):
            tasks.append((path, start, min(start + step_size, n)))
    return tasks


def from_root(
    spark: SparkSession,
    files: str | Iterable[str],
    tree: str = "Events",
    branches: Sequence[str] | str | None = None,
    step_size: int = 100_000,
    backend: RootBackend | None = None,
) -> DataFrame:
    """Read TTree(s) into a nested DataFrame, one Spark task per
    (file, entry-range) slice.

    ``branches``: None = all; a list = exactly those (pruned at the
    source — the backend never touches other baskets); a string = a
    regex over branch names (uproot's filter_name idiom), resolved
    against the first file's schema driver-side.
    """
    backend = backend or UprootBackend()
    files = [files] if isinstance(files, str) else list(files)
    if not files:
        raise ValueError("from_root needs at least one file")

    if isinstance(branches, str):
        pat = re.compile(branches)
        all_names = backend.arrow_schema(files[0], tree, None).names
        branches = [n for n in all_names if pat.fullmatch(n)]
        if not branches:
            raise ValueError(f"branch regex {pat.pattern!r} matched nothing in {all_names}")
    elif branches is not None:
        branches = list(branches)

    tasks = plan_tasks(files, tree, backend, step_size)
    if not tasks:
        raise ValueError(f"no entries in any input file ({files})")

    aschema = backend.arrow_schema(tasks[0][0], tree, branches)
    from pyspark.sql.pandas.types import from_arrow_schema

    sschema = from_arrow_schema(aschema)

    # round-robin repartition → exactly one (file, start, stop) task
    # per partition; the slice descriptors are the only rows that
    # shuffle, never event data
    tdf = spark.createDataFrame(
        tasks, "path string, start long, stop long"
    ).repartition(len(tasks))

    br = branches  # bind locally: the closure ships (backend, tree, br) only

    def reader(batches):
        for b in batches:
            for row in b.to_pylist():
                tbl = backend.read(row["path"], tree, br, row["start"], row["stop"])
                try:
                    tbl = tbl.cast(aschema)
                except (pa.ArrowInvalid, ValueError) as e:
                    raise TypeError(
                        f"backend returned schema {tbl.schema} for branches {br}, "
                        f"expected {aschema}"
                    ) from e
                yield from tbl.to_batches()

    return tdf.mapInArrow(reader, sschema)


def necessary_branches(spark: SparkSession, schema, downstream) -> list[str]:
    """Which top-level columns does ``downstream``'s plan actually
    read? Catalyst as the typetracer (the reference mocks a typetracer
    array, runs the task graph over it, and reports touched buffers —
    `src/dask_awkward/layers/layers.py:219` prepare_for_projection):
    here the mock is a ZERO-ROW parquet file with the source schema,
    ``downstream`` builds its plan over it, and the optimized scan's
    ReadSchema — real column pruning, nested fields included — is the
    touched set. No optimizer-rule emulation, no plan walking of our
    own; whatever Catalyst would prune on the real data is exactly
    what it prunes on the probe."""
    import os as _os
    import tempfile

    from dask_awkward_sandbox_spark.inspect import report_necessary_columns

    d = tempfile.mkdtemp(prefix="dwax_root_probe_")
    path = _os.path.join(d, "probe.parquet")
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)
    out = downstream(spark.read.parquet(path))
    tops: set[str] = set()
    for loc, leaves in report_necessary_columns(out).items():
        if _os.path.normpath(path) in _os.path.normpath(loc.replace("file:", "")):
            tops |= {leaf.split(".")[0] for leaf in leaves}
    return [f.name for f in schema.fields if f.name in tops]


def from_root_projected(
    spark: SparkSession,
    files: str | Iterable[str],
    downstream,
    tree: str = "Events",
    step_size: int = 100_000,
    backend: RootBackend | None = None,
) -> DataFrame:
    """from_root with the reference's necessary-columns optimization
    (`tests/test_inspect.py:85-95`: uproot.dask + report_necessary_
    columns narrowing the read to the touched TTree branches):
    ``downstream`` (DataFrame -> DataFrame) is traced over a zero-row
    probe first, only the branches its optimized plan reads are
    requested from the backend, then the real downstream runs over
    the projected source. Returns ``downstream(projected_scan)``.

    A plan that reads no columns at all (pure count) still needs ONE
    branch to know entry counts — the first branch stands in, the
    analogue of the reference's shape-only buffer touch.
    """
    backend = backend or UprootBackend()
    flist = [files] if isinstance(files, str) else list(files)
    if not flist:
        raise ValueError("from_root_projected needs at least one file")
    from pyspark.sql.pandas.types import from_arrow_schema

    full = from_arrow_schema(backend.arrow_schema(flist[0], tree, None))
    branches = necessary_branches(spark, full, downstream)
    if not branches:
        branches = [full.fields[0].name]
    return downstream(
        from_root(
            spark, flist, tree=tree, branches=branches,
            step_size=step_size, backend=backend,
        )
    )
