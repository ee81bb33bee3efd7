"""Keyword-surface compatibility with the reference API (r6, verdict
item 6): a ported `import dask_awkward as dak` script calls
`dak.sum(x, axis=1, highlevel=True)` — the Column-level functions here
must ACCEPT the awkward-standard keywords instead of TypeError-ing,
and reject unsupported VALUES with a documented, directed error
rather than silently diverging.

Reference signatures (e.g. /root/reference/src/dask_awkward/lib/
reducers.py `sum(array, axis=None, keepdims=False, mask_identity=
False, highlevel=True, behavior=None, attrs=None)`) carry four
keyword groups:

- ``axis`` — our Column→Column forms ARE the deepest-list axis
  (axis=1 on depth-1 ragged columns, equivalently -1). axis=1/-1/
  unset accepted; axis=None and axis=0 raise pointing at the
  dedicated entry points (reducers.sum0-family, reducers.*_axis0).
- ``highlevel``/``behavior``/``attrs`` — graph-construction knobs
  with no Spark analogue. The defaults (True/None/None) are accepted
  and ignored; any other value raises NotImplementedError (the
  documented-divergence contract: never silently drop a behavior the
  caller asked for).
- per-function fixed keywords (``stable=True`` on sort/argsort,
  ``n=2`` on combinations, …) — accepted at the only supported value,
  rejected otherwise.

The decorator grafts the accepted keywords onto ``__signature__`` so
``inspect.signature`` (and tests/test_namespace_parity.py's
signature-parity sweep) sees the real surface.
"""

from __future__ import annotations

import functools
import inspect

_UNSET = object()

# keywords every reference high-level function accepts
_STANDARD_FIXED = {"highlevel": True, "behavior": None, "attrs": None}


def ak_surface(
    axis: tuple | None = (1, -1),
    axis_default=1,
    fixed: dict | None = None,
    fixed_pos: list[tuple[int, str, object]] | None = None,
    unpack_first_sequence: bool = False,
):
    """Wrap a Column-level function with the awkward keyword surface.

    ``axis``: accepted axis values (unset always accepted); None means
    the reference function has no axis keyword — don't graft one.
    ``fixed``: {kw: only_supported_value} beyond the standard
    highlevel/behavior/attrs trio.
    ``fixed_pos``: [(positional_index, name, only_supported_value)]
    for reference-API positional arguments our form fixes (e.g.
    ``combinations(array, 2)`` — n rides positionally in ported code).
    ``unpack_first_sequence``: the reference form takes a LIST of
    arrays where ours takes them as separate arguments (cartesian) —
    a ported ``dak.cartesian([a, b])`` unpacks.
    """
    all_fixed = {**_STANDARD_FIXED, **(fixed or {})}
    fixed_pos = fixed_pos or []

    def deco(fn):
        sig = inspect.signature(fn)
        own = set(sig.parameters)

        @functools.wraps(fn)
        def wrapper(*args, **kw):
            if (
                unpack_first_sequence
                and args
                and isinstance(args[0], (list, tuple))
            ):
                args = tuple(args[0]) + args[1:]
            ax = kw.pop("axis", _UNSET) if axis is not None else _UNSET
            if ax is not _UNSET and ax not in axis:
                raise ValueError(
                    f"{fn.__name__}: axis={ax!r} is not supported by the "
                    f"Column-level form (it reduces the deepest list axis; "
                    f"accepted: {sorted(axis, key=repr)}). For axis=None use "
                    f"the global forms (reducers.sum0/count0/min0/max0/"
                    f"mean0); for axis=0 the positional forms "
                    f"(reducers.sum_axis0 family)."
                )
            for idx, name, want in fixed_pos:
                got = _UNSET
                rest = args
                if len(args) > idx:
                    got = args[idx]
                    rest = args[:idx] + args[idx + 1 :]
                if name in kw:
                    got = kw.pop(name)
                if got is not _UNSET and got != want:
                    raise NotImplementedError(
                        f"{fn.__name__}: {name}={got!r} — only {name}={want!r} "
                        f"is implemented (documented divergence)"
                    )
                args = rest
            for k, v in all_fixed.items():
                got = kw.pop(k, _UNSET)
                if got is _UNSET:
                    continue
                ok = got in v if isinstance(v, tuple) else got == v
                if not ok:
                    raise NotImplementedError(
                        f"{fn.__name__}: {k}={got!r} has no Spark analogue; "
                        f"only {k}={v!r} is supported "
                        f"(documented divergence)"
                    )
            return fn(*args, **kw)

        params = list(sig.parameters.values())
        extra = []
        if axis is not None and "axis" not in own:
            extra.append(
                inspect.Parameter(
                    "axis", inspect.Parameter.KEYWORD_ONLY, default=axis_default
                )
            )
        for idx, name, want in fixed_pos:
            if name not in own:
                extra.append(
                    inspect.Parameter(
                        name, inspect.Parameter.KEYWORD_ONLY, default=want
                    )
                )
        for k, v in all_fixed.items():
            if k not in own:
                extra.append(
                    inspect.Parameter(
                        k,
                        inspect.Parameter.KEYWORD_ONLY,
                        default=v[0] if isinstance(v, tuple) else v,
                    )
                )
        wrapper.__signature__ = sig.replace(parameters=params + extra)
        return wrapper

    return deco


def apply_surface(namespace: dict, config: dict[str, dict]) -> None:
    """Rebind ``namespace[name] = ak_surface(**cfg)(namespace[name])``
    for each entry — called at the BOTTOM of the defining module so
    both module-qualified and flat-namespace callers get the wrapped
    surface."""
    for name, cfg in config.items():
        namespace[name] = ak_surface(**cfg)(namespace[name])
