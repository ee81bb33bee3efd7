"""Record-name behavior dispatch (mixin classes) over nested columns.

The reference attaches a ``behavior`` registry to its lazy Array
(reference src/dask_awkward/lib/core.py Array.behavior; exercised by
reference tests/test_behavior.py): records carry a ``__record__`` name,
and a mixin class registered under that name contributes methods,
properties, and ufunc overrides — ``points.distance(other)``,
``points.x2``, ``np.abs(points)``.

Spark-first re-expression: the mixin methods are plain Python whose
bodies COMPOSE :class:`~.elementwise.NestedArray` field arithmetic, so
"calling a behavior method" just builds one Catalyst expression tree
(``transform``/``zip_with`` over the list-of-structs column) — zero
Python in the row path, whole-stage codegen, exactly the cost of
writing the expression by hand. The registry itself is driver-side
metadata riding the wrapper, never shipped to executors.

Registry layout mirrors awkward's ``behavior`` dict so downstream code
(or a dict built by ``ak.mixin_class`` itself) plugs in unchanged:

- ``behavior[name] -> class`` — the mixin class for record ``name``;
- ``behavior[(ufunc, name)] -> fn`` — a ufunc override for ``name``
  (``np.absolute`` applied to a "Point" array calls ``fn``).

Public surface (reference names): :func:`mixin_class`,
:func:`mixin_class_method`, :func:`with_name` (array form — the
DataFrame/metadata form lives in :mod:`.structure`),
:class:`dask_property`, :class:`dask_method`.
"""

from __future__ import annotations

import inspect
from types import MethodType
from typing import Callable

from pyspark.sql import Column


def mixin_class(registry: dict) -> Callable[[type], type]:
    """Class decorator: register ``cls`` under ``cls.__name__`` and
    collect its :func:`mixin_class_method`-marked ufunc overrides into
    ``registry[(ufunc, name)]`` (reference: ``ak.mixin_class``, which
    the reference's behavior tests build their registry with)."""

    def register(cls: type) -> type:
        registry[cls.__name__] = cls
        for _, fn in inspect.getmembers(cls, callable):
            hook = getattr(fn, "_ufunc_hook", None)
            if hook is not None:
                registry[(hook, cls.__name__)] = fn
        return cls

    return register


def mixin_class_method(ufunc) -> Callable:
    """Mark a mixin method as the override for ``ufunc`` on arrays of
    this record name (reference: ``ak.mixin_class_method``)."""

    def mark(fn):
        fn._ufunc_hook = ufunc
        return fn

    return mark


class dask_property:
    """``@dask_property`` with an optional ``.dask`` variant that runs
    when accessed on the LAZY array (reference lib/core.py
    ``dask_property``): the eager body is for concrete records, the
    ``.dask`` body receives the lazy collection. ``no_dispatch=True``
    uses the eager body in both worlds."""

    def __init__(self, fn: Callable | None = None, *, no_dispatch: bool = False):
        self._fn = fn
        self._dask_fn: Callable | None = None
        self.no_dispatch = no_dispatch

    def __call__(self, fn: Callable) -> "dask_property":
        # the @dask_property(no_dispatch=True) parameterized form
        self._fn = fn
        return self

    def dask(self, fn: Callable) -> "dask_property":
        self._dask_fn = fn
        return self

    def __get__(self, obj, objtype=None):
        # plain attribute access on a CONCRETE mixin instance (or the
        # class): ordinary property semantics over the eager body
        if obj is None:
            return self
        return self._fn(obj)

    def resolve(self, arr):
        """Value of this property for lazy array ``arr``."""
        if self._dask_fn is not None and not self.no_dispatch:
            return self._dask_fn(arr, arr)
        return self._fn(arr)


class dask_method:
    """``@dask_method`` — method analogue of :class:`dask_property`."""

    def __init__(self, fn: Callable | None = None, *, no_dispatch: bool = False):
        self._fn = fn
        self._dask_fn: Callable | None = None
        self.no_dispatch = no_dispatch

    def __call__(self, fn: Callable) -> "dask_method":
        self._fn = fn
        return self

    def dask(self, fn: Callable) -> "dask_method":
        self._dask_fn = fn
        return self

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        return MethodType(self._fn, obj)

    def resolve(self, arr):
        """Bound callable of this method for lazy array ``arr``."""
        if self._dask_fn is not None and not self.no_dispatch:
            return lambda *a, **k: self._dask_fn(arr, arr, *a, **k)
        return lambda *a, **k: self._fn(arr, *a, **k)


def with_name(arr, name: str, behavior: dict | None = None):
    """Array-level ``ak.with_name``: tag a nested column with a record
    name (+ behavior registry) so attribute access dispatches through
    the mixin class (reference tests/test_behavior.py:
    ``dak.with_name(daa.points, "Point", behavior=behaviors)``).

    Accepts a :class:`~.elementwise.NestedArray` or a raw list Column;
    returns a NestedArray. The DataFrame form (metadata on the schema
    field, parquet-transported) is :func:`.structure.with_name` — use
    :func:`behavior_from_parameters` to rehydrate dispatch from a
    frame read back off disk.
    """
    from .elementwise import NestedArray

    if isinstance(arr, Column):
        arr = NestedArray(arr)
    if not isinstance(arr, NestedArray):
        raise TypeError("with_name(array-form) takes a NestedArray or Column")
    out = NestedArray(arr.col, ndim=arr.ndim)
    out.record_name = name
    out.behavior = behavior
    return out


def behavior_from_parameters(df, column: str, behavior: dict):
    """Rehydrate a behavior-dispatching NestedArray from a frame whose
    column carries a ``__record__`` parameter (set by
    :func:`.structure.with_name`, survives parquet roundtrip): the
    storage half and the dispatch half of the reference's behavior
    system, joined."""
    from pyspark.sql import functions as F

    from .structure import parameters

    name = parameters(df, column).get("__record__")
    if name is None:
        raise ValueError(f"column {column!r} has no __record__ parameter")
    return with_name(F.col(column), name, behavior)


def resolve_behavior_attr(arr, name: str):
    """Mixin-class attribute lookup for a lazy array: returns the
    resolved value, or ``_MISSING`` when the array is unnamed / the
    registry lacks the class / the class lacks the attribute (caller
    falls through to field access, mirroring awkward's resolution
    order of behavior-before-fields)."""
    behavior = getattr(arr, "behavior", None)
    rec = getattr(arr, "record_name", None)
    if not behavior or rec is None:
        return _MISSING
    cls = behavior.get(rec)
    if cls is None or not inspect.isclass(cls):
        return _MISSING
    try:
        attr = inspect.getattr_static(cls, name)
    except AttributeError:
        return _MISSING
    if isinstance(attr, (dask_property, dask_method)):
        return attr.resolve(arr)
    if isinstance(attr, property):
        return attr.fget(arr)
    if isinstance(attr, (staticmethod, classmethod)):
        return inspect.getattr_static(cls, name).__get__(None, cls)
    if callable(attr):
        return MethodType(attr, arr)
    return attr


def resolve_behavior_ufunc(arr, ufunc):
    """Ufunc override lookup: ``behavior[(ufunc, name)]`` (also by
    ufunc ``__name__`` so registries built without numpy objects
    work). Returns the override fn or None."""
    behavior = getattr(arr, "behavior", None)
    rec = getattr(arr, "record_name", None)
    if not behavior or rec is None:
        return None
    return behavior.get((ufunc, rec)) or behavior.get(
        (getattr(ufunc, "__name__", None), rec)
    )


class _Missing:
    def __repr__(self) -> str:  # pragma: no cover
        return "<missing behavior attr>"


_MISSING = _Missing()
