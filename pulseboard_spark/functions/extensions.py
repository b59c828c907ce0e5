"""User extension surface: a scalar / pandas-UDF registry.

The reference has no UDF/UDAF/UDTF surface at all (SURVEY §2.8) —
extensibility there means "write a Kotlin method".  This engine's core
paths are pure Column expressions (never Python), so the extension
contract is explicit about cost:

* :func:`register_pandas` — the DEFAULT extension path: Arrow-batched
  vectorized UDFs (``pandas_udf``).  Plans as ``ArrowEvalPython``;
  10-100× faster than row-at-a-time, and the only kind that belongs in a
  hot path at 100 TB.
* :func:`register_scalar` — row-at-a-time Python UDF (``BatchEvalPython``).
  Accepted for convenience/prototyping; a registered scalar fn carries a
  ``vectorize me`` warning in :func:`describe`.

Registration is declarative and session-independent: ``@register_pandas``
at import time records the function; :func:`install` binds every recorded
function into a live SparkSession (``spark.udf.register``) so extensions
work from both the DataFrame API (the returned Column fn) and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Extension:
    name: str
    fn: Callable
    return_type: str
    vectorized: bool

    @property
    def udf(self) -> Callable:
        if self.vectorized:
            return F.pandas_udf(self.fn, returnType=self.return_type)
        return F.udf(self.fn, returnType=self.return_type)


_REGISTRY: dict[str, Extension] = {}


def register_pandas(name: str, return_type: str) -> Callable:
    """Decorator: register an Arrow-batched pandas UDF (Series → Series)."""

    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = Extension(name, fn, return_type, vectorized=True)
        return fn

    return deco


def register_scalar(name: str, return_type: str) -> Callable:
    """Decorator: register a row-at-a-time Python UDF (slow path)."""

    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = Extension(name, fn, return_type, vectorized=False)
        return fn

    return deco


def get(name: str) -> Callable:
    """Column-function form of a registered extension (DataFrame API use)."""
    return _REGISTRY[name].udf


def install(spark: SparkSession) -> list[str]:
    """Bind every registered extension into the session for SQL use.
    Returns the installed names."""
    for ext in _REGISTRY.values():
        spark.udf.register(ext.name, ext.udf)
    return sorted(_REGISTRY)


def describe() -> dict[str, str]:
    """name → one-line contract, flagging slow-path registrations."""
    return {
        e.name: f"{'pandas (Arrow, vectorized)' if e.vectorized else 'scalar Python — vectorize me'} -> {e.return_type}"
        for e in _REGISTRY.values()
    }
