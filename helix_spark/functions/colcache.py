"""Module-level cache for pure Column expression trees.

A PySpark ``Column`` is an immutable expression tree over unresolved
attribute NAMES — the same object is reusable across any number of
DataFrames and plans. Building a big forest (a 64-element literal array per
hyperplane, a lambda-heavy dot product, a multi-projection regex chain)
costs hundreds of py4j round trips (~1 ms each), and the hot callers — the
crawl's admit path once per WAVE, every timed battery invocation — rebuild
the identical trees each time. Caching them moves that driver cost to
once-per-process (guide §1.2: per-task — here per-call — work that a cache
removes outright).

Keys are ``(id(py4j gateway), *caller key)``: a recycled JVM gets fresh
trees (a cached JavaObject would dangle), while every session inside one
JVM shares the cache. Values must be PURE trees: no data-dependent state
beyond what the caller encodes in its key (literal vectors go in the key as
tuples).
"""

from __future__ import annotations

from typing import Callable

_CACHE: dict = {}


def _gateway_id() -> int:
    from pyspark import SparkContext

    return id(SparkContext._gateway)


def cached_col(key: tuple, builder: Callable):
    """Return the cached Column (or tuple of Columns) for ``key``, building
    it once per JVM. ``key`` must capture every input the builder depends
    on (names, literals, flags)."""
    k = (_gateway_id(),) + key
    hit = _CACHE.get(k)
    if hit is None:
        hit = builder()
        _CACHE[k] = hit
    return hit
