"""Central query registry: merges every operator module's QUERIES/ORACLES
into the driver contract surface (__spark_entry__.py).

Invariants enforced at import time:
* no duplicate query names across modules;
* every oracle key has a matching query (a dangling oracle is a typo).
Queries without an oracle are the deliberately rows-only ones (seeded
LSH/sketches — see the module docstrings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from swiftbulkuploader_spark.operators import (
    analytics_extra,
    ann_index,
    arrays_maps,
    behavior,
    components,
    dedup,
    fuzzy_join,
    grouped_map,
    hierarchy,
    jsonops,
    media_queries,
    misc_surface,
    ml_lsh,
    model_store,
    mutations,
    pipeline_queries,
    profiling,
    range_join,
    scalar_suites,
    sessions,
    similarity,
    star,
    stats_inference,
    temporal,
    textops,
    timeseries,
    tpch_like,
    training_prep,
    tpch_more,
    udtf_ops,
    urlops,
    windows_extra,
)

_MODULES = (
    ann_index, model_store,
    pipeline_queries, star, textops, jsonops, profiling, dedup, similarity,
    sessions, misc_surface, analytics_extra, grouped_map, ml_lsh, range_join,
    temporal, tpch_like, tpch_more, timeseries, windows_extra, arrays_maps,
    scalar_suites, udtf_ops, stats_inference, hierarchy, training_prep,
    fuzzy_join, behavior, media_queries, components, mutations, urlops,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _merge() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            queries[name] = fn
        for name, sql in mod.ORACLES.items():
            if name not in mod.QUERIES:
                raise ValueError(f"dangling oracle {name!r} in {mod.__name__}")
            oracles[name] = sql
    return queries, oracles


QUERIES, ORACLES = _merge()
