"""Per-process shared-artifact cache for expensive intermediate tables.

A production dedup/ER deployment persists its intermediate artifacts — the
near-dup pair table, the FastSS candidate pairs, the fitted coarse
quantizer — once per corpus snapshot and fans many downstream consumers out
from them (clustering, canonical selection, audit reports). The query
registry mirrors that: several registered queries are *views over the same
artifact* (`llm_dedup_ngram_jaccard` emits the pair table that
`llm_dedup_clusters` / `llm_dedup_cluster_canonical` close into components;
`er_fuzzy_name_pairs` emits the pairs `er_fuzzy_entities` resolves).
Recomputing the shared subtree per query would misstate the cost of the
pipeline — a user runs the pair join once, not once per report.

This module is that persistence layer at harness scale: DataFrames are
materialized via ``localCheckpoint(eager=True)`` (executor block-manager
storage, the moral equivalent of the warehouse parquet a cluster deployment
would write) and memoized per (Spark application, artifact key). Keys must
encode every parameter that changes the artifact (sf_dir, thresholds,
hash widths); the application id scopes entries to one SparkSession so a
stopped session's dangling blocks are never returned to a new one.

Plan-audit escape hatch: under ``SPARK_GRAFT_PLAN_CAPTURE`` the cache is
bypassed and the builder's lazy DataFrame is returned, so captured plans
show the real computation instead of an opaque checkpoint scan (same
contract as `llm.dedup.jaccard_pairs_prefix`).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}

#: Persisted intermediates awaiting release at the next registered-query
#: boundary (see :func:`persist_tracked`).
_PERSIST_POOL: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``persist()`` with a QUERY-SCOPED lifecycle: the frame is registered
    for release at the next registered-query invocation
    (:func:`release_tracked`, called by ``harness.register``'s wrapper).

    Why not bare ``persist()``: Spark's CacheManager holds every persisted
    plan until explicit unpersist or session end, and it matches by
    CANONICALIZED plan — so a second invocation of the same query (a bench
    rep, a driver re-run) silently substitutes the previous invocation's
    InMemoryRelation for its own subtree. That is cross-invocation result
    caching: the r11 bench under-reported every query with a leaked
    persist (basket/recsys/graph/7 analytics sites) because reps 2-3 read
    rep 1's cache instead of recomputing. Tracked persists keep the
    within-query reuse (the reason these operators persist at all) while
    guaranteeing each invocation pays its own build.
    """
    out = df.persist()
    _PERSIST_POOL.append(out)
    return out


def release_tracked() -> None:
    """Unpersist every tracked frame from PRIOR query invocations.

    Invoked at the start of each registered query (harness.register), so a
    query's own persisted intermediates survive exactly until the next
    query begins — long enough for any consumer of its returned lazy
    DataFrame, never long enough to leak into another invocation's plan.
    """
    for df in _PERSIST_POOL:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _PERSIST_POOL.clear()


def shared_many(
    spark: SparkSession,
    keys: list[tuple],
    build: Callable[[], tuple],
) -> tuple:
    """Memoize a build that produces SEVERAL DataFrames atomically — e.g. a
    trainer that returns both its model table and the transformed table it
    computed along the way (`bpe_train_with_encoded`). All outputs cache
    under their own key in one shot, so consumers of either artifact never
    re-run the build. The builder is responsible for materialization (no
    automatic checkpoint here — multi-output builders already checkpoint
    internally)."""
    if os.environ.get("SPARK_GRAFT_PLAN_CAPTURE"):
        return build()
    app_id = spark.sparkContext.applicationId
    fulls = [(app_id, *k) for k in keys]
    if any(f not in _CACHE for f in fulls):
        for stale in [k for k in _CACHE if k[0] != app_id]:
            del _CACHE[stale]
        dfs = build()
        if len(dfs) != len(keys):
            raise ValueError("shared_many: build() arity != len(keys)")
        for f, df in zip(fulls, dfs):
            _CACHE[f] = df
    return tuple(_CACHE[f] for f in fulls)


def shared_df(
    spark: SparkSession,
    key: tuple,
    build: Callable[[], DataFrame],
    materialize: bool = True,
) -> DataFrame:
    """Return the artifact for `key`, building + materializing it on first
    use within this Spark application.

    `materialize=False` is for builders whose output is already an eagerly
    materialized table (e.g. `jaccard_pairs_prefix` localCheckpoints its
    verified pairs) — the cache then just memoizes the handle instead of
    stacking a second checkpoint on top.
    """
    if os.environ.get("SPARK_GRAFT_PLAN_CAPTURE"):
        return build()
    app_id = spark.sparkContext.applicationId
    full = (app_id, *key)
    df = _CACHE.get(full)
    if df is None:
        # evict entries from stopped sessions before inserting: keys are
        # app-scoped so stale entries are never *returned*, but without this
        # sweep their DataFrame handles would accumulate forever in a
        # long-lived process that restarts SparkSessions
        for stale in [k for k in _CACHE if k[0] != app_id]:
            del _CACHE[stale]
        df = build()
        if materialize:
            df = df.localCheckpoint(eager=True)
        _CACHE[full] = df
    return df
