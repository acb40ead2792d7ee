"""Bounded-liveness persist tracking (kinesis_vcr_spark/cacheutil.py):
scope isolation, eviction order, and post-eviction recompute safety."""

from __future__ import annotations

from kinesis_vcr_spark import cacheutil


def test_scopes_evict_independently_and_results_survive(spark):
    a = cacheutil.persist_tracked(
        "scope_a", spark.range(100).selectExpr("id", "id * 2 AS v")
    )
    b = cacheutil.persist_tracked("scope_b", spark.range(50))
    assert a.count() == 100 and b.count() == 50
    assert a.storageLevel.useMemory and b.storageLevel.useMemory

    cacheutil.evict_tracked("scope_a")
    assert not a.storageLevel.useMemory  # unpersisted
    assert b.storageLevel.useMemory  # other scope untouched
    # evicted frames still COMPUTE correctly (cache loss, not data loss)
    assert a.where("v >= 100").count() == 50
    assert cacheutil._TRACKED["scope_a"] == []

    # a second tracked call in the same scope evicts-then-tracks one
    cacheutil.evict_tracked("scope_b")
    c = cacheutil.persist_tracked("scope_b", spark.range(7))
    assert c.count() == 7
    assert len(cacheutil._TRACKED["scope_b"]) == 1
    cacheutil.evict_tracked("scope_b")


def test_eviction_tolerates_dead_session_handles(spark):
    # a handle whose unpersist raises must not break eviction
    class Boom:
        def unpersist(self, blocking=False):
            raise RuntimeError("session gone")

    cacheutil._TRACKED["scope_x"] = [Boom()]
    cacheutil.evict_tracked("scope_x")  # must not raise
    assert cacheutil._TRACKED["scope_x"] == []
