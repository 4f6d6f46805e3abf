"""A27 status machine transitions, mirroring the reference's
status_test.clj:6-24 (loading → ready → updating → failed) plus the
shutdown and recovery legs, observed through on-disk state.

Reference semantics (common/status.clj:5-45): ready? is true for
{ready, updating}; loading? for {loading, updating}; updating? =
loading? AND ready?; failed knocks out every other status.
"""

from __future__ import annotations

import os

import pytest

from elephantdb_spark.build import build_domain, update_domain
from elephantdb_spark.engine import Domain, Engine
from elephantdb_spark.spec import DomainSpec


def _kv(spark, items):
    return spark.createDataFrame(
        [(str(k).encode(), str(v).encode()) for k, v in items],
        "key binary, value binary",
    )


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "domains"))


def test_status_transitions_mirror_reference(spark, eng):
    root = eng.domain_root("dom")
    spec = DomainSpec(num_shards=4)

    # cold build in flight: version dir reserved, no token → loading
    from elephantdb_spark.store import DomainStore

    store = DomainStore.create_or_open(root, spec)
    os.makedirs(store.create_version(1))  # the writer creates the dir
    dom = Domain(spark, root, "dom")
    assert dom.status() == "loading"
    assert dom.is_loading() and not dom.is_ready() and not dom.is_updating()

    # publish → ready (to-ready)
    build_domain(spark, _kv(spark, [(1, "a"), (2, "b")]), root, spec, version=1)
    assert dom.status() == "ready"
    assert dom.is_ready() and not dom.is_loading()

    # to-loading from ready = updating: ready? AND loading? both true —
    # the domain keeps serving its published version during the update
    os.makedirs(store.create_version(2))
    assert dom.status() == "updating"
    assert dom.is_ready() and dom.is_loading() and dom.is_updating()
    assert dom.get(b"1") == b"a"  # still serving v1
    store.delete_version(2)

    # failed build knocks out every other status (to-failed)
    def exploding_indexer(df):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        update_domain(
            spark, _kv(spark, [(3, "c")]), root, version=3,
            indexer=exploding_indexer,
        )
    assert dom.status() == "failed"
    assert dom.is_failed()
    assert not (dom.is_ready() or dom.is_loading() or dom.is_updating())
    assert dom.store.last_failure()["version"] == 3
    assert "boom" in dom.store.last_failure()["error"]

    # a later successful publish supersedes the failure (back to ready)
    update_domain(spark, _kv(spark, [(3, "c")]), root, version=4)
    assert dom.status() == "ready"
    assert dom.store.last_failure() is None

    # shutdown wins over everything (to-shutdown)
    dom.shutdown()
    assert dom.status() == "shutdown" and dom.is_shutdown()
    assert not dom.is_ready()


def test_engine_serves_and_reports_during_update(spark, eng):
    spec = DomainSpec(num_shards=4)
    build_domain(spark, _kv(spark, [(1, "a")]), eng.domain_root("d1"), spec, version=1)
    dom = eng.domain("d1")
    os.makedirs(dom.store.create_version(2))  # update in flight
    assert eng.get_status() == {"d1": "updating"}
    assert eng.is_fully_loaded()  # ready? includes updating
    # register_views keeps serving the published version while updating
    assert eng.register_views() == ["edb_d1"]
    assert spark.sql("SELECT count(*) c FROM edb_d1").first().c == 1


def test_failed_status_is_durable_across_handles(spark, eng):
    spec = DomainSpec(num_shards=4)
    root = eng.domain_root("d2")
    build_domain(spark, _kv(spark, [(1, "a")]), root, spec, version=1)

    def exploding_indexer(df):
        raise RuntimeError("kaput")

    with pytest.raises(RuntimeError):
        update_domain(spark, _kv(spark, [(2, "b")]), root, version=2,
                      indexer=exploding_indexer)
    # a FRESH handle (simulated restart) observes the same failed state
    fresh = Domain(spark, root, "d2")
    assert fresh.status() == "failed"
    # ... but the published version still serves reads
    assert fresh.get(b"1") == b"a"
