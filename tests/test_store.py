"""VersionedStore / DomainStore semantics ported from the reference suite
(test/elephantdb/store/versioned_store_test.clj:12-39,
test/elephantdb/common/spec_test.clj:9-24)."""

from __future__ import annotations

import os

import pytest

from elephantdb_spark.spec import DomainSpec, SpecMismatchError
from elephantdb_spark.store import DomainStore, VersionedStore, shard_dirname


def test_create_succeed_resolve(tmp_path):
    vs = VersionedStore(str(tmp_path / "d"))
    assert vs.all_versions() == []
    assert vs.most_recent_version() is None

    p1 = vs.create_version(1)
    os.makedirs(p1)
    # unpublished versions are invisible (versioned_store_test.clj:30-39)
    assert vs.all_versions() == []
    vs.succeed_version(1)
    assert vs.all_versions() == [1]
    assert vs.most_recent_version() == 1

    p3 = vs.create_version(3)
    os.makedirs(p3)
    vs.succeed_version(3)
    assert vs.all_versions() == [3, 1]  # most recent first
    assert vs.most_recent_version() == 3
    # mostRecentVersion(maxVersion) is inclusive (VersionedStore.java:69-76)
    assert vs.most_recent_version(max_version=2) == 1
    assert vs.most_recent_version(max_version=3) == 3
    assert vs.most_recent_version(max_version=0) is None


def test_create_existing_version_fails(tmp_path):
    vs = VersionedStore(str(tmp_path))
    os.makedirs(vs.create_version(5))
    vs.succeed_version(5)
    with pytest.raises(RuntimeError):
        vs.create_version(5)


def test_create_clears_incomplete_leftover(tmp_path):
    vs = VersionedStore(str(tmp_path))
    p = vs.version_path(7)
    os.makedirs(p)
    open(os.path.join(p, "junk"), "w").close()
    path = vs.create_version(7)  # unpublished leftover → cleared
    assert not os.path.exists(path)


def test_fail_version_removes_everything(tmp_path):
    vs = VersionedStore(str(tmp_path))
    p = vs.create_version(9)
    os.makedirs(p)
    vs.succeed_version(9)
    vs.fail_version(9)
    assert vs.all_versions() == []
    assert not os.path.exists(p)


def test_cleanup_keeps_n_newest(tmp_path):
    vs = VersionedStore(str(tmp_path))
    for v in (1, 2, 3, 4):
        os.makedirs(vs.create_version(v))
        vs.succeed_version(v)
    # an unpublished junk dir should be removed too (VersionedStore.java:110-127)
    os.makedirs(vs.version_path(99))
    vs.cleanup(versions_to_keep=2)
    assert vs.all_versions() == [4, 3]
    assert not os.path.exists(vs.version_path(99))
    assert not os.path.exists(vs.version_path(1))


def test_spec_round_trip_and_mismatch(tmp_path):
    spec = DomainSpec(num_shards=4, persistence_opts={"compression": "snappy"})
    root = str(tmp_path / "dom")
    store = DomainStore.create_or_open(root, spec)
    assert store.spec == spec

    # reopen with equal spec OK
    DomainStore.create_or_open(root, DomainSpec(num_shards=4, persistence_opts={"compression": "snappy"}))
    # reopen with no spec OK (reads stored)
    assert DomainStore.open(root).spec == spec
    # mismatch → error (DomainStore.java:40-53)
    with pytest.raises(SpecMismatchError):
        DomainStore.create_or_open(root, DomainSpec(num_shards=8))


def test_spec_positive_shards():
    with pytest.raises(ValueError):
        DomainSpec(num_shards=0)


def test_synchronize_versions_copy_forward(tmp_path):
    spec = DomainSpec(num_shards=4)
    store = DomainStore.create_or_open(str(tmp_path / "dom"), spec)
    old = store.create_version(1)
    for s in (0, 1, 2, 3):
        d = os.path.join(old, shard_dirname(s))
        os.makedirs(d)
        open(os.path.join(d, f"part-{s}.parquet"), "w").write(str(s))
    store.succeed_version(1)

    new = store.create_version(2)
    d = os.path.join(new, shard_dirname(1))  # batch touched only shard 1
    os.makedirs(d)
    open(os.path.join(d, "part-new.parquet"), "w").write("new")

    copied = store.synchronize_versions(1, 2)
    assert copied == [0, 2, 3]
    assert os.path.exists(os.path.join(new, shard_dirname(0), "part-0.parquet"))
    # shard 1 not overwritten
    assert os.path.exists(os.path.join(new, shard_dirname(1), "part-new.parquet"))
    assert not os.path.exists(os.path.join(new, shard_dirname(1), "part-1.parquet"))


def test_cleanup_on_never_created_root_is_noop(tmp_path):
    # ADVICE r1: cleanup() on a root that was never created must not raise
    store = VersionedStore(str(tmp_path / "does_not_exist"))
    store.cleanup()
    store.cleanup(versions_to_keep=2)
    assert store.all_versions() == []


def test_cleanup_gcs_aside_of_version_deleted_in_same_pass(tmp_path):
    """Review finding (r4, pass 3): the published-set check ran live per
    aside while the same loop deleted version tokens — listdir order
    could leave a published version's crash-leftover aside un-GC-able
    forever. The snapshot makes it deterministic."""
    import os

    from elephantdb_spark.store import VersionedStore

    vs = VersionedStore(str(tmp_path / "dom"))
    for v in (5, 6):
        vs.create_version(v)
        vs.succeed_version(v)
    aside = vs.staging_aside_path(5)
    os.makedirs(aside)
    with open(os.path.join(aside, "batch-0"), "w") as fh:
        fh.write("staged")
    vs.cleanup(versions_to_keep=1)
    assert vs.all_versions() == [6]
    assert not os.path.exists(aside), "published-version aside must GC"
