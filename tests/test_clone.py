"""Shallow clone (LakeTable.clone_to): zero-copy metadata fork — the
Delta ``CREATE TABLE … SHALLOW CLONE`` analog. The clone points at the
source's data files with absolute references; copy-on-write keeps
every subsequent write on its own side, and compaction self-contains
the clone."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.dml import update_where
from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events

from .cdc_oracle import assert_frames_equal, canon

N_EVENTS = 3_000
N_KEYS = 200


@pytest.fixture()
def source(spark, tmp_path):
    events = gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS)
    root = str(tmp_path / "src")
    replay(spark, events, LakeTable.create(root, n_buckets=8), chunk_size=1_000)
    return LakeTable.load(root), events


def _local_data_dirs(root):
    return [d for d in os.listdir(os.path.join(root, "data"))]


def test_clone_reads_identically_without_copying_data(spark, tmp_path, source):
    table, _ = source
    dst = str(tmp_path / "clone")
    clone = table.clone_to(dst)

    assert clone.version == 0
    assert clone.meta["cloned_from"]["version"] == table.version
    assert _local_data_dirs(dst) == []  # zero bytes copied
    assert_frames_equal(
        clone.read(spark).toPandas(), canon(table.read(spark).toPandas())
    )

    with pytest.raises(ValueError, match="already a table"):
        table.clone_to(dst)


def test_clone_and_source_diverge_independently(spark, tmp_path, source):
    table, _ = source
    src_before = table.read(spark).toPandas()
    clone = table.clone_to(str(tmp_path / "clone"))

    # write on the clone: lands in clone-local dirs, source unmoved
    upd = update_where(spark, clone, "source = 'web'", {"lang": "'cloned'"})
    assert upd["committed"] and upd["rows_updated"] > 0
    assert _local_data_dirs(clone.root)  # clone now has own data
    assert_frames_equal(
        LakeTable.load(table.root).read(spark).toPandas(), canon(src_before)
    )

    # write on the source: clone unmoved
    update_where(spark, LakeTable.load(table.root), "source = 'web'", {"lang": "'src'"})
    clone_now = LakeTable.load(clone.root).read(spark).toPandas()
    assert set(clone_now.loc[clone_now["source"] == "web", "lang"]) == {"cloned"}


def test_clone_inherits_the_manifest_for_redelivery_dedupe(spark, tmp_path, source):
    """Replaying the SAME stream into the clone must apply nothing —
    the cloned manifest already records every chunk."""
    table, events = source
    clone = table.clone_to(str(tmp_path / "clone"))
    res = replay(spark, events, LakeTable.load(clone.root), chunk_size=1_000)
    assert res["batches_applied"] == 0


def test_compaction_self_contains_the_clone(spark, tmp_path, source):
    table, _ = source
    clone = table.clone_to(str(tmp_path / "clone"))
    before = clone.read(spark).toPandas()
    LakeTable.load(clone.root).compact(spark, watermark_lsn=N_EVENTS)

    now = LakeTable.load(clone.root)
    for entry in now.meta["buckets"].values():
        assert not os.path.isabs(entry["dir"])  # every pointer is local
        assert not entry.get("deltas")
    # live rows unchanged by compaction (only tombstones purged)
    assert_frames_equal(now.read(spark).toPandas(), canon(before))


def test_clone_carries_constraints_and_enforces_them(spark, tmp_path, source):
    table, _ = source
    table.add_constraint(spark, "tok_sane", "n_tok <= 64")
    clone = LakeTable.load(table.root).clone_to(str(tmp_path / "clone"))
    assert clone.constraints == {"tok_sane": "n_tok <= 64"}
    with pytest.raises(ValueError, match="check:tok_sane"):
        update_where(spark, clone, "true", {"n_tok": "n_tok + 100"})


def _advance_source(spark, table, events):
    """Rewrite the source's buckets past the cloned snapshot (a fresh
    COW replay of the same stream shifted to new LSNs)."""
    more = (
        events.withColumn("lsn", F.col("lsn") + N_EVENTS)
        .unionByName(events)
    )
    replay(spark, more, LakeTable.load(table.root), chunk_size=1_000)
    return LakeTable.load(table.root)


def test_source_expiry_refuses_to_dangle_registered_clone(spark, tmp_path, source):
    table, events = source
    clone = table.clone_to(str(tmp_path / "clone"))
    src = LakeTable.load(table.root)
    assert os.path.abspath(clone.root) in src.meta.get("clones", [])
    assert os.path.abspath(clone.root) in src.detail()["clones"]

    src = _advance_source(spark, src, events)
    want = canon(clone.read(spark).toPandas())
    with pytest.raises(ValueError, match="shallow clone"):
        src.expire_snapshots(keep_last=1, grace_seconds=0)
    # nothing was deleted: the clone still reads
    assert_frames_equal(
        LakeTable.load(clone.root).read(spark).toPandas(), want
    )
    # force overrides (accepting the dangle)
    res = src.expire_snapshots(keep_last=1, force=True, grace_seconds=0)
    assert res["removed_dirs"]


def test_source_expiry_after_clone_self_containment(spark, tmp_path, source):
    table, events = source
    clone = table.clone_to(str(tmp_path / "clone"))
    src = _advance_source(spark, table, events)

    # compaction self-contains the clone: every pointer goes local,
    # so the registered clone no longer blocks source retention
    LakeTable.load(clone.root).compact(spark, watermark_lsn=0)
    want = canon(LakeTable.load(clone.root).read(spark).toPandas())
    res = src.expire_snapshots(keep_last=1, grace_seconds=0)
    assert res["removed_dirs"]
    assert_frames_equal(
        LakeTable.load(clone.root).read(spark).toPandas(), want
    )
