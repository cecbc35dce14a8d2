"""Round-3 maintenance-surface review findings, pinned:

- expire's clone guard reads the ON-DISK HEAD registry (a clone
  registered after the expiring handle loaded is still protected);
- clone metadata does not inherit the source's clone registry;
- expire deletes expired METADATA first and honors a grace window for
  young unreferenced dirs (in-flight writer guard);
- drop_column refuses a column referenced by a CHECK constraint and
  keeps the recorded clustering spec truthful;
- rebucket falls back to key sort if the recorded zorder spec names a
  vanished column;
- lookup uses the declared key type (custom-schema tables);
- a feed from the empty snapshot is exempt from the retention gate.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_etl_spark.cdc.apply import apply_batch
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.schemas import EVENTS_SCHEMA


def _ev_df(spark, lsns, key_mod=7):
    rows = [
        (lsn, "U", f"k{lsn % key_mod}", [lsn, 1, 2], 3, "s", None, 2) for lsn in lsns
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def _build(spark, root, spans):
    t = LakeTable.create(root, n_buckets=4, schema_version=2)
    for i, (lo, hi) in enumerate(spans):
        apply_batch(spark, t, _ev_df(spark, range(lo, hi)), batch_id=i, lsn_lo=lo, lsn_hi=hi - 1)
        t = LakeTable.load(root)
    return t


def test_expire_protects_clone_registered_after_handle_load(spark, tmp_path):
    root = str(tmp_path / "src")
    t = _build(spark, root, [(0, 50), (50, 100)])
    stale = LakeTable.load(root)  # handle BEFORE the clone exists
    clone = t.clone_to(str(tmp_path / "clone"))
    assert LakeTable.load(root).meta["clones"]  # registered on HEAD
    # move pointers so old dirs become unreferenced
    apply_batch(
        spark, LakeTable.load(root), _ev_df(spark, range(100, 150)),
        batch_id=2, lsn_lo=100, lsn_hi=149,
    )
    stale.meta["version"] = stale.version  # (unchanged; stale registry)
    with pytest.raises(ValueError, match="shallow clone"):
        stale.expire_snapshots(keep_last=1, grace_seconds=0)
    assert clone.read(spark).count() > 0


def test_clone_does_not_inherit_clone_registry(spark, tmp_path):
    root = str(tmp_path / "src")
    t = _build(spark, root, [(0, 40)])
    t.clone_to(str(tmp_path / "c1"))
    c2 = LakeTable.load(root).clone_to(str(tmp_path / "c2"))
    assert "clones" not in c2.meta
    assert LakeTable.load(str(tmp_path / "c2")).meta.get("clones") is None


def test_expire_grace_window_spares_young_dirs_and_deletes_metadata_first(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _build(spark, root, [(0, 40), (40, 80)])
    res = t.expire_snapshots(keep_last=1)  # default grace: dirs are seconds old
    assert res["expired_versions"] and res["removed_dirs"] == []
    # expired metadata is gone even though data survived as orphans
    with pytest.raises(ValueError, match="no snapshot"):
        LakeTable.load_version(root, res["expired_versions"][0])
    # a zero-grace re-run reclaims the now-unreferenced orphan dirs
    res2 = LakeTable.load(root).expire_snapshots(keep_last=1, grace_seconds=0)
    assert LakeTable.load(root).read(spark).count() > 0


def test_drop_column_refuses_constraint_reference_and_clears_clustering(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _build(spark, root, [(0, 60)])
    t.add_constraint(spark, "tok_pos", "n_tok > 0")
    t = LakeTable.load(root)
    with pytest.raises(ValueError, match="tok_pos"):
        t.drop_column("n_tok")
    t.drop_constraint("tok_pos")
    t = LakeTable.load(root)
    t.compact(spark, watermark_lsn=59, zorder_by=["n_tok"])
    t = LakeTable.load(root)
    assert t.meta["clustering"]["cols"] == ["n_tok"]
    t.drop_column("n_tok")
    t = LakeTable.load(root)
    assert t.meta["clustering"] == {"kind": "key", "cols": ["doc_id"]}
    # rebucket no longer trips over the dropped column either way
    res = t.rebucket(spark, 8)
    assert LakeTable.load(root).read(spark).count() > 0


def test_lookup_uses_declared_key_type(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    t = LakeTable.create(
        str(tmp_path / "t"), n_buckets=4, key_col="id", schema_version=1,
        schemas={1: schema},
    )
    ev = spark.createDataFrame(
        [(i, "U", i, f"v{i}", 1) for i in range(30)],
        "lsn long, op string, id long, val string, schema_version int",
    )
    apply_batch(spark, t, ev, batch_id=0, lsn_lo=0, lsn_hi=29)
    t = LakeTable.load(t.root)
    got = {r["id"]: r["val"] for r in t.lookup(spark, [3, 17]).collect()}
    assert got == {3: "v3", 17: "v17"}


def test_feed_from_empty_snapshot_exempt_from_retention_gate(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _build(spark, root, [(0, 60)])
    t.compact(spark, watermark_lsn=59)  # records a purge point
    t = LakeTable.load(root)
    assert int(t.meta["compaction_watermark_lsn"]) >= 0
    feed = t.read_changes(spark, since_version=0)  # empty old: complete
    assert feed.count() == t.read(spark).count()
