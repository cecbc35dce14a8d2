"""EP2/EP3 orchestrator CLI: layer dispatch + the partial-refresh
convergence invariant (reference orchestrator.py:480-509 — replaying
any range is idempotent and converges; SURVEY.md §3 EP3). The CLI
functions are exercised directly with the shared session."""

from __future__ import annotations

from argparse import Namespace

import pytest

from scripts.orchestrator import (
    cmd_bronze,
    cmd_changes,
    cmd_gold,
    cmd_partial_refresh,
    cmd_snapshot,
    refresh_batch_id,
)


def _args(tmp_path, sf, **kw):
    base = {"sf_dir": sf, "out": str(tmp_path), "parallelism": 8}
    base.update(kw)
    return Namespace(**base)


def test_bronze_then_snapshot_and_changes(spark, tmp_path, sf_tiny):
    # explicit chunk_size: the default (fixed 1M, never data-derived —
    # a grown stream must re-plan identical chunk ids) would give one
    # batch at this scale, and the test wants the multi-batch path
    res = cmd_bronze(spark, _args(tmp_path, sf_tiny, chunk_size=400))
    assert res["rows_applied"] == 1000 and res["batches"] >= 2
    snap = cmd_snapshot(spark, _args(tmp_path, sf_tiny, version=1))
    assert snap["version"] == 1 and snap["rows"] > 0
    feed = cmd_changes(spark, _args(tmp_path, sf_tiny, since_version=1))
    assert sum(feed["changes"].values()) > 0


def test_partial_refresh_idempotent_and_any_order_converges(spark, tmp_path, sf_tiny):
    full = tmp_path / "full"
    cmd_bronze(spark, _args(full, sf_tiny))
    from medallion_etl_spark.cdc.table import LakeTable

    want = sorted(
        tuple(r) for r in LakeTable.load(str(full / "docs_table")).read(spark).collect()
    )

    # fresh table built ONLY from out-of-order range refreshes
    part = tmp_path / "part"
    ranges = [(500, 749), (0, 249), (750, 999), (250, 499)]
    for lo, hi in ranges:
        res = cmd_partial_refresh(spark, _args(part, sf_tiny, lsn_lo=lo, lsn_hi=hi))
        assert not res["skipped"]
    # re-running a range is a recorded no-op, not a double apply
    res = cmd_partial_refresh(spark, _args(part, sf_tiny, lsn_lo=500, lsn_hi=749))
    assert res["skipped"]
    got = sorted(
        tuple(r) for r in LakeTable.load(str(part / "docs_table")).read(spark).collect()
    )
    assert got == want


def test_refresh_batch_ids_stable_and_namespaced():
    a = refresh_batch_id(1, 250)
    assert a == refresh_batch_id(1, 250)
    assert a != refresh_batch_id(251, 500)
    assert (1 << 39) <= a < (1 << 40)  # above replay chunks, below stream epochs


def test_gold_query_dispatch_unknown_name_exits(spark, tmp_path, sf_tiny):
    with pytest.raises(SystemExit, match="unknown query"):
        cmd_gold(spark, _args(tmp_path, sf_tiny, entity="query", name="nope"))


def test_compact_zorder_via_cli(spark, tmp_path, sf_tiny):
    from medallion_etl_spark.cdc.table import LakeTable
    from scripts.orchestrator import _table_root, cmd_compact

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    res = cmd_compact(
        spark, _args(tmp_path, sf_tiny, watermark_lsn="0", zorder="n_tok,source")
    )
    assert res["buckets"]
    table = LakeTable.load(_table_root(str(tmp_path)))
    assert table.meta["clustering"] == {
        "kind": "zorder",
        "cols": ["n_tok", "source"],
        "coding": "linear",
    }
    # default path (no flag) must keep working and record the key sort
    cmd_compact(spark, _args(tmp_path, sf_tiny, watermark_lsn="0", zorder=None))
    table = LakeTable.load(_table_root(str(tmp_path)))
    assert table.meta["clustering"]["kind"] == "key"


def test_dml_via_cli(spark, tmp_path, sf_tiny):
    from scripts.orchestrator import _table_root, cmd_delete_where, cmd_update_where
    from medallion_etl_spark.cdc.table import LakeTable

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    root = _table_root(str(tmp_path))
    before = LakeTable.load(root).read(spark).count()

    upd = cmd_update_where(
        spark,
        _args(tmp_path, sf_tiny, predicate="source = 'click'", set=["lang='xx'"]),
    )
    assert upd["committed"] and upd["rows_updated"] > 0
    table = LakeTable.load(root)
    assert (
        table.read(spark).filter("source = 'click' AND lang = 'xx'").count()
        == upd["rows_updated"]
    )

    dele = cmd_delete_where(
        spark, _args(tmp_path, sf_tiny, predicate="source = 'click'")
    )
    assert dele["rows_deleted"] == upd["rows_updated"]
    assert LakeTable.load(root).read(spark).count() == before - dele["rows_deleted"]


def test_constraints_via_cli(spark, tmp_path, sf_tiny):
    from scripts.orchestrator import (
        _table_root,
        cmd_add_constraint,
        cmd_drop_constraint,
    )
    from medallion_etl_spark.cdc.table import LakeTable

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    root = _table_root(str(tmp_path))

    res = cmd_add_constraint(
        spark, _args(tmp_path, sf_tiny, name="tok_pos", predicate="n_tok >= 0")
    )
    assert res["constraint"] == "tok_pos"
    assert LakeTable.load(root).constraints == {"tok_pos": "n_tok >= 0"}

    cmd_drop_constraint(spark, _args(tmp_path, sf_tiny, name="tok_pos"))
    assert LakeTable.load(root).constraints == {}


def test_convert_clone_restore_via_cli(spark, tmp_path, sf_tiny):
    import os

    from scripts.orchestrator import (
        _table_root,
        cmd_clone,
        cmd_convert,
        cmd_restore,
    )
    from medallion_etl_spark.cdc.table import LakeTable

    # bronze a table, snapshot its rows to parquet, CONVERT that parquet
    src_out = tmp_path / "src"
    cmd_bronze(spark, _args(src_out, sf_tiny))
    table = LakeTable.load(_table_root(str(src_out)))
    n_rows = table.read(spark).count()
    snap = str(tmp_path / "snap")
    table.read(spark).write.parquet(snap)

    conv_out = tmp_path / "conv"
    os.makedirs(conv_out, exist_ok=True)
    res = cmd_convert(
        spark,
        _args(conv_out, sf_tiny, source=snap, n_buckets="8", schema_version="2"),
    )
    assert res["rows_converted"] == n_rows

    # CLONE the converted table; the clone reads identically
    clone_dst = str(tmp_path / "clone_t")
    cres = cmd_clone(spark, _args(conv_out, sf_tiny, dst=clone_dst))
    assert cres["cloned_to"] == clone_dst
    assert LakeTable.load(clone_dst).read(spark).count() == n_rows

    # RESTORE the bronzed table one version back
    v = table.version
    rres = cmd_restore(spark, _args(src_out, sf_tiny, version=str(v - 1)))
    assert rres == {"restored_to": v - 1, "version": v + 1}
    assert LakeTable.load(_table_root(str(src_out))).version == v + 1

    # snapshot --as-of with a far-future unix timestamp resolves to HEAD
    snap_res = cmd_snapshot(
        spark, _args(src_out, sf_tiny, version="9999999999", as_of=True)
    )
    assert snap_res["version"] == v + 1


def test_detail_via_cli(spark, tmp_path, sf_tiny):
    from scripts.orchestrator import cmd_detail

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    d = cmd_detail(spark, _args(tmp_path, sf_tiny))
    # rows from per-bucket commit stats (no Spark job), consistent with
    # an actual read; unknowns would surface as None, never 0
    from medallion_etl_spark.cdc.table import LakeTable
    from scripts.orchestrator import _table_root

    table = LakeTable.load(_table_root(str(tmp_path)))
    live = table.read(spark).count()
    # stored_rows includes not-yet-compacted tombstones; after a
    # compaction purges them the two counts must agree
    assert d["stored_rows"] >= live
    table.compact(spark, watermark_lsn=d["max_committed_lsn"])
    d2 = cmd_detail(spark, _args(tmp_path, sf_tiny))
    assert d2["stored_rows"] == live
    assert d["version"] == table.version - 1  # compact committed one more
    assert d["n_buckets"] == table.n_buckets
    assert d["committed_batches"] == len(table.committed_batches())
    assert d["max_committed_lsn"] == table.max_committed_lsn()
    assert d["cloned_from"] is None and d["last_restore_commit"] is None


def test_ddl_add_and_widen_column_via_cli(spark, tmp_path, sf_tiny):
    from scripts.orchestrator import cmd_add_column, cmd_widen_column

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    res = cmd_add_column(spark, _args(tmp_path, sf_tiny, name="score", type="double"))
    assert res["column"] == "score" and res["type"] == "double"
    res2 = cmd_add_column(spark, _args(tmp_path, sf_tiny, name="hits", type="int"))
    res3 = cmd_widen_column(spark, _args(tmp_path, sf_tiny, name="hits", type="bigint"))
    assert res3["schema_version"] == res2["schema_version"] + 1

    from medallion_etl_spark.cdc.table import LakeTable

    t = LakeTable.load(str(tmp_path / "docs_table"))
    df = t.read(spark)
    assert dict(df.dtypes)["score"] == "double"
    assert dict(df.dtypes)["hits"] == "bigint"
    assert df.count() > 0  # old files align (NULL columns) without a rewrite

    # expire via CLI: the DDL commits above left superseded history
    from scripts.orchestrator import cmd_expire

    res = cmd_expire(spark, _args(tmp_path, sf_tiny, keep_last="1", force=False))
    assert res["expired_versions"] and res["retained_versions"]


def test_refresh_signatures_cursor_and_rerun(spark, tmp_path, sf_tiny):
    """refresh-signatures bootstraps the derived table on first run,
    records its cursor as the refresh batch-id, advances by exactly
    the new versions on later runs, and a no-change re-run is a
    skip."""
    from medallion_etl_spark.cdc.table import LakeTable
    from medallion_etl_spark.operators.dedup_incremental import token_minhash
    from pyspark.sql import functions as F
    from scripts.orchestrator import cmd_refresh_signatures

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    sroot = str(tmp_path / "sig_table")
    res = cmd_refresh_signatures(spark, _args(tmp_path, sf_tiny, sig_root=sroot))
    assert not res["skipped"] and res["rows_applied"] > 0

    corpus = LakeTable.load(str(tmp_path / "docs_table"))
    exp = {
        r["doc_id"]: tuple(r["mh"])
        for r in corpus.read(spark)
        .select("doc_id", token_minhash(F.col("tokens")).alias("mh"))
        .collect()
    }
    got = {
        r["doc_id"]: tuple(r["mh"])
        for r in LakeTable.load(sroot).read(spark).collect()
    }
    assert got == exp

    # nothing new committed -> skip, cursor unchanged
    res2 = cmd_refresh_signatures(spark, _args(tmp_path, sf_tiny, sig_root=sroot))
    assert res2["skipped"] and res2["since_version"] == res["to_version"]


def test_refresh_signatures_rebootstrap_after_restore(spark, tmp_path, sf_tiny):
    """After a corpus RESTORE the feed cursor is unusable by design
    (stale higher-LSN signatures can't be reverted through LWW): the
    CLI must fail with guidance, and --rebootstrap must rebuild the
    signature table from the restored snapshot."""
    from medallion_etl_spark.cdc.table import LakeTable
    from medallion_etl_spark.operators.dedup_incremental import token_minhash
    from pyspark.sql import functions as F
    from scripts.orchestrator import cmd_refresh_signatures, cmd_restore

    # small chunks so bronze commits several versions (restore needs a
    # STRICTLY older snapshot to target)
    cmd_bronze(spark, _args(tmp_path, sf_tiny, chunk_size=400))
    sroot = str(tmp_path / "sig_table")
    cmd_refresh_signatures(spark, _args(tmp_path, sf_tiny, sig_root=sroot))

    cmd_restore(spark, _args(tmp_path, sf_tiny, version=1))
    with pytest.raises(SystemExit, match="rebootstrap"):
        cmd_refresh_signatures(spark, _args(tmp_path, sf_tiny, sig_root=sroot))

    res = cmd_refresh_signatures(
        spark, _args(tmp_path, sf_tiny, sig_root=sroot, rebootstrap=True)
    )
    assert res["bootstrapped"]
    corpus = LakeTable.load(str(tmp_path / "docs_table"))
    exp = {
        r["doc_id"]: tuple(r["mh"])
        for r in corpus.read(spark)
        .select("doc_id", token_minhash(F.col("tokens")).alias("mh"))
        .collect()
    }
    got = {
        r["doc_id"]: tuple(r["mh"])
        for r in LakeTable.load(sroot).read(spark).collect()
    }
    assert got == exp


def test_refresh_agg_cursor_rerun_and_rebootstrap(spark, tmp_path, sf_tiny):
    """refresh-agg bootstraps the totals table on first run, advances
    by exactly the new versions, skips when caught up, fails with
    guidance across a RESTORE, and --rebootstrap rebuilds."""
    from pyspark.sql import functions as F

    from medallion_etl_spark.cdc.table import LakeTable
    from medallion_etl_spark.operators.ivm import _contrib
    from scripts.orchestrator import cmd_refresh_agg, cmd_restore

    def expected():
        corpus = LakeTable.load(str(tmp_path / "docs_table"))
        rows = (
            _contrib(
                corpus.read(spark, raw=True).filter(
                    ~F.coalesce(F.col("_deleted"), F.lit(False))
                ),
                1,
            )
            .groupBy("source")
            .agg(F.sum("d_rows").alias("n"), F.sum("d_tok").alias("s"))
            .collect()
        )
        return {r["source"]: (r["n"], r["s"]) for r in rows}

    def got(aroot):
        return {
            r["source"]: (r["n_rows"], r["sum_tok"])
            for r in LakeTable.load(aroot).read(spark).collect()
        }

    cmd_bronze(spark, _args(tmp_path, sf_tiny, chunk_size=400))
    aroot = str(tmp_path / "agg_table")
    res = cmd_refresh_agg(spark, _args(tmp_path, sf_tiny, agg_root=aroot))
    assert res["bootstrapped"] and not res["skipped"]
    assert got(aroot) == expected()

    # caught up -> skip, cursor unchanged
    res2 = cmd_refresh_agg(spark, _args(tmp_path, sf_tiny, agg_root=aroot))
    assert res2["skipped"] and res2["since_version"] == res["to_version"]

    cmd_restore(spark, _args(tmp_path, sf_tiny, version=1))
    with pytest.raises(SystemExit, match="rebootstrap"):
        cmd_refresh_agg(spark, _args(tmp_path, sf_tiny, agg_root=aroot))
    res3 = cmd_refresh_agg(
        spark, _args(tmp_path, sf_tiny, agg_root=aroot, rebootstrap=True)
    )
    assert res3["bootstrapped"]
    assert got(aroot) == expected()


def test_wap_publish_via_cli(spark, tmp_path, sf_tiny):
    from medallion_etl_spark.cdc.table import LakeTable
    from scripts.orchestrator import _table_root, cmd_clone, cmd_publish

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    root = _table_root(str(tmp_path))
    stage = str(tmp_path / "stage")
    cmd_clone(spark, _args(tmp_path, sf_tiny, dst=stage))
    from medallion_etl_spark.cdc.dml import update_where

    update_where(spark, LakeTable.load(stage), "source = 'click'", {"lang": "'wap'"})
    res = cmd_publish(spark, _args(tmp_path, sf_tiny, stage=stage))
    assert res["published"]
    got = LakeTable.load(root).read(spark)
    assert got.filter("source = 'click' AND lang = 'wap'").count() > 0
    assert not LakeTable.exists(stage)


def test_redrive_via_cli(spark, tmp_path, sf_tiny):
    import os

    from pyspark.sql import functions as F

    from medallion_etl_spark.cdc.replay import replay
    from medallion_etl_spark.cdc.table import LakeTable
    from medallion_etl_spark.sources.readers import load_table
    from scripts.orchestrator import _table_root, cmd_redrive

    # build a quarantined table from the driver events with bad ops
    root = _table_root(str(tmp_path))
    from medallion_etl_spark.operators.cdc_query import _as_change_stream

    stream = _as_change_stream(load_table(spark, sf_tiny, "events"))
    dirty = stream.withColumn(
        "op", F.when(F.col("lsn") % 50 == 0, F.lit("X")).otherwise(F.col("op"))
    )
    table = LakeTable.create(root, n_buckets=4, schema_version=2)
    res = replay(spark, dirty, table, chunk_size=500, on_malformed="quarantine")
    assert res["rows_quarantined"] > 0
    out = cmd_redrive(
        spark,
        _args(
            tmp_path,
            sf_tiny,
            path=res["quarantine_path"],
            set=["op='U'"],
            on_still_bad="fail",
        ),
    )
    assert out["committed"] and out["redriven"] == res["rows_quarantined"]
    assert not os.path.exists(res["quarantine_path"])


def test_fold_deltas_via_cli(spark, tmp_path, sf_tiny):
    from pyspark.sql import functions as F

    from medallion_etl_spark.cdc.apply import apply_batch
    from medallion_etl_spark.cdc.table import LakeTable
    from medallion_etl_spark.operators.cdc_query import _as_change_stream
    from medallion_etl_spark.sources.readers import load_table
    from scripts.orchestrator import _table_root, cmd_fold_deltas

    cmd_bronze(spark, _args(tmp_path, sf_tiny))
    root = _table_root(str(tmp_path))
    t = LakeTable.load(root)
    hwm = t.max_committed_lsn()
    tail = (
        _as_change_stream(load_table(spark, sf_tiny, "events"))
        .limit(50)
        .withColumn("lsn", F.col("lsn") + hwm + 1)
    )
    apply_batch(
        spark, t, tail, batch_id=88, lsn_lo=hwm + 1, lsn_hi=hwm + 10_000,
        write_mode="mor",
    )
    res = cmd_fold_deltas(spark, _args(tmp_path, sf_tiny, min_deltas="1"))
    assert res["committed"] and res["folded_buckets"]
    head = LakeTable.load(root)
    assert not any(e.get("deltas") for e in head.meta["buckets"].values())
