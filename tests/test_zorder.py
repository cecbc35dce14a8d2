"""Z-order compaction (cdc/zorder.py): data is preserved, files are
physically sorted by the documented Z-value (verified bit-for-bit
against a Python mirror of the coding), and row-group min/max stats
on the interleaved dimensions get tighter than key-sorted layout —
the property that buys non-key-predicate row-group pruning."""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.apply import apply_batch
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.cdc.zorder import zvalue_col

BITS = 8
N_BINS = 1 << BITS


def _events(spark, n=40_000):
    # n_tok sweeps 0..9999 (co-prime stride), source cycles s0..s7 —
    # both dimensions are uncorrelated with doc_id, so a key sort
    # leaves them unclustered
    return spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.sequence(F.lit(0), F.lit(31)).alias("tokens"),
        ((F.col("id") * 37) % 10_000).cast("long").alias("n_tok"),
        F.concat(F.lit("s"), F.col("id") % 8).alias("source"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(1).alias("schema_version"),
    )


def _build(spark, root):
    t = LakeTable.create(root, n_buckets=4)
    apply_batch(
        spark, t, _events(spark), batch_id=0, lsn_lo=0, lsn_hi=39_999, merge_path="agg"
    )
    return LakeTable.load(root)


def _bucket_files(table):
    out = []
    for entry in table.meta["buckets"].values():
        d = os.path.join(table.root, entry["dir"])
        out.extend(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
    return out


# -- Python mirror of the zvalue coding --------------------------------


def _sprefix(s):
    b = s.encode("utf-8")[:4]
    return float(int.from_bytes(b, "big")) if b else None


def _code(v, lo, hi):
    if v is None or hi <= lo:
        return 0
    return int(min(N_BINS - 1, max(0, math.floor((v - lo) / (hi - lo) * N_BINS))))


def _pyz(codes):
    z = 0
    for b in range(BITS):
        for i, c in enumerate(codes):
            z |= ((c >> b) & 1) << (b * len(codes) + i)
    return z


def test_zorder_compact_preserves_data_and_records_clustering(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    before = sorted(
        (r["doc_id"], r["n_tok"], r["source"])
        for r in table.read(spark).collect()
    )
    table.compact(spark, watermark_lsn=-1, zorder_by=["n_tok", "source"])
    table = LakeTable.load(table.root)
    after = sorted(
        (r["doc_id"], r["n_tok"], r["source"])
        for r in table.read(spark).collect()
    )
    assert after == before
    assert table.meta["clustering"] == {"kind": "zorder", "cols": ["n_tok", "source"]}


def test_files_are_sorted_by_the_documented_zvalue(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    table.compact(spark, watermark_lsn=-1, zorder_by=["n_tok", "source"])
    table = LakeTable.load(table.root)
    files = _bucket_files(table)
    assert files
    # global ranges over the same frame zvalue_col aggregated
    rows_all = []
    for f in files:
        tb = pq.read_table(f, columns=["n_tok", "source"])
        rows_all.append(tb.to_pylist())
    n_vals = [float(r["n_tok"]) for rows in rows_all for r in rows]
    s_vals = [_sprefix(r["source"]) for rows in rows_all for r in rows]
    lo_n, hi_n = min(n_vals), max(n_vals)
    lo_s, hi_s = min(s_vals), max(s_vals)
    for rows in rows_all:
        zs = [
            _pyz(
                [
                    _code(float(r["n_tok"]), lo_n, hi_n),
                    _code(_sprefix(r["source"]), lo_s, hi_s),
                ]
            )
            for r in rows
        ]
        assert zs == sorted(zs), "bucket file not in Z-value order"


def _avg_rowgroup_spread(files, col="n_tok"):
    spreads, groups = [], 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spreads.append(st.max - st.min)
            groups += md.num_row_groups
    return sum(spreads) / len(spreads), len(spreads)


def test_zorder_tightens_rowgroup_stats_vs_key_sort(spark, tmp_path):
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)  # force many row groups
    try:
        key_t = _build(spark, str(tmp_path / "key"))
        key_t.compact(spark, watermark_lsn=-1)  # default: key sort
        z_t = _build(spark, str(tmp_path / "z"))
        z_t.compact(spark, watermark_lsn=-1, zorder_by=["n_tok", "source"])
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)
    key_spread, key_groups = _avg_rowgroup_spread(_bucket_files(LakeTable.load(key_t.root)))
    z_spread, z_groups = _avg_rowgroup_spread(_bucket_files(LakeTable.load(z_t.root)))
    assert key_groups >= 8 and z_groups >= 8, "expected multiple row groups"
    # key-sorted layout leaves n_tok ~full-range per row group; the
    # Z-sorted layout must be meaningfully tighter (=> pruning works)
    assert z_spread < 0.6 * key_spread, (z_spread, key_spread)


def test_zvalue_rejects_bad_inputs(spark):
    df = _events(spark, n=10)
    with pytest.raises(ValueError, match="not in frame"):
        zvalue_col(df, ["nope"])
    with pytest.raises(ValueError, match="overflows"):
        zvalue_col(df, ["n_tok", "source", "lsn", "doc_id"], bits=16)
    with pytest.raises(ValueError, match="not Z-orderable"):
        zvalue_col(df, ["tokens"])
