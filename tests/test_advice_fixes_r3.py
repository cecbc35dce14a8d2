"""Round-3 ADVICE regression pins.

1. A concurrent rebucket() mid-replay must not let the retry path
   reuse upfront per-bucket stats computed under the OLD layout —
   stale _bucket ids against the new layout would merge a partial base
   and silently drop every untouched key in the replaced buckets.
2. detail().stored_rows must count merge-on-read delta rows (same
   entry_sources walk bucket_rows() uses).
3. The Z-order string range code must be order-preserving for strings
   shorter than the 4-byte prefix width (pad with 0x00, which sorts
   below every byte, before the hex/conv integer view).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable, entry_sources
from medallion_etl_spark.synth import gen_events


def test_replay_recomputes_stats_after_concurrent_rebucket(spark, tmp_path):
    """GROW direction is the provably-lossy one without the guard: the
    stale 8-layout changed-bucket ids cannot name buckets 8..31, so the
    merge would read a partial base and the commit would replace
    new-layout buckets with chunk-only rows."""
    root = str(tmp_path / "t")
    clean_root = str(tmp_path / "clean")
    LakeTable.create(root, n_buckets=8)
    ev = gen_events(spark, n_events=4_000, n_keys=300).cache()
    ev.count()
    replay(spark, ev.filter("lsn < 2000"), LakeTable.load(root), chunk_size=2_000)

    stale = LakeTable.load(root)  # upfront stats will address 8 buckets
    LakeTable.load(root).rebucket(spark, 32)  # concurrent layout change

    res = replay(spark, ev, stale, chunk_size=2_000)
    assert res["batches_applied"] == 1  # chunk 0 skipped, chunk 1 re-applied

    final = LakeTable.load(root)
    assert final.n_buckets == 32
    LakeTable.create(clean_root, n_buckets=32)
    replay(spark, ev, LakeTable.load(clean_root), chunk_size=2_000)
    got = sorted(tuple(r) for r in final.read(spark).collect())
    want = sorted(tuple(r) for r in LakeTable.load(clean_root).read(spark).collect())
    assert got == want


def test_apply_batch_refuses_stale_layout_stats(spark, tmp_path):
    from medallion_etl_spark.cdc.apply import apply_batch

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    ev = gen_events(spark, n_events=200, n_keys=40)
    fake_stats = [
        {"_bucket": 0, "rows_applied": 1, "lsn_lo": 0, "lsn_hi": 0, "max_sv": None}
    ]
    with pytest.raises(ValueError, match="n_buckets=4 but the table now has 8"):
        apply_batch(
            spark,
            LakeTable.load(root),
            ev,
            0,
            0,
            199,
            precomputed_stats=fake_stats,
            precomputed_stats_n_buckets=4,
        )


def test_detail_counts_mor_delta_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=4)
    ev = gen_events(spark, n_events=2_000, n_keys=150).cache()
    ev.count()
    replay(spark, ev.filter("lsn < 1000"), LakeTable.load(root), chunk_size=1_000)
    replay(spark, ev, LakeTable.load(root), chunk_size=1_000, write_mode="mor")

    t = LakeTable.load(root)
    d = t.detail()
    assert d["delta_dirs"] > 0
    base_only = sum(int(e["rows"]) for e in t.meta["buckets"].values())
    delta_rows = sum(
        int(s["rows"])
        for e in t.meta["buckets"].values()
        for s in entry_sources(e)
        if s["didx"] > 0
    )
    assert delta_rows > 0
    assert d["stored_rows"] == base_only + delta_rows == t.bucket_rows()


def test_zorder_string_code_order_preserving(spark):
    from medallion_etl_spark.cdc.zorder import _as_ordered_double

    vals = ["", "a", "aab", "ab", "aba", "abcd", "abcde", "abcz", "z", "ábc"]
    df = spark.createDataFrame([(v,) for v in vals], "name string")
    rows = df.select(
        "name", _as_ordered_double(T.StringType(), "name").alias("code")
    ).collect()
    codes = {r["name"]: r["code"] for r in rows}
    by_bytes = sorted(vals, key=lambda s: s.encode("utf-8"))
    for x, y in zip(by_bytes, by_bytes[1:]):
        assert codes[x] <= codes[y], (x, y)
    # the specific inversion from ADVICE: unpadded 'ab' coded below 'aab'
    assert codes["ab"] > codes["aab"]
