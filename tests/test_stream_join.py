"""Watermarked stream-stream join (streaming/joins.py): an availableNow
drain over multiple micro-batches must emit exactly the match set the
batch twins produce — both the same-function-on-batch run and the
independently-implemented grain-bucketed range join."""

from __future__ import annotations

import pytest

from medallion_etl_spark.operators.rangejoin import view_purchase_range_join
from medallion_etl_spark.streaming.joins import view_purchase_stream_join


@pytest.fixture(scope="module")
def events_dir(spark, sf_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sjoin") / "events")
    spark.read.parquet(f"{sf_small}/events.parquet").repartition(4).write.parquet(out)
    return out


def _keyset(df):
    return sorted(
        (r["view_id"], r["purchase_id"], r["user_id"], r["gap_us"])
        for r in df.collect()
    )


def test_stream_join_equals_batch_and_range_join(spark, events_dir, sf_small):
    batch = spark.read.parquet(events_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")  # views and purchases split across batches
        .parquet(events_dir)
    )
    # The 4 files are RANDOMLY partitioned, so micro-batch 1 already
    # contains near-max timestamps; a watermark narrower than the data's
    # full time span would (correctly) drop older rows arriving in later
    # batches. A drop-free backfill drain needs watermark >= span.
    q = (
        view_purchase_stream_join(stream, watermark="3650 days")
        .writeStream.format("memory")
        .queryName("vp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _keyset(spark.sql("SELECT * FROM vp_join"))

    assert got == _keyset(view_purchase_stream_join(batch))
    # and against the independent grain-bucketed implementation
    # (drop its orderBy projection to the same columns)
    rj = view_purchase_range_join(spark, sf_small).select(
        "view_id", "purchase_id", "user_id", "gap_us"
    )
    assert got == _keyset(rj)
    assert len(got) > 0


def test_narrow_watermark_bounds_state_by_dropping_late_rows(spark, events_dir):
    """With a watermark narrower than the stream's disorder, late rows
    must be evicted/dropped rather than buffered forever — the result
    is a strict subset of the drop-free drain. This is the property
    that bounds state at 10^10-event scale."""
    batch = spark.read.parquet(events_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    q = (
        view_purchase_stream_join(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("vp_join_narrow")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    narrow = set(_keyset(spark.sql("SELECT * FROM vp_join_narrow")))
    full = set(_keyset(view_purchase_stream_join(batch)))
    assert narrow < full  # dropped some late matches, invented none
