"""Streaming windowed aggregations + custom stateful operator: the
streaming results (availableNow drain) must equal the same computation
done in one batch over the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.schemas import EVENTS_SCHEMA  # noqa: F401 (events uses driver schema)
from medallion_etl_spark.streaming.windows import (
    running_user_totals,
    sessionized_user_activity,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_small, tmp_path_factory):
    """The driver's events table re-laid-out as 4 files so the file
    stream yields multiple micro-batches."""
    out = str(tmp_path_factory.mktemp("wstream") / "events")
    spark.read.parquet(f"{sf_small}/events.parquet").repartition(4).write.parquet(out)
    return out


def _drain(spark, stream_df, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def _canon(pdf, keys):
    return pdf.sort_values(keys).reset_index(drop=True)


def test_windowed_counts_stream_equals_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(events_stream_dir)
    )
    got = _drain(
        spark, windowed_event_counts(stream), "win_counts", "complete"
    ).toPandas()
    exp = windowed_event_counts(batch).toPandas()
    keys = ["window_start", "event_type"]
    g, e = _canon(got, keys), _canon(exp, keys)
    assert len(g) == len(e)
    assert (g["n_events"].values == e["n_events"].values).all()
    assert (abs(g["sum_value"].values - e["sum_value"].values) < 1e-9).all()


def test_session_windows_stream_equals_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    got = _drain(
        spark, sessionized_user_activity(stream, gap="30 minutes"), "sess", "complete"
    ).toPandas()
    exp = sessionized_user_activity(batch, gap="30 minutes").toPandas()
    keys = ["user_id", "session_start"]
    g, e = _canon(got, keys), _canon(exp, keys)
    assert len(g) == len(e)
    assert (g["n_events"].values == e["n_events"].values).all()


def test_running_totals_stateful_across_batches(spark, events_stream_dir):
    """applyInPandasWithState accumulates across micro-batches: the
    LAST update emitted per user equals the one-shot batch aggregate."""
    batch = spark.read.parquet(events_stream_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")  # 4 micro-batches
        .parquet(events_stream_dir)
    )
    sink = _drain(spark, running_user_totals(stream), "running", "update").toPandas()
    # memory sink in update mode appends each emitted update; keep the
    # final row per user (cumulative totals grow monotonically)
    final = sink.sort_values(["user_id", "n_events"]).drop_duplicates("user_id", keep="last")
    exp = (
        batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("event_id").alias("last_event_id"),
        )
        .toPandas()
    )
    keys = ["user_id"]
    g, e = _canon(final, keys), _canon(exp, keys)
    assert len(g) == len(e)
    assert (g["n_events"].values == e["n_events"].values).all()
    assert (g["last_event_id"].values == e["last_event_id"].values).all()
    assert (abs(g["total_value"].values - e["total_value"].values) < 1e-6).all()
