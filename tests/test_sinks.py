"""Sink semantics (SURVEY.md §2.1): dynamic partition replacement only
rewrites incoming partitions and is idempotent; insert-if-absent is
null-safe on keys (fixes reference BUG-004)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_etl_spark.sources.sinks import (
    append,
    full_refresh,
    insert_if_absent,
    replace_partitions,
)

SCHEMA = T.StructType(
    [
        T.StructField("d", T.StringType()),
        T.StructField("k", T.IntegerType(), True),
        T.StructField("v", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_replace_partitions_only_touches_incoming(spark, tmp_path):
    path = str(tmp_path / "t")
    full = _df(spark, [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c"), ("d3", 4, "d")])
    replace_partitions(full, path, "d")

    # replace ONLY d1 with one different row
    repl = _df(spark, [("d1", 9, "z")])
    replace_partitions(repl, path, "d")
    got = sorted(spark.read.parquet(path).collect(), key=lambda r: (r["d"], r["k"]))
    assert [(r["d"], r["k"], r["v"]) for r in got] == [
        ("d1", 9, "z"), ("d2", 3, "c"), ("d3", 4, "d")
    ]

    # idempotent: replaying the same range converges
    replace_partitions(repl, path, "d")
    assert spark.read.parquet(path).count() == 3


def test_append_and_full_refresh(spark, tmp_path):
    path = str(tmp_path / "t")
    append(_df(spark, [("d1", 1, "a")]), path)
    append(_df(spark, [("d1", 2, "b")]), path)
    assert spark.read.parquet(path).count() == 2
    full_refresh(_df(spark, [("d9", 9, "z")]), path)
    got = spark.read.parquet(path).collect()
    assert len(got) == 1 and got[0]["d"] == "d9"


def test_insert_if_absent_null_safe_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _df(spark, [("d1", 1, "a"), ("d1", None, "n")])
    append(base, path)

    new = _df(
        spark,
        [
            ("d1", 1, "dup-key"),      # exists -> skipped
            ("d1", None, "null-dup"),  # NULL key exists -> must be skipped (BUG-004 fix)
            ("d2", 5, "fresh"),
        ],
    )
    n = insert_if_absent(spark, new, path, keys=["k"])
    assert n == 1
    got = spark.read.parquet(path).toPandas().sort_values("v")["v"].tolist()
    assert got == ["a", "fresh", "n"]


def test_insert_if_absent_into_empty_dir(spark, tmp_path):
    path = str(tmp_path / "t")
    n = insert_if_absent(spark, _df(spark, [("d1", 1, "a")]), path, keys=["k"])
    assert n == 1 and spark.read.parquet(path).count() == 1


def test_signed_measure(spark):
    from medallion_etl_spark.sources.sinks import signed_measure

    df = spark.createDataFrame(
        [("R", 5.0), ("A", 3.0)], ["flag", "qty"]
    ).select(signed_measure("qty", "flag", "R").alias("s"))
    assert sorted(r["s"] for r in df.collect()) == [-5.0, 3.0]
