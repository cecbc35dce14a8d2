"""Length-percentile op: the exact (oracle-paired) variant and the
bounded-state approx_percentile scale path agree within sketch error."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_etl_spark.operators.textops import PCTS, doc_length_percentiles
from medallion_etl_spark.sources.readers import load_table as T

SF = "/root/testdata/sf0.001"


def test_approx_percentile_tracks_exact(spark):
    exact = doc_length_percentiles(spark, SF).toPandas().set_index("source")
    docs = T(spark, SF, "documents")
    apct = F.approx_percentile(
        F.col("n_chars"), F.array(*[F.lit(p) for p in PCTS]), F.lit(10_000)
    )
    approx = (
        docs.groupBy("source")
        .agg(
            apct[0].alias("p50_chars"),
            apct[1].alias("p90_chars"),
            apct[2].alias("p99_chars"),
        )
        .toPandas()
        .set_index("source")
    )
    assert set(approx.index) == set(exact.index)
    for src in exact.index:
        for col in ("p50_chars", "p90_chars", "p99_chars"):
            e, a = float(exact.loc[src, col]), float(approx.loc[src, col])
            # approx returns a real member of the group; exact
            # interpolates between members — allow one member's gap
            assert abs(e - a) <= max(0.05 * e, 30.0), (src, col, e, a)


def test_exact_percentiles_monotone_and_bounded(spark):
    pdf = doc_length_percentiles(spark, SF).toPandas()
    assert (pdf["p50_chars"] <= pdf["p90_chars"]).all()
    assert (pdf["p90_chars"] <= pdf["p99_chars"]).all()
    assert (pdf["p99_chars"] <= pdf["max_chars"]).all()
    assert (pdf["n_docs"] > 0).all()
