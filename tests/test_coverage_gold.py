"""Gold coverage operators: hectolitros NULL-propagation contract
(reference fact_ventas.py:75-77, plan_htls_gold.md:9) and the coverage
multi-output shared pre-agg (reference cobertura.py:436-446)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from medallion_etl_spark.functions.exprs import dsum
from medallion_etl_spark.operators.coverage import (
    coverage_outputs,
    hectolitros_measure,
)


def test_null_factor_propagates_to_null_measure(spark):
    """LEFT-join factor lookup: missing factor row AND explicitly-NULL
    factor both yield a NULL measure (never 0); SUM skips the NULLs;
    COUNT(measure) < COUNT(*) exposes the gap."""
    fact = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "part_id int, qty double"
    )
    factors = spark.createDataFrame(
        [(1, 0.5), (2, None)], "f_part_id int, factor double"
    )  # part 3 has NO factor row
    htls = F.col("qty") * F.col("factor")
    joined = fact.join(factors, fact.part_id == factors.f_part_id, "left")
    rows = {r["part_id"]: r for r in joined.select("part_id", htls.alias("htls")).collect()}
    assert rows[1]["htls"] == 5.0
    assert rows[2]["htls"] is None  # NULL factor -> NULL measure
    assert rows[3]["htls"] is None  # join miss -> NULL measure
    agg = joined.agg(
        dsum(htls, "total"), F.count(F.lit(1)).alias("n"), F.count(htls).alias("n_htls")
    ).collect()[0]
    assert agg["total"] == 5.0  # SUM skips NULLs, never coerces to 0
    assert (agg["n"], agg["n_htls"]) == (3, 1)


def test_hectolitros_measure_shape(spark, sf_tiny):
    df = hectolitros_measure(spark, sf_tiny).toPandas()
    assert len(df) > 0
    # the factor dim deliberately leaves rows without a measure
    assert (df["n_with_htls"] < df["n_rows"]).any()
    assert df["cantidad_total_htls"].notna().all()
    assert not df["cantidad_total_htls"].apply(math.isnan).any()


def test_coverage_outputs_share_one_inner_agg(spark, sf_tiny):
    """Both coverage outputs must regroup the SAME persisted inner agg:
    their physical plans read an InMemoryTableScan, so the fact-table
    join+shuffle runs once no matter how many outputs exist (the
    reference recomputes the inner CTE per output table)."""
    outs = coverage_outputs(spark, sf_tiny)
    assert set(outs) == {"cobertura_vendedor_marca", "cobertura_sucursal_marca"}
    try:
        for df in outs.values():
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan
        a = outs["cobertura_vendedor_marca"].toPandas()
        b = outs["cobertura_sucursal_marca"].toPandas()
        assert len(a) > 0 and len(b) > 0
        # regroupings of one inner agg agree on the total
        assert abs(a["total_net_qty"].sum() - b["total_net_qty"].sum()) < 1e-6
    finally:
        spark.catalog.clearCache()


def test_coverage_inner_having_cancels_returns(spark):
    """A client whose returns cancel purchases (SUM <= 0) must not be
    counted as a buyer (reference cobertura.py:76 HAVING, BUG-009)."""
    from medallion_etl_spark.functions.exprs import dsum as _dsum

    li = spark.createDataFrame(
        [
            (1, 10.0, "N"),  # client 1 buys 10
            (2, 10.0, "N"),
            (2, 10.0, "R"),  # client 2's return cancels the purchase
        ],
        "cust int, qty double, flag string",
    )
    signed = F.col("qty") * F.when(F.col("flag") == "R", -1).otherwise(1)
    inner = li.groupBy("cust").agg(_dsum(signed, "net")).filter(F.col("net") > 0)
    assert [r["cust"] for r in inner.collect()] == [1]
