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
    """All five coverage outputs must regroup the SAME persisted inner
    agg: their physical plans read an InMemoryTableScan, so the
    fact-table join+shuffle runs once no matter how many outputs exist
    (the reference recomputes the inner CTE per output table)."""
    outs = coverage_outputs(spark, sf_tiny)
    assert set(outs) == {
        "cobertura_vendedor_marca",
        "cobertura_sucursal_marca",
        "cobertura_vendedor_generico",
        "cobertura_sucursal_generico",
        "cobertura_sucursal_aguas",
    }
    try:
        for df in outs.values():
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan
        frames = {k: df.toPandas() for k, df in outs.items()}
        for k, df in frames.items():
            assert len(df) > 0, k
        # the per-variant client-grain HAVING clips negative client
        # cells BEFORE summing, so a finer grain keeps at least as much
        # volume as a coarser regroup of the same product attribute
        a = frames["cobertura_vendedor_marca"]["total_net_qty"].sum()
        b = frames["cobertura_sucursal_marca"]["total_net_qty"].sum()
        assert a >= b - 1e-6
        # the aguas output is the PROMO-generico subset, subdivided
        ag = frames["cobertura_sucursal_aguas"]
        assert set(ag["subdivision_aguas"]) <= {"AGUAS MINERAL", "AGUAS SABORIZADAS"}
        promo = frames["cobertura_sucursal_generico"]
        promo_total = promo[promo["generico"] == "PROMO"]["total_net_qty"].sum()
        assert ag["total_net_qty"].sum() <= promo_total + 1e-6
    finally:
        spark.catalog.clearCache()


def test_aguas_subdivision_semantics(spark):
    """The aguas variant's distinctive pieces (reference
    cobertura.py:348-433): product-subset filter, marca CASE ->
    subdivision, client HAVING computed WITH the NULL-subdivision
    group present, NULL subdivision dropped in the outer query."""
    from pyspark.sql import functions as _F

    from medallion_etl_spark.operators.coverage import _aguas_output

    rows = [
        # (periodo, fuerza, vend, ruta, suc, ds, marca, generico, cliente, net)
        ("2024-01-01", 1, 1, 0, 1, "A", "Brand#11", "PROMO", 10, 5.0),
        ("2024-01-01", 1, 1, 0, 1, "A", "Brand#13", "PROMO", 10, 3.0),
        # unmapped marca -> NULL subdivision -> dropped
        ("2024-01-01", 1, 1, 0, 1, "A", "Brand#15", "PROMO", 10, 99.0),
        # wrong generico -> excluded by the subset filter
        ("2024-01-01", 1, 1, 0, 1, "A", "Brand#11", "LARGE", 10, 99.0),
        # client nets negative within its subdivision -> not a buyer
        ("2024-01-01", 1, 1, 0, 1, "A", "Brand#11", "PROMO", 11, -2.0),
        # NULL fuerza -> excluded
        ("2024-01-01", None, 1, None, 1, "A", "Brand#11", "PROMO", 12, 7.0),
    ]
    inner = spark.createDataFrame(
        rows,
        "periodo string, fuerza_ventas int, vendedor_key long, ruta int, "
        "sucursal_key int, ds_sucursal string, marca string, generico string, "
        "cliente_key long, net_qty double",
    ).withColumn("periodo", _F.to_timestamp("periodo"))
    got = {
        (r["subdivision_aguas"]): (r["clientes_compradores"], r["total_net_qty"])
        for r in _aguas_output(inner).collect()
    }
    assert got == {"AGUAS MINERAL": (1, 5.0), "AGUAS SABORIZADAS": (1, 3.0)}


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
