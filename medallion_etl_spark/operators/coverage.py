"""Gold-layer coverage operators: the hectolitros lookup measure and
the multi-output coverage aggregation family.

Reference semantics re-expressed (NOT ported):

- **Hectolitros measure** (reference fact_ventas.py:75-77,
  fact_stock.py:63-65, docs/plan_htls_gold.md:9): a measure derived by
  LEFT-joining a factor lookup onto the fact — a missing or NULL
  factor yields a NULL measure (never 0), and SUM over the measure
  skips the NULLs while COUNT(*)/COUNT(measure) expose how many rows
  carried one.
- **Coverage multi-output shared pre-agg** (reference
  cobertura.py:436-446 with bodies :50-93, :145-249): the reference's
  five monthly coverage tables are a manual grouping-set — each one
  re-runs the same client-level inner aggregation (group by period ×
  seller × branch × brand × client, HAVING SUM(qty) > 0) and then
  re-groups it along a different dimension pair. Here the inner agg
  is computed ONCE, persisted, and every output re-groups the cached
  frame — at 100 TB this is the difference between one fact-table
  shuffle and five.

Scale shape: the inner agg is the only pass over the fact table (one
shuffle, partial agg map-side); each output re-aggregates the much
smaller client-level frame (|periods × sellers × brands × clients|
rows, bounded by distinct clients). The dims broadcast.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dsum, dsum_sql
from ..sources.readers import load_table as T

# --------------------------------------------------------------------------
# P9: hectolitros measure via factor lookup (reference fact_ventas.py:75-77)
#
# Factor dim: parts with p_size < 40 publish a conversion factor
# (p_size/100); parts with p_size % 7 == 0 publish an explicitly NULL
# factor (the reference's dim_articulo rows predating the
# factor_hectolitros migration). Everything else has NO factor row, so
# the LEFT join misses — both miss and NULL-factor must produce a NULL
# measure.


def _factor_dim(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part").filter(F.col("p_size") < 40)
    factor = F.when(F.col("p_size") % 7 == 0, F.lit(None).cast("double")).otherwise(
        F.col("p_size") / F.lit(100.0)
    )
    return p.select(F.col("p_partkey").alias("f_partkey"), factor.alias("factor_htls"))


def hectolitros_measure(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly hectolitros rollup. NULL-propagation contract (pinned by
    tests/test_coverage_gold.py): factor missing or NULL -> measure
    NULL; SUM skips NULLs; n_rows vs n_with_htls exposes the gap."""
    li = T(spark, sf, "lineitem")
    factors = _factor_dim(spark, sf)
    htls = F.col("l_quantity") * F.col("factor_htls")  # NULL factor -> NULL
    return (
        li.join(F.broadcast(factors), li.l_partkey == factors.f_partkey, "left")
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("periodo"))
        .agg(
            dsum(htls, "cantidad_total_htls"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(htls).alias("n_with_htls"),
        )
        .orderBy("periodo")
    )


HECTOLITROS_MEASURE_SQL = f"""
WITH factors AS (
  SELECT p_partkey AS f_partkey,
         CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_size / 100.0 END AS factor_htls
  FROM part WHERE p_size < 40
)
SELECT date_trunc('month', l_shipdate) AS periodo,
       {dsum_sql("l_quantity * factor_htls", "cantidad_total_htls")},
       COUNT(*) AS n_rows,
       COUNT(l_quantity * factor_htls) AS n_with_htls
FROM lineitem LEFT JOIN factors ON l_partkey = f_partkey
GROUP BY 1
ORDER BY 1
"""

# --------------------------------------------------------------------------
# Coverage multi-output shared pre-agg (reference cobertura.py:436-446)
#
# Dimension mapping onto the testdata (FIXTURES.md §C): vendedor ->
# l_suppkey, sucursal -> customer's c_nationkey, marca -> p_brand,
# cliente -> c_custkey.


def coverage_inner_agg(spark: SparkSession, sf: str) -> DataFrame:
    """The shared client-level pre-agg: one pass over the fact table.
    HAVING SUM(signed qty) > 0 is semantic, not an optimization —
    returns cancel purchases per client before the client is counted
    (reference cobertura.py:76, BUG-009 fix)."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    p = T(spark, sf, "part")
    signed_qty = F.col("l_quantity") * F.when(F.col("l_returnflag") == "R", -1).otherwise(1)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("periodo"),
            F.col("l_suppkey").alias("vendedor_key"),
            F.col("c_nationkey").alias("sucursal_key"),
            F.col("p_brand").alias("marca"),
            F.col("c_custkey").alias("cliente_key"),
        )
        .agg(dsum(signed_qty, "net_qty"))
        .filter(F.col("net_qty") > 0)
    )


def _regroup(inner: DataFrame, dim: str) -> DataFrame:
    return (
        inner.groupBy("periodo", dim, "marca")
        .agg(
            F.countDistinct("cliente_key").alias("clientes_compradores"),
            dsum("net_qty", "total_net_qty"),
        )
        .orderBy("periodo", dim, "marca")
    )


def coverage_outputs(spark: SparkSession, sf: str) -> dict[str, DataFrame]:
    """All coverage outputs from ONE persisted inner agg. The reference
    recomputes the inner CTE per output table; persisting it means the
    fact table is scanned and shuffled exactly once no matter how many
    coverage outputs regroup it (exchange reuse is pinned by
    tests/test_coverage_gold.py::test_coverage_inner_agg_computed_once).
    """
    inner = coverage_inner_agg(spark, sf).persist(StorageLevel.MEMORY_AND_DISK)
    return {
        "cobertura_vendedor_marca": _regroup(inner, "vendedor_key"),
        "cobertura_sucursal_marca": _regroup(inner, "sucursal_key"),
    }


def cobertura_vendedor_marca(spark: SparkSession, sf: str) -> DataFrame:
    return coverage_outputs(spark, sf)["cobertura_vendedor_marca"]


def cobertura_sucursal_marca(spark: SparkSession, sf: str) -> DataFrame:
    return coverage_outputs(spark, sf)["cobertura_sucursal_marca"]


_COBERTURA_INNER_SQL = f"""
  SELECT date_trunc('month', o_orderdate) AS periodo,
         l_suppkey AS vendedor_key, c_nationkey AS sucursal_key,
         p_brand AS marca, c_custkey AS cliente_key,
         {dsum_sql("l_quantity * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)", "net_qty")}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3, 4, 5
  HAVING CAST(SUM(CAST((l_quantity * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)) AS DECIMAL(38,6))) AS DOUBLE) > 0
"""


def _cobertura_sql(dim: str) -> str:
    return f"""
WITH inner_agg AS ({_COBERTURA_INNER_SQL})
SELECT periodo, {dim}, marca,
       COUNT(DISTINCT cliente_key) AS clientes_compradores,
       {dsum_sql("net_qty", "total_net_qty")}
FROM inner_agg
GROUP BY periodo, {dim}, marca
ORDER BY periodo, {dim}, marca
"""


QUERIES = {
    "hectolitros_measure": (hectolitros_measure, HECTOLITROS_MEASURE_SQL),
    "cobertura_vendedor_marca": (cobertura_vendedor_marca, _cobertura_sql("vendedor_key")),
    "cobertura_sucursal_marca": (cobertura_sucursal_marca, _cobertura_sql("sucursal_key")),
}
