"""Gold-layer coverage operators: the hectolitros lookup measure and
the five-output coverage (cobertura) aggregation family.

Reference semantics re-expressed (NOT ported):

- **Hectolitros measure** (reference fact_ventas.py:75-77,
  fact_stock.py:63-65, docs/plan_htls_gold.md:9): a measure derived by
  LEFT-joining a factor lookup onto the fact — a missing or NULL
  factor yields a NULL measure (never 0), and SUM over the measure
  skips the NULLs while COUNT(*)/COUNT(measure) expose how many rows
  carried one.
- **Coverage multi-output family** (reference cobertura.py:436-446
  dispatcher; bodies :27-433): five monthly coverage tables, each the
  same two-level pattern — an inner client-level aggregation at the
  variant's OWN grain (``GROUP BY <grain>, cliente HAVING SUM(qty) >
  0``: returns cancel purchases before the client is counted as a
  buyer, BUG-009 fix) re-grouped to ``COUNT(DISTINCT cliente)`` +
  ``SUM(qty)``. The variants differ in grain and subset:
    * cob_preventista_marca   (:27)  periodo × fuerza × vendedor ×
      ruta × sucursal × marca — ``ruta`` is the conditional route
      pick (fuerza 1 → the client's ruta_fv1, fuerza 4 → ruta_fv4,
      else NULL, reference :56-60)
    * cob_sucursal_marca      (:110) periodo × fuerza × sucursal × marca
    * cob_preventista_generico(:183) the preventista grain over the
      coarser product attribute ``generico``
    * cob_sucursal_generico   (:269) the sucursal grain over ``generico``
    * cob_sucursal_aguas      (:348) the sucursal grain restricted to
      generico = 'AGUAS DANONE' and subdivided by a marca CASE
      (mineral vs saborizada brands; unmapped marcas are dropped
      AFTER the client HAVING, reference :385-397, :416)
  Every variant filters ``fuerza_ventas IS NOT NULL``.

The reference recomputes its inner CTE per output table — five full
fact-table scans. Here the FINEST client-level pre-agg (all grain
attributes, no HAVING) is computed once, persisted, and every output
derives its own client grain from the cached frame: regroup →
HAVING > 0 at the variant's grain → final agg. One fact-table shuffle
no matter how many outputs (exchange reuse pinned by
tests/test_coverage_gold.py). Applying HAVING at the variant's own
client grain (not the finest) is load-bearing: a client whose returns
on vendedor A cancel purchases via vendedor B nets out differently per
grain, exactly as the reference's per-variant CTEs compute it.

Dimension mapping onto the testdata (FIXTURES.md §C): vendedor ->
l_suppkey, fuerza_ventas -> supplier-nation derived (NULLable),
ruta -> conditional client attribute per fuerza, sucursal ->
customer's c_nationkey, ds_sucursal -> n_name, marca -> p_brand,
generico -> p_type, cliente -> c_custkey.

Scale shape: the inner agg is the only pass over the fact table (one
shuffle, partial agg map-side); each output re-aggregates the much
smaller client-level frame (bounded by |periods × sellers × brands ×
clients|). The dims broadcast.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dsum, dsum_sql
from .util import broadcast_if_small
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
        li.join(broadcast_if_small(factors), li.l_partkey == factors.f_partkey, "left")
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
# Coverage family (reference cobertura.py:27-446).
#
# Fixture semantics for the mapped dimensions:
#   fuerza_ventas: supplier attribute — NULL when s_nationkey % 5 = 0
#     (the reference filters dv.id_fuerza_ventas IS NOT NULL in every
#     variant), else s_nationkey % 4 + 1 ∈ {1..4}.
#   ruta: the reference's conditional route (cobertura.py:56-60) —
#     fuerza 1 reads the client's ruta_fv1 (here c_custkey % 10),
#     fuerza 4 reads ruta_fv4 (c_custkey % 7), anything else NULL.
#   aguas subset (cobertura.py:348-433): generico 'PROMO'
#     plays 'AGUAS DANONE'; marcas Brand#11/12 -> 'AGUAS MINERAL',
#     Brand#13/14 -> 'AGUAS SABORIZADAS', Brand#15 unmapped -> NULL
#     subdivision, dropped after the client HAVING like the
#     reference's outer WHERE.

_VENDEDOR_GRAIN = [
    "periodo", "fuerza_ventas", "vendedor_key", "ruta",
    "sucursal_key", "ds_sucursal",
]
_SUCURSAL_GRAIN = ["periodo", "fuerza_ventas", "sucursal_key", "ds_sucursal"]

_AGUAS_GENERICO = "PROMO"
_AGUAS_MINERAL = ("Brand#11", "Brand#12")
_AGUAS_SABORIZADA = ("Brand#13", "Brand#14")


def coverage_inner_agg(spark: SparkSession, sf: str) -> DataFrame:
    """The shared FINEST client-level pre-agg: one pass over the fact
    table, grouped by every grain attribute any variant needs plus the
    client, with NO having — each output applies ``HAVING SUM > 0`` at
    its own client grain downstream (reference BUG-009 semantics,
    per-variant)."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    p = T(spark, sf, "part")
    sup = T(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("v_suppkey"),
        F.when(F.col("s_nationkey") % 5 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("s_nationkey") % 4 + 1).cast("int"))
        .alias("fuerza_ventas"),
    )
    nat = T(spark, sf, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("ds_sucursal")
    )
    signed_qty = F.col("l_quantity") * F.when(F.col("l_returnflag") == "R", -1).otherwise(1)
    ruta = (
        F.when(F.col("fuerza_ventas") == 1, F.col("c_custkey") % 10)
        .when(F.col("fuerza_ventas") == 4, F.col("c_custkey") % 7)
        .cast("int")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .join(broadcast_if_small(p), li.l_partkey == p.p_partkey)
        .join(broadcast_if_small(sup), li.l_suppkey == sup.v_suppkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.nk)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("periodo"),
            F.col("fuerza_ventas"),
            F.col("l_suppkey").alias("vendedor_key"),
            ruta.alias("ruta"),
            F.col("c_nationkey").alias("sucursal_key"),
            F.col("ds_sucursal"),
            F.col("p_brand").alias("marca"),
            F.col("p_type").alias("generico"),
            F.col("c_custkey").alias("cliente_key"),
        )
        .agg(dsum(signed_qty, "net_qty"))
    )


def _cov_output(inner: DataFrame, grain: list[str]) -> DataFrame:
    """Variant body: client grain regroup -> HAVING > 0 -> final agg.
    The HAVING must see the variant's OWN client grain (see module
    docstring), which is why this is two aggs over the small cached
    frame, not one filter on it."""
    cli = (
        inner.filter(F.col("fuerza_ventas").isNotNull())
        .groupBy(*grain, "cliente_key")
        .agg(dsum("net_qty", "cli_qty"))
        .filter(F.col("cli_qty") > 0)
    )
    return (
        cli.groupBy(*grain)
        .agg(
            F.countDistinct("cliente_key").alias("clientes_compradores"),
            dsum("cli_qty", "total_net_qty"),
        )
        .orderBy(*grain)
    )


def _aguas_output(inner: DataFrame) -> DataFrame:
    sub = (
        F.when(F.col("marca").isin(*_AGUAS_MINERAL), F.lit("AGUAS MINERAL"))
        .when(F.col("marca").isin(*_AGUAS_SABORIZADA), F.lit("AGUAS SABORIZADAS"))
    )
    grain = _SUCURSAL_GRAIN + ["subdivision_aguas"]
    cli = (
        inner.filter(
            F.col("fuerza_ventas").isNotNull()
            & (F.col("generico") == _AGUAS_GENERICO)
        )
        .withColumn("subdivision_aguas", sub)
        .groupBy(*grain, "cliente_key")
        .agg(dsum("net_qty", "cli_qty"))
        # reference order: the client HAVING runs WITH the NULL
        # subdivision group present; the NULL group is dropped after
        # (outer WHERE, cobertura.py:416) — groups are independent so
        # both filters commute, but keep the reference's reading
        .filter(F.col("cli_qty") > 0)
        .filter(F.col("subdivision_aguas").isNotNull())
    )
    return (
        cli.groupBy(*grain)
        .agg(
            F.countDistinct("cliente_key").alias("clientes_compradores"),
            dsum("cli_qty", "total_net_qty"),
        )
        .orderBy(*grain)
    )


def coverage_outputs(spark: SparkSession, sf: str) -> dict[str, DataFrame]:
    """All five coverage outputs from ONE persisted inner agg. The
    reference recomputes the inner CTE per output table; persisting it
    means the fact table is scanned and shuffled exactly once no
    matter how many coverage outputs regroup it (exchange reuse is
    pinned by tests/test_coverage_gold.py)."""
    inner = coverage_inner_agg(spark, sf).persist(StorageLevel.MEMORY_AND_DISK)
    return _build_outputs(inner)


def _build_outputs(inner: DataFrame) -> dict[str, DataFrame]:
    return {
        "cobertura_vendedor_marca": _cov_output(inner, _VENDEDOR_GRAIN + ["marca"]),
        "cobertura_sucursal_marca": _cov_output(inner, _SUCURSAL_GRAIN + ["marca"]),
        "cobertura_vendedor_generico": _cov_output(inner, _VENDEDOR_GRAIN + ["generico"]),
        "cobertura_sucursal_generico": _cov_output(inner, _SUCURSAL_GRAIN + ["generico"]),
        "cobertura_sucursal_aguas": _aguas_output(inner),
    }


# one persisted inner agg per (session, sf): the driver invokes each
# coverage query separately, and without this cache every invocation
# would re-persist (and re-scan the fact table for) its own copy.
# Keyed by applicationId — id(spark) is unsound (CPython reuses freed
# addresses, so a restarted session could hit a cache of dead frames)
# — and the replaced entry's persisted inner agg is unpersisted so
# stale blocks never accumulate.
_COVERAGE_CACHE: dict[str, tuple[str, dict[str, DataFrame], DataFrame]] = {}


def _cached_outputs(spark: SparkSession, sf: str) -> dict[str, DataFrame]:
    app_id = spark.sparkContext.applicationId
    hit = _COVERAGE_CACHE.get(sf)
    if hit is not None and hit[0] == app_id:
        return hit[1]
    if hit is not None:
        try:  # old session's cache: drop its persisted blocks if alive
            hit[2].unpersist(blocking=False)
        except Exception:
            pass  # the old session is gone; nothing to release
    inner = coverage_inner_agg(spark, sf).persist(StorageLevel.MEMORY_AND_DISK)
    outs = _build_outputs(inner)
    _COVERAGE_CACHE[sf] = (app_id, outs, inner)
    return outs


def cobertura_vendedor_marca(spark: SparkSession, sf: str) -> DataFrame:
    return _cached_outputs(spark, sf)["cobertura_vendedor_marca"]


def cobertura_sucursal_marca(spark: SparkSession, sf: str) -> DataFrame:
    return _cached_outputs(spark, sf)["cobertura_sucursal_marca"]


def cobertura_vendedor_generico(spark: SparkSession, sf: str) -> DataFrame:
    return _cached_outputs(spark, sf)["cobertura_vendedor_generico"]


def cobertura_sucursal_generico(spark: SparkSession, sf: str) -> DataFrame:
    return _cached_outputs(spark, sf)["cobertura_sucursal_generico"]


def cobertura_sucursal_aguas(spark: SparkSession, sf: str) -> DataFrame:
    return _cached_outputs(spark, sf)["cobertura_sucursal_aguas"]


_COV_PRE_SQL = f"""
  SELECT date_trunc('month', o_orderdate) AS periodo,
         sup.fuerza_ventas,
         l_suppkey AS vendedor_key,
         CAST(CASE WHEN sup.fuerza_ventas = 1 THEN c_custkey % 10
                   WHEN sup.fuerza_ventas = 4 THEN c_custkey % 7 END AS INT) AS ruta,
         c_nationkey AS sucursal_key,
         n_name AS ds_sucursal,
         p_brand AS marca,
         p_type AS generico,
         c_custkey AS cliente_key,
         {dsum_sql("l_quantity * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)", "net_qty")}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  JOIN (SELECT s_suppkey,
               CASE WHEN s_nationkey % 5 = 0 THEN NULL
                    ELSE CAST(s_nationkey % 4 + 1 AS INT) END AS fuerza_ventas
        FROM supplier) sup ON l_suppkey = sup.s_suppkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9
"""


def _cov_sql(grain: list[str]) -> str:
    g = ", ".join(grain)
    # Spark orderBy puts NULLS FIRST on ascending keys; DuckDB defaults
    # to NULLS LAST — pin the nullable `ruta` key explicitly
    order = ", ".join(f"{c} NULLS FIRST" if c == "ruta" else c for c in grain)
    return f"""
WITH pre AS ({_COV_PRE_SQL}),
cli AS (
  SELECT {g}, cliente_key, {dsum_sql("net_qty", "cli_qty")}
  FROM pre
  WHERE fuerza_ventas IS NOT NULL
  GROUP BY {g}, cliente_key
)
SELECT {g},
       COUNT(DISTINCT cliente_key) AS clientes_compradores,
       {dsum_sql("cli_qty", "total_net_qty")}
FROM cli
WHERE cli_qty > 0
GROUP BY {g}
ORDER BY {order}
"""


_AGUAS_SQL = f"""
WITH pre AS ({_COV_PRE_SQL}),
cli AS (
  SELECT periodo, fuerza_ventas, sucursal_key, ds_sucursal,
         CASE WHEN marca IN ('{_AGUAS_MINERAL[0]}','{_AGUAS_MINERAL[1]}')
                THEN 'AGUAS MINERAL'
              WHEN marca IN ('{_AGUAS_SABORIZADA[0]}','{_AGUAS_SABORIZADA[1]}')
                THEN 'AGUAS SABORIZADAS' END AS subdivision_aguas,
         cliente_key, {dsum_sql("net_qty", "cli_qty")}
  FROM pre
  WHERE fuerza_ventas IS NOT NULL AND generico = '{_AGUAS_GENERICO}'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT periodo, fuerza_ventas, sucursal_key, ds_sucursal, subdivision_aguas,
       COUNT(DISTINCT cliente_key) AS clientes_compradores,
       {dsum_sql("cli_qty", "total_net_qty")}
FROM cli
WHERE cli_qty > 0 AND subdivision_aguas IS NOT NULL
GROUP BY 1, 2, 3, 4, 5
ORDER BY 1, 2, 3, 4, 5
"""


QUERIES = {
    "hectolitros_measure": (hectolitros_measure, HECTOLITROS_MEASURE_SQL),
    "cobertura_vendedor_marca": (
        cobertura_vendedor_marca,
        _cov_sql(_VENDEDOR_GRAIN + ["marca"]),
    ),
    "cobertura_sucursal_marca": (
        cobertura_sucursal_marca,
        _cov_sql(_SUCURSAL_GRAIN + ["marca"]),
    ),
    "cobertura_vendedor_generico": (
        cobertura_vendedor_generico,
        _cov_sql(_VENDEDOR_GRAIN + ["generico"]),
    ),
    "cobertura_sucursal_generico": (
        cobertura_sucursal_generico,
        _cov_sql(_SUCURSAL_GRAIN + ["generico"]),
    ),
    "cobertura_sucursal_aguas": (cobertura_sucursal_aguas, _AGUAS_SQL),
}
