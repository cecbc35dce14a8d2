"""Medallion relational operator layer: the SURVEY.md §2 inventory
re-expressed over the driver's TPC-H-ish testdata.

Every query is a (DataFrame fn, DuckDB oracle SQL) pair with identical
column aliases. Mapping of testdata tables to reference entities
(FIXTURES.md §C): lineitem/orders ~ fact_ventas, customer(+nation,
region) ~ dim_cliente, part ~ dim_articulo, supplier ~ dim_vendedor,
events ~ the change stream / bronze landing.

Plan-shape notes (checked via .explain, see tests/test_plan_shapes.py):
dim joins broadcast; filters and projections push into the parquet
scan; aggregates run partial+final; decimal accumulation keeps double
measures bit-identical to the oracle regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exprs import davg, davg_sql, dsum, dsum_sql, safe_cast, split_part
from ..sources.readers import load_table as T
from .util import broadcast_if_small

# --------------------------------------------------------------------------
# A1/A7 + P12: hash aggregate with exact measures (reference
# gold_queries.py:32-58; cobertura.py:65)


def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {dsum_sql("l_quantity", "sum_qty")},
  {dsum_sql("l_extendedprice", "sum_base_price")},
  {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {davg_sql("l_quantity", "avg_qty")},
  {davg_sql("l_extendedprice", "avg_price")},
  {davg_sql("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# O1 top-k + J2 broadcast dim join (reference gold_queries.py:32-41)


def top_revenue_parts(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    part = T(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(dsum(rev, "revenue"), dsum("l_quantity", "total_qty"))
        .orderBy(F.col("revenue").desc(), "p_partkey")
        .limit(10)
    )


TOP_REVENUE_PARTS_SQL = f"""
SELECT p_partkey, p_name, p_brand,
  {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
  {dsum_sql("l_quantity", "total_qty")}
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name, p_brand
ORDER BY revenue DESC, p_partkey
LIMIT 10
"""

# --------------------------------------------------------------------------
# J1/J2/J3: chained dim denormalization (reference dim_cliente.py:121-126,
# INC-001 composite-key lesson -> both join keys explicit)


def customer_nation_region(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "c_acctbal",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


CUSTOMER_NATION_REGION_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       n_name AS nation, r_name AS region
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""

# --------------------------------------------------------------------------
# A3: two-level coverage aggregation with HAVING SUM > 0 between levels —
# the reference's most semantic operator (cobertura.py:50-93: a client
# counts as a buyer only if its NET quantity is positive; returns/credit
# notes cancel purchases). Returnflag 'R' plays the credit-note sign.


def coverage_two_level(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    signed_qty = F.col("l_quantity") * F.when(F.col("l_returnflag") == "R", -1).otherwise(1)
    inner = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("periodo"),
            F.col("c_nationkey").alias("nation_key"),
            F.col("c_custkey").alias("cust_key"),
        )
        .agg(dsum(signed_qty, "net_qty"))
        .filter(F.col("net_qty") > 0)
    )
    return (
        inner.groupBy("periodo", "nation_key")
        .agg(
            F.countDistinct("cust_key").alias("clientes_compradores"),
            dsum("net_qty", "total_net_qty"),
        )
        .orderBy("periodo", "nation_key")
    )


COVERAGE_TWO_LEVEL_SQL = f"""
WITH cliente_net AS (
  SELECT date_trunc('month', o_orderdate) AS periodo,
         c_nationkey AS nation_key, c_custkey AS cust_key,
         {dsum_sql("l_quantity * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)", "net_qty")}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2, 3
  HAVING CAST(SUM(CAST((l_quantity * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)) AS DECIMAL(38,6))) AS DOUBLE) > 0
)
SELECT periodo, nation_key,
       COUNT(DISTINCT cust_key) AS clientes_compradores,
       {dsum_sql("net_qty", "total_net_qty")}
FROM cliente_net
GROUP BY periodo, nation_key
ORDER BY periodo, nation_key
"""

# --------------------------------------------------------------------------
# A2: COUNT(DISTINCT) KPIs (reference cobertura.py:84, gold_queries.py:212-217)


def count_distinct_kpi(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("periodo"))
        .agg(
            F.countDistinct("o_custkey").alias("clientes_activos"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_facturacion"),
            davg("o_totalprice", "ticket_promedio"),
        )
        .orderBy("periodo")
    )


COUNT_DISTINCT_KPI_SQL = f"""
SELECT date_trunc('month', o_orderdate) AS periodo,
       COUNT(DISTINCT o_custkey) AS clientes_activos,
       COUNT(*) AS n_orders,
       {dsum_sql("o_totalprice", "total_facturacion")},
       {davg_sql("o_totalprice", "ticket_promedio")}
FROM orders
GROUP BY 1
ORDER BY periodo
"""

# --------------------------------------------------------------------------
# A4/A5: pivot via conditional aggregation (reference dim_articulo.py:35-45
# MAX(CASE WHEN id_forma_agrupar=...), gold_queries.py:228-233 SUM(CASE))


def pivot_status_matrix(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")

    def qty_if(status: str):
        return F.when(F.col("l_linestatus") == status, F.col("l_quantity"))

    return (
        li.groupBy("l_returnflag")
        .agg(
            dsum(qty_if("O"), "qty_open"),
            dsum(qty_if("F"), "qty_filled"),
            F.max(F.when(F.col("l_linestatus") == "O", F.col("l_shipdate"))).alias("last_ship_open"),
            F.max(F.when(F.col("l_linestatus") == "F", F.col("l_shipdate"))).alias("last_ship_filled"),
        )
        .orderBy("l_returnflag")
    )


PIVOT_STATUS_MATRIX_SQL = f"""
SELECT l_returnflag,
  {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", "qty_open")},
  {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", "qty_filled")},
  MAX(CASE WHEN l_linestatus = 'O' THEN l_shipdate END) AS last_ship_open,
  MAX(CASE WHEN l_linestatus = 'F' THEN l_shipdate END) AS last_ship_filled
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def quarterly_matrix(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")

    def q(n: int):
        return F.when(F.quarter("o_orderdate") == n, F.col("o_totalprice"))

    return (
        o.groupBy(F.year("o_orderdate").alias("anio"))
        .agg(
            dsum(q(1), "q1"),
            dsum(q(2), "q2"),
            dsum(q(3), "q3"),
            dsum(q(4), "q4"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("anio")
    )


QUARTERLY_MATRIX_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS anio,
  {dsum_sql("CASE WHEN EXTRACT(quarter FROM o_orderdate) = 1 THEN o_totalprice END", "q1")},
  {dsum_sql("CASE WHEN EXTRACT(quarter FROM o_orderdate) = 2 THEN o_totalprice END", "q2")},
  {dsum_sql("CASE WHEN EXTRACT(quarter FROM o_orderdate) = 3 THEN o_totalprice END", "q3")},
  {dsum_sql("CASE WHEN EXTRACT(quarter FROM o_orderdate) = 4 THEN o_totalprice END", "q4")},
  COUNT(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY anio
"""

# --------------------------------------------------------------------------
# W1/W2: last-writer-wins dedup by window-over-id (reference
# staff_transformer.py:61-81 DISTINCT ON ... ORDER BY id DESC) — same
# pattern the CDC engine uses, here over the events table.


def lww_latest_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


LWW_LATEST_EVENTS_SQL = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value,
       ts AS last_ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
ORDER BY user_id
"""

# --------------------------------------------------------------------------
# W4: LAG month-over-month delta (reference gold_queries.py:140-152)


def mom_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("periodo")
    ).agg(dsum("o_totalprice", "revenue"))
    w = Window.orderBy("periodo")
    return (
        monthly.withColumn("prev_revenue", F.lag("revenue").over(w))
        .withColumn("delta", F.col("revenue") - F.col("prev_revenue"))
        .withColumn("pct_change", (F.col("revenue") - F.col("prev_revenue")) / F.col("prev_revenue") * 100)
        .orderBy("periodo")
    )


MOM_REVENUE_DELTA_SQL = f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS periodo,
         {dsum_sql("o_totalprice", "revenue")}
  FROM orders GROUP BY 1
)
SELECT periodo, revenue,
       lag(revenue) OVER (ORDER BY periodo) AS prev_revenue,
       revenue - lag(revenue) OVER (ORDER BY periodo) AS delta,
       (revenue - lag(revenue) OVER (ORDER BY periodo)) / lag(revenue) OVER (ORDER BY periodo) * 100 AS pct_change
FROM monthly
ORDER BY periodo
"""

# --------------------------------------------------------------------------
# P1: JSON field extraction + agg (reference sales_transformer.py:117-220
# data_raw->>'...' patterns) over events.props.


def json_extract_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_k"),
            F.max("k").alias("max_k"),
            dsum("value", "sum_value"),
        )
        .orderBy("event_type")
    )


JSON_EXTRACT_EVENTS_SQL = f"""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       {dsum_sql("value", "sum_value")}
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# --------------------------------------------------------------------------
# S12: calendar dimension generator (reference dim_tiempo.py:12-73 —
# Python date loop -> declarative sequence + column exprs)

_MESES = ["enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
          "agosto", "septiembre", "octubre", "noviembre", "diciembre"]
_DIAS = ["lunes", "martes", "miercoles", "jueves", "viernes", "sabado", "domingo"]


def calendar_dim(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.sql(
        "SELECT explode(sequence(to_date('1996-01-01'), to_date('1998-12-31'), interval 1 day)) AS fecha"
    )
    iso_dow = F.weekday("fecha") + 1  # 1=Monday..7=Sunday (ISO)
    return df.select(
        F.col("fecha").cast("timestamp").alias("fecha"),
        F.year("fecha").alias("anio"),
        F.month("fecha").alias("mes"),
        F.dayofmonth("fecha").alias("dia"),
        F.quarter("fecha").alias("trimestre"),
        iso_dow.alias("dia_semana_iso"),
        F.weekofyear("fecha").alias("semana_iso"),
        F.element_at(F.array(*[F.lit(m) for m in _MESES]), F.month("fecha")).alias("nombre_mes"),
        F.element_at(F.array(*[F.lit(d) for d in _DIAS]), (F.weekday("fecha") + 1).cast("int")).alias("nombre_dia"),
        (iso_dow >= 6).alias("es_finde"),
    ).orderBy("fecha")


CALENDAR_DIM_SQL = """
SELECT CAST(d AS TIMESTAMP) AS fecha,
       CAST(EXTRACT(year FROM d) AS INT) AS anio,
       CAST(EXTRACT(month FROM d) AS INT) AS mes,
       CAST(EXTRACT(day FROM d) AS INT) AS dia,
       CAST(EXTRACT(quarter FROM d) AS INT) AS trimestre,
       CAST(EXTRACT(isodow FROM d) AS INT) AS dia_semana_iso,
       CAST(EXTRACT(week FROM d) AS INT) AS semana_iso,
       (['enero','febrero','marzo','abril','mayo','junio','julio','agosto','septiembre','octubre','noviembre','diciembre'])[EXTRACT(month FROM d)] AS nombre_mes,
       (['lunes','martes','miercoles','jueves','viernes','sabado','domingo'])[EXTRACT(isodow FROM d)] AS nombre_dia,
       EXTRACT(isodow FROM d) >= 6 AS es_finde
FROM generate_series(DATE '1996-01-01', DATE '1998-12-31', INTERVAL 1 DAY) AS t(d)
ORDER BY fecha
"""

# --------------------------------------------------------------------------
# J6 anti join (reference hectolitros_loader.py:69-73 incremental load) and
# J7 semi join (isin/EXISTS)


def anti_join_unsold_parts(spark: SparkSession, sf: str) -> DataFrame:
    part = T(spark, sf, "part")
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") >= F.lit("2000-01-01"))
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


ANTI_JOIN_UNSOLD_PARTS_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2000-01-01'
)
ORDER BY p_partkey
"""


def semi_join_big_spenders(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(F.col("o_totalprice") > 400_000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


SEMI_JOIN_BIG_SPENDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
ORDER BY c_custkey
"""

# --------------------------------------------------------------------------
# J4: explode / lateral array join (reference
# client_forces_transformer.py:70-71 jsonb_array_elements) over document text


def explode_doc_words(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") > 3)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


EXPLODE_DOC_WORDS_SQL = """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE length(word) > 3
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""

# --------------------------------------------------------------------------
# U1: UNION ALL table-count report (reference util_queries.sql:95-106)


def union_all_table_counts(spark: SparkSession, sf: str) -> DataFrame:
    names = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
    parts = [
        T(spark, sf, n).agg(F.count(F.lit(1)).alias("n_rows")).select(F.lit(n).alias("table_name"), "n_rows")
        for n in names
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


UNION_ALL_TABLE_COUNTS_SQL = """
SELECT 'region' AS table_name, COUNT(*) AS n_rows FROM region
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
ORDER BY table_name
"""

# --------------------------------------------------------------------------
# Top-k per group: window rank (reference gold_queries top products per brand)


def top3_parts_per_brand(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    part = T(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(dsum(rev, "revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    return (
        per_part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_name", "revenue")
        .orderBy("p_brand", "rk")
    )


TOP3_PARTS_PER_BRAND_SQL = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey, p_name,
         {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
)
SELECT p_brand,
       CAST(row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS INT) AS rk,
       p_partkey, p_name, revenue
FROM per_part
QUALIFY rk <= 3
ORDER BY p_brand, rk
"""

# --------------------------------------------------------------------------
# A7: ratio KPIs with NULLIF guard (reference gold_queries.py:164,:199,:217)


def avg_ticket_per_segment(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    return (
        o.join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            davg("o_totalprice", "ticket_promedio"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .withColumn(
            "orders_per_customer",
            F.col("n_orders") / F.nullif(F.col("n_customers"), F.lit(0)),
        )
        .orderBy("c_mktsegment")
    )


AVG_TICKET_PER_SEGMENT_SQL = f"""
SELECT c_mktsegment,
       {davg_sql("o_totalprice", "ticket_promedio")},
       COUNT(*) AS n_orders,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(*) / NULLIF(COUNT(DISTINCT c_custkey), 0) AS orders_per_customer
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# --------------------------------------------------------------------------
# P3/P4/P5/P7: safe casts, sentinel nulling, boolean-from-token, split_part
# (reference sales_transformer.py:117-220, deposits_transformer.py:45-46)


def expr_kitchen_sink(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    synthetic = F.concat(F.col("event_type"), F.lit(" - "), F.col("user_id").cast("string"))
    return ev.select(
        "event_id",
        safe_cast(F.get_json_object("props", "$.k"), "int").alias("k_safe"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("type_no_sentinel"),
        (F.upper("event_type") == F.lit("CLICK")).alias("is_click"),
        split_part(synthetic, " - ", 2).cast("long").alias("uid_from_split"),
        F.coalesce(F.col("value").cast("boolean"), F.lit(False)).alias("value_bool"),
    ).orderBy("event_id")


EXPR_KITCHEN_SINK_SQL = """
SELECT event_id,
       CAST(NULLIF(json_extract_string(props, '$.k'), '') AS INTEGER) AS k_safe,
       NULLIF(event_type, 'error') AS type_no_sentinel,
       upper(event_type) = 'CLICK' AS is_click,
       CAST(string_split(event_type || ' - ' || CAST(user_id AS VARCHAR), ' - ')[2] AS BIGINT) AS uid_from_split,
       COALESCE(CAST(value AS BOOLEAN), FALSE) AS value_bool
FROM events
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# P1/P2 + J4: JSON array parse + explode (reference
# client_forces_transformer.py:70-71 — jsonb_array_elements over a
# payload array). The JSON document is constructed from row values so
# both engines parse byte-identical input.


def json_array_explode(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    j = F.concat(F.lit("["), F.col("user_id"), F.lit(","), F.col("user_id") + 1, F.lit("]"))
    arr = F.from_json(j, "array<bigint>")
    return (
        ev.select("event_type", F.explode(arr).alias("v"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_vals"), F.sum("v").alias("sum_vals"))
        .orderBy("event_type")
    )


JSON_ARRAY_EXPLODE_SQL = """
WITH j AS (
  SELECT event_type,
         unnest(from_json('[' || user_id || ',' || (user_id + 1) || ']',
                          '["BIGINT"]')) AS v
  FROM events
)
SELECT event_type, COUNT(*) AS n_vals, CAST(SUM(v) AS BIGINT) AS sum_vals
FROM j GROUP BY event_type ORDER BY event_type
"""

# --------------------------------------------------------------------------
# J5: double-nested lateral explode (reference marketing_transformer.py:
# 105-106 — jsonb_array_elements(CanalesMkt) canal, then
# jsonb_array_elements(canal->'SubCanalesMkt')): an
# array<struct<tag, vals:array>> exploded twice.


def double_nested_explode(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    uid = F.col("user_id")
    tags = F.array(
        F.struct(F.lit("lo").alias("tag"), F.array(uid % 10, (uid + 1) % 10).alias("vals")),
        F.struct(F.lit("hi").alias("tag"), F.array(uid % 7).alias("vals")),
    )
    return (
        ev.select(F.explode(tags).alias("t"))
        .select(F.col("t.tag").alias("tag"), F.explode("t.vals").alias("v"))
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .orderBy("tag")
    )


DOUBLE_NESTED_EXPLODE_SQL = """
WITH lvl1 AS (
  SELECT unnest([
           {'tag': 'lo', 'vals': [user_id % 10, (user_id + 1) % 10]},
           {'tag': 'hi', 'vals': [user_id % 7]}
         ]) AS t
  FROM events
), lvl2 AS (
  SELECT t.tag AS tag, unnest(t.vals) AS v FROM lvl1
)
SELECT tag, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sum_v
FROM lvl2 GROUP BY tag ORDER BY tag
"""


# --------------------------------------------------------------------------
# A-family addendum: ROLLUP (the reference's 5 cobertura tables are a
# manual grouping-set, cobertura.py:436-446 — here expressed natively
# so one pass produces detail + subtotal + grand-total levels).


def rollup_orders_by_nation_segment(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    return (
        o.join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .rollup("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "c_nationkey", "c_mktsegment")
    )


ROLLUP_ORDERS_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS n_orders,
       {dsum_sql("o_totalprice", "revenue")},
       CAST(GROUPING(c_nationkey) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_nationkey, c_mktsegment)
ORDER BY gid, c_nationkey, c_mktsegment
"""


QUERIES = {
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "json_array_explode": (json_array_explode, JSON_ARRAY_EXPLODE_SQL),
    "double_nested_explode": (double_nested_explode, DOUBLE_NESTED_EXPLODE_SQL),
    "rollup_orders_by_nation_segment": (rollup_orders_by_nation_segment, ROLLUP_ORDERS_SQL),
    "top_revenue_parts": (top_revenue_parts, TOP_REVENUE_PARTS_SQL),
    "customer_nation_region": (customer_nation_region, CUSTOMER_NATION_REGION_SQL),
    "coverage_two_level": (coverage_two_level, COVERAGE_TWO_LEVEL_SQL),
    "count_distinct_kpi": (count_distinct_kpi, COUNT_DISTINCT_KPI_SQL),
    "pivot_status_matrix": (pivot_status_matrix, PIVOT_STATUS_MATRIX_SQL),
    "quarterly_matrix": (quarterly_matrix, QUARTERLY_MATRIX_SQL),
    "lww_latest_events": (lww_latest_events, LWW_LATEST_EVENTS_SQL),
    "mom_revenue_delta": (mom_revenue_delta, MOM_REVENUE_DELTA_SQL),
    "json_extract_events": (json_extract_events, JSON_EXTRACT_EVENTS_SQL),
    "calendar_dim": (calendar_dim, CALENDAR_DIM_SQL),
    "anti_join_unsold_parts": (anti_join_unsold_parts, ANTI_JOIN_UNSOLD_PARTS_SQL),
    "semi_join_big_spenders": (semi_join_big_spenders, SEMI_JOIN_BIG_SPENDERS_SQL),
    "explode_doc_words": (explode_doc_words, EXPLODE_DOC_WORDS_SQL),
    "union_all_table_counts": (union_all_table_counts, UNION_ALL_TABLE_COUNTS_SQL),
    "top3_parts_per_brand": (top3_parts_per_brand, TOP3_PARTS_PER_BRAND_SQL),
    "avg_ticket_per_segment": (avg_ticket_per_segment, AVG_TICKET_PER_SEGMENT_SQL),
    "expr_kitchen_sink": (expr_kitchen_sink, EXPR_KITCHEN_SINK_SQL),
}
