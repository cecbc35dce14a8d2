"""Reference-shaped silver transforms: the bronze→silver extraction
semantics of medallion-etl applied to its own record shapes
(FIXTURES.md §B), so a user of the reference can run the same
transformations here.

Each function documents the reference behavior it reproduces
(file:line). All logic is built-in column expressions — the JSON
arrives parsed (read_json_records with an explicit schema), so there
is no string re-parsing per field the way the reference's
``data_raw->>'x'`` does 70+ times per row; Catalyst prunes the struct
accesses to the columns actually used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import bool_from_token, null_if_sentinel, safe_cast, split_part

VIGENTE = "9999-12-31"
GROUPING_FORMS = ["MARCA", "GENERICO", "CALIBRE", "PROVEED", "UNIDAD DE NEGOCIO"]


def parse_sales(raw: DataFrame) -> DataFrame:
    """Silver sales extraction (reference sales_transformer.py:117-220):
    NULLIF-empty-then-cast numerics, sentinel-date nulling
    ('0001-01-01'), boolean from 'SI'/'NO' token, and the derived
    measure ``facturacion_neta = cantidades_total * ABS(precioventabr)``
    — reading the ``precioventabr`` key exactly as the reference CODE
    does (its docs say precioUnitarioBruto; BUGS.md BUG-008 flags the
    discrepancy; we replicate the code)."""
    return raw.select(
        safe_cast("idSucursal", "int").alias("id_sucursal"),
        safe_cast("idCliente", "int").alias("id_cliente"),
        safe_cast("idArticulo", "int").alias("id_articulo"),
        safe_cast("idVendedor", "int").alias("id_vendedor"),
        safe_cast("nrodoc", "long").alias("nro_doc"),
        null_if_sentinel(safe_cast("fechaComprobate", "date"), "0001-01-01").alias(
            "fecha_comprobante"
        ),
        null_if_sentinel(
            safe_cast(F.col("fechaEntrega"), "date"), "0001-01-01"
        ).alias("fecha_entrega"),
        bool_from_token("anulado").alias("anulado"),
        bool_from_token("esCombo").alias("es_combo"),
        safe_cast("cantidadesTotal", "decimal(15,4)").alias("cantidades_total"),
        safe_cast("subtotalFinal", "decimal(15,4)").alias("subtotal_final"),
        (
            safe_cast("cantidadesTotal", "decimal(15,4)")
            * F.abs(safe_cast("precioventabr", "decimal(15,4)"))
        ).cast("decimal(15,4)").alias("facturacion_neta"),
        split_part("proveedor", " - ", 1).cast("int").alias("id_proveedor"),
    )


def client_forces(raw_clients: DataFrame) -> DataFrame:
    """Explode eClifuerza and keep only vigente rows in sales forces
    1/4 (reference client_forces_transformer.py:57-73: lateral
    jsonb_array_elements + fechaFinFuerza='9999-12-31' filter +
    idFuerzaVentas IN (1,4)), then first-per-(cliente,ruta,
    fecha_inicio) like its DISTINCT ON."""
    exploded = raw_clients.select(
        safe_cast("idCliente", "int").alias("id_cliente"),
        F.explode("eClifuerza").alias("f"),
    ).select(
        "id_cliente",
        safe_cast(F.col("f.idFuerzaVentas"), "int").alias("id_fuerza_ventas"),
        safe_cast(F.col("f.idRuta"), "int").alias("id_ruta"),
        safe_cast(F.col("f.fechaInicioFuerza"), "date").alias("fecha_inicio"),
        F.col("f.fechaFinFuerza").alias("fecha_fin"),
    )
    vigente = exploded.filter(
        (F.col("fecha_fin") == VIGENTE) & F.col("id_fuerza_ventas").isin(1, 4)
    ).drop("fecha_fin")
    return vigente.dropDuplicates(["id_cliente", "id_ruta", "fecha_inicio"])


def staff_lww(raw_staff: DataFrame, id_col: str = "id") -> DataFrame:
    """Last-writer-wins staff dedup: newest row (highest serial id) per
    (id_personal, id_sucursal) — reference staff_transformer.py:61-81
    ``DISTINCT ON (id_personal, id_sucursal) ... ORDER BY id DESC``.
    Composite key is load-bearing: ids are unique per branch only
    (reference CLAUDE.md:166-178, INCIDENTS.md INC-001)."""
    w = Window.partitionBy("id_personal", "id_sucursal").orderBy(F.col(id_col).desc())
    return (
        raw_staff.select(
            F.col(id_col),
            safe_cast("idPersonal", "int").alias("id_personal"),
            safe_cast("idSucursal", "int").alias("id_sucursal"),
            F.col("desPersonal").alias("des_personal"),
            F.col("cargo"),
        )
        .filter(F.col("id_personal").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", id_col)
    )


def article_groupings_pivot(raw_articles: DataFrame) -> DataFrame:
    """Explode eAgrupaciones and pivot the five known grouping forms
    into columns, MAX per form, unknown forms dropped (reference
    article_groupings_transformer.py:51-66 + dim_articulo.py:35-45
    ``MAX(CASE WHEN id_forma_agrupar='MARCA' THEN des END)``)."""
    flat = raw_articles.select(
        safe_cast("idArticulo", "int").alias("id_articulo"),
        F.explode("eAgrupaciones").alias("g"),
    ).select(
        "id_articulo",
        F.col("g.idFormaAgrupar").alias("forma"),
        F.col("g.desAgrupacion").alias("des"),
    )
    return (
        flat.groupBy("id_articulo")
        .pivot("forma", GROUPING_FORMS)
        .agg(F.max("des"))
        .withColumnsRenamed(
            {
                "MARCA": "marca",
                "GENERICO": "generico",
                "CALIBRE": "calibre",
                "PROVEED": "proveedor",
                "UNIDAD DE NEGOCIO": "unidad_negocio",
            }
        )
    )


def marketing_flatten(raw_marketing: DataFrame) -> DataFrame:
    """Double-nested lateral explode: segmento -> CanalesMkt ->
    SubCanalesMkt (reference marketing_transformer.py:105-111)."""
    return (
        raw_marketing.select(
            safe_cast("idSegmentoMkt", "int").alias("id_segmento"),
            F.col("desSegmentoMkt").alias("des_segmento"),
            F.explode("CanalesMkt").alias("canal"),
        )
        .select(
            "id_segmento",
            "des_segmento",
            safe_cast(F.col("canal.idCanalMkt"), "int").alias("id_canal"),
            F.col("canal.desCanalMkt").alias("des_canal"),
            F.explode("canal.SubCanalesMkt").alias("sub"),
        )
        .select(
            "id_segmento",
            "des_segmento",
            "id_canal",
            "des_canal",
            safe_cast(F.col("sub.idSubcanalMkt"), "int").alias("id_subcanal"),
            F.col("sub.desSubcanalMkt").alias("des_subcanal"),
        )
    )


def dim_cliente_routes(
    forces: DataFrame, routes: DataFrame, staff: DataFrame
) -> DataFrame:
    """The INC-001 join chain done right: client_forces ⋈ routes ON
    (id_ruta, id_fuerza_ventas) ⋈ staff ON (id_personal, id_sucursal) —
    every hop carries the branch discriminator so vendors from one
    branch can never attach to another branch's clients (reference
    dim_cliente.py:30-54 post-fix; INCIDENTS.md:7-33 documents the
    cross-branch mixing when id_sucursal was omitted)."""
    latest = Window.partitionBy("id_cliente", "id_fuerza_ventas").orderBy(
        F.col("fecha_inicio").desc()
    )
    current = (
        forces.withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        current.join(routes, ["id_ruta", "id_fuerza_ventas"])
        .join(staff, ["id_personal", "id_sucursal"])
        .select(
            "id_cliente",
            "id_fuerza_ventas",
            "id_ruta",
            "id_sucursal",
            "id_personal",
            "des_personal",
        )
    )
