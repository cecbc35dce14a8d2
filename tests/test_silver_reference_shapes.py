"""Reference-shaped silver transforms on FIXTURES.md §B records: the
exact edge cases the reference's own semantics hinge on — empty-string
numerics, sentinel dates, SI/NO booleans, vigente filters, LWW staff
dedup by serial id, grouping pivot with unknown forms dropped,
double-nested marketing explode, and the INC-001 composite-key join."""

from __future__ import annotations

import json
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from medallion_etl_spark.operators.silver import (
    article_groupings_pivot,
    client_forces,
    dim_cliente_routes,
    marketing_flatten,
    parse_sales,
    staff_lww,
)
from medallion_etl_spark.sources.readers import read_json_records


def _json_df(spark, tmp_path, name, records, schema):
    p = tmp_path / f"{name}.json"
    p.write_text("\n".join(json.dumps(r) for r in records))
    return read_json_records(spark, str(p), schema)


SALES_SCHEMA = T.StructType(
    [T.StructField(n, T.StringType()) for n in [
        "idSucursal", "idCliente", "idArticulo", "idVendedor", "nrodoc",
        "fechaComprobate", "fechaEntrega", "anulado", "esCombo",
        "cantidadesTotal", "subtotalFinal", "precioventabr", "proveedor",
    ]]
)


def test_parse_sales_edge_cases(spark, tmp_path):
    recs = [
        {  # B1 happy path incl. BUG-008 key (precioventabr, not precioUnitarioBruto)
            "idSucursal": "1", "idCliente": "100", "idArticulo": "500", "idVendedor": "7",
            "nrodoc": "12345", "fechaComprobate": "2025-01-15", "fechaEntrega": "0001-01-01",
            "anulado": "NO", "esCombo": "NO", "cantidadesTotal": "10.00",
            "subtotalFinal": "1500.00", "precioventabr": "150.0000",
            "proveedor": "77 - QUILMES",
        },
        {  # empty strings -> NULL; anulado SI; negative qty (credit note)
            "idSucursal": "2", "idCliente": "", "idArticulo": "500", "idVendedor": "",
            "nrodoc": "12346", "fechaComprobate": "2025-01-16", "fechaEntrega": "",
            "anulado": "SI", "esCombo": "NO", "cantidadesTotal": "-4.00",
            "subtotalFinal": "", "precioventabr": "150.0000", "proveedor": "77 - QUILMES",
        },
    ]
    out = parse_sales(_json_df(spark, tmp_path, "sales", recs, SALES_SCHEMA))
    rows = {r["nro_doc"]: r for r in out.collect()}
    r1, r2 = rows[12345], rows[12346]
    assert r1["facturacion_neta"] == Decimal("1500.0000")  # 10 * |150|
    assert r1["fecha_entrega"] is None  # sentinel 0001-01-01
    assert r1["anulado"] is False and r1["id_proveedor"] == 77
    assert r2["id_cliente"] is None and r2["id_vendedor"] is None  # NULLIF('')
    assert r2["subtotal_final"] is None
    assert r2["anulado"] is True
    assert r2["facturacion_neta"] == Decimal("-600.0000")  # -4 * |150| (credit note)


FORCE = T.StructType(
    [
        T.StructField("idFuerzaVentas", T.StringType()),
        T.StructField("idRuta", T.StringType()),
        T.StructField("fechaInicioFuerza", T.StringType()),
        T.StructField("fechaFinFuerza", T.StringType()),
    ]
)
CLIENT_SCHEMA = T.StructType(
    [
        T.StructField("idCliente", T.StringType()),
        T.StructField("eClifuerza", T.ArrayType(FORCE)),
    ]
)


def test_client_forces_vigente_and_fv_filter(spark, tmp_path):
    recs = [
        {
            "idCliente": "100",
            "eClifuerza": [
                {"idFuerzaVentas": "1", "idRuta": "10",
                 "fechaInicioFuerza": "2024-01-01", "fechaFinFuerza": "9999-12-31"},
                {"idFuerzaVentas": "4", "idRuta": "40",  # expired -> dropped
                 "fechaInicioFuerza": "2024-06-01", "fechaFinFuerza": "2025-01-01"},
                {"idFuerzaVentas": "2", "idRuta": "20",  # FV not in (1,4) -> dropped
                 "fechaInicioFuerza": "2024-01-01", "fechaFinFuerza": "9999-12-31"},
            ],
        },
        {"idCliente": "101", "eClifuerza": []},
    ]
    out = client_forces(_json_df(spark, tmp_path, "clients", recs, CLIENT_SCHEMA)).collect()
    assert len(out) == 1
    assert (out[0]["id_cliente"], out[0]["id_fuerza_ventas"], out[0]["id_ruta"]) == (100, 1, 10)


STAFF_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("idPersonal", T.StringType()),
        T.StructField("idSucursal", T.StringType()),
        T.StructField("desPersonal", T.StringType()),
        T.StructField("cargo", T.StringType()),
    ]
)


def test_staff_lww_composite_key(spark, tmp_path):
    recs = [
        # same idPersonal in two branches (INC-001 collision): BOTH survive
        {"id": 1, "idPersonal": "2", "idSucursal": "5", "desPersonal": "OLD NAME", "cargo": "PREV"},
        {"id": 9, "idPersonal": "2", "idSucursal": "5", "desPersonal": "NEW NAME", "cargo": "PREV"},
        {"id": 4, "idPersonal": "2", "idSucursal": "6", "desPersonal": "OTHER BRANCH", "cargo": "REP"},
        {"id": 5, "idPersonal": "", "idSucursal": "5", "desPersonal": "NULL KEY", "cargo": "X"},
    ]
    out = staff_lww(_json_df(spark, tmp_path, "staff", recs, STAFF_SCHEMA))
    rows = {(r["id_personal"], r["id_sucursal"]): r["des_personal"] for r in out.collect()}
    assert rows == {(2, 5): "NEW NAME", (2, 6): "OTHER BRANCH"}  # LWW + per-branch


GROUPING = T.StructType(
    [
        T.StructField("idFormaAgrupar", T.StringType()),
        T.StructField("idAgrupacion", T.StringType()),
        T.StructField("desAgrupacion", T.StringType()),
    ]
)
ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("idArticulo", T.StringType()),
        T.StructField("eAgrupaciones", T.ArrayType(GROUPING)),
    ]
)


def test_article_groupings_pivot(spark, tmp_path):
    recs = [
        {
            "idArticulo": "500",
            "eAgrupaciones": [
                {"idFormaAgrupar": "MARCA", "idAgrupacion": "M1", "desAgrupacion": "QUILMES"},
                {"idFormaAgrupar": "GENERICO", "idAgrupacion": "G1", "desAgrupacion": "CERVEZAS"},
                {"idFormaAgrupar": "IRRELEVANTE", "idAgrupacion": "X", "desAgrupacion": "drop me"},
            ],
        },
        {"idArticulo": "501", "eAgrupaciones": [
            {"idFormaAgrupar": "CALIBRE", "idAgrupacion": "C1", "desAgrupacion": "1L"}]},
    ]
    out = article_groupings_pivot(_json_df(spark, tmp_path, "articles", recs, ARTICLE_SCHEMA))
    rows = {r["id_articulo"]: r for r in out.collect()}
    assert rows[500]["marca"] == "QUILMES" and rows[500]["generico"] == "CERVEZAS"
    assert rows[500]["calibre"] is None  # missing form -> NULL column
    assert "IRRELEVANTE" not in out.columns and "drop me" not in [
        rows[500][c] for c in ("marca", "generico", "calibre", "proveedor", "unidad_negocio")
    ]
    assert rows[501]["calibre"] == "1L" and rows[501]["marca"] is None


SUB = T.StructType(
    [
        T.StructField("idSubcanalMkt", T.StringType()),
        T.StructField("desSubcanalMkt", T.StringType()),
        T.StructField("idCanalMkt", T.StringType()),
    ]
)
CANAL = T.StructType(
    [
        T.StructField("idCanalMkt", T.StringType()),
        T.StructField("desCanalMkt", T.StringType()),
        T.StructField("idSegmentoMkt", T.StringType()),
        T.StructField("SubCanalesMkt", T.ArrayType(SUB)),
    ]
)
MKT_SCHEMA = T.StructType(
    [
        T.StructField("idSegmentoMkt", T.StringType()),
        T.StructField("desSegmentoMkt", T.StringType()),
        T.StructField("CanalesMkt", T.ArrayType(CANAL)),
    ]
)


def test_marketing_double_explode(spark, tmp_path):
    recs = [
        {
            "idSegmentoMkt": "1", "desSegmentoMkt": "TRADICIONAL",
            "CanalesMkt": [
                {"idCanalMkt": "2", "desCanalMkt": "ALMACEN", "idSegmentoMkt": "1",
                 "SubCanalesMkt": [
                     {"idSubcanalMkt": "9", "desSubcanalMkt": "ALMACEN CHICO", "idCanalMkt": "2"},
                     {"idSubcanalMkt": "10", "desSubcanalMkt": "ALMACEN GRANDE", "idCanalMkt": "2"},
                 ]},
            ],
        }
    ]
    out = marketing_flatten(_json_df(spark, tmp_path, "mkt", recs, MKT_SCHEMA)).collect()
    assert {(r["id_segmento"], r["id_canal"], r["id_subcanal"]) for r in out} == {
        (1, 2, 9), (1, 2, 10)
    }


def test_dim_cliente_inc001_no_cross_branch_mixing(spark):
    """Two branches have the same id_personal and id_ruta numbers; the
    composite-key chain must keep each client's vendor inside the
    client's own branch (the INC-001 regression)."""
    forces = spark.createDataFrame(
        [(100, 1, 10, "2024-01-01"), (200, 1, 10, "2024-01-01")],
        ["id_cliente", "id_fuerza_ventas", "id_ruta", "fecha_inicio"],
    )
    # route 10 exists in BOTH branches with different staff
    routes = spark.createDataFrame(
        [(10, 1, 2, 5), (10, 1, 2, 6)],
        ["id_ruta", "id_fuerza_ventas", "id_personal", "id_sucursal"],
    )
    staff = spark.createDataFrame(
        [(2, 5, "VENDEDOR BRANCH5"), (2, 6, "VENDEDOR BRANCH6")],
        ["id_personal", "id_sucursal", "des_personal"],
    )
    out = dim_cliente_routes(forces, routes, staff).collect()
    # each client matches BOTH branch routes (forces carry no branch) —
    # but each output row must be internally consistent: the vendor's
    # branch == the route row's branch, never mixed
    assert len(out) == 4
    for r in out:
        assert (r["id_sucursal"] == 5) == (r["des_personal"] == "VENDEDOR BRANCH5")
