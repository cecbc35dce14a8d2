"""Typed source readers (SURVEY.md §2.1 S1-S5): semicolon CSV and
schema-first JSON with nested arrays ready for explode."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_etl_spark.sources.readers import read_csv_semicolon, read_json_records


def test_read_csv_semicolon(spark, tmp_path):
    p = tmp_path / "depositos.csv"
    p.write_text("id_deposito;sucursal;nombre\n1;10 - CENTRO;Principal\n2;20 - NORTE;Anexo\n")
    schema = T.StructType(
        [
            T.StructField("id_deposito", T.IntegerType()),
            T.StructField("sucursal", T.StringType()),
            T.StructField("nombre", T.StringType()),
        ]
    )
    df = read_csv_semicolon(spark, str(p), schema)
    rows = sorted(df.collect(), key=lambda r: r["id_deposito"])
    assert [r["id_deposito"] for r in rows] == [1, 2]
    # the reference's SPLIT_PART(sucursal,' - ',1)::int pattern works on it
    got = df.select(F.split("sucursal", " - ")[0].cast("int").alias("id_suc")).collect()
    assert sorted(r["id_suc"] for r in got) == [10, 20]


def test_read_json_records_nested_arrays(spark, tmp_path):
    p = tmp_path / "clients.json"
    p.write_text(
        '{"idCliente": 1, "eClifuerza": [{"idFuerzaVentas": 1, "idRuta": 7}, '
        '{"idFuerzaVentas": 4, "idRuta": 9}]}\n'
        '{"idCliente": 2, "eClifuerza": []}\n'
    )
    schema = T.StructType(
        [
            T.StructField("idCliente", T.LongType()),
            T.StructField(
                "eClifuerza",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("idFuerzaVentas", T.LongType()),
                            T.StructField("idRuta", T.LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    df = read_json_records(spark, str(p), schema)
    exploded = df.select("idCliente", F.explode("eClifuerza").alias("f")).select(
        "idCliente", "f.idFuerzaVentas", "f.idRuta"
    )
    rows = sorted(exploded.collect(), key=lambda r: (r["idCliente"], r["idFuerzaVentas"]))
    assert [(r["idCliente"], r["idFuerzaVentas"], r["idRuta"]) for r in rows] == [
        (1, 1, 7),
        (1, 4, 9),
    ]
