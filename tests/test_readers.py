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


def test_excel_validation_semantics_with_fake_reader(spark, monkeypatch):
    """Reference hectolitros_loader.py:21-53 contract, covered without
    an Excel engine by monkeypatching the pandas reader: non-numeric id
    rows are skipped, duplicate ids keep the LAST sheet occurrence."""
    import pandas as pd

    from medallion_etl_spark.sources import readers

    sheet = pd.DataFrame(
        {
            "id_articulo": [1, "junk", 2, None, 1, 3],
            "factor": [0.5, 9.9, 0.25, 1.0, 0.75, "bad"],
        }
    )
    monkeypatch.setattr(pd, "read_excel", lambda *a, **k: sheet.copy())

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id_articulo", T.IntegerType()),
            T.StructField("factor", T.DoubleType()),
        ]
    )
    got = readers.read_excel_rows(
        spark, "/nonexistent.xlsx", schema, id_col="id_articulo"
    )
    rows = {r["id_articulo"]: r["factor"] for r in got.collect()}
    # 'junk' and None ids skipped; id 1 keeps its LAST value (0.75);
    # id 3's non-numeric factor casts to NULL but the row survives
    assert rows == {1: 0.75, 2: 0.25, 3: None}
    assert dict(got.dtypes) == {"id_articulo": "int", "factor": "double"}


def test_excel_reader_gated_without_engine(spark, monkeypatch):
    """Without openpyxl the reader must raise the documented
    NotImplementedError, not a bare ImportError."""
    import pandas as pd

    import pytest as _pytest

    from medallion_etl_spark.sources import readers

    def _no_engine(*a, **k):
        raise ImportError("Missing optional dependency 'openpyxl'")

    monkeypatch.setattr(pd, "read_excel", _no_engine)
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.IntegerType())])
    with _pytest.raises(NotImplementedError, match="Excel source needs an engine"):
        readers.read_excel_rows(spark, "/nonexistent.xlsx", schema)
