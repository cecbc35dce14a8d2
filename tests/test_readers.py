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


def test_excel_reader_gated_without_engine_for_legacy_xls(spark, monkeypatch):
    """Without openpyxl, legacy binary .xls (no stdlib fallback
    possible) must raise the documented NotImplementedError, not a
    bare ImportError. (.xlsx now falls back to the stdlib parser —
    see the real-workbook test below.)"""
    import pandas as pd

    import pytest as _pytest

    from medallion_etl_spark.sources import readers

    def _no_engine(*a, **k):
        raise ImportError("Missing optional dependency 'openpyxl'")

    monkeypatch.setattr(pd, "read_excel", _no_engine)
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.IntegerType())])
    with _pytest.raises(NotImplementedError, match="Excel source needs an engine"):
        readers.read_excel_rows(spark, "/nonexistent.xls", schema)


def _write_minimal_xlsx(path: str, header: list, rows: list[list]) -> None:
    """Hand-build a REAL (minimal, spec-conformant) .xlsx: a zip of
    OOXML parts — workbook + rels + sharedStrings + one sheet. Strings
    go through sharedStrings (the path real producers take), numbers
    inline; written with stdlib only so the test shares no code with
    the parser under test."""
    import zipfile

    def cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="s"><v>{strings.setdefault(str(v), len(strings))}</v></c>'

    strings: dict[str, int] = {}
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    body = []
    for i, row in enumerate([header, *rows], start=1):
        cells = "".join(
            cell(f"{chr(65 + j)}{i}", v) for j, v in enumerate(row)
        )
        body.append(f'<row r="{i}">{cells}</row>')
    sheet_xml = f'<?xml version="1.0"?><worksheet {ns}><sheetData>{"".join(body)}</sheetData></worksheet>'
    sst_items = "".join(
        f"<si><t>{s}</t></si>" for s, _ in sorted(strings.items(), key=lambda kv: kv[1])
    )
    sst_xml = f'<?xml version="1.0"?><sst {ns} count="{len(strings)}" uniqueCount="{len(strings)}">{sst_items}</sst>'
    wb_xml = (
        '<?xml version="1.0"?>'
        f'<workbook {ns} xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Hoja1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels_xml = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    ct_xml = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct_xml)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/_rels/workbook.xml.rels", rels_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
        z.writestr("xl/sharedStrings.xml", sst_xml)


def test_excel_source_executes_on_a_real_workbook_without_engine(
    spark, tmp_path, monkeypatch
):
    """S5 executed end-to-end with NO Excel engine: a real .xlsx file
    (built by hand, shared-string + numeric cells, a sparse row) read
    through the stdlib fallback, then the reference's validation
    contract — non-numeric ids skipped, duplicate id keeps the LAST
    occurrence, uncastable measures become NULL."""
    import pandas as pd

    from medallion_etl_spark.sources import readers

    def _no_engine(*a, **k):
        raise ImportError("Missing optional dependency 'openpyxl'")

    monkeypatch.setattr(pd, "read_excel", _no_engine)

    path = str(tmp_path / "hectolitros.xlsx")
    _write_minimal_xlsx(
        path,
        ["id_articulo", "factor"],
        [
            [1, 0.5],
            ["junk", 9.9],
            [2, 0.25],
            [None, 1.0],
            [1, 0.75],
            [3, "bad"],
        ],
    )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id_articulo", T.IntegerType()),
            T.StructField("factor", T.DoubleType()),
        ]
    )
    got = readers.read_excel_rows(spark, path, schema, id_col="id_articulo")
    rows = {r["id_articulo"]: r["factor"] for r in got.collect()}
    assert rows == {1: 0.75, 2: 0.25, 3: None}
    assert dict(got.dtypes) == {"id_articulo": "int", "factor": "double"}


def test_stdlib_xlsx_parser_reads_sheets_by_name_and_skips_rows(tmp_path):
    from medallion_etl_spark.sources.readers import _read_xlsx_stdlib

    path = str(tmp_path / "wb.xlsx")
    _write_minimal_xlsx(
        path,
        ["banner row", None],
        [["id", "val"], [10, "x"], [20, True]],
    )
    pdf = _read_xlsx_stdlib(path, sheet="Hoja1", skip_rows=1)
    assert list(pdf.columns) == ["id", "val"]
    # raw text out; typing is validate_sheet_rows' try_cast contract
    assert pdf["id"].tolist() == ["10", "20"]
    assert pdf["val"].tolist() == ["x", "true"]
