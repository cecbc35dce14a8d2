"""Typed sources (SURVEY.md §2.1).

The reference pulls from a paginated ERP REST API (S1-S3), a
semicolon-delimited CSV (S4) and an Excel sheet (S5). In this engine
every source lands as a DataFrame with an explicit schema — never
inferSchema in production paths — and batch fan-out (month × depot
loops in the reference) becomes partition-parallel reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table from a testdata scale dir (columnar scan with
    pushdown — the engine's default source)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_csv_semicolon(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Reference S4: ``csv.DictReader(delimiter=';')`` in
    depositos_loader.py:15-62 -> declarative CSV scan."""
    reader = spark.read.option("delimiter", ";").option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json_records(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Reference S1-S3: raw JSON blobs landing in bronze. Explicit
    schema so nested arrays (eClifuerza, eAgrupaciones, CanalesMkt)
    arrive as ArrayType(StructType) ready for explode."""
    return spark.read.schema(schema).json(path)


def validate_sheet_rows(
    raw: DataFrame, schema: T.StructType, *, id_col: str | None = None
) -> DataFrame:
    """The reference's Excel row-validation contract as a pure
    DataFrame transform (hectolitros_loader.py:21-53), factored out of
    the Excel reader so the semantics are testable without an Excel
    engine:

    - every column is try_cast to the declared schema (bad values ->
      NULL — explicit, since ANSI-mode plain cast throws);
    - rows whose ``id_col`` fails the cast are SKIPPED (the reference
      skips non-numeric id cells — header junk, subtotal rows);
    - duplicate ids keep the LAST sheet occurrence (the reference
      builds a dict keyed by id, so later rows overwrite earlier ones).

    ``raw`` must carry a ``_row_order`` long column (sheet row number)
    when ``id_col`` is set; the Excel reader below adds it.
    """
    casted = raw.select(
        *[
            F.col(f.name).try_cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name in raw.columns
        ],
        *([F.col("_row_order")] if "_row_order" in raw.columns else []),
    )
    if id_col is None:
        return casted
    valid = casted.filter(F.col(id_col).isNotNull())
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("_row_order").desc())
    )
    return (
        valid.withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_row_order")
    )


def _read_xlsx_stdlib(path: str, *, sheet: int | str = 0, skip_rows: int = 0):
    """Minimal pure-stdlib .xlsx parser (zipfile + ElementTree): the
    openpyxl-free fallback that makes the Excel source (S5) EXECUTE in
    engine-less environments like this container. Covers the subset
    the reference's sheets use — shared strings, inline strings,
    numbers, booleans, sparse rows addressed by A1-style refs, sheet
    selection by index or name. Anything fancier (styles, dates-as-
    numbers beyond raw serials, formulas' cached strings are returned
    as-is) is out of scope. Every value lands as its raw TEXT (bools
    normalized to 'true'/'false'): the declared-schema try_cast in
    ``validate_sheet_rows`` is the one typing contract, exactly as
    with the pandas engine path — eager numeric parsing here would
    produce mixed-type object columns Spark's inference can't merge.
    Returns a pandas DataFrame with the first non-skipped row as
    header."""
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as pd

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    RELNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = [
            (el.get("name"), el.get(RELNS))
            for el in wb.iter()
            if local(el.tag) == "sheet"
        ]
        rels: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in z.namelist():
            relroot = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            rels = {
                el.get("Id"): el.get("Target")
                for el in relroot.iter()
                if local(el.tag) == "Relationship"
            }
        if isinstance(sheet, str):
            matches = [i for i, (n, _) in enumerate(sheets) if n == sheet]
            if not matches:
                raise ValueError(f"no sheet named {sheet!r} in {path}")
            sheet_idx = matches[0]
        else:
            sheet_idx = sheet
        _name, rid = sheets[sheet_idx]
        target = rels.get(rid or "", f"worksheets/sheet{sheet_idx + 1}.xml")
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            for si in ET.fromstring(z.read("xl/sharedStrings.xml")).iter():
                if local(si.tag) == "si":
                    shared.append(
                        "".join(t.text or "" for t in si.iter() if local(t.tag) == "t")
                    )

        rows: list[list] = []
        for row in ET.fromstring(z.read(target)).iter():
            if local(row.tag) != "row":
                continue
            cells: dict[int, object] = {}
            for c in row:
                if local(c.tag) != "c":
                    continue
                col = 0
                for ch in c.get("r") or "":
                    if ch.isalpha():
                        col = col * 26 + (ord(ch.upper()) - 64)
                    else:
                        break
                col = col - 1 if col else len(cells)
                ctype = c.get("t", "n")
                v: object = None
                if ctype == "inlineStr":
                    v = "".join(t.text or "" for t in c.iter() if local(t.tag) == "t")
                else:
                    for child in c:
                        if local(child.tag) == "v":
                            v = child.text
                    if v is not None:
                        if ctype == "s":
                            v = shared[int(v)]
                        elif ctype == "b":
                            # Spark's cast accepts these (case-insensitive)
                            v = "true" if int(v) else "false"
                        # "n"/"str": keep the raw TEXT — numbers are
                        # stored as text in the XML, and typing is the
                        # declared schema's job (try_cast in
                        # validate_sheet_rows); eagerly parsing here
                        # would create mixed int/float/str object
                        # columns Spark's inference cannot merge
                cells[col] = v
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])

    rows = rows[skip_rows:]
    if not rows:
        return pd.DataFrame()
    header = [
        str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])
    ]
    width = max([len(header)] + [len(r) for r in rows[1:]])
    header += [f"col{i}" for i in range(len(header), width)]
    data = [r + [None] * (width - len(r)) for r in rows[1:]]
    return pd.DataFrame(data, columns=header)


def read_excel_rows(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    sheet: int | str = 0,
    skip_rows: int = 0,
    id_col: str | None = None,
) -> DataFrame:
    """Reference S5: Excel sheet source with row validation
    (hectolitros_loader.py:21-53). Excel is driver-side by nature (one
    small file), so this goes pandas -> createDataFrame, then applies
    ``validate_sheet_rows`` (skip non-numeric ids, last-wins dedup).

    Engine resolution: pandas' reader (full-featured) when an engine
    is installed; otherwise .xlsx files fall back to the pure-stdlib
    parser above (this container ships no openpyxl — the fallback is
    what keeps S5 an EXECUTED path here, tests/test_readers.py builds
    a real workbook and reads it); legacy binary .xls without an
    engine stays a clear NotImplementedError."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet, skiprows=skip_rows, header=0)
    except ImportError as e:  # openpyxl/xlrd absent
        if not path.lower().endswith((".xlsx", ".xlsm")):
            raise NotImplementedError(
                "Excel source needs an engine (openpyxl); not available in this "
                "environment (pure-stdlib fallback handles .xlsx only)"
            ) from e
        pdf = _read_xlsx_stdlib(path, sheet=sheet, skip_rows=skip_rows)
    # tolerate a sheet wider than the schema (trailing junk columns):
    # drop the surplus BEFORE renaming — assigning a shorter name list
    # than the column count is a pandas ValueError
    pdf = pdf.iloc[:, : len(schema.fields)]
    pdf.columns = [f.name for f in schema.fields][: len(pdf.columns)]
    pdf["_row_order"] = range(len(pdf))
    df = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    return validate_sheet_rows(df, schema, id_col=id_col)
