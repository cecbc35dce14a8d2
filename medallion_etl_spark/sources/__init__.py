from .readers import load_table, read_csv_semicolon, read_json_records  # noqa: F401
