"""File sources — reference parity for get_csv / get_excel
(src/ETL-NPL-Pipeline.py:34, :48).

CSV reads are native Spark (splittable, parallel, schema-able);
Excel has no JVM reader in this container, so it goes through
pandas/openpyxl on the driver behind an import gate — correct for
config-sized sheets (the reference's use case: small macro tables),
not for bulk data, and it says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:
    import pandas as _pd

    _HAS_PANDAS = True
except Exception:  # pragma: no cover
    _HAS_PANDAS = False


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV → DataFrame (ref get_csv). An explicit schema skips the
    inference pass — at scale, inference is a full extra read."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_excel(
    spark: SparkSession, path: str, sheet_name: str | int = 0
) -> DataFrame:
    """Excel sheet → DataFrame (ref get_excel), via driver-side
    pandas/openpyxl. Suitable for small reference tables only; bulk
    data belongs in parquet/CSV."""
    if not _HAS_PANDAS:
        raise NotImplementedError(
            "read_excel needs pandas+openpyxl; not available here"
        )
    try:
        pdf = _pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as exc:  # openpyxl missing
        raise NotImplementedError(
            "read_excel needs openpyxl for .xlsx files"
        ) from exc
    return spark.createDataFrame(pdf)
