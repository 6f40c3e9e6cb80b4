"""Excel source (SURVEY.md §2.1 S2): sheet → all-string DataFrame.

The reference reads every cell as a string to avoid dtype surprises
(``pd.read_excel(..., dtype=str)`` — Compare.py:41-43) and the diff engine
is defined over that canonical form. Template workbooks are small, so the
read happens on the driver and is parallelized afterwards via
``spark.createDataFrame`` (same boundary the JDBC driver uses for metadata).

openpyxl/xlrd are not installed in this container, so the xlsx path is
import-gated; :func:`grid_to_dataframe` provides the same semantics from an
in-memory :class:`~...sinks.excel_writer.CellGrid`, and
:func:`read_csv_all_string` is the distributed all-string scan for
file-backed snapshots of any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.sinks.excel_writer import CellGrid


def read_excel_all_string(
    spark: SparkSession, path: str, sheet_name: str | int | None = None
) -> DataFrame:
    """Read a workbook sheet with every column as StringType.

    ``sheet_name=None`` selects the active (first) sheet, mirroring the
    reference's default-to-active behavior (Compare.py:125-126).
    """
    try:
        import pandas as pd

        pdf = pd.read_excel(
            path,
            sheet_name=sheet_name if sheet_name is not None else 0,
            dtype=str,
            engine="openpyxl",
        )
    except ImportError:
        # No pandas excel engine in this environment — fall back to the
        # native stdlib reader (sinks/xlsx.py), which covers workbooks
        # this engine writes plus any inline-string/number sheet1.
        return read_xlsx_all_string(spark, path)
    return spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))


def read_xlsx_all_string(
    spark: SparkSession, path: str, header_row: int = 1
) -> DataFrame:
    """S2 via the native .xlsx reader: workbook → CellGrid →
    all-string DataFrame with explicit row ordinals (no openpyxl)."""
    from etl_pipeline_excel_sql__spark.sinks.xlsx import xlsx_to_grid

    return grid_to_dataframe(spark, xlsx_to_grid(path), header_row=header_row)


def grid_to_dataframe(
    spark: SparkSession, grid: CellGrid, header_row: int = 1
) -> DataFrame:
    """All-string DataFrame from an in-memory grid (header row → names).

    Row *r* of the sheet becomes frame row *r - header_row - 1*, with an
    explicit ``_row_ordinal`` column — the D4 positional-alignment hazard
    (Compare.py:173-176) resolved by carrying the ordinal instead of
    trusting physical order.
    """
    max_col = max((c for _, c in grid.cells), default=0)
    headers = [
        str(grid.get(header_row, c) or f"col{c}") for c in range(1, max_col + 1)
    ]
    rows = []
    for r in range(header_row + 1, grid.max_row() + 1):
        vals = [
            None if grid.get(r, c) is None else str(grid.get(r, c))
            for c in range(1, max_col + 1)
        ]
        rows.append((*vals, r - header_row - 1))
    schema_cols = ", ".join(f"`{h}` string" for h in headers)
    return spark.createDataFrame(rows, f"{schema_cols}, _row_ordinal long")


def read_csv_all_string(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """Distributed all-string scan of a CSV snapshot (the scale path for
    S2 semantics: ``inferSchema=false`` keeps every column StringType)."""
    df = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", "false")
        .csv(path)
    )
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])
