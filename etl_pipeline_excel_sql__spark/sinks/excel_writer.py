"""Excel sinks (SURVEY.md §2.2 K1-K5) — driver-side by design.

Template workbooks are O(10²-10³) rows (reference scale), so the sink is the
one legitimate driver materialization in the engine: the distributed plan
ends with ``toPandas()``/``collect()`` of an already-reduced frame, then a
local render. Everything upstream (filtering, ordering, diff classification)
stays distributed.

The render targets an abstract :class:`CellGrid`; the openpyxl adapter is
import-gated (the library isn't in this container), so all placement logic —
skip-columns, header matching, highlight fills — is real and unit-tested
against the in-memory grid.

Reference semantics replicated (citations for parity):

* K1 positional writer starting at (row 8, col 1) skipping template formula
  columns (Download.py:160-201, skip list :173, conversions :186-193);
* K2 header-matched append at first_data_row=6 in a fixed block order with a
  written-rows tally (Upload.py:148-224);
* K3 run-date stamp cell (Download.py:165-169);
* K5 highlighted diff copy — blue ``FF94DCF8`` changed/new, pink
  ``FFED8EDA`` cleared (Compare.py:160-166, 212-220).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

#: Excel 1-based column indexes the positional writer must skip — template
#: formula columns (Download.py:173).
DEFAULT_SKIP_COLS = frozenset({9, 15, 16, 17} | set(range(50, 62)))

FILL_CHANGED = "FF94DCF8"  # light blue (Compare.py:161)
FILL_CLEARED = "FFED8EDA"  # pink (Compare.py:163)
FONT_DIFF_WORD = "FFFF0000"  # red changed-word font (Compare.py:101)


def word_runs(words: list) -> list[tuple[str, str | None]]:
    """D3 render half: ``<col>__words`` structs → rich-text runs.

    Reference semantics (Compare.py:95-108): iterate NEW tokens; a token is
    red unless the old token at the same position equals it, and every
    token except the last carries a trailing space inside its own run.
    """
    runs: list[tuple[str, str | None]] = []
    for i, w in enumerate(words):
        text = w.word if i == len(words) - 1 else w.word + " "
        runs.append((text, None if w.same else FONT_DIFF_WORD))
    return runs


@dataclass
class CellGrid:
    """Minimal in-memory (row, col)→value grid with per-cell fills.

    Stand-in for an openpyxl worksheet; 1-based coordinates like Excel.
    """

    cells: dict[tuple[int, int], Any] = field(default_factory=dict)
    fills: dict[tuple[int, int], str] = field(default_factory=dict)
    #: (row, col) → rich-text runs [(text, argb-or-None), ...]; None = the
    #: default font color. Mirrors openpyxl's CellRichText/TextBlock model.
    rich: dict[tuple[int, int], list[tuple[str, str | None]]] = field(
        default_factory=dict
    )
    #: VBA module name → macro source (K4). The grid carries macro TEXT the
    #: way a real .xlsm carries its vbaProject — writing it into a live
    #: workbook needs a COM/VBA host, which no analytics engine has.
    vba_modules: dict[str, str] = field(default_factory=dict)

    def set(self, row: int, col: int, value: Any) -> None:
        self.cells[(row, col)] = value

    def get(self, row: int, col: int) -> Any:
        return self.cells.get((row, col))

    def fill(self, row: int, col: int, argb: str) -> None:
        self.fills[(row, col)] = argb

    def set_rich(
        self, row: int, col: int, runs: list[tuple[str, str | None]]
    ) -> None:
        """Rich-text cell: the plain value is the concatenated run text."""
        self.rich[(row, col)] = runs
        self.cells[(row, col)] = "".join(t for t, _ in runs)

    def max_row(self) -> int:
        return max((r for r, _ in self.cells), default=0)


def convert_value(v: Any) -> Any:
    """T7 sink conversion: null→``''``, datetimes pass as datetimes
    (openpyxl handles them natively; the reference needed COM time objects,
    Download.py:186-193 / Upload.py:211-218)."""
    if v is None:
        return ""
    if isinstance(v, float) and v != v:  # NaN
        return ""
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v
    return v


def write_positional(
    df: DataFrame,
    grid: CellGrid,
    row_start: int = 8,
    col_start: int = 1,
    skip_cols: frozenset[int] = DEFAULT_SKIP_COLS,
    max_rows: int = 100_000,
) -> int:
    """K1: positional cell writer with skip-columns.

    DataFrame column *i* (0-based) lands in the *i*-th non-skipped Excel
    column at or after ``col_start``. Bounded collect (template-scale sink;
    the ``max_rows`` guard turns an accidental huge frame into an error
    instead of a driver OOM). Returns rows written.
    """
    n_cols = len(df.columns)
    targets: list[int] = []
    c = col_start
    while len(targets) < n_cols:
        if c not in skip_cols:
            targets.append(c)
        c += 1

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"positional Excel sink got >{max_rows} rows; this sink is for "
            "template-scale output — reduce upstream"
        )
    for i, row in enumerate(rows):
        for j, value in enumerate(row):
            grid.set(row_start + i, targets[j], convert_value(value))
    return len(rows)


def stamp_run_date(
    grid: CellGrid, when: _dt.date, row: int = 4, col: int = 11
) -> None:
    """K3: run-date stamp into K4 (row 4, col 11), ``MM/DD/YYYY``."""
    grid.set(row, col, when.strftime("%m/%d/%Y"))


#: Columns the reference's paste guard protects (Download.py:214).
VBA_GUARD_COLUMNS = ("C", "D", "E", "J", "K", "AI", "AH", "AP")


def vba_paste_guard_code(columns: tuple[str, ...] = VBA_GUARD_COLUMNS) -> str:
    """The reference's Worksheet_SelectionChange paste guard, verbatim
    semantics (Download.py:208-224): undo any paste into a validated
    column whose validation type is not list (3)."""
    ranges = ", ".join(f"{c}:{c}" for c in columns)
    return f'''Private Sub Worksheet_SelectionChange(ByVal Target As Range)
    Dim cell As Range
    On Error Resume Next
    For Each cell In Target
        If Not Intersect(cell, Me.Range("{ranges}")) Is Nothing Then
            If cell.Validation.Type <> 3 Then
                Application.Undo
                MsgBox "Copy and paste is not allowed in this column.", vbExclamation
            End If
        End If
    Next cell
    On Error GoTo 0
End Sub
'''


def inject_vba_guard(
    grid: CellGrid,
    module: str = "Sheet1",
    columns: tuple[str, ...] = VBA_GUARD_COLUMNS,
) -> None:
    """K4 (Download.py:203-227): attach the paste-guard macro to the sink.

    The reference drives a live Excel COM host (``workbook.VBProject...
    AddFromString``); this engine stores the identical macro source on the
    grid so a downstream .xlsm writer with a VBA host can install it —
    the stored-string fidelity half of K4, without pretending to execute
    VBA.
    """
    grid.vba_modules[module] = vba_paste_guard_code(columns)


def write_header_matched(
    df: DataFrame,
    grid: CellGrid,
    mapping: dict[str, int],
    first_data_row: int = 6,
    max_rows: int = 100_000,
) -> int:
    """K2: header-matched append writer.

    ``mapping`` (source column → 0-based template column index) comes from
    operators/reconcile.reconcile_schema. Rows append starting at the first
    empty row at/after ``first_data_row``. Returns total rows written (the
    reference's ``total_written`` tally, Upload.py:200-224).
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError("header-matched Excel sink got too many rows")
    r = first_data_row
    while any(grid.get(r, c + 1) not in (None, "") for c in mapping.values()):
        r += 1
    cols = list(df.columns)
    written = 0
    for row in rows:
        for name, excel_idx in mapping.items():
            grid.set(r, excel_idx + 1, convert_value(row[cols.index(name)]))
        r += 1
        written += 1
    return written


def write_highlighted_diff(
    diff: DataFrame,
    grid: CellGrid,
    key: str,
    compare_cols: list[str],
    header_row: int = 1,
    max_rows: int = 100_000,
    word_diff_cols: list[str] | None = None,
) -> int:
    """K5: render a snapshot_diff result as a highlighted sheet.

    Column layout: key, then the ``__new`` value of each compared column.
    Fill rules (Compare.py:179-210): whole row blue when ``row_status='new'``;
    per-cell blue when changed, pink when cleared. For ``word_diff_cols``
    (the reference's WORD_DIFF_COLUMNS), a changed cell with a non-empty new
    value additionally renders word-level rich text — changed words red,
    unchanged words default (Compare.py:87-110, applied at :208-210) — from
    the ``<col>__words`` array snapshot_diff computed distributed-side.
    Returns rows rendered.
    """
    word_diff_cols = word_diff_cols or []
    grid.set(header_row, 1, key)
    for j, c in enumerate(compare_cols, start=2):
        grid.set(header_row, j, c)

    rows = diff.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError("diff Excel sink got too many rows")
    for i, row in enumerate(rows):
        r = header_row + 1 + i
        d = row.asDict()
        grid.set(r, 1, d[key])
        is_new = d["row_status"] == "new"
        for j, c in enumerate(compare_cols, start=2):
            new_val = d[f"{c}__new"]
            grid.set(r, j, convert_value(new_val))
            if is_new:
                grid.fill(r, j, FILL_CHANGED)
            elif d.get(f"{c}__status") == "changed":
                grid.fill(r, j, FILL_CHANGED)
                words = d.get(f"{c}__words")
                if c in word_diff_cols and words and new_val not in (None, ""):
                    grid.set_rich(r, j, word_runs(words))
            elif d.get(f"{c}__status") == "cleared":
                grid.fill(r, j, FILL_CLEARED)
        if is_new:
            grid.fill(r, 1, FILL_CHANGED)
    return len(rows)


def grid_to_openpyxl(grid: CellGrid, path: str, sheet_name: str = "Sheet1"):
    """Persist a CellGrid as a real .xlsx — only when openpyxl is available
    (import-gated; not present in this container)."""
    try:
        from openpyxl import Workbook
        from openpyxl.styles import PatternFill
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "openpyxl is not installed; CellGrid is the supported in-memory "
            "representation here"
        ) from exc
    wb = Workbook()
    ws = wb.active
    ws.title = sheet_name
    for (r, c), v in grid.cells.items():
        if (r, c) in grid.rich:
            from openpyxl.cell.rich_text import CellRichText, TextBlock
            from openpyxl.cell.text import InlineFont

            ws.cell(row=r, column=c).value = CellRichText(
                *[
                    TextBlock(
                        font=InlineFont(color=argb) if argb else InlineFont(),
                        text=text,
                    )
                    for text, argb in grid.rich[(r, c)]
                ]
            )
            continue
        ws.cell(row=r, column=c, value=v)
    for (r, c), argb in grid.fills.items():
        ws.cell(row=r, column=c).fill = PatternFill(
            start_color=argb, end_color=argb, fill_type="solid"
        )
    wb.save(path)
    return path
