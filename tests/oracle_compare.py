"""Local replica of the driver's correctness compare (SURVEY §5.2.1):
row-count + column-name schema + order-insensitive value comparison between
a Spark DataFrame and a DuckDB oracle query on the same parquet tables.

Stricter than a hash: compares cell values directly (exact for non-floats,
exact for floats too — our ops round any float whose cross-engine
accumulation order could differ, so surviving differences are real bugs).
"""

from __future__ import annotations

import math

import pandas as pd


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return f"b:{int(v)}"
    # numpy scalars → python
    if hasattr(v, "item"):
        return _canon_cell(v.item())
    return f"{type(v).__name__ if isinstance(v, (int, str)) is False else ''}{v}"


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_canon_cell(row[c]) for c in cols))
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"{name}: column mismatch spark={s_cols} duck={d_cols}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        # find first divergence for debuggability
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        only_s = [r for r in s_rows[:2000] if r not in set(d_rows[:2000])][:2]
        problems.append(
            f"{name}: value mismatch; first zip-diffs={diffs!r} spark-only-sample={only_s!r}"
        )
    return problems
