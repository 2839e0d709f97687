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
        # math.isfinite guard (r12 harness hunt): int(inf) raises
        # OverflowError, which would crash the comparator instead of
        # reporting the cell — an op emitting ±inf must FAIL, not ERROR
        if math.isfinite(v) and v == int(v) and abs(v) < 1e15:
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
    # distinct tags for int vs str (r8): the driver's value hash forks on
    # 5 vs "5", but the old untagged format canonicalized both to "5" —
    # a mixed/miscast column passed locally and FAILed at grading
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, str):
        return f"s:{v}"
    return f"{type(v).__name__}:{v}"


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    if not cols:
        return [() for _ in range(len(df))]
    # COLUMN-wise, never iterrows(): iterrows() materializes each row as a
    # Series whose common dtype upcasts mixed int/float rows to float64,
    # erasing exactly the int-vs-float column fork the driver's per-column
    # hash distinguishes (r3: dedup_substring_spans' DuckDB HUGEINT→float64
    # n_dup passed here but failed the driver hash). Series.tolist()
    # preserves each column's own dtype (int64→int, float64→float).
    col_cells = [[_canon_cell(v) for v in df[c].tolist()] for c in cols]
    return sorted(zip(*col_cells))


def _dtype_kind(s: pd.Series) -> str:
    """Coarse per-column kind mirroring what the driver's hash can fork on:
    'int' vs 'float' vs 'bool' vs everything else by value type."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"  # Spark gives ns, DuckDB us — resolution is NOT a fork
    if k == "m":
        return "timedelta"
    if k == "O":
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            if hasattr(v, "isoformat"):
                return "datetime"
            return f"obj:{type(v).__name__}"
        return "all-null"
    return str(s.dtype)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"{name}: column mismatch spark={s_cols} duck={d_cols}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    # Numeric-kind parity per column: an int64-vs-float64 fork hashes
    # differently in the driver even when every value is numerically equal
    # (DuckDB HUGEINT/uncast SUM → float64). all-null columns can't fork.
    for c in s_cols:
        sk, dk = _dtype_kind(spark_pdf[c]), _dtype_kind(duck_pdf[c])
        if sk != dk and "all-null" not in (sk, dk):
            problems.append(f"{name}: dtype-kind fork col={c} spark={sk} duck={dk}")
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        # find first divergence for debuggability
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        d_set = set(d_rows[:2000])  # hoisted (r8): was rebuilt per row
        only_s = [r for r in s_rows[:2000] if r not in d_set][:2]
        problems.append(
            f"{name}: value mismatch; first zip-diffs={diffs!r} spark-only-sample={only_s!r}"
        )
    return problems


# The testdata tables every tool registers as DuckDB views — ONE list
# (r8: three tools carried drifting copies).
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_views(con, sf_dir: str) -> None:
    """Register the parquet tables of ``sf_dir`` as DuckDB views."""
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
