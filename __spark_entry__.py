"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementations live in the ``bpspark`` package; operators
register themselves in ``bpspark.registry`` (SURVEY.md §2.3 op ids).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module with any cwd — make the repo importable
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import bpspark  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.1): TPC-H Q1-shape
    pricing summary — scan → pushed filter → partial hash agg → sort."""
    from bpspark.relational import agg_group_sums

    return agg_group_sums(spark, "/root/testdata/sf0.001").orderBy(
        "l_returnflag", "l_linestatus"
    )


def _with_worker_imports(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        bpspark.ensure_worker_imports(spark)
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "op")
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3. Each callable
    first ships the bpspark package to executor Python workers (addPyFile)
    so UDF-bearing ops work regardless of the driver's cwd."""
    return {name: _with_worker_imports(fn) for name, fn in bpspark.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per op; ops without SQL-expressible semantics are
    omitted (driver records a rows-only check)."""
    return bpspark.oracle_sql()
