"""Unit tests for the comparator the whole evidence chain runs on
(tests/oracle_compare.py). Every case is a fork class the grading driver's
value hash distinguishes — the comparator must flag ALL of them locally."""

from __future__ import annotations

import pandas as pd

from tests.oracle_compare import TABLES, _canon_cell, compare_frames


def test_int_vs_str_forks():
    # r8: 5 and "5" canonicalized identically before the i:/s: tags
    s = pd.DataFrame({"k": [1, "2"]})
    d = pd.DataFrame({"k": [1, 2]})
    assert compare_frames(s, d, "t"), "int-vs-str column fork must be flagged"


def test_int_vs_float_forks():
    s = pd.DataFrame({"n": pd.array([3], dtype="int64")})
    d = pd.DataFrame({"n": pd.array([3.0], dtype="float64")})
    assert compare_frames(s, d, "t"), "int64-vs-float64 (HUGEINT class) must fork"


def test_bool_is_not_int():
    assert _canon_cell(True) != _canon_cell(1)


def test_equal_frames_match_across_row_order():
    s = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    d = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    assert compare_frames(s, d, "t") == []


def test_row_count_and_column_mismatch():
    s = pd.DataFrame({"a": [1, 2]})
    assert compare_frames(s, pd.DataFrame({"a": [1]}), "t")
    assert compare_frames(s, pd.DataFrame({"b": [1, 2]}), "t")


def test_nested_list_cells_compare_elementwise():
    s = pd.DataFrame({"v": [[1, 2], [3]]})
    d = pd.DataFrame({"v": [[3], [1, 2]]})
    assert compare_frames(s, d, "t") == []
    d2 = pd.DataFrame({"v": [[3], [1, "2"]]})
    assert compare_frames(s, d2, "t"), "int-vs-str inside a list must fork"


def test_null_vs_value_forks():
    s = pd.DataFrame({"x": [None, 1.5]})
    d = pd.DataFrame({"x": [0.0, 1.5]})
    assert compare_frames(s, d, "t")


def test_tables_constant_matches_testdata():
    import os

    for t in TABLES:
        assert os.path.exists(f"/root/testdata/sf0.001/{t}.parquet"), t
