"""java.util.Properties parsing parity (R4) — adversarial cases from the
documented Properties.load format (SURVEY §7.4.1, FIXTURES.md §B1)."""

from __future__ import annotations

import io
import zipfile

import pytest

from bpspark.parse import (
    basename_no_ext,
    extract_isbn_from_path,
    parse_metadata_zip,
    parse_properties,
)


def P(text: str, encoding: str = "iso-8859-1") -> dict[str, str]:
    return parse_properties(text.encode(encoding))


class TestPropertiesParity:
    def test_basic_separators(self):
        assert P("a=1\nb:2\nc 3\n") == {"a": "1", "b": "2", "c": "3"}

    def test_separator_padding(self):
        assert P("a \t = \t 1\nb\t:\t2\nTruth  = Beauty\n") == {
            "a": "1", "b": "2", "Truth": "Beauty"
        }

    def test_comments_and_blanks(self):
        assert P("# comment\n! also\n   \n\na=1\n  # indented comment\n") == {"a": "1"}

    def test_line_continuation(self):
        # javadoc's canonical example: fruits spanning three lines
        text = (
            "fruits                           apple, banana, pear, \\\n"
            "                                  cantaloupe, watermelon, \\\n"
            "                                  kiwi, mango\n"
        )
        assert P(text) == {
            "fruits": "apple, banana, pear, cantaloupe, watermelon, kiwi, mango"
        }

    def test_even_backslashes_no_continuation(self):
        # \\ at end is an escaped backslash, NOT a continuation
        assert P("a=1\\\\\nb=2\n") == {"a": "1\\", "b": "2"}

    def test_unicode_escape(self):
        assert P("motto=BestPub \\u00e9ditions\n") == {"motto": "BestPub \u00e9ditions"}

    def test_escaped_separators_in_key(self):
        assert P("a\\=b=c\n") == {"a=b": "c"}
        assert P("a\\:b : c\n") == {"a:b": "c"}
        assert P("a\\ b=c\n") == {"a b": "c"}

    def test_backslash_before_other_char_dropped(self):
        assert P("key=va\\lue\n") == {"key": "value"}
        assert P("b\\eta=x\n") == {"beta": "x"}

    def test_key_without_value(self):
        assert P("cheeses\n") == {"cheeses": ""}
        assert P("empty=\n") == {"empty": ""}

    def test_latin1_bytes(self):
        assert P("cafe=Caf\xe9\n") == {"cafe": "Caf\xe9"}

    def test_control_escapes(self):
        assert P("a=1\\t2\\n3\\r4\\f5\n") == {"a": "1\t2\n3\r4\f5"}

    def test_crlf_and_cr_line_endings(self):
        assert P("a=1\r\nb=2\rc=3\n") == {"a": "1", "b": "2", "c": "3"}

    def test_duplicate_key_last_wins(self):
        assert P("a=1\na=2\n") == {"a": "2"}

    def test_value_leading_ws_stripped_trailing_kept(self):
        assert P("a=   x  \n")["a"] == "x  "


class TestZipExplode:
    def _zip(self, entries: dict[str, bytes]) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for name, data in entries.items():
                zf.writestr(name, data)
        return buf.getvalue()

    def test_one_record_per_entry_keyed_by_basename(self):
        z = self._zip({
            "9780000000001.txt": b"Title=X\n",
            "chapter-1.txt": b"ChapterNumber=1\n",
        })
        recs = dict(parse_metadata_zip(z))
        assert recs == {
            "9780000000001": {"Title": "X"},
            "chapter-1": {"ChapterNumber": "1"},
        }

    def test_directory_entries_skipped(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(zipfile.ZipInfo("subdir/"), b"")
            zf.writestr("subdir/chapter-2.txt", b"ChapterNumber=2\n")
        recs = dict(parse_metadata_zip(buf.getvalue()))
        assert recs == {"chapter-2": {"ChapterNumber": "2"}}  # basename strips dirs

    def test_corrupt_zip_raises(self):
        with pytest.raises(Exception):
            parse_metadata_zip(b"PK\x03\x04 truncated")


def test_basename():
    assert basename_no_ext("9780000000001.txt") == "9780000000001"
    assert basename_no_ext("a/b/chapter-2.txt") == "chapter-2"
    assert basename_no_ext("noext") == "noext"
    assert basename_no_ext(".hidden") == ".hidden"


def test_isbn_extraction():
    assert extract_isbn_from_path("/x/y/9780000000001.zip") == "9780000000001"
    assert extract_isbn_from_path("/x/notanisbn.zip") == ""
