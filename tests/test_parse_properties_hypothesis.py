"""Property-based tests for the java-Properties parser (R4 parity,
SURVEY §7.4.1): round-trip over a serializable subset, total-function
robustness on arbitrary latin-1 bytes, idempotence."""

from __future__ import annotations

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from bpspark.parse import parse_properties

# keys/values that serialize canonically with key=value\n (no separators,
# escapes, comments, or surrounding whitespace ambiguity)
_plain_key = st.text(
    alphabet=st.characters(
        codec="latin-1",
        exclude_characters="=:# !\t\f\n\r\\",
        exclude_categories=("Cc",),
    ),
    min_size=1,
    max_size=30,
)
_plain_value = st.text(
    alphabet=st.characters(
        codec="latin-1", exclude_characters="\n\r\\", exclude_categories=("Cc",)
    ),
    max_size=60,
).map(lambda s: s.strip(" \t\f"))  # leading ws is eaten, trailing ws kept → pin both


@given(st.dictionaries(_plain_key, _plain_value, max_size=12))
@settings(max_examples=200, deadline=None)
def test_roundtrip_plain_subset(d):
    text = "".join(f"{k}={v}\n" for k, v in d.items())
    assert parse_properties(text.encode("iso-8859-1")) == d


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_total_on_arbitrary_bytes(data):
    """The parser must be total over latin-1 byte streams: any input yields
    a dict (the quarantine channel is for ZIP errors, not parser crashes)."""
    props = parse_properties(data)
    assert isinstance(props, dict)
    assert all(isinstance(k, str) and isinstance(v, str) for k, v in props.items())


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_deterministic(data):
    assert parse_properties(data) == parse_properties(data)


@given(st.dictionaries(_plain_key, _plain_value, min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_last_duplicate_wins(d):
    """Writing every pair twice (second value marked) keeps the second —
    Hashtable.put semantics."""
    lines = []
    for k, v in d.items():
        lines.append(f"{k}={v}X")
        lines.append(f"{k}={v}")
    props = parse_properties("\n".join(lines).encode("iso-8859-1"))
    assert props == d


@given(
    st.dictionaries(_plain_key, _plain_value, min_size=1, max_size=6),
    st.data(),
)
@settings(max_examples=150, deadline=None)
def test_last_duplicate_wins_across_syntactic_forms(d, data):
    """java.util.Properties last-wins must hold when the duplicate entries
    use DIFFERENT syntax: ':' vs '=' separators, and a logical line split
    by backslash-continuation. All three forms define the same key; only
    stream order decides the winner."""
    lines = []
    for k, v in d.items():
        forms = [
            f"{k}={v}X",          # loser 1: '=' form
            f"{k}:{v}Y",          # loser 2: ':' form
        ]
        # winner: value split across a continuation line at a random point
        # (continuation eats the line break + leading whitespace of the next
        # physical line — java.util.Properties.load readLine semantics)
        cut = data.draw(st.integers(min_value=0, max_value=len(v)))
        # Properties.load strips the continuation line's LEADING whitespace,
        # so a cut landing just before a space would reassemble differently
        # (that's correct Java behavior, not a parser bug) — only cut at
        # points where the tail starts with a non-blank character.
        assume(not v[cut:][:1] in (" ", "\t", "\f"))
        winner = f"{k}={v[:cut]}\\\n    {v[cut:]}"
        lines.extend(forms)
        lines.append(winner)
    props = parse_properties("\n".join(lines).encode("iso-8859-1"))
    assert props == d
