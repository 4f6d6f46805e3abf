"""Property tests for curation.NORMALIZATION_STEPS.

Pure-python properties run hypothesis directly against the re replay
(compiled with re.ASCII: Java's default ``\\s`` is ASCII-only, unlike
python's unicode-aware default — the replay must match the engine, and
RE2/DuckDB is ASCII-only too, which is why the steps live in that
dialect). One Spark test then pins Spark's regexp_replace chain to the
replay over a hostile corpus including unicode whitespace lookalikes
(NBSP, LINE SEPARATOR) that must NOT be treated as whitespace.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from elephantdb_spark.operators.curation import NORMALIZATION_STEPS

_STEPS = [(re.compile(pat, re.ASCII), rep) for pat, rep in NORMALIZATION_STEPS]


def py_normalize(s: str) -> str:
    for rx, rep in _STEPS:
        s = rx.sub(rep, s)
    return s


#: BMP text through Latin Extended: covers ASCII controls, whitespace,
#: NBSP (\xa0) and accented letters; hypothesis excludes surrogates.
_text = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF), max_size=200
)


@given(_text)
@settings(max_examples=500, deadline=None)
def test_normalize_is_idempotent(s):
    once = py_normalize(s)
    assert py_normalize(once) == once


@given(_text)
@settings(max_examples=500, deadline=None)
def test_normalize_output_invariants(s):
    out = py_normalize(s)
    # no C0 controls (except \t \n which have their own rules), no DEL, no CR
    assert not re.search(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\r]", out)
    # no horizontal-whitespace runs, no tabs at all ([ \t]+ -> single space)
    assert not re.search(r"[ \t]{2,}", out) and "\t" not in out
    # at most one blank line in a row
    assert "\n\n\n" not in out
    # no blanks hugging a newline
    assert " \n" not in out and "\n " not in out
    # trimmed (ASCII sense)
    assert out == out.strip(" \t\n\r\x0b\x0c")


@given(_text)
@settings(max_examples=300, deadline=None)
def test_normalize_preserves_non_ascii_verbatim(s):
    """Non-ASCII codepoints (incl. NBSP / combining marks) pass through
    untouched — normalization is byte-conservative outside the declared
    ASCII rewrite classes."""
    kept = [ch for ch in py_normalize(s) if ord(ch) > 127]
    want = [ch for ch in s if ord(ch) > 127]
    assert kept == want


# Spark sweep: a hostile fixed corpus (plus a few hypothesis-shaped
# samples baked in) through the REAL regexp_replace chain vs the replay.
HOSTILE = [
    "",
    " \t \t ",
    "\r\r\n\r",
    "a\x00b\x07c\x1fd\x7fe",
    "x \n \n \n y",
    "one\t\ttwo  three\r\nfour",
    "\n\n\n\n\n",
    "\xa0nbsp\xa0stays\xa0",          # NBSP is NOT ASCII whitespace
    "mixed \xa0 \t nbsp\r\n",
    "caf\xe9  r\xe9sum\xe9\tĀ˿",
    "\x0bvtab\x0cff between\x0b\x0c",
    "end with cr\r",
    " lead and trail ",
    "a" * 150 + "\r\n" + " " * 30 + "\n\n\n\n" + "b",
]


def test_spark_matches_ascii_replay(spark):
    from pyspark.sql import functions as F

    from elephantdb_spark.operators.curation import normalize_text

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(HOSTILE)], "id long, text string"
    )
    got = {r["id"]: r["text"] for r in normalize_text(df, "text").collect()}
    for i, s in enumerate(HOSTILE):
        assert got[i] == py_normalize(s), repr(s)
