"""normalize_text (round 13): NFC + control-strip + whitespace
collapse, pinned on hostile inputs and against python ground truth."""

from __future__ import annotations

import unicodedata

from optimal_parallel_fp_growth_spark.operators.textops import normalize_text


def _brute(t: str) -> str:
    t = unicodedata.normalize("NFC", t)
    t = "".join(
        " " if (ord(c) < 0x20 or ord(c) == 0x7F) else c for c in t
    )
    return " ".join(t.split())


def test_hostile_inputs_match_brute(spark):
    rows = [
        (1, "café time"),          # NFD e + combining acute
        (2, "already café"),
        (3, "a\tb\nc\r\nd"),
        (4, "  spaced   out  "),
        (5, "ctrl\x00\x01\x1f\x7fchars"),
        (6, ""),
        (7, "ṩ = ṩ"),   # multi-combining NFC case
        (8, None),
        (9, "한국어 가 text"),  # jamo composing to 가
        (10, "no change needed"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    for doc_id, t in rows:
        want = None if t is None else _brute(t)
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_matches_duckdb_oracle_semantics(spark):
    """The oracle's nfc_normalize (utf8proc) and CPython's unicodedata
    must agree on the fixture alphabet — the cross-engine premise of
    the string-exact gate."""
    import duckdb

    samples = [
        "café", "ﬁle", "å", "ṩ", "ΩΩ",
        "ascii", "한국어 가",
    ]
    con = duckdb.connect()
    for s in samples:
        d = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert d == unicodedata.normalize("NFC", s), repr(s)
