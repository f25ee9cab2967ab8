"""Daitch-Mokotoff Soundex — the reference's own test vectors
(Lucene.Net.Tests.Analysis.Phonetic/Language/DaitchMokotoffSoundexTest.cs)
plus a randomized Python-vs-SQL fuzz of both oracle pipelines."""
from __future__ import annotations

import random

import duckdb
import pytest

from lucenenet_spark.functions.dmsoundex import (
    daitch_mokotoff,
    daitch_mokotoff_encode,
    dm_branch_cte,
    dm_cte,
)

# DaitchMokotoffSoundexTest.cs GetSoundex vectors (branching)
SOUNDEX_VECTORS = [
    ("Straßburg", "294795"),       # accented + ß folding
    ("Strasburg", "294795"),
    ("Éregon", "095600"),
    ("Eregon", "095600"),
    ("AKSSOL", "054800"),          # adjacent-code collapse
    ("GERSCHFELD", "547830|545783|594783|594578"),
    ("GOLDEN", "583600"),
    ("Alpert", "087930"),
    ("Breuer", "791900"),
    ("Haber", "579000"),
    ("Mannheim", "665600"),        # mn forceAppend
    ("Mintz", "664000"),
    ("Topf", "370000"),
    ("Kleinmann", "586660"),
    ("Ben Aron", "769600"),        # inner whitespace removed
    ("AUERBACH", "097400|097500"),
    ("OHRBACH", "097400|097500"),
    ("LIPSHITZ", "874400"),
    ("LIPPSZYC", "874400|874500"),
    ("LEWINSKY", "876450"),
    ("LEVINSKI", "876450"),
    ("SZLAMAWICZ", "486740"),
    ("SHLAMOVITZ", "486740"),
    ("Ceniow", "467000|567000"),
    ("Tsenyuv", "467000"),
    ("Holubica", "587400|587500"),
    ("Golubitsa", "587400"),
    ("Przemysl", "746480|794648"),
    ("Pshemeshil", "746480"),
    (
        "Rosochowaciec",
        "944744|944745|944754|944755|945744|945745|945754|945755",
    ),
    ("Rosokhovatsets", "945744"),
    ("Peters", "734000|739400"),
    ("Peterson", "734600|739460"),
    ("Moskowitz", "645740"),
    ("Moskovitz", "645740"),
    ("Jackson", "154600|145460|454600|445460"),
    (
        "Jackson-Jackson",
        "154654|154645|154644|145465|145464|454654|454645|454644"
        "|445465|445464",
    ),
]

# Encode() vectors (non-branching)
ENCODE_VECTORS = [
    ("AUERBACH", "097400"),
    ("OHRBACH", "097400"),
    ("LIPSHITZ", "874400"),
    ("LIPPSZYC", "874400"),
    ("LEWINSKY", "876450"),
    ("LEVINSKI", "876450"),
    ("SZLAMAWICZ", "486740"),
    ("SHLAMOVITZ", "486740"),
    (" \t\n\r Washington \t\n\r ", "746536"),
    ("Washington", "746536"),
]


@pytest.mark.parametrize("source,expected", SOUNDEX_VECTORS)
def test_soundex_vectors(source, expected):
    assert daitch_mokotoff(source) == expected


@pytest.mark.parametrize("source,expected", ENCODE_VECTORS)
def test_encode_vectors(source, expected):
    assert daitch_mokotoff_encode(source) == expected


def test_edge_cases():
    # no coded character at all -> all-zero pad (reference behavior for
    # rule-less input)
    assert daitch_mokotoff("3000") == "000000"
    assert daitch_mokotoff_encode("3000") == "000000"
    # digits inside a name are transparent (lastChar untouched): the 'a'
    # after "b1" is NOT at start and NOT adjacent for m/n purposes
    assert daitch_mokotoff("b1a") == daitch_mokotoff("ba")
    # m/n forceAppend both directions
    assert daitch_mokotoff("mn").startswith("66")
    assert daitch_mokotoff("nm").startswith("66")


def test_sql_oracles_match_python():
    """Both generated DuckDB pipelines (non-branching dm_cte, branching
    dm_branch_cte with in-step window dedup) reproduce the Python
    encoder bit-for-bit over a stress vocabulary."""
    rng = random.Random(11)
    words = {
        "".join(
            rng.choice("sczdtrjhkaeiou" if rng.random() < 0.7 else
                       "abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 8))
        )
        for _ in range(400)
    }
    words |= {
        "akssol", "gerschfe", "jackson", "przemysl"[:8], "mannheim",
        "peterson", "holubica", "mn", "nm", "mnm",
    }
    words = sorted(words)
    con = duckdb.connect()
    con.execute("CREATE TABLE vocab(tok VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [(w,) for w in words])
    got = dict(
        con.sql("WITH " + dm_cte("vocab") + " SELECT tok, ph FROM encv")
        .fetchall()
    )
    for w in words:
        assert got[w] == daitch_mokotoff_encode(w), w
    gotb = dict(
        con.sql(
            "WITH " + dm_branch_cte("vocab") + " SELECT tok, ph FROM encb"
        ).fetchall()
    )
    for w in words:
        assert gotb[w] == daitch_mokotoff(w), w


def test_encoder_registered():
    from lucenenet_spark.functions.phonetic import ENCODERS

    assert ENCODERS["daitch_mokotoff"]("AUERBACH") == "097400"
