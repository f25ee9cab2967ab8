"""ASCIIFoldingFilter (:ascii analyzer flag): the full 1242-entry fold
table from Analysis/Miscellaneous/ASCIIFoldingFilter.cs as shared DATA,
Python scan vs DuckDB translate+CASE mirror, and the chain composition
point (after the base PRE stage, before the stop filter)."""

from __future__ import annotations

import random

import duckdb
import pytest

from lucenenet_spark.functions.analysis import (
    has_ascii_fold, split_analyzer, tokenize_text, validate_analyzer,
)
from lucenenet_spark.functions.asciifold import (
    FOLD_MAP, ascii_fold, ascii_fold_sql,
)


def test_fold_table_shape():
    # 1242 mapped chars, 1072 single-char outputs (ASCIIFoldingFilter.cs)
    assert len(FOLD_MAP) == 1242
    assert sum(1 for v in FOLD_MAP.values() if len(v) == 1) == 1072
    assert FOLD_MAP["Æ"] == "AE" and FOLD_MAP["ﬀ"] == "ff"
    assert FOLD_MAP["é"] == "e" and FOLD_MAP["ß"] == "ss"


def test_fold_fixtures():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("ﬂéèçœǣǳ") == "fleecoeaedz"
    # chars >= U+0080 NOT in the table pass through (the default arm)
    assert ascii_fold("日本語") == "日本語"
    assert ascii_fold("plain") == "plain"
    # quote-like folds map to ASCII punctuation
    assert ascii_fold("‘x’") == "'x'"


def test_flag_parsing():
    assert split_analyzer("standard:ascii") == ("standard", frozenset())
    assert split_analyzer("english:ascii:excl=a,b") == (
        "english", frozenset({"a", "b"}))
    assert has_ascii_fold("english:ascii")
    assert has_ascii_fold("english:ascii:excl=a")
    assert not has_ascii_fold("english:excl=a")
    validate_analyzer("french:ascii")
    with pytest.raises(ValueError):
        validate_analyzer("cjk:ascii")
    with pytest.raises(ValueError):
        validate_analyzer("hindi:ascii")


def test_chain_composition():
    # fold BEFORE the stop filter: "thé" folds to the stop word
    assert tokenize_text("thé Café MÉRGE naïve", "standard:ascii") == [
        "cafe", "merge", "naive"]
    # fold BEFORE the stemmer: accented surfaces stem like ASCII ones
    assert tokenize_text("mérges", "english:ascii") == ["merg"]
    # elision runs before the fold (french chain order)
    assert tokenize_text("l'élève", "french:ascii") == ["elev"]
    # unflagged chains keep accents
    assert tokenize_text("café", "standard") == ["café"]


def test_fold_sql_fuzz_matches_python():
    alphabet = list(FOLD_MAP) + list("abcxyz'ß") + ["日", "क"]
    rng = random.Random(41)
    words = sorted({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(1500)
    })
    vals = ", ".join("('{}')".format(w.replace("'", "''")) for w in words)
    sql = f"SELECT t, {ascii_fold_sql('t')} FROM (VALUES {vals}) v(t)"
    got = dict(duckdb.connect().execute(sql).fetchall())
    bad = [(w, ascii_fold(w), got[w]) for w in words
           if ascii_fold(w) != got[w]]
    assert not bad, (len(bad), bad[:10])
