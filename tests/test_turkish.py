"""Turkish analyzer slot: snowball TurkishStemmer (the largest snowball
program — vowel harmony, optional-consonant suffix marks, the recursive
ki-chain, the continue_stemming flag, and SnowballFilter's
ignore-the-return-value contract) + TurkishLowerCaseFilter casing +
ApostropheFilter, with the independent DuckDB SQL mirror fuzz-compared
against the Python derivation. Semantics transcribed from
Tartarus/Snowball/Ext/TurkishStemmer.cs, Analysis/Tr/TurkishAnalyzer.cs,
TurkishLowerCaseFilter.cs, ApostropheFilter.cs."""

from __future__ import annotations

import random

import duckdb

from lucenenet_spark.entry_support import _STEM_PIPELINES
from lucenenet_spark.functions.analysis import (
    tokenize_text, tokenize_with_positions,
)
from lucenenet_spark.functions.turkish import (
    apostrophe_truncate, turkish_fold, turkish_stem,
)

FIXTURES = {
    # < 2 vowels: untouched (more_than_one_syllable_word gate)
    "ev": "ev", "su": "su", "o": "o", "krk": "krk",
    # nominal-verb lAr branch unsets the flag: noun suffixes AND postlude
    # are skipped, but the lAr deletion itself sticks
    "kitaplar": "kitap",
    "mergeler": "merge",
    # DUr branch + noun lAr afterwards (flag stays set)
    "mergelerdir": "merge",
    "kitaplardır": "kitap",
    # noun yU + postlude last-consonant b->p
    "kitabı": "kitap",
    # chained noun suffixes: ndAn -> sU -> lAr
    "evlerinden": "ev",
    # ki chain: DA branch
    "kapıdaki": "kapı",
    "kitaplardaki": "kitap",
    "evdekilerin": "ev",
    # reserved buffers keep the stemmed form but skip the postlude
    "soyadı": "soyad",
    "adım": "ad",
    # plain plural + possessive
    "çocukları": "çocuk",
    "arabasında": "araba",
    # -iyor (progressive) is not modeled by the algorithm
    "geliyor": "geliyor",
}


def test_turkish_fixtures():
    for w, want in FIXTURES.items():
        got = turkish_stem(w)
        assert got == want, (w, got, want)


def test_turkish_flag_skips_postlude():
    # lAr branch unsets the flag -> postlude skipped: a stem ending in a
    # devoicable consonant keeps it (no b->p / d->t rewrite)
    assert turkish_stem("kitablar") == "kitab"  # NOT kitap
    # same stem through a flag-preserving path devoices
    assert turkish_stem("kitabı") == "kitap"


def test_turkish_harmony_gate():
    # check_vowel_harmony needs a partner vowel LEFT of the last vowel:
    # "oxler" fails (-ler's e has only o to its left, not in {eiöü})
    # while "oxalar" passes (-lar's a finds the partner o)
    assert turkish_stem("oxler") == "oxler"
    assert turkish_stem("oxalar") == "oxa"


def test_turkish_fold_and_apostrophe():
    assert turkish_fold("İstanbul") == "istanbul"
    assert turkish_fold("DIŞ") == "DıŞ"  # bare I -> ı; rest left to lower()
    assert turkish_fold("İyi") == "iyi"  # I + combining dot -> i
    assert apostrophe_truncate("türkiye'dir") == "türkiye"
    assert apostrophe_truncate("a’b'c") == "a"
    assert apostrophe_truncate("merge") == "merge"


def test_turkish_chain():
    assert tokenize_text(
        "ve mergelerdir'in İstanbul kitapLARI the", "turkish"
    ) == ["merge", "istanbul", "kitap", "the"]
    # stop words drop with position gaps preserved
    toks, poss = tokenize_with_positions("ve merge ki merge", "turkish")
    assert toks == ["merge", "merge"] and poss == [1, 3]


def test_turkish_sql_fuzz_matches_python():
    rng = random.Random(977)
    stems = ["merge", "kitap", "çocuk", "ev", "araba", "kapı", "gül",
             "türk", "iş", "göz", "su", "o", "xy", "soyad", "ad", "ki",
             "kiki", "bilgisayar"]
    sufs = ["lar", "ler", "ları", "leri", "dır", "dir", "dan", "den",
            "nda", "nde", "ki", "sı", "si", "ı", "i", "u", "ü", "ya",
            "ye", "la", "le", "ca", "ce", "nın", "nin", "ın", "in", "m",
            "n", "mız", "niz", "sin", "sınız", "siniz", "iz", "di", "ti",
            "miş", "muş", "sa", "se", "casına", "ken", "ndan", "nden",
            "na", "ne", "daki", "deki", "ndaki", "lardaki", "lerindeki",
            ""]
    alphabet = "abcçdefgğhıijklmnoöprsştuüvyz"
    words = set(stems)
    for st in stems:
        for su in sufs:
            words.add(st + su)
            words.add(st + su + rng.choice(sufs))
    for _ in range(1500):
        st = rng.choice(stems)
        st = "".join(
            c if rng.random() > 0.3 else rng.choice(alphabet) for c in st
        )
        words.add(st + rng.choice(sufs) + rng.choice(sufs)
                  + rng.choice(sufs))
    words = sorted(w for w in words if w)
    vals = ", ".join("('{}')".format(w) for w in words)
    sql = f"""WITH RECURSIVE rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{_STEM_PIPELINES['turkish']()}
SELECT tok, stem FROM stemmap"""
    got = dict(duckdb.connect().execute(sql).fetchall())
    bad = [(w, turkish_stem(w), got.get(w))
           for w in words if turkish_stem(w) != got.get(w)]
    assert not bad, (len(bad), bad[:10])
