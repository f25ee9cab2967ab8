"""Round-5j analyzer slots: the full snowball stemmers (languages whose
reference Analyzer ships ONLY SnowballFilter — no light variant), each with
an independent DuckDB SQL mirror fuzz-compared against the Python stemmer.

Fixtures are hand-traced from the published snowball algorithms with the
suffix data checked against the reference's generated Among tables
(Tartarus/Snowball/Ext/DanishStemmer.cs etc.)."""

from __future__ import annotations

import random

import duckdb
import pytest

from lucenenet_spark.entry_support import _STEM_PIPELINES
from lucenenet_spark.functions import snowball
from lucenenet_spark.functions.analysis import tokenize_text


# -- Danish ---------------------------------------------------------------

DANISH_FIXTURES = {
    # main_suffix: longest a_0 entry inside R1 (R1 clamped to start >= 3)
    "merges": "merg",          # -es
    "merge": "merg",           # -e
    "kærligheden": "kær",      # -heden, then other_suffix -ig in R1
    "spørgsmålet": "spørgsmål",  # -et
    "følelsen": "føl",         # -elsen? no: -en then -els via other_suffix
    "hundene": "hund",         # -ene
    "billeder": "billed",      # -er
    # action 2: bare -s only after a valid s-ending
    "afstands": "afstand",     # d is a valid s-ending
    "cykles": "cykl",          # -es entry (e before s would fail act 2)
    "hors": "hor",             # r valid s-ending
    "vis": "vis",              # bare -s after i (NOT a valid s-ending)
    # consonant_pair: gd/dt/gt/kt inside R1 drop the final letter
    "vagt": "vagt",            # -gt pair NOT fully in R1 (p1=3, pair at 2..3)
    "forsagt": "forsag",       # -gt pair inside R1 (p1=3, pair at 5..6)
    "bundt": "bund",           # -dt pair at exactly the R1 boundary
    # other_suffix
    "ubetydeligst": "ubetyd",  # igst -> strip st, then -elig
    "venligst": "ven",         # igst -> venlig, then -lig
    "frygtløst": "frygtløs",   # løst -> løs
    "løst": "løst",            # R1 starts at 3: løst's match can't fit
    # undouble: final double non-vowel in R1
    "bakken": "bak",           # -en then undouble kk
    "bakke": "bak",            # -e then undouble
    "kommer": "kom",           # -er then undouble mm
    # null region: too short / no non-vowel after a vowel
    "og": "og",
    "by": "by",
    "uro": "uro",              # p1 = max(3,3)=3 == len: nothing fits
}


def test_danish_fixtures():
    for w, want in DANISH_FIXTURES.items():
        got = snowball.danish_stem(w)
        assert got == want, (w, got, want)


def test_danish_chain_stops_then_stems():
    # snowball Danish stop set applies pre-stem; English stops do not
    assert tokenize_text("og hundene på bakken", "danish") == ["hund", "bak"]
    assert "the" in tokenize_text("the merge", "danish")


# -- Dutch ----------------------------------------------------------------

DUTCH_FIXTURES = {
    # step 1
    "hoofden": "hoofd",        # -en after non-vowel
    "lopen": "lop",            # -en
    "bomen": "bom",            # -en after non-vowel m
    "zeeën": "zeeen",          # -en preceded by a vowel: en_ending fails
    "mergen": "merg",          # gate query surface
    "volgens": "volgen",       # -s after n (a valid s-ending)
    "merges": "merges",        # -s after vowel e: NOT a valid s-ending
    "relaxjes": "relaxjes",    # -s after j: NOT a valid s-ending (g_v_j)
    "bijzonderheden": "bijzonder",  # heden -> heid, then 3a strips heid+en?
    # step 2 e_ending (+ undouble)
    "merge": "merg",
    "witte": "wit",            # -e then undouble tt
    # step 3a/3b
    "vrolijkheid": "vrolijk",  # heid in R2, then no en
    "gezelligheid": "gezell",  # heid strip, then ig strip in R2
    "lichamelijk": "licham",   # lijk in R2, then e_ending n/a
    "lopend": "lopend",        # end NOT in R2 (p2=5)
    "opheffende": "opheff",    # -e, then nothing; undouble keeps ff
    # step 4 undouble vowel
    "maan": "man",
    "brood": "brod",
    "bood": "bod",
    "ijiy": "ijiy",            # marking: i/y casework round-trips
    # overrides (StemmerOverrideFilter DEFAULT_STEM_DICT)
    "ei": "eier",
    "kind": "kinder",
    "fiets": "fiets",
    "fietsen": "fiets",        # NOT overridden: stems en off, s-ending t
}


def test_dutch_fixtures():
    for w, want in DUTCH_FIXTURES.items():
        got = snowball.dutch_chain(w)
        assert got == want, (w, got, want)


def test_dutch_marking():
    # prelude: initial y, i between vowels, y after vowel; postlude
    # restores case, so marking is only visible through vowel
    # classification (here: 'baaien' — the marked I is a consonant, so
    # R1's first non-vowel lands earlier than an unmarked scan would)
    assert snowball._nl_mark("yoyo") == "YoYo"
    assert snowball._nl_mark("baaien") == "baaIen"
    assert snowball._nl_mark("aii") == "aIi"
    assert snowball._nl_mark("aiia") == "aIia"


def test_dutch_chain_stops_then_stems():
    assert tokenize_text("de hoofden van lopen", "dutch") == ["hoofd", "lop"]
    assert "the" in tokenize_text("the merge", "dutch")


# -- Armenian ---------------------------------------------------------------

ARMENIAN_FIXTURES = {
    # ending pass: suffix in window [pV:] AND in R2
    "ուսանողներին": "ուսանող",   # -ներին (students, dat pl)
    "մարդկություն": "մարդկությ",  # ENDING -ուն fires before NOUN -ություն
    # window: suffix must sit after the first vowel
    "գրքերը": "գրքերը",           # -ը matches but fails R2 (fail-no-retry)
    # non-Armenian text passes through (no vowel -> empty window)
    "merge": "merge",
    "xyz": "xyz",
}


def test_armenian_fixtures():
    for w, want in ARMENIAN_FIXTURES.items():
        got = snowball.armenian_stem(w)
        assert got == want, (w, got, want)


def test_armenian_chain_stops_then_stems():
    # stop set applies (որոնք is a stop word), then the stemmer
    assert tokenize_text("որոնք ուսանողներին", "armenian") == ["ուսանող"]
    assert "the" in tokenize_text("the merge", "armenian")


# -- Catalan ----------------------------------------------------------------

CATALAN_FIXTURES = {
    # the reference's own TestCatalanAnalyzer.cs vectors
    "llengües": "llengu",      # standard -ües? no: verb 'es' in R1, clean ü
    "llengua": "llengu",       # residual -a, clean ü
    "diccionari": "diccion",   # standard -ari
    "institut": "inst",        # verb -ut, then residual -it
    "estudis": "estud",        # residual -is
    "catalans": "catalan",     # residual -s (no std/verb entry matches)
    # region semantics: matched suffix outside its region fails the whole
    # pass without retrying a shorter entry (fail-no-retry)
    "merges": "merg",          # std fails, verb -es in R1
    "merge": "merg",           # residual -e
    "lògiques": "log",         # standard 'iques' -> 'ic' then residual
    "quíssima": "quissim",     # R1/R2 too late for -íssima: residual -a,
                               # then cleaning í -> i
    "cantàvem": "cant",        # verb -àvem
    # cleaning: middle dot and accents fold even when no suffix fires
    "col·legi": "col.leg",
    # apostrophe tokens pass through the stemmer untouched
    "s'ha": "s'ha",
}


def test_catalan_fixtures():
    for w, want in CATALAN_FIXTURES.items():
        got = snowball.catalan_stem(w)
        assert got == want, (w, got, want)


def test_catalan_chain_elides_then_stops_then_stems():
    # ElisionFilter ahead of the stop filter (CatalanAnalyzer.cs):
    # l'/d' strip, then "de" drops as a stop word — the reference's own
    # TestContractions vector
    assert tokenize_text(
        "Diccionari de l'Institut d'Estudis Catalans", "catalan"
    ) == ["diccion", "inst", "estud", "catalan"]
    # "d'un" -> elided to "un" -> stop; "li'n" is a literal stop entry
    assert tokenize_text("d'un li'n merge", "catalan") == ["merg"]
    assert tokenize_text("un", "catalan") == []


# -- Romanian ---------------------------------------------------------------

ROMANIAN_FIXTURES = {
    # vowel_suffix alone (no standard/verb suffix)
    "merge": "merg",
    # step_0 ea -> e, then vowel -e
    "mergea": "merg",
    # no Romanian suffix matches: untouched
    "merges": "merges",
    # combo: abilitate -> abil (R1)
    "abilitate": "abil",
    # step_0 ile -> i (not preceded by ab), then vowel -i
    "lucrurile": "lucrur",
    # a_3 delete: -oasă in R2
    "frumoasă": "frumoas",
    # iune in R2 requires preceding ţ (which becomes t) — here R2 fails
    "acţiune": "acţiun",
    # step_0 ului fails R1 (p1=4); verb -ui preceded by consonant l
    "fiului": "fiul",
    # prelude: i between vowels -> I (a consonant for later checks),
    # postlude restores it; vowel -i strips, the marked I survives as i
    "copiii": "copii",
    # step_0 aţia -> aţi... on "naţiunilor": ilor -> i, vowel -i
    "naţiunilor": "naţiun",
    # a_3 case 3: -istă -> ist in R2
    "socialista": "socialist",
    # verb: -ează
    "lucrează": "lucr",
    # verb act-1 condition: preceded by vowel (not u) -> keep
    "ai": "ai",
    # combo longest match "icatori" fails R1 (fail-no-retry), a_3
    # "atori" fails R2, verb has no match -> only vowel -i strips
    "icatori": "icator",
    # ... but with a long enough prefix the combo fires (icatori -> ic)
    # and a_3 then deletes the residual -ic in R2
    "multiplicatori": "multipl",
}


def test_romanian_fixtures():
    for w, want in ROMANIAN_FIXTURES.items():
        got = snowball.romanian_stem(w)
        assert got == want, (w, got, want)


def test_romanian_flag_skips_verb_suffix():
    # a_3 "ică" deletes in R2 (p1=3, p2=5, pos=5) and sets the flag
    assert snowball.romanian_stem("politică") == "polit"
    # "socialist" fires a_3 case 3 with UNCHANGED text ("ist" -> "ist"):
    # the flag must still set, so verb_suffix must NOT strip anything
    assert snowball.romanian_stem("socialist") == "socialist"


def test_romanian_chain_stops_then_stems():
    # Romanian stop set applies pre-stem ("este", "şi" are stops);
    # English "the" is NOT a Romanian stop so it survives (and stems)
    assert tokenize_text("este merge şi lucrurile", "romanian") == [
        "merg", "lucrur",
    ]
    assert tokenize_text("the merge", "romanian") == ["the", "merg"]


# -- Basque -------------------------------------------------------------------

BASQUE_FIXTURES = {
    # izenak walks leftward: -ak (RV), then -ge
    "mergeak": "mer",
    "merge": "mer",
    "merges": "merges",
    # aditzak -ka deletes in RV BEFORE izenak's identity "aurka" guard
    # could see the word (reference rule order)
    "aurka": "aur",
    # identity guard consumes the whole match, walk moves left of it
    "atseden": "atseden",
    # izenak replacement: minutuko -> minutu
    "minutuko": "minutu",
    # longest match "etxea" fails RV (pos 0 < pV 4): fail-no-retry
    "etxea": "etxea",
    # izenak -ak in RV
    "liburuak": "liburu",
    # chained walk: -ren (R2) then -na (RV)
    "gizonaren": "gizo",
    # -an (aditzak, RV)
    "mendian": "mendi",
}


def test_basque_fixtures():
    for w, want in BASQUE_FIXTURES.items():
        got = snowball.basque_stem(w)
        assert got == want, (w, got, want)


def test_basque_stage_resume():
    # after aditzak stops at E, izenak resumes AT E (not at the word
    # end): "zuhaitzak" — aditzak deletes -ak? "ak" is not in a_0; "ka"
    # no; so aditzak fails at the end; izenak -ak fires, then -tz (RV)
    assert snowball.basque_stem("zuhaitzak") == "zuhai"


def test_basque_chain_stops_then_stems():
    # Basque stop set pre-stem; English "the" is not a Basque stop
    assert tokenize_text("eta liburuak ez dira", "basque") == ["liburu"]
    assert tokenize_text("the mergeak", "basque") == ["the", "mer"]


# -- Irish --------------------------------------------------------------------

IRISH_PRE_FIXTURES = {
    # prothesis: lowercase n/t + UPPERCASE vowel inserts the hyphen
    "nAthair": "n-athair",
    "tUachtarán": "t-uachtarán",
    # all-lowercase words are untouched (nathair = snake)
    "nathair": "nathair",
    # elision (ignoreCase) strips d'/m'/b' at a first-position apostrophe
    "d'Athair": "athair",
    "D'fhuascail": "fhuascail",
    "m'Éire": "éire",
    # non-article prefix: no strip
    "dd'x": "dd'x",
    # HYPHENATIONS stop -> '' sentinel (any case)
    "n": "", "T": "", "h": "",
    # elision output feeds the prothesis check in chain order
    "d'nAthair": "n-athair",
}

IRISH_FIXTURES = {
    # verb -tar (R1 delete) after initial_morph mh -> m
    "mhergetar": "merge",
    "mergetar": "merge",
    "merge": "merge",
    # eclipsis/prothesis prefixes
    "n-athair": "athair",
    "bhfuil": "fuil",
    "t-uachtarán": "uachtarán",
    # deriv replacements
    "grafaíocht": "graf",
    "siopadóireacht": "siopadóir",
    # deriv R2-checked delete fails when the suffix sits before p2
    "achtúil": "achtúil",
    # noun then nothing else fires
    "bailiúchánaibh": "bailiúchán",
}


def test_irish_pre_fixtures():
    for w, want in IRISH_PRE_FIXTURES.items():
        got = snowball.irish_pre(w)
        assert got == want, (w, got, want)


def test_irish_fixtures():
    for w, want in IRISH_FIXTURES.items():
        got = snowball.irish_stem(w)
        assert got == want, (w, got, want)


def test_irish_chain_raw_pre():
    # the chain must hand the RAW token to the pre stage: nAthair and
    # nathair diverge, h/n/t drop any-case, stops apply post-lowercase
    assert tokenize_text(
        "an mhergetar agus nAthair ach nathair t h N", "irish"
    ) == ["merge", "athair", "nathair"]
    # positions: dropped hyphenation tokens leave gaps like stops do
    from lucenenet_spark.functions.analysis import tokenize_with_positions

    toks, poss = tokenize_with_positions("t merge n merge", "irish")
    assert toks == ["merge", "merge"] and poss == [1, 3]


_SNOWBALL_FUZZ = {
    "danish": dict(
        stems=["kærlig", "merg", "spørgsmål", "føl", "hund", "afstand",
               "billed", "bak", "løs", "hø", "x", "ab", "indtag",
               "ubetyd", "bet", "cykl", "kom", "ven", "frygt", "va"],
        sufs=["hed", "ethed", "ered", "e", "erede", "ende", "erende",
              "ene", "erne", "ere", "en", "heden", "eren", "er", "heder",
              "erer", "s", "heds", "es", "endes", "erendes", "enes",
              "ernes", "eres", "ens", "hedens", "erens", "ers", "ets",
              "erets", "et", "eret", "gd", "dt", "gt", "kt", "igst",
              "ig", "lig", "elig", "els", "løst", "kk", "tt", "st", ""],
        alphabet="abcdefghijklmnopqrstuvxyzæåø",
        pyfn=snowball.danish_stem,
    ),
    "dutch": dict(
        stems=["licham", "opheff", "man", "brod", "merg", "kinder", "lop",
               "hoofd", "vrolijk", "gezell", "y", "ei", "kind", "fiets",
               "aai", "ooi", "boom", "geloof", "paa", "ze", "wit"],
        sufs=["heden", "ene", "en", "se", "s", "e", "heid", "heiden",
              "end", "ing", "ig", "lijk", "baar", "bar", "dd", "kk", "tt",
              "aa", "ee", "oo", "uu", "d", "t", "ische", "iën", "yen",
              "iet", "", "gem", "gemen", "igen", "igend", "ende"],
        alphabet="abcdefghijklmnopqrstuvwyzèáäéëíïóöúü",
        pyfn=snowball.dutch_chain,
    ),
    "armenian": dict(
        stems=["գրք", "մարդկ", "ուսանող", "հայ", "տ", "աա", "խնդ",
               "ծրագր", "բառ", "քաղաք", "սիր", "x", "մե"],
        sufs=list(snowball._HY_ENDING) + list(snowball._HY_VERB)
        + list(snowball._HY_ADJ) + list(snowball._HY_NOUN) + [""],
        alphabet="աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ",
        pyfn=snowball.armenian_stem,
    ),
    "catalan": dict(
        # every suffix from all four tables (incl. apostrophe/hyphen
        # pronouns — the SQL literal escaping is under test too) crossed
        # with stems straddling the R1/R2 boundaries
        stems=["lleng", "cant", "merg", "log", "q", "xyz", "aa",
               "col·l", "estud", "tècn", "portà", "ïx", "be"],
        sufs=list(s for s, _, _ in snowball._CA_PRON)
        + list(s for s, _, _ in snowball._CA_STD)
        + list(s for s, _, _ in snowball._CA_VERB)
        + list(s for s, _, _ in snowball._CA_RES) + [""],
        alphabet="abcdefghijlmnopqrstuvxyzàáèéìíïòóúü·'-",
        pyfn=snowball.catalan_stem,
    ),
    "romanian": dict(
        # stems straddling the pV/p1/p2 boundaries plus prelude triggers
        # (u/i between vowels) and the ab/ţ condition neighborhoods
        stems=["merg", "lucr", "copi", "fi", "acţ", "soci", "x", "ab",
               "frum", "întâln", "jucăr", "import", "naţ", "abil",
               "artist", "realist", "aua", "oaie", "copii", "uşi",
               "războai", "băieţ", "ţ", "aiu", "said"],
        sufs=[s for s, _ in snowball._RO_STEP0]
        + [s for s, _ in snowball._RO_COMBO]
        + [s for s, _ in snowball._RO_STD]
        + [s for s, _ in snowball._RO_VERB]
        + list(snowball._RO_VOWEL_SUF) + ["", "ţ", "u", "i"],
        alphabet="abcdefghijlmnoprstuvzăâîşţ",
        pyfn=snowball.romanian_stem,
    ),
    "basque": dict(
        # double suffixes exercise the leftward walk; identity guards
        # (atseden/aurka/geldi/igaro/zehar) and the rewrites (jok, tra,
        # minutu, z) are in the suffix pool
        stems=["merge", "etxe", "liburu", "zuhai", "gizon", "mendi", "x",
               "aa", "aurk", "atsed", "minutu", "handi", "lan", "bazter",
               "itsas", "gald", "zehark", "tr", "behin"],
        sufs=[s for s, _ in snowball._EU_ADITZAK]
        + [s for s, _ in snowball._EU_IZENAK]
        + [s for s, _ in snowball._EU_ADJ] + ["", "a", "ak", "en", "ko"],
        alphabet="abdeghijklmnoprstuxzñ",
        pyfn=snowball.basque_stem,
    ),
    "irish": dict(
        # initial_morph prefixes crossed in via the stem pool (prefixed
        # variants included below), suffixes from all three passes
        stems=["merge", "athair", "fuascail", "siopadóir", "graf", "arc",
               "gin", "paite", "óid", "x", "aa", "beal", "scéal",
               "bhmerge", "gcbeal", "d'fhx", "n-a", "mhóid"],
        sufs=[s for s, _ in snowball._GA_NOUN]
        + [s for s, _ in snowball._GA_DERIV]
        + [s for s, _ in snowball._GA_VERB] + ["", "a", "e", "ach"],
        alphabet="abcdefghilmnoprstuáéíóú",
        pyfn=snowball.irish_stem,
    ),
}


@pytest.mark.parametrize("lang", sorted(_SNOWBALL_FUZZ))
def test_sql_snowball_fuzz_matches_python(lang):
    """SQL-pipeline-vs-Python fuzz: every suffix crossed with the stem
    pool plus double-suffix random mutations, so the R1 fit checks, the
    s-ending group, consonant pairs, and undouble all get exercised on
    both sides of the region boundary."""
    cfg = _SNOWBALL_FUZZ[lang]
    rng = random.Random(977 + len(lang))
    words = set()
    for st in cfg["stems"]:
        for su in cfg["sufs"]:
            words.add(st + su)
    for _ in range(900):
        st = rng.choice(cfg["stems"])
        st = "".join(
            c if rng.random() > 0.25 else rng.choice(cfg["alphabet"])
            for c in st
        )
        words.add(st + rng.choice(cfg["sufs"]) + rng.choice(cfg["sufs"]))
    words = sorted(words)
    con = duckdb.connect()
    vals = ", ".join("('{}')".format(w.replace("'", "''")) for w in words)
    sql = f"""WITH RECURSIVE rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{_STEM_PIPELINES[lang]()}
SELECT tok, stem FROM stemmap"""
    got = dict(con.execute(sql).fetchall())
    pyfn = cfg["pyfn"]
    bad = [(w, pyfn(w), got.get(w)) for w in words if pyfn(w) != got.get(w)]
    assert not bad, (len(bad), bad[:10])
