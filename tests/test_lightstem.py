"""German/Swedish analyzer slots: UniNE light stemmers + snowball stop sets.

Reference chains: GermanAnalyzer.cs CreateComponents (StandardTokenizer ->
LowerCase -> Stop(german) -> GermanNormalizationFilter ->
GermanLightStemFilter) and SwedishAnalyzer.cs (-> Stop(swedish) ->
SwedishLightStemFilter). The SQL mirrors
(entry_support._german_sql_pipeline / _swedish_sql_pipeline) are
independent implementations fuzz-compared here so the language gates are
non-circular."""
import pytest

from lucenenet_spark.functions.analysis import tokenize_text, tokenize_with_positions
from lucenenet_spark.functions.lightstem import (
    german_chain,
    german_light_stem,
    german_normalize,
    swedish_light_stem,
)

# -- German normalization FSM (GermanNormalizationFilter.cs) -------------------

NORM_FIXTURES = {
    # umlaut fold sets the V state
    "häuser": "hauser",
    "brücken": "brucken",
    # ß -> ss, scanner skips the inserted s
    "größe": "grosse",
    # e deleted in umlaut state: after a/o, and after u-from-ordinary-state
    "goethe": "gothe",
    "ueber": "uber",
    "schaefer": "schafer",
    # u after a consonant enters umlaut state: the e deletes
    "statue": "statu",
    # u after a vowel does NOT (the V guard): the e stays
    "aue": "aue",
    # q sets the V state, so 'que' keeps its e
    "quelle": "quelle",
    # e after consonant is ordinary
    "tage": "tage",
}


def test_german_normalization_fixtures():
    for w, want in NORM_FIXTURES.items():
        assert german_normalize(w) == want, w


# hand-derived, rule by rule (GermanLightStemmer.cs Step1/Step2):
GERMAN_FIXTURES = {
    "häuser": "haus",      # norm 'hauser', -er (step1), step2 len guard
    "katzen": "katz",      # -en via step1 e[n]
    "kindern": "kind",     # -ern (step1), step2 no-op
    "aufeinander": "aufeinand",  # -er step1
    "goethe": "goth",      # norm deletes oe's e, then trailing -e
    "quelle": "quell",     # trailing -e
    "brücken": "bruck",    # umlaut fold + -en
    "größe": "gross",      # ß -> ss + trailing -e
    "tages": "tag",        # step1 e[s], step2 len guard
    "bestes": "best",       # step1 -es; step2 'est' needs len > 5
    "kleinstes": "klein",   # step1 -es, then step2 -st after stEnding 'n'
}


def test_german_stem_fixtures():
    for w, want in GERMAN_FIXTURES.items():
        assert german_chain(w) == want, (w, german_chain(w))


SWEDISH_FIXTURES = {
    # the CLEF-2003 worked example
    "jackor": "jack",
    "jackorna": "jack",
    # suffix tiers
    "klubben": "klubb",     # -en
    "öppnare": "öppn",      # -are
    "vackrast": "vackr",    # -ast
    "betydelser": "betyd",  # -elser
    "friheten": "fri",      # -heten
    "hundar": "hund",       # -ar
    "huset": "hus",         # -et
    "flickorna": "flick",   # -orna
    # trailing -s strips first, then the cascade sees the rest
    "hundars": "hund",
    # final single-char tier
    "tala": "tal",
}


def test_swedish_stem_fixtures():
    for w, want in SWEDISH_FIXTURES.items():
        assert swedish_light_stem(w) == want, (w, swedish_light_stem(w))


def test_min_length_guards():
    # every rule carries a strict length guard — short words pass through
    assert german_light_stem("ern") == "ern"
    assert german_light_stem("see") == "see"  # len 3, -e rule needs > 3
    assert german_light_stem("esse") == "ess"  # len 4 > 3
    assert swedish_light_stem("en") == "en"
    assert swedish_light_stem("ar") == "ar"
    assert swedish_light_stem("het") == "het"


# -- analyzer chains -------------------------------------------------------------


def test_german_chain_stops_then_stems():
    assert tokenize_text("und die katzen", "german") == ["katz"]
    # English stopwords are NOT in the German set
    assert tokenize_text("the katzen", "german") == ["the", "katz"]
    toks, poss = tokenize_with_positions("und die katzen laufen", "german")
    assert toks == ["katz", "lauf"] and poss == [2, 3]


def test_swedish_chain():
    assert tokenize_text("och hundar jackorna", "swedish") == ["hund", "jack"]


# -- SQL mirrors vs Python (non-circular gate evidence) ----------------------------


def _fuzz_words(seed: int) -> list:
    import random

    rng = random.Random(seed)
    words = set(NORM_FIXTURES) | set(GERMAN_FIXTURES) | set(SWEDISH_FIXTURES)
    # ASCII-only fuzz: the SQL mirrors cover the gate corpus's ASCII token
    # space (umlauts are handled by the Python FSM, exercised above)
    words = {w for w in words if w.isascii()}
    # suffix-heavy alphabet: vowels + the rule letters
    for _ in range(800):
        n = rng.randint(3, 12)
        words.add(
            "".join(
                rng.choice("aeiounrstmbdghkletqy") for _ in range(n)
            )
        )
    return sorted(words)


@pytest.mark.parametrize("lang", ["german", "swedish"])
def test_sql_lightstem_fuzz_matches_python(lang):
    import duckdb

    from lucenenet_spark.entry_support import (
        _german_sql_pipeline,
        _swedish_sql_pipeline,
    )

    pipeline = {
        "german": _german_sql_pipeline,
        "swedish": _swedish_sql_pipeline,
    }[lang]
    pyfn = {"german": german_chain, "swedish": swedish_light_stem}[lang]
    words = _fuzz_words(13 if lang == "german" else 17)
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""WITH rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{pipeline()}
SELECT tok, stem FROM stemmap"""
    got = dict(con.execute(sql).fetchall())
    bad = [(w, pyfn(w), got.get(w)) for w in words if pyfn(w) != got.get(w)]
    assert not bad, bad[:10]
