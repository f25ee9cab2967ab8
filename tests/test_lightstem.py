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


# -- round-5b: French/Spanish/Italian/Portuguese/Norwegian/Finnish slots --------

from lucenenet_spark.functions.lightstem import (  # noqa: E402
    FRENCH_ARTICLES,
    ITALIAN_ARTICLES,
    elide,
    finnish_light_stem,
    french_light_stem,
    italian_light_stem,
    norwegian_light_stem,
    portuguese_light_stem,
    spanish_light_stem,
)

# hand-traced, rule by rule, against FrenchLightStemmer.cs control flow
FRENCH_FIXTURES = {
    "chevaux": "cheval",          # aux -> al (s[-4] != 'e')
    "cheveux": "cheveu",          # 'e' before aux: plain x strip only
    "aux": "aux",                 # length guards
    "chantés": "chant",           # s strip, norm folds é and strips e
    "agrandissement": "agrandi",  # -issement -> -ir, norm strips the r
    "agrandissant": "agrandi",    # -issant -> -ir
    "activement": "actif",        # -ivement -> -if
    "rapidement": "rapid",        # -ement
    "planificatrice": "planifi",  # -ficatrice -> -fier, norm -r/-e
    "éducatrice": "eduqu",        # -catrice -> -quer, norm -r/-e
    "communicateur": "comuniqu",  # -cateur -> -quer; norm collapses 'mm'
    "animatrice": "anim",         # -atrice -> -er
    "animateur": "anim",          # -ateur -> -er
    "utilisateur": "utilis",      # -ateur fires BEFORE -isateur (code order)
    "directrice": "direct",       # -trice -> -teur (no return), then -teur -> -ter
    "deuxième": "deux",           # -ième
    "chanteuse": "chant",         # -teuse -> -ter
    "porteur": "port",            # -teur -> -ter
    "danseuse": "danseu",         # -euse drops only 'se'
    "boulangère": "boulang",      # -ère -> -er, then norm -r/-e
    "créative": "creatif",        # -ive -> -if
    "folle": "fou",
    "molle": "mou",
    "personnelle": "person",      # -nnelle (len > 9)
    "personnel": "personel",      # len 9 fails the > 9 guard; norm collapses nn
    "complète": "complet",        # -ète -> -et (no return)
    "numérique": "num",           # -ique strip (no return), then norm r/e
    "politesse": "polit",         # -esse
    "patinage": "patin",          # -inage
    "nationalisation": "national",  # -isation
    "actualisation": "actuel",    # -ualisation -> -uel
    "information": "inform",      # -ation
    "opposition": "opos",         # -ition + norm 'pp' collapse
    "bottle": "botl",             # norm duplicate collapse + e strip
    "mer": "mer",                 # norm length guard
}

# SpanishLightStemmer.cs: len<5 pass-through happens BEFORE the accent fold
SPANISH_FIXTURES = {
    "casa": "casa", "caso": "caso", "sólo": "sólo",   # len<5 untouched
    "clase": "clas", "casas": "cas", "mesas": "mes",
    "franceses": "frances",       # -eses -> -es
    "luces": "luz", "veces": "vez",  # -ces -> -z
    "países": "pais",             # fold í->i fires at len>=5
    "común": "comun",             # fold fires at len>=5 even with no suffix
    "hijos": "hij", "rojos": "roj",
    "feliz": "feliz",
}

# ItalianLightStemmer.cs: len<6 pass-through BEFORE the fold
ITALIAN_FIXTURES = {
    "laghi": "laghi", "libri": "libri", "zii": "zii",  # len<6 untouched
    "amiche": "amic",             # -he -> -2
    "vecchie": "vecch",           # -ie -> -2
    "negozio": "negoz",           # -io -> -2
    "famiglia": "famigl",         # -ia -> -2
    "ragazzo": "ragazz", "piccole": "piccol",
    "grande": "grand", "perché": "perc",  # fold é->e, then -he -> -2
}

PORTUGUESE_FIXTURES = {
    "bons": "bom",                # -ns -> m
    "amáveis": "amavel",          # -eis -> el, fold á->a LAST
    "papéis": "papel",            # -éis -> el
    "animais": "animal",          # -ais -> al
    "lençóis": "lencol",          # -óis -> ol
    "barris": "barril",           # -is -> il
    "corações": "coraca",         # -ões -> ão, final-vowel strip, fold
    "rapidamente": "rapid",       # -mente, then final-vowel strip
    "casas": "casa",              # -s; feminine/final rules len-guarded out
    "meninas": "menin",           # -s, fem len>6 fails at 6, final -a strip
    "amorosa": "amoros",          # fem -osa -> o, then final -o strip
    "professora": "professor",    # fem -ora -> -1
    "pequena": "pequen",          # fem -na -> o, then final -o strip
}

NORWEGIAN_FIXTURES = {
    "bilens": "bil",              # possessive s + -en
    "hemmeligheten": "hemmelig",  # -heten
    "hemmeligheter": "hemmelig",  # -heter
    "kristendom": "kristen",      # -dom
    "følelsen": "føl",            # -elsen
    "sovende": "sov",             # -ende
    "fineste": "fin",             # -este
    "husene": "hus",              # -ene
    "billigst": "billig",         # -st (bokmaal)
    "kake": "kak",                # final -e
    "huset": "hus",               # -et
    "gutane": "gutan",            # nynorsk -ane NOT stripped (bokmaal slot): -e only
}

FINNISH_FIXTURES = {
    "voimakkaampi": "voimakaamp",  # norm2 i strip + kk collapse
    "talossa": "talo",             # -ssa
    "taloissa": "talo",            # -ssa then norm1 -i
    "kirjakin": "kirjak",          # len 8 fails the >8 kin guard; -n after vowel
    "kahdeksankin": "kahdek",      # kin stripped at len>8, then -an, norm1 -s
    "yhteiskunnallinen": "yhteiskunnall",  # -inen
    "kauneimmat": "kauneimm",      # norm1 -at
    "lehdet": "lehde",             # norm1 -t (hde->ksi does not fire: word ends det)
}


def test_french_stem_fixtures():
    for w, want in FRENCH_FIXTURES.items():
        assert french_light_stem(w) == want, (w, french_light_stem(w))


def test_spanish_stem_fixtures():
    for w, want in SPANISH_FIXTURES.items():
        assert spanish_light_stem(w) == want, (w, spanish_light_stem(w))


def test_italian_stem_fixtures():
    for w, want in ITALIAN_FIXTURES.items():
        assert italian_light_stem(w) == want, (w, italian_light_stem(w))


def test_portuguese_stem_fixtures():
    for w, want in PORTUGUESE_FIXTURES.items():
        assert portuguese_light_stem(w) == want, (w, portuguese_light_stem(w))


def test_norwegian_stem_fixtures():
    for w, want in NORWEGIAN_FIXTURES.items():
        assert norwegian_light_stem(w) == want, (w, norwegian_light_stem(w))


def test_finnish_stem_fixtures():
    for w, want in FINNISH_FIXTURES.items():
        assert finnish_light_stem(w) == want, (w, finnish_light_stem(w))


def test_elision_filter():
    # ElisionFilter.cs: strip only when the prefix before the FIRST
    # apostrophe is an article; both ' and U+2019 count
    assert elide("l'avion", FRENCH_ARTICLES) == "avion"
    assert elide("qu'il", FRENCH_ARTICLES) == "il"
    assert elide("jusqu'au", FRENCH_ARTICLES) == "au"
    assert elide("l’avion", FRENCH_ARTICLES) == "avion"
    assert elide("xyz'abc", FRENCH_ARTICLES) == "xyz'abc"  # not an article
    assert elide("l'qu'x", FRENCH_ARTICLES) == "qu'x"      # first apostrophe only
    assert elide("avion", FRENCH_ARTICLES) == "avion"      # no apostrophe
    assert elide("'avion", FRENCH_ARTICLES) == "'avion"    # empty prefix
    assert elide("dell'arte", ITALIAN_ARTICLES) == "arte"
    assert elide("dell'arte", FRENCH_ARTICLES) == "dell'arte"  # wrong language


def test_french_chain_elides_then_stops_then_stems():
    # "l'est" must elide to "est" BEFORE the stop filter so it drops like
    # the reference chain (ElisionFilter ahead of StopFilter)
    assert tokenize_text("l'est", "french") == []
    # elision feeds the stemmer: "l'agrandissement" -> "agrandissement" -> stem
    assert tokenize_text("l'agrandissement arrive", "french") == [
        "agrandi", "ariv"
    ]
    # positions: "l'avion" is ONE UAX#29 token (MidNumLet apostrophe —
    # the reason ElisionFilter is a token filter); stopped tokens still
    # occupy slots
    toks, poss = tokenize_with_positions("le chat et l'avion", "french")
    assert toks == ["chat", "avion"] and poss == [1, 3]


def test_italian_chain():
    assert tokenize_text("dell'arte e della vita", "italian") == [
        "arte", "vita"
    ]


def test_new_language_chains_stop_then_stem():
    # each language's snowball stop set drops its own function words and
    # the stemmer hits what survives
    assert tokenize_text("las casas grandes", "spanish") == ["cas", "grand"]
    assert tokenize_text("os meninos e as meninas", "portuguese") == [
        "menin", "menin"
    ]
    assert tokenize_text("kake og husene", "norwegian") == ["kak", "hus"]
    assert tokenize_text("talossa ja taloissa", "finnish") == ["talo", "talo"]


def _fuzz_words_accented(seed: int, extra_sufs: tuple) -> list:
    """Suffix-heavy fuzz vocabulary INCLUDING accented characters — the
    round-5b SQL pipelines carry full translate() folds (unlike the
    ASCII-shortcut German mirror), so the fuzz exercises them."""
    import random

    rng = random.Random(seed)
    stems = [
        "nation", "educ", "chev", "ami", "negoz", "luz", "bott", "profes",
        "activ", "merg", "fol", "ab", "tyhjyy", "kahdeksa", "hemmelig",
        "cora", "kirja", "talo", "x",
    ]
    words = set()
    for st in stems:
        for su in extra_sufs:
            words.add(st + su)
    accents = "àáâäãòóôöõèéêëùúûüìíîïç"
    for _ in range(700):
        st = rng.choice(stems)
        st = "".join(
            c if rng.random() > 0.25 else rng.choice(accents) for c in st
        )
        words.add(st + rng.choice(extra_sufs))
    return sorted(words)


_R5B_SUFS = {
    "french": (
        "aux", "eaux", "x", "s", "es", "issement", "issant", "ement",
        "ivement", "ficatrice", "ficateur", "catrice", "cateur", "atrice",
        "ateur", "trice", "ième", "teuse", "teur", "euse", "ère", "ive",
        "folle", "molle", "nnelle", "nnel", "ète", "ique", "esse", "inage",
        "isation", "ualisation", "isateur", "ation", "ition", "ie", "rre",
        "tt", "ee",
    ),
    "spanish": ("eses", "ces", "as", "os", "es", "a", "o", "e", "s", "z"),
    "italian": ("he", "hi", "ii", "ia", "io", "ie", "a", "o", "i", "e"),
    "portuguese": (
        "es", "res", "ns", "eis", "éis", "ais", "óis", "is", "ões", "ães",
        "mente", "inha", "iaca", "eira", "osa", "ica", "ida", "ada", "iva",
        "ama", "ona", "ora", "esa", "na", "a", "o", "e", "s",
    ),
    "norwegian": (
        "heter", "heten", "dom", "het", "elser", "elsen", "ende", "else",
        "este", "eren", "ere", "est", "ene", "er", "en", "et", "st", "te",
        "a", "e", "n", "s", "ens",
    ),
    "finnish": (
        "kin", "kokin", "kinkin", "ko", "dellinen", "dellisuus", "lla",
        "tse", "sti", "ni", "aa", "nnen", "ntena", "tten", "eiden", "neen",
        "niin", "seen", "teen", "inen", "han", "hen", "den", "ksen", "ssa",
        "sta", "lta", "tta", "ksi", "lle", "ne", "nei", "ja", "ta", "at",
        "ei", "hde", "ppa", "kka", "ttu", "i", "e",
    ),
}


@pytest.mark.parametrize(
    "lang", ["french", "spanish", "italian", "portuguese", "norwegian", "finnish"]
)
def test_sql_lightstem_r5b_fuzz_matches_python(lang):
    import duckdb

    from lucenenet_spark.entry_support import _STEM_PIPELINES

    pyfn = {
        "french": french_light_stem,
        "spanish": spanish_light_stem,
        "italian": italian_light_stem,
        "portuguese": portuguese_light_stem,
        "norwegian": norwegian_light_stem,
        "finnish": finnish_light_stem,
    }[lang]
    words = _fuzz_words_accented(29 + len(lang), _R5B_SUFS[lang])
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    rec = "RECURSIVE " if lang == "finnish" else ""
    sql = f"""WITH {rec}rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{_STEM_PIPELINES[lang]()}
SELECT tok, stem FROM stemmap"""
    got = dict(con.execute(sql).fetchall())
    bad = [(w, pyfn(w), got.get(w)) for w in words if pyfn(w) != got.get(w)]
    assert not bad, bad[:10]


# -- stem exclusions (SetKeywordMarkerFilter via the :excl= suffix) -----------


def test_stem_exclusion_suffix():
    from lucenenet_spark.functions.analysis import (
        split_analyzer,
        validate_analyzer,
    )

    assert split_analyzer("english:excl=merge,value") == (
        "english", frozenset({"merge", "value"})
    )
    assert split_analyzer("french") == ("french", frozenset())
    validate_analyzer("german:excl=a,b")
    with pytest.raises(ValueError):
        validate_analyzer("klingon:excl=a")


def test_stem_exclusion_skips_stemming():
    # excluded tokens index verbatim; everything else still stems
    assert tokenize_text("merge merges", "english:excl=merge") == [
        "merge", "merg"
    ]
    # the exclusion match happens POST-stop/POST-elision, like
    # SetKeywordMarkerFilter's position in CreateComponents
    assert tokenize_text("l'animateur", "french:excl=animateur") == [
        "animateur"
    ]
    assert tokenize_text("casas", "spanish:excl=casas") == ["casas"]


def test_stem_exclusion_german_still_normalizes():
    # GermanNormalizationFilter has no keyword check: an excluded token is
    # normalized but NOT light-stemmed (goethe -> gothe, keeps the -e)
    assert tokenize_text("goethe", "german") == ["goth"]
    assert tokenize_text("goethe", "german:excl=goethe") == ["gothe"]


# -- Hungarian (round 5d) ------------------------------------------------------


HUNGARIAN_FIXTURES = {
    # hand-derived, rule by rule (HungarianLightStemmer.cs):
    "ablakokat": "ablak",   # case -at, plural -ok (a link vowel)
    "házakban": "haz",      # fold á, case -ban, plural -ak
    "hazakent": "haz",      # case -kent (len>6), possessive final -a
    "kertektől": "ker",     # fold ő, case -tol, possessive -tek (cons before)
    "almák": "alm",         # fold á, plural -ak
    "könyvek": "konyv",     # fold ö; y counts as a VOWEL so -tek is skipped,
                            # plural -ek
    "autója": "aut",        # fold ó, possessive -ja after vowel, normalize -o
    "egyetemen": "egyet",   # case -en after consonant, possessive -em
    "merge": "merg",        # possessive final -e after consonant
    "merged": "merg",       # possessive -ed after consonant
    "merges": "merges",     # no rule fires
}


def test_hungarian_stem_fixtures():
    from lucenenet_spark.functions.lightstem import hungarian_light_stem

    for w, want in HUNGARIAN_FIXTURES.items():
        assert hungarian_light_stem(w) == want, (w, hungarian_light_stem(w))


def test_hungarian_chain_stops_then_stems():
    # snowball Hungarian stop set drops the articles/conjunctions, the light
    # stemmer conflates the case-suffixed forms that survive
    assert tokenize_text("a házakban és az ablakokat", "hungarian") == [
        "haz", "ablak"
    ]


def test_sql_hungarian_fuzz_matches_python():
    """SQL-vs-Python fuzz with Hungarian accents (the fold table covers
    á ë é í ó ő õ ö ú ű ũ û ü) + every suffix family the stemmer knows."""
    import random

    import duckdb

    from lucenenet_spark.entry_support import _STEM_PIPELINES
    from lucenenet_spark.functions.lightstem import hungarian_light_stem

    rng = random.Random(53)
    stems = [
        "ablak", "haz", "kert", "merg", "auto", "konyv", "egyetem", "alm",
        "pad", "hal", "x", "ab", "tt", "szavak",
    ]
    sufs = [
        "kent", "nak", "nek", "val", "vel", "ert", "rol", "ban", "ben",
        "bol", "nal", "nel", "hoz", "hez", "tol", "al", "el", "at", "et",
        "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig", "on", "en",
        "t", "n", "a", "e", "atok", "otok", "etek", "itek", "itok", "unk",
        "tok", "tek", "juk", "ink", "am", "em", "om", "ad", "ed", "od",
        "uk", "nk", "ja", "je", "im", "id", "ik", "m", "d", "i", "k", "ak",
        "ok", "ek", "ák", "ét", "ő", "ű", "kat", "ket", "okat", "eket",
    ]
    accents = "áëéíóőõöúűũûü"
    words = set()
    for st in stems:
        for su in sufs:
            words.add(st + su)
    for _ in range(800):
        st = rng.choice(stems)
        st = "".join(
            c if rng.random() > 0.25 else rng.choice(accents) for c in st
        )
        words.add(st + rng.choice(sufs))
    words = sorted(words)
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""WITH rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{_STEM_PIPELINES["hungarian"]()}
SELECT tok, stem FROM stemmap"""
    got = dict(con.execute(sql).fetchall())
    bad = [
        (w, hungarian_light_stem(w), got.get(w))
        for w in words
        if hungarian_light_stem(w) != got.get(w)
    ]
    assert not bad, bad[:10]


# -- round 5d: Russian / Czech / Bulgarian / Latvian / Indonesian --------------


R5D_FIXTURES = {
    # hand-derived rule by rule against the cited reference stemmers
    "russian": {
        "корабли": "корабл",    # -и case strip
        "важный": "важн",       # -ый case strip
        "статьями": "стат",     # -ями case, normalize final -ь
        "женщинами": "женщин",  # -ами case
        "осенний": "осен",      # -ий case, collapse double н
        "merge": "merge",       # Latin text passes through
    },
    "czech": {
        "hradech": "hrad",      # -ech case
        "staveb": "stavb",      # normalize e-insertion removal
        "otců": "otk",          # -ů vowel strip, palatal c->k
        "matkin": "matk",       # possessive -in
        "merges": "merg",       # -es is in the case table
        "merge": "merg",        # final-vowel strip
    },
    "bulgarian": {
        "градовете": "град",    # article -те, plural -ове
        "книгите": "книг",      # article -те, plural -и
        "хубава": "хубав",      # final -а strip
        "колища": "кол",        # -ища early return
        "длъжен": "длъжн",      # ен -> н
        "merge": "merge",       # Latin text passes through
    },
    "latvian": {
        "cilvēkiem": "cilvēk",  # -iem (vc 2, palatalizing, no rule hits)
        "ūdens": "ūden",        # bare -s (vc 0)
        "zaļu": "zal",          # -u palatalizes ļ -> l
        "merges": "merg",       # -es affix applies to Latin text too
        "merge": "merg",        # -e affix
        "up": "up",             # too short for any affix (len < affix+3)
    },
    "indonesian": {
        "membukakan": "buka",     # mem- prefix then -kan (not blocked by MENG)
        "kebijakan": "bijak",     # ke- blocks -kan, -an still strips
        "customernya": "customer",  # possessive -nya
        "bukulah": "buku",        # particle -lah
        "perbaikan": "bai",       # per- second-order prefix, then -kan
        "merge": "merge",         # 2 syllables: no rule may fire
    },
}


@pytest.mark.parametrize("lang", sorted(R5D_FIXTURES))
def test_r5d_stem_fixtures(lang):
    from lucenenet_spark.functions import lightstem

    pyfn = {
        "russian": lightstem.russian_light_stem,
        "czech": lightstem.czech_stem,
        "bulgarian": lightstem.bulgarian_stem,
        "latvian": lightstem.latvian_stem,
        "indonesian": lightstem.indonesian_stem,
    }[lang]
    for w, want in R5D_FIXTURES[lang].items():
        assert pyfn(w) == want, (lang, w, pyfn(w), want)


def test_r5d_chains_stop_then_stem():
    # each slot's own stop set applies (Cyrillic sets for ru/bg, Latin for
    # cs/lv/id), then the slot's stemmer
    assert tokenize_text("и корабли на рейде", "russian") == ["корабл", "рейд"]
    assert tokenize_text("jsou hradech a otců", "czech") == ["hrad", "otk"]
    assert tokenize_text("и градовете са хубава", "bulgarian") == [
        "град", "хубав"
    ]
    assert tokenize_text("un cilvēkiem bet zaļu", "latvian") == [
        "cilvēk", "zal"
    ]
    assert tokenize_text("yang membukakan itu customernya", "indonesian") == [
        "buka", "customer"
    ]
    # English stopwords are NOT dropped by the non-English slots
    assert "the" in tokenize_text("the merge", "russian")


_R5D_ALPHABETS = {
    "russian": "абвгдежзийклмнопрстуфхцчшщъыьэюя",
    "czech": "áéíóúůýěčšžřďťň",
    "bulgarian": "абвгдежзийклмнопрстуфхцчшщъьюя",
    "latvian": "āēīūčģķļņšž",
    "indonesian": "aeiou",
}

_R5D_STEMS = {
    "russian": ["корабл", "важн", "стать", "женщин", "осен", "телефон",
                "х", "до", "мост", "оь"],
    "czech": ["hrad", "stav", "otc", "matk", "merg", "x", "ab", "koč",
              "pánů", "vešt"],
    "bulgarian": ["град", "книг", "хубав", "кол", "длъж", "х", "об",
                  "ец", "момч"],
    "latvian": ["cilvēk", "ūden", "zaļ", "merg", "up", "kuģ", "šņor",
                "ļļ", "kš", "ņņ", "pj"],
    "indonesian": ["buka", "bijak", "customer", "baik", "ajar", "main",
                   "guna", "x", "se"],
}

_R5D_SUFS = {
    "russian": ("иями", "оями", "иям", "иях", "оях", "ями", "оям", "оьв",
                "ами", "его", "ему", "ери", "ими", "ого", "ому", "ыми",
                "оев", "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия",
                "ию", "ьв", "ою", "ую", "ям", "ых", "ея", "ам", "ем",
                "ей", "ём", "ев", "ий", "им", "ое", "ой", "ом", "ов",
                "ые", "ый", "ым", "ми", "а", "е", "и", "о", "у", "й",
                "ы", "я", "ь", "н", "нн"),
    "czech": ("atech", "ětem", "etem", "atům", "ech", "ich", "ích", "ého",
              "ěmi", "emi", "ému", "ěte", "ete", "ěti", "eti", "ího",
              "iho", "ími", "ímu", "imu", "ách", "ata", "aty", "ých",
              "ama", "ami", "ové", "ovi", "ými", "em", "es", "ém", "ím",
              "ům", "at", "ám", "os", "us", "ým", "mi", "ou", "a", "e",
              "i", "o", "u", "ů", "y", "á", "é", "í", "ý", "ě", "ov",
              "in", "ův", "čt", "št", "c", "č", "z", "ž", "eb", "ůb"),
    "bulgarian": ("ият", "ът", "то", "те", "та", "ия", "ят", "овци",
                  "ове", "еве", "ища", "ци", "зи", "еи", "еви", "си",
                  "и", "я", "а", "о", "е", "ен", "ъл", "ън", "ъц"),
    "latvian": ("ajiem", "ajai", "ajam", "ajām", "ajos", "ajās", "iem",
                "ajā", "ais", "ai", "ei", "ām", "am", "ēm", "īm", "im",
                "um", "us", "as", "ās", "es", "os", "ij", "īs", "ēs",
                "is", "ie", "u", "a", "i", "e", "ā", "ē", "ī", "ū", "o",
                "s", "š"),
    "indonesian": ("kah", "lah", "pun", "ku", "mu", "nya", "kan", "an",
                   "i", "si", "kannya", "annya", "inya", "lahku",
                   "kanlah", "anku"),
}

_ID_PREFIXES = ("", "meng", "meny", "men", "mem", "me", "peng", "peny",
                "pen", "pem", "di", "ter", "ke", "ber", "bel", "be",
                "per", "pel", "pe", "ber", "belajar", "beser")


@pytest.mark.parametrize("lang", sorted(R5D_FIXTURES))
def test_sql_r5d_fuzz_matches_python(lang):
    """SQL-pipeline-vs-Python fuzz per round-5d slot: every suffix (and for
    Indonesian every prefix) family crossed with the stem pool, plus random
    alphabet mutation so palatal/normalization rewrites get hit."""
    import random

    import duckdb

    from lucenenet_spark.entry_support import _STEM_PIPELINES
    from lucenenet_spark.functions import lightstem

    pyfn = {
        "russian": lightstem.russian_light_stem,
        "czech": lightstem.czech_stem,
        "bulgarian": lightstem.bulgarian_stem,
        "latvian": lightstem.latvian_stem,
        "indonesian": lightstem.indonesian_stem,
    }[lang]
    rng = random.Random(547 + len(lang))
    words = set()
    for st in _R5D_STEMS[lang]:
        for su in _R5D_SUFS[lang]:
            words.add(st + su)
            if lang == "indonesian":
                words.add(rng.choice(_ID_PREFIXES) + st + su)
    alphabet = _R5D_ALPHABETS[lang]
    for _ in range(700):
        st = rng.choice(_R5D_STEMS[lang])
        st = "".join(
            c if rng.random() > 0.25 else rng.choice(alphabet) for c in st
        )
        pre = rng.choice(_ID_PREFIXES) if lang == "indonesian" else ""
        words.add(pre + st + rng.choice(_R5D_SUFS[lang]))
    words = sorted(words)
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""WITH rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{_STEM_PIPELINES[lang]()}
SELECT tok, stem FROM stemmap"""
    got = dict(con.execute(sql).fetchall())
    bad = [(w, pyfn(w), got.get(w)) for w in words if pyfn(w) != got.get(w)]
    assert not bad, (len(bad), bad[:10])


# -- round 5e: Arabic / Persian / Sorani / Galician ----------------------------


def test_arabic_fixtures():
    from lucenenet_spark.functions.lightstem import (
        arabic_chain,
        arabic_normalize,
        arabic_stem,
    )

    # normalization: seated alefs, dotless yeh, teh marbuta, harakat
    assert arabic_normalize("أَحْمَد") == "احمد"
    assert arabic_normalize("مَكْتَبَة") == "مكتبه"
    # prefix: wal- strip; suffix: -ha then -at strip CUMULATIVELY
    assert arabic_stem("والكتابها") == "كتاب"
    assert arabic_stem("الكلمات") == "كلم"
    # wa- needs len >= 4: (normalized) len-3 keeps the waw
    assert arabic_stem("ومن") == "ومن"
    assert arabic_stem("وكتب") == "كتب"
    # al- needs 2 chars left
    assert arabic_stem("الم") == "الم"
    assert arabic_chain("بِالْكُتُبِ") == "كتب"


def test_persian_fixtures():
    from lucenenet_spark.functions.lightstem import persian_normalize

    assert persian_normalize("كتابی") == "كتابي"   # farsi yeh -> yeh
    assert persian_normalize("کتاب") == "كتاب"     # keheh -> kaf
    assert persian_normalize("درۀ") == "دره"       # heh+yeh -> heh
    assert persian_normalize("آباد") == "اباد"     # alef madda -> alef


def test_sorani_fixtures():
    from lucenenet_spark.functions.lightstem import (
        sorani_normalize,
        sorani_stem,
    )

    assert sorani_normalize("ره") == "ڕە"    # initial reh + final heh
    assert sorani_normalize("كتێب") == "کتێب"  # kaf -> keheh
    assert sorani_normalize("دره") == "درە"   # non-initial reh stays
    # heh + ZWNJ -> ae — live through the tokenizer too since round 5g
    # (ZWNJ is Extend and stays in-token)
    assert sorani_normalize("گته‌و") == "گتەو"
    assert tokenize_text("گته‌و", "sorani") == ["گتەو"]
    # fatha before a final heh deletes AFTER the heh was scanned non-final
    assert sorani_normalize("بَه") == "بە"
    assert sorani_stem("پیاوەکان") == "پیاو"   # -ekan
    assert sorani_stem("کتێبێک") == "کتێب"     # -ek
    # -da postposition leaves len 6, too short for -eke (needs >6), so
    # the shorter -ke arm fires
    assert sorani_stem("ماڵەکەدا") == "ماڵە"


def test_galician_fixtures():
    from lucenenet_spark.functions.lightstem import galician_minimal_stem

    assert galician_minimal_stem("normais") == "normal"
    assert galician_minimal_stem("luces") == "luz"
    assert galician_minimal_stem("casas") == "casa"
    assert galician_minimal_stem("papéis") == "papel"
    # exception blocks the ns rule; the bare -s rule still fires
    assert galician_minimal_stem("luns") == "lun"
    # whole-word exception of the -s rule
    assert galician_minimal_stem("martes") == "martes"
    assert galician_minimal_stem("menos") == "menos"  # -s exception word
    assert galician_minimal_stem("xamós") == "xamón"


def test_r5e_chains():
    assert tokenize_text("في والكتابها كلمات", "arabic") == ["كتاب", "كلم"]
    assert tokenize_text("که كتابی میروم", "persian") == ["كتابي", "ميروم"]
    assert tokenize_text("بۆ پیاوەکان ره", "sorani") == ["پیاو", "ڕە"]
    assert tokenize_text("as normais e luces", "galician") == [
        "normal", "luz"
    ]
    # arabic stop list is UNnormalized: the normalized form of a stop word
    # is NOT dropped (normalization runs after the stop filter)
    assert "the" in tokenize_text("the merge", "arabic")


def test_arabic_excl_still_normalizes():
    # ArabicNormalizationFilter runs before SetKeywordMarkerFilter
    # (ArabicAnalyzer.cs:142): excluded tokens normalize but do not stem
    assert tokenize_text("الكلمات", "arabic") == ["كلم"]
    assert tokenize_text("الكلمات", "arabic:excl=الكلمات") == ["الكلمات"]
    # excluded token still normalizes (teh marbuta -> heh) but skips the
    # heh-suffix strip the unexcluded path would apply
    assert tokenize_text("مكتبة", "arabic") == ["مكتب"]
    assert tokenize_text("مكتبة", "arabic:excl=مكتبة") == ["مكتبه"]


_R5E_FUZZ = {
    # stems / prefixes / suffixes / mutation alphabet per 5e slot.
    # sorani's alphabet includes the ZWNJ, harakat, and the ENUMERATED Cf
    # subset the SQL mirror deletes (the Python side deletes all of Cf)
    "arabic": {
        "stems": ["كتاب", "كلم", "درس", "علم", "مدرس", "طالب", "من", "ب"],
        "prefixes": ["", "ال", "وال", "بال", "كال", "فال", "لل", "و"],
        "sufs": ["", "ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة",
                 "ي", "اتها", "يةه", "هاة"],
        "alphabet": "ابتثجحخدذرزسشصضطظعغفقكلمنهويآأإىةًٌٍَُِّْـ",
    },
    "sorani": {
        "stems": ["پیاو", "ماڵ", "کتێب", "شار", "ر", "ره", "گا", "ده"],
        "prefixes": [""],
        "sufs": ["", "دا", "نا", "ەوە", "مان", "یان", "تان", "ێکی", "یەکی",
                 "ێک", "یەک", "ەکە", "کە", "ەکان", "کان", "یانی", "انی",
                 "ان", "یانە", "انە", "ایە", "ەیە", "ە", "ی",
                 "ەکاندا", "ەکەمان"],
        "alphabet": "ابجدرزسشعفقکگلمنهویەێڕڵيىكةھڒ"
                    "ًَُّ‌‍‎‏‪⁠﻿؜​",
    },
    "galician": {
        "stems": ["normai", "luce", "casa", "papéi", "lun", "xamó",
                  "animá", "caraco", "cadrí", "male", "mare", "luze",
                  "leise", "ga", "x", "pai", "cai", "ingle"],
        "prefixes": [""],
        "sufs": ["", "s", "ns", "ós", "ões", "ães", "ais", "áis", "éis",
                 "eis", "óis", "ois", "ís", "is", "les", "res", "ces",
                 "zes", "ises", "ás", "ses"],
        "alphabet": "abcdefghilmnopqrstuxzáéíóúñãõê",
    },
}


@pytest.mark.parametrize("lang", sorted(_R5E_FUZZ))
def test_sql_r5e_fuzz_matches_python(lang):
    """SQL-pipeline-vs-Python fuzz for the 5e stemmers. The pipelines run
    on POST-stop tokens, i.e. post-normalization for sorani (pre-stop norm)
    and raw for arabic (stop list unnormalized, norm inside the pipeline) —
    so arabic fuzz words carry raw harakat/alef variants while sorani fuzz
    words are fed through sorani_normalize first for the Python expectation
    and through the _PRE_NORM_SQL expression on the SQL side."""
    import random

    import duckdb

    from lucenenet_spark.entry_support import _PRE_NORM_SQL, _STEM_PIPELINES
    from lucenenet_spark.functions import lightstem

    cfg = _R5E_FUZZ[lang]
    rng = random.Random(911 + len(lang))
    words = set()
    for st in cfg["stems"]:
        for su in cfg["sufs"]:
            words.add(rng.choice(cfg["prefixes"]) + st + su)
    for _ in range(700):
        st = rng.choice(cfg["stems"])
        st = "".join(
            c if rng.random() > 0.25 else rng.choice(cfg["alphabet"])
            for c in st
        )
        words.add(
            rng.choice(cfg["prefixes"]) + st + rng.choice(cfg["sufs"])
        )
    words = sorted(w for w in words if w and "'" not in w)

    if lang == "arabic":
        pyfn = lightstem.arabic_chain
        tok_expr = "tok"
    elif lang == "sorani":
        def pyfn(w):
            return lightstem.sorani_stem(lightstem.sorani_normalize(w))

        tok_expr = _PRE_NORM_SQL["sorani"]("tok")
    else:
        pyfn = lightstem.galician_minimal_stem
        tok_expr = "tok"

    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""WITH raw0 AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
rawtoks AS (SELECT docid, ord, {tok_expr} AS tok FROM raw0),
{_STEM_PIPELINES[lang]()}
SELECT tok, stem FROM stemmap"""
    got = {}
    for k, v in con.execute(sql).fetchall():
        got[k] = v
    if lang == "sorani":
        bad = [
            (w, pyfn(w), got.get(lightstem.sorani_normalize(w)))
            for w in words
            if pyfn(w) != got.get(lightstem.sorani_normalize(w))
        ]
    else:
        bad = [
            (w, pyfn(w), got.get(w)) for w in words if pyfn(w) != got.get(w)
        ]
    assert not bad, (len(bad), bad[:10])


def test_sql_persian_norm_matches_python():
    """The Persian slot is normalization-only: fuzz the combined
    Arabic+Persian translate map SQL-vs-Python."""
    import random

    import duckdb

    from lucenenet_spark.entry_support import _PRE_NORM_SQL
    from lucenenet_spark.functions.lightstem import persian_normalize

    rng = random.Random(409)
    alphabet = "ابپتثجچحخدذرزژسشصضطظعغفقکگلمنوهیآأإىةيےۀۂًٌٍَُِّْـ"
    words = {"".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
             for _ in range(900)}
    words = sorted(words)
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    expr = _PRE_NORM_SQL["persian"]("tok")
    got = dict(con.execute(
        f"SELECT tok, {expr} FROM (VALUES {vals}) t(tok)"
    ).fetchall())
    bad = [
        (w, persian_normalize(w), got.get(w))
        for w in words
        if persian_normalize(w) != got.get(w)
    ]
    assert not bad, (len(bad), bad[:10])


# -- round 5f: Greek -----------------------------------------------------------


def test_greek_lowercase_extras():
    from lucenenet_spark.functions.lightstem import greek_lowercase

    assert greek_lowercase("καλόσ") == "καλοσ"
    assert greek_lowercase("ςωκράτης".lower()) == "σωκρατησ"
    assert greek_lowercase("προϊόν") == "προιον"
    assert greek_lowercase("ΰϋύ") == "υυυ"


GREEK_FIXTURES = {
    # hand-traced, rule by rule, against GreekStemmer.cs control flow
    "γεγονοτα": "γεγον",       # rule0
    "ομαδεσ": "ομαδ",          # rule1: -αδεσ, no exception -> add back αδ
    "γιαγιαδεσ": "γιαγι",      # rule1 exception: no add-back
    "κεφτεδεσ": "κεφτ",        # rule2: base not in the add-back list
    "σκουπεδεσ": "σκουπεδ",    # rule2 add-back: base ends -υπ
    "πλεξουδεσ": "πλεξουδ",    # rule3 add-back: base ends πλεξ
    "πολεωσ": "πολ",           # rule4: -εωσ, not in exc4
    "πελαγια": "πελαγ",        # rule5: base ends consonant, no ι back
    "αξιου": "αξ",             # rule5: -ιου, base ξ consonant
    "ποια": "ποι",             # rule5: base ends vowel -> + ι
    "τοπικου": "τοπ",          # rule6: -ικου, base τοπ consonant & not exc
    "φαγαμε": "φ",             # rule7: -αγαμε tier (len 6 > 5)
    "γραψαμε": "γραψ",         # rule7: -αμε, base not in exc7
    "τρωγανε": "τρωγ",         # rule8: -ανε, τρωγ not in exc8b
    "γραφετε": "γραφ",         # rule9
    "τρεχοντασ": "τρεχ",       # rule10
    "αρχοντασ": "αρχοντ",      # rule10 αρχ restore
    "χτυπιομαστε": "χτυπι",    # rule11: the -ομαστε arm fires FIRST, so
                               # the ι stays (the ιομαστε elif is
                               # unreachable in the reference too)
    "γραφεστε": "γραφ",        # rule12
    "χτυπηθηκε": "χτυπ",       # rule13
    "γραφουσε": "γραφ",        # rule14
    "φαγαγε": "φαγ",           # rule15: cond1 false, no add-back
    "χτυπησε": "χτυπ",         # rule16
    "χτυπηστε": "χτυπ",        # rule17
    "γραφουνε": "γραφ",        # rule18
    "γραφουμε": "γραφ",        # rule19
    "ονοματων": "ονομα",       # rule20 (-3 of ματων)
    "γραφει": "γραφ",          # rule21 long list (no short rule fired)
    "ωραιοτερη": "ωραι",       # rule21 vowel strip, then rule22 -οτερ
    "καλυτερα": "καλ",         # rule21 vowel strip, then rule22 -υτερ
    "και": "και",              # < 4 chars bypasses
    "merge": "merge",          # Latin text passes through
}


def test_greek_stem_fixtures():
    # fixtures above that are non-obvious were first traced by hand, then
    # pinned against the Python implementation; the SQL fuzz below is the
    # independent check of both
    from lucenenet_spark.functions.lightstem import greek_stem

    for w, want in GREEK_FIXTURES.items():
        got = greek_stem(w)
        assert got == want, (w, got, want)


def test_greek_chain():
    assert tokenize_text("ο ΓΡΑΦΕΙ και τα γεγονότα", "greek") == [
        "γραφ", "γεγον"
    ]


def test_sql_greek_fuzz_matches_python():
    """SQL-vs-Python fuzz across every GreekStemmer rule family: stems
    crossed with all 100+ rule suffixes plus random Greek-letter mutation
    (which also hits the exception-set and add-back paths)."""
    import random

    import duckdb

    from lucenenet_spark.entry_support import _STEM_PIPELINES
    from lucenenet_spark.functions.lightstem import greek_stem

    rng = random.Random(271)
    stems = ["γραφ", "χτυπ", "τρεχ", "ομ", "γιαγι", "κεφτ", "πλεξ", "πολ",
             "αξ", "τοπ", "φαγ", "τρωγ", "αρχ", "ον", "κρε", "τρ", "τσ",
             "θ", "ν", "π", "σκ", "καθεστ", "γεγον", "φω", "κολλ", "ψοφ",
             "ωραι", "καλ", "x"]
    sufs = ["", "α", "ασ", "εσ", "ων", "ου", "η", "οσ", "οι",
            "αδεσ", "αδων", "εδεσ", "εδων", "ουδεσ", "ουδων", "εωσ",
            "εων", "ια", "ιου", "ιων", "ικα", "ικο", "ικου", "ικων",
            "αγαμε", "ηθηκαμε", "ουσαμε", "ησαμε", "ηκαμε", "αμε",
            "ιουντανε", "ιοντανε", "ουντανε", "ηθηκανε", "ιοτανε",
            "οντανε", "ουσανε", "αγανε", "ησανε", "οτανε", "ηκανε", "ανε",
            "ησετε", "ετε", "οντασ", "ωντασ", "ομαστε", "ιομαστε",
            "ιεστε", "εστε", "ηθηκεσ", "ηθηκα", "ηθηκε", "ηκεσ", "ηκα",
            "ηκε", "ουσεσ", "ουσα", "ουσε", "αγεσ", "αγα", "αγε", "ησου",
            "ησε", "ησα", "ηστε", "ησουνε", "ηθουνε", "ουνε", "ησουμε",
            "ηθουμε", "ουμε", "ματων", "ματοσ", "ματα", "ιοντουσαν",
            "ιομασταν", "ουμαστε", "ιουνται", "ονται", "οταν", "ομαι",
            "ειτε", "εισ", "ουν", "ουσ", "ει", "αει", "εστερ", "εστατ",
            "οτερ", "υτερ", "ωτατ", "καθεστωτοσ", "γεγονοτα", "φωτα"]
    alphabet = "αβγδεζηθικλμνξοπρστυφχψω"
    words = set()
    for st in stems:
        for su in sufs:
            words.add(st + su)
    for _ in range(900):
        st = rng.choice(stems)
        st = "".join(
            c if rng.random() > 0.3 else rng.choice(alphabet) for c in st
        )
        words.add(st + rng.choice(sufs))
    words = sorted(w for w in words if w)
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""WITH rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{_STEM_PIPELINES["greek"]()}
SELECT tok, stem FROM stemmap"""
    got = dict(con.execute(sql).fetchall())
    bad = [
        (w, greek_stem(w), got.get(w))
        for w in words
        if greek_stem(w) != got.get(w)
    ]
    assert not bad, (len(bad), bad[:10])


# -- round 5g: Hindi + the Extend-aware tokenizer ------------------------------


def test_tokenizer_attaches_marks():
    """Round-5g tokenizer: BMP combining marks + ZWNJ/ZWJ continue a run
    (UAX#29 Extend), in BOTH regex dialects."""
    import duckdb

    from lucenenet_spark.functions.analysis import (
        TOKEN_PATTERN_RE2,
        _findall,
    )

    con = duckdb.connect()
    cases = {
        "लडकियाँ और लडके": ["लडकियाँ", "और", "लडके"],
        "كَلِمات": ["كَلِمات"],          # harakat stay attached
        "می‌خواهم": ["می‌خواهم"],        # ZWNJ joins (Extend)
        "áb c": ["áb", "c"],  # combining acute continues a run
        "िx": ["x"],               # a mark cannot START a token
        "don't b.com 21.35": ["don't", "b.com", "21.35"],
    }
    for text, want in cases.items():
        assert _findall(text) == want, (text, _findall(text))
        got = con.execute(
            "SELECT regexp_extract_all(?, ?)", [text, TOKEN_PATTERN_RE2]
        ).fetchone()[0]
        assert got == want, ("re2", text, got)


def test_persian_char_filter():
    # PersianCharFilter.cs: ZWNJ -> space BEFORE tokenization, persian
    # slot only ("می" normalizes to "مي", a Persian stop word)
    assert tokenize_text("می‌خواهم merge", "persian") == ["خواهم", "merge"]
    assert tokenize_text("می‌خواهم", "standard") == ["می‌خواهم"]


def test_indic_normalize_fixtures():
    from lucenenet_spark.functions.lightstem import indic_normalize

    assert indic_normalize("अा") == "आ"        # 2-char AA composition
    assert indic_normalize("अाॅ") == "ऑ"       # 3-char candra O
    # nukta qa composition (decomposed input -> precomposed U+0958)
    assert indic_normalize("\u0915\u093C\u093E") == "\u0958\u093E"
    # bengali khanda ta: TA + virama + ZWJ -> U+09CE
    assert indic_normalize("\u09A4\u09CD\u200D") == "\u09CE"
    assert indic_normalize("merge") == "merge"


def test_hindi_fixtures():
    from lucenenet_spark.functions.lightstem import (
        hindi_normalize,
        hindi_stem,
    )

    assert hindi_normalize("न्") == "ं"          # dead n -> bindu
    assert hindi_normalize("आप") == "अप"        # long -> short vowel
    # nukta deleted AND long ii folds to short i
    assert hindi_normalize("पढ़ती") == "\u092A\u0922\u0924\u093F"
    assert hindi_stem("लडकियाँ") == "लडक"        # 4-char tier
    assert hindi_stem("खाते") == "खा"            # 2-char tier
    assert hindi_stem("लडके") == "लडक"           # 1-char tier
    assert hindi_stem("और") == "और"              # guards


def test_hindi_chain():
    assert tokenize_text("वह अपनी किताबें पढ़ती है", "hindi") == [
        "किताब", "पढत"
    ]
    # decomposed AA composes (Indic scan), then folds, then stop-drops
    assert tokenize_text("अाप आते हैं", "hindi") == ["अत"]


def test_sql_hindi_fuzz_matches_python():
    """Full-chain fuzz: raw Devanagari-ish tokens through the hindi
    pre-norm CTEs (recursive Indic scan + HindiNormalizer + stop filter)
    AND the stem pipeline, vs the Python chain — compares the final stem
    STREAMS so stop-filtering parity is covered too."""
    import random

    import duckdb

    from lucenenet_spark.entry_support import (
        _STEM_PIPELINES,
        _hindi_prenorm_ctes,
    )
    from lucenenet_spark.functions.analysis import stop_words, tokenize_text

    rng = random.Random(643)
    base = ["लडक", "खा", "किताब", "पढ", "अप", "आ", "अा", "हैं", "न", "क",
            "merge", "x"]
    sufs = ["", "ियाँ", "ते", "े", "ी", "ें", "ाएंगी", "ाकर", "ना", "ो",
            "़", "्", "ाँ", "ा", "ॅ", "ं"]
    alphabet = ("अआइईउऊएऐओऔकखगघचछजझटठडढणतथदधनपफबभमयरलवशषसह"
                "ािीुूृेैोौंँ़्‍")
    words = set()
    for b in base:
        for su in sufs:
            words.add(b + su)
    for _ in range(700):
        b = rng.choice(base)
        b = "".join(
            c if rng.random() > 0.3 else rng.choice(alphabet) for c in b
        )
        words.add(b + rng.choice(sufs))
    words = sorted(w for w in words if w and "'" not in w)

    stop_list = ", ".join(f"'{w}'" for w in sorted(stop_words("hindi")))
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""WITH RECURSIVE rawtoks0 AS (
  SELECT 0 AS docid, tok, row_number() OVER () AS ord
  FROM (VALUES {vals}) t(tok)),
{_hindi_prenorm_ctes(stop_list)},
{_STEM_PIPELINES["hindi"]()}
SELECT r.ord, m.stem FROM rawtoks r JOIN stemmap m ON r.tok = m.tok
ORDER BY r.ord"""
    got = [st for _o, st in con.execute(sql).fetchall()]
    # python side: each word is one raw token; run it through the chain
    want = []
    for w in words:
        want.extend(tokenize_text("क " + w, "hindi")[1:]
                    if False else [])
    # simpler: the chain on the single token (tokenize would re-tokenize,
    # so apply the chain stages directly)
    from lucenenet_spark.functions.lightstem import (
        hindi_chain_pre,
        hindi_stem,
    )

    stops = stop_words("hindi")
    want = []
    for w in words:
        n = hindi_chain_pre(w)
        if n not in stops:
            want.append(hindi_stem(n))
    assert got == want, (len(got), len(want),
                         [x for x in zip(got, want) if x[0] != x[1]][:10])


# -- round 5h: Brazilian Portuguese --------------------------------------------


def test_brazilian_reference_vectors():
    """Every Check() pair from the reference's own TestBrazilianStemmer.cs
    (the analyzer lowercases first, so inputs are lowercased here)."""
    import re

    from lucenenet_spark.functions.lightstem import brazilian_stem

    src = open(
        "/root/reference/src/Lucene.Net.Tests.Analysis.Common/Analysis/Br/"
        "TestBrazilianStemmer.cs",
        encoding="utf-8",
    ).read()
    pairs = re.findall(r'Check\("([^"]*)", "([^"]*)"\)', src)
    assert len(pairs) > 80
    bad = [
        (w, brazilian_stem(w.lower()), want)
        for w, want in pairs
        if brazilian_stem(w.lower()) != want
    ]
    assert not bad, bad[:10]


def test_brazilian_quirks():
    from lucenenet_spark.functions.lightstem import brazilian_stem

    # the unassigned-"logias" quirk: the rule needs "logias" inside R2
    # (two vowel-consonant boundaries before it); it fires (altered=True)
    # but CT keeps the suffix, and step4's residual strip is skipped
    assert brazilian_stem("barbarlogias") == "barbarlogias"
    # without R2 coverage the word falls through to step2's -ias strip
    assert brazilian_stem("tecnologias") == "tecnolog"
    # non-indexable lengths pass the RAW token through
    assert brazilian_stem("ab") == "ab"
    assert brazilian_stem("x" * 30) == "x" * 30
    # non-letter terms fold but do not stem
    assert brazilian_stem("bota3s") == "bota3s"
    assert brazilian_stem("ação1") == "acao1"


def test_brazilian_chain():
    assert tokenize_text("as bocadas e os quilômetros", "brazilian") == [
        "boc", "quilometr"
    ]


def test_sql_brazilian_matches_python():
    """SQL-vs-Python on the reference vectors PLUS suffix-crossed fuzz."""
    import random
    import re

    import duckdb

    from lucenenet_spark.entry_support import _STEM_PIPELINES
    from lucenenet_spark.functions.lightstem import (
        _BR_STEP1,
        _BR_STEP2,
        brazilian_stem,
    )

    src = open(
        "/root/reference/src/Lucene.Net.Tests.Analysis.Common/Analysis/Br/"
        "TestBrazilianStemmer.cs",
        encoding="utf-8",
    ).read()
    words = {w.lower() for w, _ in
             re.findall(r'Check\("([^"]*)", "([^"]*)"\)', src)}
    rng = random.Random(1117)
    stems = ["boat", "bob", "boc", "quilometr", "tecno", "agu", "ci",
             "gu", "a", "xyz", "emoc"]
    sufs = [s for _, _, *_ in []]
    sufs = [r[0] for r in _BR_STEP1] + [
        s for _mn, group in _BR_STEP2 for s in group
    ] + ["e", "gue", "cie", "os", "a", "i", "o", ""]
    alphabet = "abcdefghijlmnopqrstuvxzáâãéêíóôõúüçñ"
    for st in stems:
        for su in sufs:
            words.add(st + su)
    for _ in range(800):
        st = rng.choice(stems)
        st = "".join(
            c if rng.random() > 0.3 else rng.choice(alphabet) for c in st
        )
        words.add(st + rng.choice(sufs))
    words = sorted(w for w in words if w and "'" not in w)
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""WITH rawtoks AS (
  SELECT 0 AS docid, 0 AS ord, tok FROM (VALUES {vals}) t(tok)),
{_STEM_PIPELINES["brazilian"]()}
SELECT tok, stem FROM stemmap"""
    got = dict(con.execute(sql).fetchall())
    bad = [
        (w, brazilian_stem(w), got.get(w))
        for w in words
        if brazilian_stem(w) != got.get(w)
    ]
    assert not bad, (len(bad), bad[:10])
