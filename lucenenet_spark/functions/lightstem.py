"""UniNE light stemmers + ElisionFilter — the language analyzer slots.

Implements the published algorithms from Jacques Savoy, "Light Stemming
Approaches for the French, Portuguese, German and Hungarian Languages"
(SAC 2006) and "Report on CLEF-2003 Monolingual Tracks", as the reference
ships them:

- GermanNormalizationFilter (Analysis/De/GermanNormalizationFilter.cs):
  a 3-state FSM over the token — umlauts/accents fold to their base vowel,
  ß -> ss, and an 'e' is DELETED when the scanner is in the umlaut state
  (entered after a/o, or after a 'u' that itself followed an ordinary
  consonant), so "goethe"->"gothe"-style ae/oe/ue digraph folding happens
  only where German orthography would put an umlaut;
- GermanLightStemmer (Analysis/De/GermanLightStemmer.cs): accent fold,
  then two suffix-strip steps (plural/case endings -ern/-e[mnrs]/-e/-s,
  then -est/-er/-en/-st) with minimum-length guards;
- SwedishLightStemmer (Analysis/Sv/SwedishLightStemmer.cs): a trailing
  -s strip, then one cascade of definite/plural/comparative suffixes;
- FrenchLightStemmer (Analysis/Fr/FrenchLightStemmer.cs): plural/x strip,
  a long derivational-suffix cascade with letter rewrites (-issement->-ir,
  -cateur->-quer, ...), then Norm (accent fold, adjacent-duplicate-letter
  collapse, -ie/-r/-e/-e tail strip);
- SpanishLightStemmer (Analysis/Es/SpanishLightStemmer.cs): accent fold +
  one final-vowel/plural switch;
- ItalianLightStemmer (Analysis/It/ItalianLightStemmer.cs): accent fold +
  one final-vowel switch (len >= 6 only);
- PortugueseLightStemmer (Analysis/Pt/PortugueseLightStemmer.cs): plural
  suffix rewrite, feminine normalization, final-vowel strip, accent fold;
- NorwegianLightStemmer (Analysis/No/NorwegianLightStemmer.cs), BOKMAAL
  flag (the filter's default): possessive -s then one ending cascade;
- FinnishLightStemmer (Analysis/Fi/FinnishLightStemmer.cs): a kin/ko
  particle loop, two case-ending steps, and two normalization steps with
  a k/p/t duplicate collapse;
- ElisionFilter (Analysis/Util/ElisionFilter.cs): if the prefix before
  the FIRST apostrophe (' or U+2019) is in the language's article set,
  strip prefix + apostrophe ("l'avion" -> "avion"); used by the French
  and Italian chains ahead of the stop filter.

Slot-naming note: at matchVersion 4.8 the reference's FrenchAnalyzer,
SpanishAnalyzer, ItalianAnalyzer and PortugueseAnalyzer default to these
LIGHT stemmers (their .cs CreateComponents), while SwedishAnalyzer,
NorwegianAnalyzer and FinnishAnalyzer default to the heavier Tartarus
Snowball stemmers. Our "swedish"/"norwegian"/"finnish" slots implement
the reference's LIGHT filter variants (SwedishLightStemFilterFactory,
NorwegianLightStemFilter(BOKMAAL), FinnishLightStemFilter) — shipped
components a user selects by factory — not the Snowball defaults.

Stemming never changes token COUNT or positions — only the token text —
so the analyzer slot composes with the indexed position/offset channels
unchanged (same contract as the Porter slot, functions/porter.py).
"""

from __future__ import annotations

# -- German ---------------------------------------------------------------

_DE_FOLD = {
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
}

_ST_ENDING = frozenset("bdfghklmnt")

# FSM states (GermanNormalizationFilter.cs)
_N, _V, _U = 0, 1, 2


def german_normalize(token: str) -> str:
    """GermanNormalizationFilter.cs IncrementToken: umlaut fold + ß->ss +
    umlaut-state 'e' deletion, one left-to-right pass."""
    out: list[str] = []
    state = _N
    for c in token:
        if c in ("a", "o"):
            out.append(c)
            state = _U
        elif c == "u":
            out.append(c)
            state = _U if state == _N else _V
        elif c == "e":
            if state == _U:
                state = _V  # deleted: skip the char, scanner continues in V
                continue
            out.append(c)
            state = _V
        elif c in ("i", "q", "y"):
            out.append(c)
            state = _V
        elif c in ("ä", "ö", "ü"):
            out.append(_DE_FOLD[c])
            state = _V
        elif c == "ß":
            out.append("ss")
            state = _N
        else:
            out.append(c)
            state = _N
    return "".join(out)


def _german_step1(s: str) -> str:
    n = len(s)
    if n > 5 and s.endswith("ern"):
        return s[:-3]
    if n > 4 and s[-2] == "e" and s[-1] in "mnrs":
        return s[:-2]
    if n > 3 and s[-1] == "e":
        return s[:-1]
    if n > 3 and s[-1] == "s" and s[-2] in _ST_ENDING:
        return s[:-1]
    return s


def _german_step2(s: str) -> str:
    n = len(s)
    if n > 5 and s.endswith("est"):
        return s[:-3]
    if n > 4 and (s.endswith("er") or s.endswith("en")):
        return s[:-2]
    if n > 4 and s.endswith("st") and s[-3] in _ST_ENDING:
        return s[:-2]
    return s


def german_light_stem(token: str) -> str:
    """GermanLightStemmer.cs Stem: accent fold, then Step1 + Step2.
    (The analyzer chain applies german_normalize BEFORE this, mirroring
    GermanAnalyzer.cs CreateComponents' filter order.)"""
    s = "".join(_DE_FOLD.get(c, c) for c in token)
    return _german_step2(_german_step1(s))


def german_chain(token: str) -> str:
    """The post-stop slot for analyzer="german": GermanNormalizationFilter
    then GermanLightStemFilter (GermanAnalyzer.cs CreateComponents)."""
    return german_light_stem(german_normalize(token))


# -- Swedish ---------------------------------------------------------------


def swedish_light_stem(token: str) -> str:
    """SwedishLightStemmer.cs Stem: trailing -s, then one suffix cascade."""
    s = token
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:-5]
    if n > 6 and s[-4:] in ("arne", "erna", "ande", "else", "aste", "orna", "aren"):
        return s[:-4]
    if n > 5 and s[-3:] in ("are", "ast", "het"):
        return s[:-3]
    if n > 4 and s[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


# -- ElisionFilter ----------------------------------------------------------

# FrenchAnalyzer.cs DEFAULT_ARTICLES / ItalianAnalyzer.cs DEFAULT_ARTICLES
FRENCH_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)
ITALIAN_ARTICLES = frozenset(
    "c l all dall dell nell sull coll pell gl agl dagl degl negl sugl"
    " un m t s v d".split()
)

_APOSTROPHES = ("'", "’")


def elide(token: str, articles: frozenset) -> str:
    """ElisionFilter.cs IncrementToken: find the FIRST apostrophe; if the
    prefix before it is an article, strip prefix + apostrophe. Runs on the
    lowercased token (the article set is case-insensitive in the
    reference, so lower-then-elide == elide-then-lower)."""
    for i, ch in enumerate(token):
        if ch in _APOSTROPHES:
            if token[:i] in articles:
                return token[i + 1:]
            return token
    return token


# -- French -----------------------------------------------------------------

_FR_FOLD = {
    "à": "a", "á": "a", "â": "a",
    "ô": "o",
    "è": "e", "é": "e", "ê": "e",
    "ù": "u", "û": "u",
    "î": "i",
    "ç": "c",
}


def _french_norm(s: str) -> str:
    """FrenchLightStemmer.cs Norm: accent fold + adjacent-duplicate-letter
    collapse (len>4 only), then -ie strip and the r/e/e/double tail."""
    if len(s) > 4:
        s = "".join(_FR_FOLD.get(c, c) for c in s)
        out = [s[0]]
        for c in s[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(t: str) -> str:
    """FrenchLightStemmer.cs Stem — exact control flow: every branch falls
    through to Norm; branches marked no-return in the reference ("trice",
    "ète", "ique", the x/s strips) continue down the cascade."""
    s = t
    if len(s) > 5 and s[-1] == "x":
        if s.endswith("aux") and s[-4] != "e":
            s = s[:-2] + "l"  # chevaux -> cheval
        else:
            s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]
    if len(s) > 9 and s.endswith("issement"):
        s = s[:-6]
        return _french_norm(s[:-1] + "r")  # -issement -> -ir
    if len(s) > 8 and s.endswith("issant"):
        s = s[:-4]
        return _french_norm(s[:-1] + "r")  # -issant -> -ir
    if len(s) > 6 and s.endswith("ement"):
        s = s[:-4]
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-1]
            s = s[:-1] + "f"  # -ivement -> -if
        return _french_norm(s)
    if len(s) > 11 and s.endswith("ficatrice"):
        s = s[:-5]
        return _french_norm(s[:-2] + "er")  # -ficatrice -> -fier
    if len(s) > 10 and s.endswith("ficateur"):
        s = s[:-4]
        return _french_norm(s[:-2] + "er")  # -ficateur -> -fier
    if len(s) > 9 and s.endswith("catrice"):
        s = s[:-3]
        return _french_norm(s[:-4] + "quer")  # -catrice -> -quer
    if len(s) > 8 and s.endswith("cateur"):
        s = s[:-2]
        return _french_norm(s[:-4] + "quer")  # -cateur -> -quer
    if len(s) > 8 and s.endswith("atrice"):
        s = s[:-4]
        return _french_norm(s[:-2] + "er")  # -atrice -> -er
    if len(s) > 7 and s.endswith("ateur"):
        s = s[:-3]
        return _french_norm(s[:-2] + "er")  # -ateur -> -er
    if len(s) > 6 and s.endswith("trice"):
        s = s[:-1]
        s = s[:-3] + "eur"  # -trice -> -teur (no return)
    if len(s) > 5 and s.endswith("ième"):
        return _french_norm(s[:-4])
    if len(s) > 7 and s.endswith("teuse"):
        s = s[:-2]
        return _french_norm(s[:-1] + "r")  # -teuse -> -ter
    if len(s) > 6 and s.endswith("teur"):
        s = s[:-1]
        return _french_norm(s[:-1] + "r")  # -teur -> -ter
    if len(s) > 5 and s.endswith("euse"):
        return _french_norm(s[:-2])
    if len(s) > 8 and s.endswith("ère"):
        s = s[:-1]
        return _french_norm(s[:-2] + "e" + s[-1])  # -ère -> -er
    if len(s) > 7 and s.endswith("ive"):
        s = s[:-1]
        return _french_norm(s[:-1] + "f")  # -ive -> -if
    if len(s) > 4 and (s.endswith("folle") or s.endswith("molle")):
        s = s[:-2]
        return _french_norm(s[:-1] + "u")  # folle -> fou
    if len(s) > 9 and s.endswith("nnelle"):
        return _french_norm(s[:-5])
    if len(s) > 9 and s.endswith("nnel"):
        return _french_norm(s[:-3])
    if len(s) > 4 and s.endswith("ète"):
        s = s[:-1]
        s = s[:-2] + "e" + s[-1]  # -ète -> -et (no return)
    if len(s) > 8 and s.endswith("ique"):
        s = s[:-4]  # no return
    if len(s) > 8 and s.endswith("esse"):
        return _french_norm(s[:-3])
    if len(s) > 7 and s.endswith("inage"):
        return _french_norm(s[:-3])
    if len(s) > 9 and s.endswith("isation"):
        s = s[:-7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-2] + "e" + s[-1]  # -ualisation -> -uel
        return _french_norm(s)
    if len(s) > 9 and s.endswith("isateur"):
        return _french_norm(s[:-7])
    if len(s) > 8 and s.endswith("ation"):
        return _french_norm(s[:-5])
    if len(s) > 8 and s.endswith("ition"):
        return _french_norm(s[:-5])
    return _french_norm(s)


def french_chain(token: str) -> str:
    """Post-stop slot for analyzer="french" (FrenchAnalyzer.cs
    CreateComponents at 4.8: ... -> StopFilter -> FrenchLightStemFilter).
    Elision runs PRE-stop (see analysis._analyzer_chain)."""
    return french_light_stem(token)


# -- Spanish ----------------------------------------------------------------

_ES_FOLD = {
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
}


def spanish_light_stem(t: str) -> str:
    """SpanishLightStemmer.cs Stem: len<5 pass-through, accent fold, one
    final-vowel / plural switch (-eses -> -es, -ces -> -z, -[oae]s -> -)."""
    if len(t) < 5:
        return t
    s = "".join(_ES_FOLD.get(c, c) for c in t)
    last = s[-1]
    if last in "oae":
        return s[:-1]
    if last == "s":
        if s.endswith("eses"):
            return s[:-2]
        if s.endswith("ces"):
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


# -- Italian ----------------------------------------------------------------


def italian_light_stem(t: str) -> str:
    """ItalianLightStemmer.cs Stem: len<6 pass-through, accent fold, one
    final-vowel switch (-ie/-he -> -2, -hi/-ii -> -2, -i[ao] -> -2, else
    single final vowel strip)."""
    if len(t) < 6:
        return t
    s = "".join(_ES_FOLD.get(c, c) for c in t)  # same fold table
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last == "a":
        return s[:-2] if prev == "i" else s[:-1]
    if last == "o":
        return s[:-2] if prev == "i" else s[:-1]
    return s


# -- Portuguese ---------------------------------------------------------------

_PT_FOLD = {
    "à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ç": "c",
}


def _pt_remove_suffix(s: str) -> str:
    if len(s) > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if len(s) > 3 and s.endswith("ns"):
        return s[:-2] + "m"  # bons -> bom
    if len(s) > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"  # amáveis -> amável (pre-fold)
    if len(s) > 4 and s.endswith("ais"):
        return s[:-3] + "al"
    if len(s) > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if len(s) > 4 and s.endswith("is"):
        return s[:-1] + "l"  # -is -> -il
    if len(s) > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if len(s) > 6 and s.endswith("mente"):
        return s[:-5]
    if len(s) > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    if len(s) > 7 and (
        s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")
    ):
        return s[:-1] + "o"
    if len(s) > 6:
        if s[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(t: str) -> str:
    """PortugueseLightStemmer.cs Stem: len<4 pass-through, RemoveSuffix,
    NormFeminine (final -a only), final e/a/o strip (len>4), accent fold
    LAST (so the suffix table sees the accented forms)."""
    if len(t) < 4:
        return t
    s = _pt_remove_suffix(t)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return "".join(_PT_FOLD.get(c, c) for c in s)


# -- Norwegian (BOKMAAL — NorwegianLightStemFilter's default flag) -----------


def norwegian_light_stem(t: str) -> str:
    """NorwegianLightStemmer.cs Stem with useBokmaal=true, useNynorsk=false
    (the NorwegianLightStemFilter default): possessive -s, then ONE ending
    from the cascade (each branch returns)."""
    s = t
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("heter") or s.endswith("heten")):
        return s[:-5]
    if n > 5 and (s.endswith("dom") or s.endswith("het")):
        return s[:-3]
    if n > 7 and (s.endswith("elser") or s.endswith("elsen")):
        return s[:-5]
    if n > 6 and s[-4:] in ("ende", "else", "este", "eren"):
        return s[:-4]
    if n > 5 and s[-3:] in ("ere", "est", "ene"):
        return s[:-3]
    if n > 4 and s[-2:] in ("er", "en", "et", "st", "te"):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


# -- Finnish ------------------------------------------------------------------

_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(s: str) -> str:
    while len(s) > 8 and (s.endswith("kin") or s.endswith("ko")):
        s = s[:-3] if s.endswith("kin") else s[:-2]
    if len(s) > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _fi_step2(s: str) -> str:
    if len(s) > 5:
        if s[-3:] in ("lla", "tse", "sti"):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s[-4:] in ("neen", "niin", "seen", "teen", "inen"):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _FI_VOWELS and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
            return s[:-3]
    if n > 5:
        if s[-2:] in ("na", "ne"):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s[-2:] in ("ja", "ta"):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _FI_VOWELS:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _fi_norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"
    if len(s) > 4 and (s.endswith("ei") or s.endswith("at")):
        return s[:-2]
    if len(s) > 3 and s[-1] in "tsjeai":
        return s[:-1]
    return s


def _fi_norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            s = "".join(out)
    return s


def finnish_light_stem(t: str) -> str:
    """FinnishLightStemmer.cs Stem: len<4 pass-through, ä/å->a ö->o fold,
    then Step1 (kin/ko particle loop + -dellinen/-dellisuus), Step2,
    Step3 (case endings), Norm1 (hde->ksi + tail strip), Norm2 (final
    vowel strips + k/p/t duplicate collapse)."""
    if len(t) < 4:
        return t
    s = t.replace("ä", "a").replace("å", "a").replace("ö", "o")
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(s)))))


# -- Hungarian ----------------------------------------------------------------

_HU_VOWELS = frozenset("aeiouy")

# vowel fold table from the reference's Stem() switch (á→a, ë/é→e, í→i,
# ó/ő/õ/ö→o, ú/ű/ũ/û/ü→u)
_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")


def _hu_case(s: str) -> str:
    """HungarianLightStemmer.cs RemoveCase: longest case suffixes first,
    with the double-consonant 'al/el' and trailing t/n/a/e rules."""
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s[-3:] in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                      "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
            return s[:-3]
        if s[-2:] in ("al", "el") and s[-3] not in _HU_VOWELS and s[-3] == s[-4]:
            return s[:-3]
    if n > 4:
        if s[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                      "be", "ul", "ig"):
            return s[:-2]
        if s[-2:] in ("on", "en") and s[-3] not in _HU_VOWELS:
            return s[:-2]
        c = s[-1]
        if c in "tn":
            return s[:-1]
        if c in "ae" and s[-2] == s[-3] and s[-2] not in _HU_VOWELS:
            return s[:-2]
    return s


def _hu_possessive(s: str) -> str:
    """HungarianLightStemmer.cs RemovePossessive."""
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWELS and s[-4:] in ("atok", "otok", "etek"):
            return s[:-4]
        if s[-4:] in ("itek", "itok"):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWELS and s[-3:] in ("unk", "tok", "tek"):
            return s[:-3]
        if s[-4] in _HU_VOWELS and s[-3:] == "juk":
            return s[:-3]
        if s[-3:] == "ink":
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWELS and s[-2:] in ("am", "em", "om", "ad",
                                                  "ed", "od", "uk"):
            return s[:-2]
        if s[-3] in _HU_VOWELS and s[-2:] in ("nk", "ja", "je"):
            return s[:-2]
        if s[-2:] in ("im", "id", "ik"):
            return s[:-2]
    if n > 3:
        c = s[-1]
        if c in "ae" and s[-2] not in _HU_VOWELS:
            return s[:-1]
        if c in "md" and s[-2] in _HU_VOWELS:
            return s[:-1]
        if c == "i":
            return s[:-1]
    return s


def _hu_plural(s: str) -> str:
    """HungarianLightStemmer.cs RemovePlural: -k with a/o/e link vowel."""
    n = len(s)
    if n > 3 and s[-1] == "k":
        if s[-2] in "aoe" and n > 4:
            return s[:-2]
        return s[:-1]
    return s


def hungarian_light_stem(token: str) -> str:
    """HungarianLightStemmer.cs Stem (UniNE light algorithm, Savoy:
    'Light Stemming Approaches for the French, Portuguese, German and
    Hungarian Languages'): vowel fold, then RemoveCase → RemovePossessive
    → RemovePlural → final-vowel Normalize."""
    s = token.translate(_HU_FOLD)
    s = _hu_plural(_hu_possessive(_hu_case(s)))
    if len(s) > 3 and s[-1] in "aeio":
        return s[:-1]
    return s


# -- Russian (light) -----------------------------------------------------------

_RU_3SUF = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
            "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2SUF = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
            "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
            "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def _ru_case(s: str) -> str:
    """RussianLightStemmer.cs RemoveCase (Dolamic & Savoy, 'Indexing and
    Searching Strategies for the Russian Language')."""
    n = len(s)
    if n > 6 and s[-4:] in ("иями", "оями"):
        return s[:-4]
    if n > 5 and s[-3:] in _RU_3SUF:
        return s[:-3]
    if n > 4 and s[-2:] in _RU_2SUF:
        return s[:-2]
    if n > 3 and s[-1] in "аеиоуйыяь":
        return s[:-1]
    return s


def russian_light_stem(token: str) -> str:
    """RussianLightStemmer.cs Stem: RemoveCase then Normalize (drop final
    ь/и; collapse double н)."""
    s = _ru_case(token)
    if len(s) > 3:
        if s[-1] in "ьи":
            return s[:-1]
        if s[-1] == "н" and s[-2] == "н":
            return s[:-1]
    return s


# -- Czech ---------------------------------------------------------------------

_CZ_3SUF = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
            "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
            "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2SUF = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
            "mi", "ou")


def _cz_case(s: str) -> str:
    """CzechStemmer.cs RemoveCase."""
    n = len(s)
    if n > 7 and s.endswith("atech"):
        return s[:-5]
    if n > 6 and s[-4:] in ("ětem", "etem", "atům"):
        return s[:-4]
    if n > 5 and s[-3:] in _CZ_3SUF:
        return s[:-3]
    if n > 4 and s[-2:] in _CZ_2SUF:
        return s[:-2]
    if n > 3 and s[-1] in "aeiouůyáéíýě":
        return s[:-1]
    return s


def czech_stem(token: str) -> str:
    """CzechStemmer.cs Stem (Dolamic & Savoy light stemmer for Czech):
    RemoveCase -> RemovePossessives (-ov/-in/-ův) -> Normalize (palatal
    rewrites čt->ck, št->sk, c/č->k, z/ž->h; e-insertion removal; ů->o)."""
    s = _cz_case(token)
    if len(s) > 5 and s[-2:] in ("ov", "in", "ův"):
        s = s[:-2]
    if not s:
        return s
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in "cč":
        return s[:-1] + "k"
    if s[-1] in "zž":
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


# -- Bulgarian -----------------------------------------------------------------


def _bg_article(s: str) -> str:
    """BulgarianStemmer.cs RemoveArticle (definite-article suffixes)."""
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:-3]
    if n > 5 and s[-2:] in ("ът", "то", "те", "та", "ия"):
        return s[:-2]
    if n > 4 and s.endswith("ят"):
        return s[:-2]
    return s


def _bg_plural(s: str) -> str:
    """BulgarianStemmer.cs RemovePlural (with the palatal rewrites:
    еве->й, ци->к, зи->г, еXи->яX, си->х)."""
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:-3]
        if s.endswith("ове"):
            return s[:-3]
        if s.endswith("еве"):
            return s[:-3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:-3]
        if s.endswith("та"):
            return s[:-2]
        if s.endswith("ци"):
            return s[:-2] + "к"
        if s.endswith("зи"):
            return s[:-2] + "г"
        if s[-3] == "е" and s[-1] == "и":
            return s[:-3] + "я" + s[-2]
    if n > 4:
        if s.endswith("си"):
            return s[:-2] + "х"
        if s.endswith("и"):
            return s[:-1]
    return s


def bulgarian_stem(token: str) -> str:
    """BulgarianStemmer.cs Stem (Savoy BUIR algorithm): <4 chars pass
    through; -ища early-returns; else article -> plural -> я/а-о-е strips
    under ONE length check -> ен->н -> ъN->N."""
    s = token
    if len(s) < 4:
        return s
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    s = _bg_plural(_bg_article(s))
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s[-1] in "аое":
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


# -- Latvian -------------------------------------------------------------------

# (affix, vowel count of the affix, fires palatalization) in the exact
# declaration order of LatvianStemmer.cs `affixes` — first match wins
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False), ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False), ("š", 0, False),
)
_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(s: str, removed: str) -> str:
    """LatvianStemmer.cs Unpalatalize: `removed` is the first character of
    the stripped affix (the reference reads it at s[len] — still in the
    buffer past the shortened length)."""
    if removed == "u":
        if s.endswith("kš"):
            return s[:-1] + "st"
        if s.endswith("ņņ"):
            return s[:-2] + "nn"
    if s[-2:] in ("pj", "bj", "mj", "vj"):
        return s[:-1]
    if s.endswith("šņ"):
        return s[:-2] + "sn"
    if s.endswith("žņ"):
        return s[:-2] + "zn"
    if s.endswith("šļ"):
        return s[:-2] + "sl"
    if s.endswith("žļ"):
        return s[:-2] + "zl"
    if s.endswith("ļņ"):
        return s[:-2] + "ln"
    if s.endswith("ļļ"):
        return s[:-2] + "ll"
    if s.endswith("č"):
        return s[:-1] + "c"
    if s.endswith("ļ"):
        return s[:-1] + "l"
    if s.endswith("ņ"):
        return s[:-1] + "n"
    return s


def latvian_stem(token: str) -> str:
    """LatvianStemmer.cs Stem (light version of Kreslins): the FIRST affix
    in declaration order with numVowels(whole token) > affix.vc and
    len >= len(affix)+3 is stripped; declension II/V/VI strips then run
    the unpalatalization rules."""
    nv = sum(1 for c in token if c in _LV_VOWELS)
    for af, vc, pal in _LV_AFFIXES:
        if nv > vc and len(token) >= len(af) + 3 and token.endswith(af):
            s = token[: -len(af)]
            return _lv_unpalatalize(s, af[0]) if pal else s
    return token


# -- Indonesian ----------------------------------------------------------------

_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64,
)
_ID_VOWELS = frozenset("aeiou")


def indonesian_stem(token: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer.cs Stem (Asian, Williams & Tahaghoghi): particle
    and possessive-pronoun strips, then derivational first-order prefix /
    suffix / second-order prefix with the reference's flag interactions
    (e.g. -kan blocked after ke-/peng-/pe- removal). numSyllables is the
    vowel count, decremented per removal; every rule gates on >2."""
    st = {"syl": sum(1 for c in token if c in _ID_VOWELS), "f": 0}

    def particle(s):
        if s.endswith(("kah", "lah", "pun")):
            st["syl"] -= 1
            return s[:-3]
        return s

    def possessive(s):
        if s.endswith(("ku", "mu")):
            st["syl"] -= 1
            return s[:-2]
        if s.endswith("nya"):
            st["syl"] -= 1
            return s[:-3]
        return s

    def first_prefix(s):
        rules = (
            ("meng", _ID_MENG, 4, None), ("meny", _ID_MENG, 4, "s"),
            ("men", _ID_MENG, 3, None), ("mem", _ID_MENG, 3, None),
            ("me", _ID_MENG, 2, None),
        )
        for pre, flag, cut, repl in rules:
            if s.startswith(pre):
                if repl is not None and not (len(s) > 4 and s[4] in _ID_VOWELS):
                    continue  # meny needs a vowel at [4] else falls to men
                st["f"] |= flag
                st["syl"] -= 1
                return (repl or "") + s[cut:]
        if s.startswith("peng"):
            st["f"] |= _ID_PENG
            st["syl"] -= 1
            return s[4:]
        if s.startswith("peny") and len(s) > 4 and s[4] in _ID_VOWELS:
            st["f"] |= _ID_PENG
            st["syl"] -= 1
            return "s" + s[4:]
        if s.startswith("peny"):
            st["f"] |= _ID_PENG
            st["syl"] -= 1
            return s[4:]
        if s.startswith("pen") and len(s) > 3 and s[3] in _ID_VOWELS:
            st["f"] |= _ID_PENG
            st["syl"] -= 1
            return "t" + s[3:]
        if s.startswith("pen"):
            st["f"] |= _ID_PENG
            st["syl"] -= 1
            return s[3:]
        if s.startswith("pem"):
            st["f"] |= _ID_PENG
            st["syl"] -= 1
            return s[3:]
        if s.startswith("di"):
            st["f"] |= _ID_DI
            st["syl"] -= 1
            return s[2:]
        if s.startswith("ter"):
            st["f"] |= _ID_TER
            st["syl"] -= 1
            return s[3:]
        if s.startswith("ke"):
            st["f"] |= _ID_KE
            st["syl"] -= 1
            return s[2:]
        return s

    def second_prefix(s):
        if s.startswith("ber"):
            st["f"] |= _ID_BER
            st["syl"] -= 1
            return s[3:]
        if s == "belajar":
            st["f"] |= _ID_BER
            st["syl"] -= 1
            return s[3:]
        if (s.startswith("be") and len(s) > 4
                and s[2] not in _ID_VOWELS and s[3] == "e" and s[4] == "r"):
            st["f"] |= _ID_BER
            st["syl"] -= 1
            return s[2:]
        if s.startswith("per"):
            st["syl"] -= 1
            return s[3:]
        if s == "pelajar":
            st["syl"] -= 1
            return s[3:]
        if s.startswith("pe"):
            st["f"] |= _ID_PE
            st["syl"] -= 1
            return s[2:]
        return s

    def suffix(s):
        if (s.endswith("kan")
                and not st["f"] & (_ID_KE | _ID_PENG | _ID_PE)):
            st["syl"] -= 1
            return s[:-3]
        if (s.endswith("an")
                and not st["f"] & (_ID_DI | _ID_MENG | _ID_TER)):
            st["syl"] -= 1
            return s[:-2]
        if (s.endswith("i") and not s.endswith("si")
                and not st["f"] & (_ID_BER | _ID_KE | _ID_PENG)):
            st["syl"] -= 1
            return s[:-1]
        return s

    s = token
    if st["syl"] > 2:
        s = particle(s)
    if st["syl"] > 2:
        s = possessive(s)
    if not stem_derivational:
        return s
    old = s
    if st["syl"] > 2:
        s = first_prefix(s)
    if s != old:  # a rule fired
        old = s
        if st["syl"] > 2:
            s = suffix(s)
        if s != old and st["syl"] > 2:
            s = second_prefix(s)
    else:
        if st["syl"] > 2:
            s = second_prefix(s)
        if st["syl"] > 2:
            s = suffix(s)
    return s


# -- Arabic --------------------------------------------------------------------

# ArabicNormalizer.cs Normalize: hamza-seated alefs -> bare alef, dotless
# yeh -> yeh, teh marbuta -> heh; tatweel + harakat deleted
_AR_NORM_MAP = str.maketrans(
    {"آ": "ا", "أ": "ا", "إ": "ا",
     "ى": "ي", "ة": "ه",
     "ـ": None, "ً": None, "ٌ": None, "ٍ": None,
     "َ": None, "ُ": None, "ِ": None, "ّ": None,
     "ْ": None}
)


def arabic_normalize(token: str) -> str:
    return token.translate(_AR_NORM_MAP)


# ArabicStemmer.cs Prefixes/Suffixes declaration order
_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_stem(token: str) -> str:
    """ArabicStemmer.cs Stem: strip the FIRST matching prefix (wa- needs
    len>=4, the rest len>=len+2), then strip EVERY matching suffix in
    declaration order cumulatively (each needs 2 chars left)."""
    s = token
    for p in _AR_PREFIXES:
        if s.startswith(p) and (
            len(s) >= 4 if len(p) == 1 else len(s) >= len(p) + 2
        ):
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[: -len(suf)]
    return s


def arabic_chain(token: str) -> str:
    """ArabicAnalyzer.cs chain tail: normalization then stem (stop filter
    runs BEFORE normalization — 'the stopword list is not normalized')."""
    return arabic_stem(arabic_normalize(token))


# -- Persian -------------------------------------------------------------------

# ArabicNormalizer + PersianNormalizer.cs composed in one simultaneous map
# (sound because neither normalizer consumes the other's outputs):
# farsi yeh / yeh barree -> yeh, keheh -> kaf, heh+hamza / heh goal -> heh,
# hamza-above deleted
_FA_NORM_MAP = str.maketrans(
    {"آ": "ا", "أ": "ا", "إ": "ا",
     "ى": "ي", "ة": "ه",
     "ـ": None, "ً": None, "ٌ": None, "ٍ": None,
     "َ": None, "ُ": None, "ِ": None, "ّ": None,
     "ْ": None,
     "ی": "ي", "ے": "ي", "ک": "ك",
     "ۀ": "ه", "ہ": "ه", "ٔ": None}
)


def persian_normalize(token: str) -> str:
    """PersianAnalyzer.cs chain: ArabicNormalizationFilter then
    PersianNormalizationFilter, BEFORE the stop filter ('the stopword list
    is normalized'). PersianCharFilter's ZWNJ->space happens for free:
    this engine's tokenizer already splits on ZWNJ."""
    return token.translate(_FA_NORM_MAP)


# -- Sorani Kurdish ------------------------------------------------------------


def sorani_normalize(token: str) -> str:
    """SoraniNormalizer.cs Normalize — exact index-loop port: yeh forms ->
    farsi yeh, kaf -> keheh, ZWNJ deleted (turning a preceding heh into ae),
    word-final heh -> ae, teh marbuta -> ae, heh doachashmee -> heh,
    word-initial reh / rreh-above -> rreh, harakat + tatweel + Unicode
    format chars deleted."""
    import unicodedata

    out = []
    n = len(token)
    for i, c in enumerate(token):
        if c in "يى":
            out.append("ی")
        elif c == "ك":
            out.append("ک")
        elif c == "‌":
            if out and out[-1] == "ه":
                out[-1] = "ە"
        elif c == "ه":
            # i == len-1 in the reference's scan == nothing follows in the
            # ORIGINAL buffer (right-side chars are not yet deleted there)
            out.append("ە" if i == n - 1 else c)
        elif c == "ة":
            out.append("ە")
        elif c == "ھ":
            out.append("ه")
        elif c == "ر":
            # i == 0 in the scan counts AFTER left-side deletions
            out.append("ڕ" if not out else c)
        elif c == "ڒ":
            out.append("ڕ")
        elif c in "ـًٌٍَُِّْ":
            pass
        elif unicodedata.category(c) == "Cf":
            pass
        else:
            out.append(c)
    return "".join(out)


def sorani_stem(token: str) -> str:
    """SoraniStemmer.cs Stem: postposition strip, possessive-pronoun strip,
    then the first matching ezafe/definite/plural/demonstrative suffix."""
    s = token
    if len(s) > 5 and s.endswith("دا"):            # -da
        s = s[:-2]
    elif len(s) > 4 and s.endswith("نا"):          # -na (strip 1!)
        s = s[:-1]
    elif len(s) > 6 and s.endswith("ەوە"):    # -ewe
        s = s[:-3]
    if len(s) > 6 and s[-3:] in ("مان", "یان",
                                 "تان"):
        s = s[:-3]
    n = len(s)
    if n > 6 and s.endswith("ێکی"):
        return s[:-3]
    if n > 7 and s.endswith("یەکی"):
        return s[:-4]
    if n > 5 and s.endswith("ێک"):
        return s[:-2]
    if n > 6 and s.endswith("یەک"):
        return s[:-3]
    if n > 6 and s.endswith("ەکە"):
        return s[:-3]
    if n > 5 and s.endswith("کە"):
        return s[:-2]
    if n > 7 and s.endswith("ەکان"):
        return s[:-4]
    if n > 6 and s.endswith("کان"):
        return s[:-3]
    if n > 7 and s.endswith("یانی"):
        return s[:-4]
    if n > 6 and s.endswith("انی"):
        return s[:-3]
    if n > 6 and s.endswith("یان"):
        return s[:-3]
    if n > 5 and s.endswith("ان"):
        return s[:-2]
    if n > 7 and s.endswith("یانە"):
        return s[:-4]
    if n > 6 and s.endswith("انە"):
        return s[:-3]
    if n > 5 and (s.endswith("ایە")
                  or s.endswith("ەیە")):
        return s[:-2]
    if n > 4 and s.endswith("ە"):
        return s[:-1]
    if n > 4 and s.endswith("ی"):
        return s[:-1]
    return s


# -- Galician (minimal) --------------------------------------------------------

# galician.rslp "Plural" step (GalicianMinimalStemmer.cs: RSLP-S, plural
# reduction only): (suffix, min stem len, replacement, whole-word exceptions)
# in declaration order — first match wins, one application
_GL_PLURAL_RULES = (
    ("ns", 1, "n", frozenset({"luns", "furatapóns", "furatapons"})),
    ("ós", 3, "ón", None),
    ("ões", 3, "ón", None),
    ("ães", 1, "ão", frozenset({"mães", "magalhães"})),
    ("ais", 2, "al", frozenset({"cais", "tais", "mais", "pais", "ademais"})),
    ("áis", 2, "al", frozenset({"cáis", "táis", "máis", "páis", "ademáis"})),
    ("éis", 2, "el", None),
    ("eis", 2, "el", None),
    ("óis", 2, "ol", frozenset({"escornabóis"})),
    ("ois", 2, "ol", frozenset({"escornabois"})),
    ("ís", 2, "il", frozenset({"país"})),
    ("is", 2, "il", frozenset({"menfis", "pais", "kinguis"})),
    ("les", 2, "l", frozenset({"ingles", "marselles", "montreales",
                               "senegales", "manizales", "móstoles",
                               "nápoles"})),
    ("res", 3, "r", frozenset({"petres", "henares", "cáceres", "baleares",
                               "linares", "londres", "mieres", "miraflores",
                               "mércores", "venres", "pires"})),
    ("ces", 2, "z", None),
    ("zes", 2, "z", None),
    ("ises", 3, "z", None),
    ("ás", 1, "al", frozenset({"más"})),
    ("ses", 2, "s", None),
    ("s", 2, "", frozenset({
        "barbadés", "barcelonés", "cantonés", "gabonés", "llanés",
        "medinés", "escocés", "escocês", "francês", "barcelonês",
        "cantonês", "macramés", "reves", "barcelones", "cantones",
        "gabones", "llanes", "magallanes", "medines", "escoces",
        "frances", "xoves", "martes", "aliás", "pires", "lápis", "cais",
        "mais", "mas", "menos", "férias", "pêsames", "crúcis", "país",
        "cangas", "atenas", "asturias", "canarias", "filipinas",
        "honduras", "molucas", "caldas", "mascareñas", "micenas",
        "covarrubias", "psoas", "óculos", "nupcias", "llanes"})),
)


def galician_minimal_stem(token: str) -> str:
    """GalicianMinimalStemmer.cs: apply the galician.rslp Plural step
    (min word size 3, step suffix 's'), first matching rule only."""
    if len(token) < 3 or not token.endswith("s"):
        return token
    for suf, mn, repl, exc in _GL_PLURAL_RULES:
        if (token.endswith(suf) and len(token) - len(suf) >= mn
                and (exc is None or token not in exc)):
            return token[: -len(suf)] + repl
    return token


# -- Greek ---------------------------------------------------------------------

# GreekLowerCaseFilter.cs applied AFTER generic str.lower(): final sigma ->
# sigma, tonos/dialytika vowels fold to the bare vowel, reserved U+03A2 ->
# final sigma (the filter's backwards-compat arm, NOT re-folded)
_EL_LOWER_MAP = str.maketrans(
    {"ς": "σ", "ά": "α", "έ": "ε", "ή": "η",
     "ί": "ι", "ϊ": "ι", "ΐ": "ι",
     "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
     "ό": "ο", "ώ": "ω", "΢": "ς"}
)


def greek_lowercase(token: str) -> str:
    """GreekLowerCaseFilter.cs on an already-lowercased token: for every
    uppercase char X the filter maps, greek(lower(X)) == greek(X), so the
    composition with the tokenizer's generic lowercase is exact."""
    return token.translate(_EL_LOWER_MAP)


_EL_VOWELS = frozenset("αεηιουω")
_EL_VOWELS_NO_Y = frozenset("αεηιοω")

_EL_EXC4 = frozenset({"θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"})
_EL_EXC6 = frozenset({
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"})
_EL_EXC7 = frozenset({"αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ",
                      "ουλ", "πεθ", "πικρ", "ποτ", "σιχ", "χ"})
_EL_EXC8A = frozenset({"τρ", "τσ"})
_EL_EXC8B = frozenset({
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"})
_EL_EXC9 = frozenset({"αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν",
                      "απλ", "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ",
                      "παγ", "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ",
                      "υ", "δ", "εμ", "θαρρ", "θ"})
_EL_EXC12A = frozenset({"π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"})
_EL_EXC12B = frozenset({"αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                        "προ", "νισ"})
_EL_EXC13 = frozenset({"διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"})
_EL_EXC14 = frozenset({
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
    "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
    "τσα"})
_EL_EXC15A = frozenset({
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"})
_EL_EXC15B = frozenset({"ψοφ", "ναυλοχ"})
_EL_EXC16 = frozenset({"ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                       "επταν"})
_EL_EXC17 = frozenset({"ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν",
                       "δυσχρ", "ευχρ", "κοινοχρ", "παλιμψ"})
_EL_EXC18 = frozenset({"ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ",
                       "εξων"})
_EL_EXC19 = frozenset({"παρασουσ", "φ", "χ", "ωριοπλ", "αζ",
                       "αλλοσουσ", "ασουσ"})


def _el_strip_table(s, table):
    """First matching (min-exclusive-len, suffixes, strip) row wins."""
    for mn, sufs, cut in table:
        if len(s) > mn and s.endswith(sufs):
            return s[: len(s) - cut], True
    return s, False


def greek_stem(token: str) -> str:  # noqa: C901
    """GreekStemmer.cs Stem (Ntais' rule set over GreekLowerCaseFilter
    output): 21 "short rules" with add-back exception sets, the Rule21
    "long list" only when no short rule fired, then the Rule22
    comparative/superlative strip. Operates on lowercased, accent-folded,
    final-sigma-folded text."""
    if len(token) < 4:
        return token
    s = token
    orig_len = len(s)
    # Rule0: irregular neuter strip table
    s, _ = _el_strip_table(s, (
        (9, ("καθεστωτοσ", "καθεστωτων"), 4),
        (8, ("γεγονοτοσ", "γεγονοτων"), 4),
        (8, ("καθεστωτα",), 3),
        (7, ("τατογιου", "τατογιων"), 4),
        (7, ("γεγονοτα",), 3),
        (7, ("καθεστωσ",), 2),
        (6, ("σκαγιου", "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ",
             "κρεατων", "περατοσ", "περατων", "τερατοσ", "τερατων"), 4),
        (6, ("τατογια",), 3),
        (6, ("γεγονοσ",), 2),
        (5, ("φαγιου", "φαγιων", "σογιου", "σογιων"), 4),
        (5, ("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα"), 3),
        (4, ("φαγια", "σογια", "φωτοσ", "φωτων"), 3),
        (4, ("κρεασ", "περασ", "τερασ"), 2),
        (3, ("φωτα",), 2),
        (2, ("φωσ",), 1),
    ))
    # Rule1
    if len(s) > 4 and s.endswith(("αδεσ", "αδων")):
        s = s[:-4]
        if not s.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                           "νταντ", "κυρ", "θει", "πεθερ")):
            s += "αδ"
    # Rule2
    if len(s) > 4 and s.endswith(("εδεσ", "εδων")):
        s = s[:-4]
        if s.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                       "μιλ")):
            s += "εδ"
    # Rule3
    if len(s) > 5 and s.endswith(("ουδεσ", "ουδων")):
        s = s[:-5]
        if s.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                       "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ",
                       "φε")):
            s += "ουδ"
    # Rule4
    if len(s) > 3 and s.endswith(("εωσ", "εων")):
        s = s[:-3]
        if s in _EL_EXC4:
            s += "ε"
    # Rule5
    if len(s) > 2 and s.endswith("ια"):
        s = s[:-2]
        if s and s[-1] in _EL_VOWELS:
            s += "ι"
    elif len(s) > 3 and s.endswith(("ιου", "ιων")):
        s = s[:-3]
        if s and s[-1] in _EL_VOWELS:
            s += "ι"
    # Rule6
    removed = False
    if len(s) > 3 and s.endswith(("ικα", "ικο")):
        s = s[:-3]
        removed = True
    elif len(s) > 4 and s.endswith(("ικου", "ικων")):
        s = s[:-4]
        removed = True
    if removed and ((s and s[-1] in _EL_VOWELS) or s in _EL_EXC6):
        s += "ικ"
    # Rule7
    if len(s) == 5 and s.endswith("αγαμε"):
        s = s[:-1]
    else:
        if len(s) > 7 and s.endswith("ηθηκαμε"):
            s = s[:-7]
        elif len(s) > 6 and s.endswith("ουσαμε"):
            s = s[:-6]
        elif len(s) > 5 and s.endswith(("αγαμε", "ησαμε", "ηκαμε")):
            s = s[:-5]
        if len(s) > 3 and s.endswith("αμε"):
            s = s[:-3]
            if s in _EL_EXC7:
                s += "αμ"
    # Rule8
    removed = False
    if len(s) > 8 and s.endswith("ιουντανε"):
        s = s[:-8]
        removed = True
    elif len(s) > 7 and s.endswith(("ιοντανε", "ουντανε", "ηθηκανε")):
        s = s[:-7]
        removed = True
    elif len(s) > 6 and s.endswith(("ιοτανε", "οντανε", "ουσανε")):
        s = s[:-6]
        removed = True
    elif len(s) > 5 and s.endswith(("αγανε", "ησανε", "οτανε", "ηκανε")):
        s = s[:-5]
        removed = True
    if removed and s in _EL_EXC8A:
        s += "αγαν"
    if len(s) > 3 and s.endswith("ανε"):
        s = s[:-3]
        if (s and s[-1] in _EL_VOWELS_NO_Y) or s in _EL_EXC8B:
            s += "αν"
    # Rule9
    if len(s) > 5 and s.endswith("ησετε"):
        s = s[:-5]
    if len(s) > 3 and s.endswith("ετε"):
        s = s[:-3]
        if (s in _EL_EXC9 or (s and s[-1] in _EL_VOWELS_NO_Y)
                or s.endswith(("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ",
                               "ενδ", "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ",
                               "ροθ", "σθ", "πυρ", "αιν", "συνδ", "συν",
                               "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                               "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ",
                               "ωφελ"))):
            s += "ετ"
    # Rule10
    if len(s) > 5 and s.endswith(("οντασ", "ωντασ")):
        s = s[:-5]
        if len(s) == 3 and s.endswith("αρχ"):
            s += "οντ"
        if s.endswith("κρε"):
            s += "ωντ"
    # Rule11
    if len(s) > 6 and s.endswith("ομαστε"):
        s = s[:-6]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    elif len(s) > 7 and s.endswith("ιομαστε"):
        s = s[:-7]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    # Rule12
    if len(s) > 5 and s.endswith("ιεστε"):
        s = s[:-5]
        if s in _EL_EXC12A:
            s += "ιεστ"
    if len(s) > 4 and s.endswith("εστε"):
        s = s[:-4]
        if s in _EL_EXC12B:
            s += "εστ"
    # Rule13
    if len(s) > 6 and s.endswith("ηθηκεσ"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("ηθηκα", "ηθηκε")):
        s = s[:-5]
    removed = False
    if len(s) > 4 and s.endswith("ηκεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ηκα", "ηκε")):
        s = s[:-3]
        removed = True
    if removed and (s in _EL_EXC13
                    or s.endswith(("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ",
                                   "πιθ"))):
        s += "ηκ"
    # Rule14
    removed = False
    if len(s) > 5 and s.endswith("ουσεσ"):
        s = s[:-5]
        removed = True
    elif len(s) > 4 and s.endswith(("ουσα", "ουσε")):
        s = s[:-4]
        removed = True
    if removed and (s in _EL_EXC14 or (s and s[-1] in _EL_VOWELS)
                    or s.endswith(("ποδαρ", "βλεπ", "πανταχ", "φρυδ",
                                   "μαντιλ", "μαλλ", "κυματ", "λαχ", "ληγ",
                                   "φαγ", "ομ", "πρωτ"))):
        s += "ουσ"
    # Rule15
    removed = False
    if len(s) > 4 and s.endswith("αγεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("αγα", "αγε")):
        s = s[:-3]
        removed = True
    if removed:
        cond1 = (s in _EL_EXC15A
                 or s.endswith(("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ",
                                "φρ", "πρ", "λοχ", "σμην")))
        cond2 = s in _EL_EXC15B or s.endswith("κολλ")
        if cond1 and not cond2:
            s += "αγ"
    # Rule16
    removed = False
    if len(s) > 4 and s.endswith("ησου"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ησε", "ησα")):
        s = s[:-3]
        removed = True
    if removed and s in _EL_EXC16:
        s += "ησ"
    # Rule17
    if len(s) > 4 and s.endswith("ηστε"):
        s = s[:-4]
        if s in _EL_EXC17:
            s += "ηστ"
    # Rule18
    removed = False
    if len(s) > 6 and s.endswith(("ησουνε", "ηθουνε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουνε"):
        s = s[:-4]
        removed = True
    if removed and s in _EL_EXC18:
        s += "ουν"
    # Rule19
    removed = False
    if len(s) > 6 and s.endswith(("ησουμε", "ηθουμε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουμε"):
        s = s[:-4]
        removed = True
    if removed and s in _EL_EXC19:
        s += "ουμ"
    # Rule20
    if len(s) > 5 and s.endswith(("ματων", "ματοσ")):
        s = s[:-3]
    elif len(s) > 4 and s.endswith("ματα"):
        s = s[:-2]
    # Rule21 — long list, only if NO short rule fired
    if len(s) == orig_len:
        s, fired = _el_strip_table(s, (
            (9, ("ιοντουσαν",), 9),
            (8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν"), 8),
            (7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
                 "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
                 "ουμαστε"), 7),
            (6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν",
                 "ομουνα", "οσαστε", "οσουνα", "ουνται", "ουνταν",
                 "ουσατε"), 6),
            (5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα",
                 "ηθεισ", "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν",
                 "ονται", "ονταν", "οσουν", "ουμαι", "ουσαν"), 5),
            (4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται",
                 "ηδεσ", "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ",
                 "ομαι", "οταν"), 4),
            (3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ"), 3),
            (2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου",
                 "υσ", "ων"), 2),
        ))
        if not fired and len(s) > 1 and s[-1] in _EL_VOWELS:
            s = s[:-1]
    # Rule22 — comparatives/superlatives (no length guard)
    if s.endswith(("εστερ", "εστατ")):
        return s[:-5]
    if s.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return s[:-4]
    return s


# -- Hindi (+ the shared Indic normalizer) -------------------------------------

# IndicNormalizer.cs decompositions: (ch1, ch2, ch3, res, script-flags) as
# offsets into each script's codepage; -1 = absent, 0xFF = ZWJ. Flags index
# into _INDIC_SCRIPTS below. Shared DATA with the SQL mirror.
_IN_DEV, _IN_BEN, _IN_GUR, _IN_GUJ, _IN_ORI = 1, 2, 4, 8, 16
_IN_TAM, _IN_TEL, _IN_KAN, _IN_MAL = 32, 64, 128, 256

_INDIC_SCRIPTS = (
    (_IN_DEV, 0x0900), (_IN_BEN, 0x0980), (_IN_GUR, 0x0A00),
    (_IN_GUJ, 0x0A80), (_IN_ORI, 0x0B00), (_IN_TAM, 0x0B80),
    (_IN_TEL, 0x0C00), (_IN_KAN, 0x0C80), (_IN_MAL, 0x0D00),
)

_INDIC_DECOMP = (
    (0x05, 0x3E, 0x45, 0x11, _IN_DEV | _IN_GUJ),
    (0x05, 0x3E, 0x46, 0x12, _IN_DEV),
    (0x05, 0x3E, 0x47, 0x13, _IN_DEV | _IN_GUJ),
    (0x05, 0x3E, 0x48, 0x14, _IN_DEV | _IN_GUJ),
    (0x05, 0x3E, -1, 0x06, _IN_DEV | _IN_BEN | _IN_GUR | _IN_GUJ | _IN_ORI),
    (0x05, 0x45, -1, 0x72, _IN_DEV),
    (0x05, 0x45, -1, 0x0D, _IN_GUJ),
    (0x05, 0x46, -1, 0x04, _IN_DEV),
    (0x05, 0x47, -1, 0x0F, _IN_GUJ),
    (0x05, 0x48, -1, 0x10, _IN_GUR | _IN_GUJ),
    (0x05, 0x49, -1, 0x11, _IN_DEV | _IN_GUJ),
    (0x05, 0x4A, -1, 0x12, _IN_DEV),
    (0x05, 0x4B, -1, 0x13, _IN_DEV | _IN_GUJ),
    (0x05, 0x4C, -1, 0x14, _IN_DEV | _IN_GUR | _IN_GUJ),
    (0x06, 0x45, -1, 0x11, _IN_DEV | _IN_GUJ),
    (0x06, 0x46, -1, 0x12, _IN_DEV),
    (0x06, 0x47, -1, 0x13, _IN_DEV | _IN_GUJ),
    (0x06, 0x48, -1, 0x14, _IN_DEV | _IN_GUJ),
    (0x07, 0x57, -1, 0x08, _IN_MAL),
    (0x09, 0x41, -1, 0x0A, _IN_DEV),
    (0x09, 0x57, -1, 0x0A, _IN_TAM | _IN_MAL),
    (0x0E, 0x46, -1, 0x10, _IN_MAL),
    (0x0F, 0x45, -1, 0x0D, _IN_DEV),
    (0x0F, 0x46, -1, 0x0E, _IN_DEV),
    (0x0F, 0x47, -1, 0x10, _IN_DEV),
    (0x0F, 0x57, -1, 0x10, _IN_ORI),
    (0x12, 0x3E, -1, 0x13, _IN_MAL),
    (0x12, 0x4C, -1, 0x14, _IN_TEL | _IN_KAN),
    (0x12, 0x55, -1, 0x13, _IN_TEL),
    (0x12, 0x57, -1, 0x14, _IN_TAM | _IN_MAL),
    (0x13, 0x57, -1, 0x14, _IN_ORI),
    (0x15, 0x3C, -1, 0x58, _IN_DEV),
    (0x16, 0x3C, -1, 0x59, _IN_DEV | _IN_GUR),
    (0x17, 0x3C, -1, 0x5A, _IN_DEV | _IN_GUR),
    (0x1C, 0x3C, -1, 0x5B, _IN_DEV | _IN_GUR),
    (0x21, 0x3C, -1, 0x5C, _IN_DEV | _IN_BEN | _IN_ORI),
    (0x22, 0x3C, -1, 0x5D, _IN_DEV | _IN_BEN | _IN_ORI),
    (0x23, 0x4D, 0xFF, 0x7A, _IN_MAL),
    (0x24, 0x4D, 0xFF, 0x4E, _IN_BEN),
    (0x28, 0x3C, -1, 0x29, _IN_DEV),
    (0x28, 0x4D, 0xFF, 0x7B, _IN_MAL),
    (0x2B, 0x3C, -1, 0x5E, _IN_DEV | _IN_GUR),
    (0x2F, 0x3C, -1, 0x5F, _IN_DEV | _IN_BEN),
    (0x2C, 0x41, 0x41, 0x0B, _IN_TEL),
    (0x30, 0x3C, -1, 0x31, _IN_DEV),
    (0x30, 0x4D, 0xFF, 0x7C, _IN_MAL),
    (0x32, 0x4D, 0xFF, 0x7D, _IN_MAL),
    (0x33, 0x3C, -1, 0x34, _IN_DEV),
    (0x33, 0x4D, 0xFF, 0x7E, _IN_MAL),
    (0x35, 0x41, -1, 0x2E, _IN_TEL),
    (0x3E, 0x45, -1, 0x49, _IN_DEV | _IN_GUJ),
    (0x3E, 0x46, -1, 0x4A, _IN_DEV),
    (0x3E, 0x47, -1, 0x4B, _IN_DEV | _IN_GUJ),
    (0x3E, 0x48, -1, 0x4C, _IN_DEV | _IN_GUJ),
    (0x3F, 0x55, -1, 0x40, _IN_KAN),
    (0x41, 0x41, -1, 0x42, _IN_GUR),
    (0x46, 0x3E, -1, 0x4A, _IN_TAM | _IN_MAL),
    (0x46, 0x42, 0x55, 0x4B, _IN_KAN),
    (0x46, 0x42, -1, 0x4A, _IN_KAN),
    (0x46, 0x46, -1, 0x48, _IN_MAL),
    (0x46, 0x55, -1, 0x47, _IN_TEL | _IN_KAN),
    (0x46, 0x56, -1, 0x48, _IN_TEL | _IN_KAN),
    (0x46, 0x57, -1, 0x4C, _IN_TAM | _IN_MAL),
    (0x47, 0x3E, -1, 0x4B, _IN_BEN | _IN_ORI | _IN_TAM | _IN_MAL),
    (0x47, 0x57, -1, 0x4C, _IN_BEN | _IN_ORI),
    (0x4A, 0x55, -1, 0x4B, _IN_KAN),
    (0x72, 0x3F, -1, 0x07, _IN_GUR),
    (0x72, 0x40, -1, 0x08, _IN_GUR),
    (0x72, 0x47, -1, 0x0F, _IN_GUR),
    (0x73, 0x41, -1, 0x09, _IN_GUR),
    (0x73, 0x42, -1, 0x0A, _IN_GUR),
    (0x73, 0x4B, -1, 0x13, _IN_GUR),
)


def _indic_script(c: str):
    cp = ord(c)
    for flag, base in _INDIC_SCRIPTS:
        if base <= cp < base + 0x80:
            return flag, base
    return 0, 0


def indic_normalize(token: str) -> str:
    """IndicNormalizer.cs Normalize: left-to-right scan; at each position
    in a known Indic block whose offset appears in the decomposition
    table, compose the FIRST matching (2- or 3-char, same-script, ZWJ
    allowed third) row and delete the consumed chars; the scan continues
    after the composed char."""
    s = list(token)
    i = 0
    while i < len(s):
        flag, base = _indic_script(s[i])
        if flag:
            ch0 = ord(s[i]) - base
            if i + 1 < len(s):
                f1, _ = _indic_script(s[i + 1])
                if f1 == flag:
                    ch1 = ord(s[i + 1]) - base
                    ch2 = -1
                    if i + 2 < len(s):
                        if s[i + 2] == "‍":
                            ch2 = 0xFF
                        else:
                            f2, _ = _indic_script(s[i + 2])
                            if f2 == flag:
                                ch2 = ord(s[i + 2]) - base
                    for c0, c1, c2, res, flags in _INDIC_DECOMP:
                        if (c0 == ch0 and flags & flag and c1 == ch1
                                and (c2 < 0 or c2 == ch2)):
                            s[i] = chr(base + res)
                            del s[i + 1]
                            if c2 >= 0:
                                del s[i + 1]
                            break
        i += 1
    return "".join(s)


# HindiNormalizer.cs: dead n -> bindu first (two-char), then the per-char
# folds/deletions (nukta forms, candrabindu, ZWJ/ZWNJ/virama, chandra and
# long->short vowels)
_HI_NORM_MAP = str.maketrans(
    {"ँ": "ं",
     "़": None, "‍": None, "‌": None, "्": None,
     "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
     "क़": "क", "ख़": "ख", "ग़": "ग",
     "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
     "फ़": "फ", "य़": "य",
     "ॅ": "े", "ॆ": "े",
     "ॉ": "ो", "ॊ": "ो",
     "ऍ": "ए", "ऎ": "ए",
     "ऑ": "ओ", "ऒ": "ओ",
     "ॲ": "अ", "आ": "अ", "ई": "इ",
     "ऊ": "उ", "ॠ": "ऋ", "ॡ": "ऌ",
     "ऐ": "ए", "औ": "ओ",
     "ी": "ि", "ू": "ु", "ॄ": "ृ",
     "ॣ": "ॢ", "ै": "े", "ौ": "ो"}
)


def hindi_normalize(token: str) -> str:
    """HindiNormalizer.cs: the dead-n (न + virama -> anusvara) two-char
    rule, then the per-char fold table. The global replace equals the
    reference's scan: a virama consumed by dead-n is gone before the
    standalone-virama deletion arm would see it."""
    return token.replace("न्", "ं").translate(_HI_NORM_MAP)


def hindi_chain_pre(token: str) -> str:
    """HindiAnalyzer.cs pre-stop tail: IndicNormalizationFilter then
    HindiNormalizationFilter (the stop list holds normalized forms)."""
    return hindi_normalize(indic_normalize(token))


_HI_SUF = (
    (6, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां"), 5),
    (5, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां"), 4),
    (4, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं"), 3),
    (3, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
         "ता", "ाँ", "ां", "ों", "ें"), 2),
    (2, ("ो", "े", "ू", "ु", "ी", "ि", "ा"), 1),
)


def hindi_stem(token: str) -> str:
    """HindiStemmer.cs (Ramanathan & Rao lightweight stemmer): longest of
    the five suffix tiers, each with a strict length guard."""
    for mn, sufs, cut in _HI_SUF:
        if len(token) > mn and token.endswith(sufs):
            return token[:-cut]
    return token


# -- Brazilian Portuguese ------------------------------------------------------

_BR_VOWELS = frozenset("aeiou")

_BR_FOLD = str.maketrans(
    {"á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e", "í": "i",
     "ó": "o", "ô": "o", "õ": "o", "ú": "u", "ü": "u", "ç": "c",
     "ñ": "n"}
)

_BR_EDGE = set("\"'-,;.?!")

# BrazilianStemmer.cs Step1 rows in declaration order:
# (suffix, region, replacement|None, min CT length guard, preceded|None,
#  assign) — assign=False is the reference's unassigned-"logias" quirk
# (the rule fires and reports altered but leaves CT unchanged)
_BR_STEP1 = (
    ("uciones", "r2", "u", 0, None, True),
    ("imentos", "r2", None, 6, None, True),
    ("amentos", "r2", None, 6, None, True),
    ("adores", "r2", None, 6, None, True),
    ("adoras", "r2", None, 6, None, True),
    ("logias", "r2", "log", 6, None, False),
    ("encias", "r2", "ente", 6, None, True),
    ("amente", "r1", None, 6, None, True),
    ("idades", "r2", None, 6, None, True),
    ("acoes", "r2", None, 5, None, True),
    ("imento", "r2", None, 5, None, True),
    ("amento", "r2", None, 5, None, True),
    ("adora", "r2", None, 5, None, True),
    ("ismos", "r2", None, 5, None, True),
    ("istas", "r2", None, 5, None, True),
    ("logia", "r2", "log", 5, None, True),
    ("ucion", "r2", "u", 5, None, True),
    ("encia", "r2", "ente", 5, None, True),
    ("mente", "r2", None, 5, None, True),
    ("idade", "r2", None, 5, None, True),
    ("acao", "r2", None, 4, None, True),
    ("ezas", "r2", None, 4, None, True),
    ("icos", "r2", None, 4, None, True),
    ("icas", "r2", None, 4, None, True),
    ("ismo", "r2", None, 4, None, True),
    ("avel", "r2", None, 4, None, True),
    ("ivel", "r2", None, 4, None, True),
    ("ista", "r2", None, 4, None, True),
    ("osos", "r2", None, 4, None, True),
    ("osas", "r2", None, 4, None, True),
    ("ador", "r2", None, 4, None, True),
    ("ivas", "r2", None, 4, None, True),
    ("ivos", "r2", None, 4, None, True),
    ("iras", "rv", "ir", 4, "e", True),
    ("eza", "r2", None, 3, None, True),
    ("ico", "r2", None, 3, None, True),
    ("ica", "r2", None, 3, None, True),
    ("oso", "r2", None, 3, None, True),
    ("osa", "r2", None, 3, None, True),
    ("iva", "r2", None, 3, None, True),
    ("ivo", "r2", None, 3, None, True),
    ("ira", "rv", "ir", 3, "e", True),
)

# BrazilianStemmer.cs Step2 verb-suffix tiers: (min RV length, suffixes)
# in declaration order — all suffixes within a tier share one length
_BR_STEP2 = (
    (7, ("issemos", "essemos", "assemos", "ariamos", "eriamos",
         "iriamos")),
    (6, ("iremos", "eremos", "aremos", "avamos", "iramos", "eramos",
         "aramos", "asseis", "esseis", "isseis", "arieis", "erieis",
         "irieis")),
    (5, ("irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
         "asses", "esses", "isses", "astes", "assem", "essem", "issem",
         "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
         "erias", "irias", "estes", "istes", "aveis")),
    (4, ("aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
         "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
         "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
         "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
         "eres", "ires", "ados", "idos", "amos", "emos", "imos", "ieis")),
    (3, ("ada", "ida", "ara", "era", "ira", "iam", "ado", "ido", "ias",
         "ais", "eis", "ear")),
    (2, ("ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
         "eu", "iu", "ou")),
)


def _br_r1(v: str | None) -> str | None:
    """BrazilianStemmer.cs GetR1 — exact loop port (the scans run over
    [0, len-1), so the last char can never be the region boundary)."""
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and v[j] not in _BR_VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and v[j] in _BR_VOWELS:
        j += 1
    if not j < i:
        return None
    return v[j + 1:]


def _br_rv(v: str | None) -> str | None:
    """BrazilianStemmer.cs GetRV — exact three-branch port."""
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _BR_VOWELS:
        j = 2
        while j < i and v[j] not in _BR_VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _BR_VOWELS and v[1] in _BR_VOWELS:
        j = 2
        while j < i and v[j] in _BR_VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


def _br_ct(term: str) -> str:
    ct = term.lower().translate(_BR_FOLD)
    if len(ct) >= 2 and ct[0] in _BR_EDGE:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _BR_EDGE:
        ct = ct[:-1]
    return ct


def _br_remove(ct: str, suf: str) -> str:
    return ct[: -len(suf)] if ct.endswith(suf) else ct


def brazilian_stem(token: str) -> str:
    """BrazilianStemmer.cs Stem via BrazilianStemFilter.cs semantics: CT
    (folded changed term) with the five steps; non-indexable terms
    (len <= 2 or >= 30 after folding) keep the ORIGINAL token, terms with
    non-letter chars return CT unstemmed. R1/R2/RV are frozen from the
    pre-stemming CT — later steps test the ORIGINAL regions while CT
    shrinks, and removals stay conditional on the CURRENT CT suffix."""
    ct = _br_ct(token)
    if not (2 < len(ct) < 30):
        return token
    if not all(c.isalpha() for c in ct):
        return ct
    r1 = _br_r1(ct)
    r2 = _br_r1(r1)
    rv = _br_rv(ct)

    def sfx(v, s):
        return v is not None and v.endswith(s)

    # Step 1 — standard suffixes
    altered = False
    for suf, region, repl, guard, preceded, assign in _BR_STEP1:
        if guard and len(ct) < guard:
            continue
        reg = {"r1": r1, "r2": r2, "rv": rv}[region]
        if not (ct.endswith(suf) and sfx(reg, suf)):
            continue
        if preceded and not ct[: -len(suf)].endswith(preceded):
            continue
        if assign:
            ct = ct[: -len(suf)] + (repl or "")
        altered = True
        break
    # Step 2 — verb suffixes in RV
    if not altered and rv is not None:
        for mn, sufs in _BR_STEP2:
            if len(rv) < mn:
                continue
            hit = next((s for s in sufs if rv.endswith(s)), None)
            if hit:
                ct = _br_remove(ct, hit)
                altered = True
                break
    if altered:
        # Step 3
        if rv is not None and rv.endswith("i") and rv[:-1].endswith("c"):
            ct = _br_remove(ct, "i")
    else:
        # Step 4 — residual suffix
        if rv is not None:
            for s in ("os", "a", "i", "o"):
                if rv.endswith(s):
                    ct = _br_remove(ct, s)
                    break
    # Step 5
    if rv is not None and rv.endswith("e"):
        if rv[:-1].endswith("gu"):
            ct = _br_remove(ct, "e")
            ct = _br_remove(ct, "u")
        elif rv[:-1].endswith("ci"):
            ct = _br_remove(ct, "e")
            ct = _br_remove(ct, "i")
        else:
            ct = _br_remove(ct, "e")
    return ct
