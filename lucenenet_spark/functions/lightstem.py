"""UniNE light stemmers — the "german" and "swedish" analyzer slots.

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
  -s strip, then one cascade of definite/plural/comparative suffixes.

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
