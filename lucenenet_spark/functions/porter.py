"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980), matching the behavior of the reference's
PorterStemFilter (Lucene.Net.Analysis.Common/Analysis/En/PorterStemFilter.cs,
tests Lucene.Net.Tests.Analysis.Common/Analysis/En/TestPorterStemFilter.cs).
Implemented from the published algorithm, including the two departures the
canonical reference implementation documents and Lucene adopts:
BLI -> BLE in step 2, and LOGI -> LOG.

Words of length <= 2 are returned unchanged (the reference implementation's
`k <= k0+1` early exit). Tokens are expected lowercase (the stem filter
runs after LowerCaseFilter).
"""
from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]."""
    n = 0
    i = 0
    ln = len(w)
    # skip initial consonant run
    while i < ln and _is_cons(w, i):
        i += 1
    while i < ln:
        # vowel run
        while i < ln and not _is_cons(w, i):
            i += 1
        if i >= ln:
            break
        n += 1
        while i < ln and _is_cons(w, i):
            i += 1
    return n


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            return w[:-1]
        return w
    flag = False
    if w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            return w + "e"
        if _ends_double_cons(w) and w[-1] not in "lsz":
            return w[:-1]
        if _measure(w) == 1 and _ends_cvc(w):
            return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"),  # departure: paper has abli -> able
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),  # departure
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _step2(w: str) -> str:
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                return stem + rep
            return w
    return w


def _step3(w: str) -> str:
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                return stem + rep
            return w
    return w


def _step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                return stem
            return w
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if w.endswith("ll") and _measure(w) > 1:
        return w[:-1]
    return w


_CACHE: dict[str, str] = {}


def porter_stem(word: str) -> str:
    """Stem one lowercase token. Memoized (vocabularies are tiny relative
    to token streams — the same amortization the simhash UDF uses)."""
    out = _CACHE.get(word)
    if out is None:
        if len(word) <= 2:
            out = word
        else:
            # non-letter chars (digits, joined punctuation) classify as
            # consonants, exactly like the reference stemmer's char tests
            w = _step1a(word)
            w = _step1b(w)
            w = _step1c(w)
            w = _step2(w)
            w = _step3(w)
            w = _step4(w)
            w = _step5b(_step5a(w))
            out = w
        if len(_CACHE) < 1_000_000:  # bound task memory
            _CACHE[word] = out
    return out
