"""Turkish analyzer slot: TurkishAnalyzer.cs chain (ApostropheFilter ->
TurkishLowerCaseFilter -> stop -> SnowballFilter(TurkishStemmer)).

Casing: TurkishLowerCaseFilter.cs maps I-dotted forms before the generic
lowercase (İ -> i; I followed by combining dots above -> i with the dots
removed; bare I -> ı). Both rewrites are case-level, so they run as a
CHAR FILTER on the whole text ahead of the tokenizer (like Persian's
ZWNJ filter) — every mapped char stays a letter, so token boundaries are
unchanged, and the later generic lower() agrees with Turkish-culture
lowercasing on everything that remains. Documented divergence: the
reference skips intervening non-spacing marks when looking for the
combining dot (TurkishLowerCaseFilter.cs IsBeforeDot); this filter only
collapses directly-adjacent dots — interleavings like I+accent+dot keep
the accent order but classify the I as bare. The 2:1 I+dot collapse also
shifts offsets right of it by one (the reference edits the token buffer
after offsets are fixed).

ApostropheFilter.cs truncates the token at the FIRST ' or ’ (keeping the
prefix); truncation is case-independent, so running it after the generic
lowercase is equivalent to the reference order.

Stemmer: the full snowball TurkishStemmer (Tartarus/Snowball/Ext/
TurkishStemmer.cs, generated from turkish.sbl by Evren Kapusuz Çilden),
re-derived as pure-string functions. Faithfulness notes, verified
against the generated cursor machine:
 - SnowballFilter.cs:102 IGNORES Stem()'s return value and always takes
   the buffer, so every early `return false` in Stem() merely SKIPS the
   later stages (they never revert prior deletions): <2 vowels -> token
   unchanged; the continue_stemming flag unset (nominal-verb lAr branch)
   -> noun suffixes AND postlude skipped; reserved buffer ("ad"/"soyad")
   -> postlude's appends skipped.
 - check_vowel_harmony: the LAST vowel left of the cursor picks a partner
   set; harmony holds iff some partner char occurs anywhere further left
   (snowball `goto` skips non-partner vowels — per the program, not
   grammar-book harmony).
 - the optional-consonant/U helpers consume the optional char in their
   first branch and consume NOTHING in the second (which requires the
   char TWO before the cursor to pass the vowel test).
 - a failed stem_suffix_chain_before_ki call performs no deletions
   (every failing path exits before its first delete), but failing
   ALTERNATIVES inside the drivers leak their completed deletions into
   later alternatives (snowball restores only the cursor) — transcribed
   where it occurs (noun branches 2c, 6, 9; chain branches).
 - all recursion sites are in tail position with string-only effects, so
   stem_suffix_chain_before_ki is a pure function s -> s' | failure, and
   the nda-branch retains its matched tail: chain(s[:c]) + s[c:].
"""

from __future__ import annotations

import re

_TR_VOWELS = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
# g_vowel1..g_vowel6 partner sets keyed by the last vowel (g_vowel3 ı,
# g_vowel4 i, g_vowel5 o/u, g_vowel6 ö/ü)
_TR_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"),
    "ı": frozenset("aı"), "i": frozenset("ei"),
    "o": frozenset("ou"), "ö": frozenset("öü"),
    "u": frozenset("ou"), "ü": frozenset("öü"),
}

def _longest_first(*words: str) -> tuple:
    return tuple(sorted(words, key=lambda w: (-len(w), w)))

A0_POSS = _longest_first(
    "mız", "miz", "muz", "müz", "nız", "niz", "nuz", "nüz", "m", "n")
A1_LARI = ("leri", "ları")
A2_NU = ("ni", "nu", "nü", "nı")
A3_NUN = ("in", "un", "ün", "ın")
A4_YA = ("a", "e")
A5_NA = ("na", "ne")
A6_DA = ("da", "ta", "de", "te")
A7_NDA = ("nda", "nde")
A8_DAN = ("dan", "tan", "den", "ten")
A9_NDAN = ("ndan", "nden")
A10_YLA = ("la", "le")
A11_NCA = ("ca", "ce")
A12_YUM = ("im", "um", "üm", "ım")
A13_SUN = ("sin", "sun", "sün", "sın")
A14_YUZ = ("iz", "uz", "üz", "ız")
A15_SUNUZ = ("siniz", "sunuz", "sünüz", "sınız")
A16_LAR = ("lar", "ler")
A17_NUZ = ("niz", "nuz", "nüz", "nız")
A18_DUR = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
A19_CASINA = ("casına", "cesine")
A20_YDU = _longest_first(
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım", "din", "tin",
    "dun", "tun", "dün", "tün", "dın", "tın", "du", "tu", "dü", "tü",
    "dı", "tı")
A21_YSA = _longest_first("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
A22_YMUS = ("miş", "muş", "müş", "mış")


def _harmony(s: str, c: int) -> bool:
    i = c - 1
    while i >= 0 and s[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    partners = _TR_HARMONY[s[i]]
    j = i - 1
    while j >= 0 and s[j] not in partners:
        j -= 1
    return j >= 0


def _among(s: str, c: int, sufs: tuple):
    head = s[:c]
    for suf in sufs:
        if head.endswith(suf):
            return c - len(suf)
    return None


def _opt_cons(s: str, c, ch: str):
    """mark_suffix_with_optional_{n,s,y}_consonant at cursor c."""
    if c is None:
        return None
    if c >= 1 and s[c - 1] == ch:
        if c >= 2 and s[c - 2] in _TR_VOWELS:
            return c - 1
        return None
    if c >= 2 and s[c - 2] in _TR_VOWELS:
        return c
    return None


def _opt_U(s: str, c):
    if c is None:
        return None
    if c >= 1 and s[c - 1] in _TR_U:
        if c >= 2 and s[c - 2] not in _TR_VOWELS:
            return c - 1
        return None
    if c >= 2 and s[c - 2] not in _TR_VOWELS:
        return c
    return None


# -- mark routines: (s, cursor) -> new cursor | None ---------------------------

def _mk_possessives(s, c):
    return _opt_U(s, _among(s, c, A0_POSS))


def _mk_sU(s, c):
    if not _harmony(s, c):
        return None
    if c >= 1 and s[c - 1] in _TR_U:
        return _opt_cons(s, c - 1, "s")
    return None


def _mk_lArI(s, c):
    return _among(s, c, A1_LARI)


def _mk_yU(s, c):
    if not _harmony(s, c):
        return None
    if c >= 1 and s[c - 1] in _TR_U:
        return _opt_cons(s, c - 1, "y")
    return None


def _harmony_among(s, c, sufs):
    if not _harmony(s, c):
        return None
    return _among(s, c, sufs)


def _mk_nU(s, c):
    return _harmony_among(s, c, A2_NU)


def _mk_nUn(s, c):
    return _opt_cons(s, _harmony_among(s, c, A3_NUN), "n")


def _mk_yA(s, c):
    return _opt_cons(s, _harmony_among(s, c, A4_YA), "y")


def _mk_nA(s, c):
    return _harmony_among(s, c, A5_NA)


def _mk_DA(s, c):
    return _harmony_among(s, c, A6_DA)


def _mk_ndA(s, c):
    return _harmony_among(s, c, A7_NDA)


def _mk_DAn(s, c):
    return _harmony_among(s, c, A8_DAN)


def _mk_ndAn(s, c):
    return _harmony_among(s, c, A9_NDAN)


def _mk_ylA(s, c):
    return _opt_cons(s, _harmony_among(s, c, A10_YLA), "y")


def _mk_ki(s, c):
    return c - 2 if s[:c].endswith("ki") else None


def _mk_ncA(s, c):
    return _opt_cons(s, _harmony_among(s, c, A11_NCA), "n")


def _mk_yUm(s, c):
    return _opt_cons(s, _harmony_among(s, c, A12_YUM), "y")


def _mk_sUn(s, c):
    return _harmony_among(s, c, A13_SUN)


def _mk_yUz(s, c):
    return _opt_cons(s, _harmony_among(s, c, A14_YUZ), "y")


def _mk_sUnUz(s, c):
    return _among(s, c, A15_SUNUZ)


def _mk_lAr(s, c):
    return _harmony_among(s, c, A16_LAR)


def _mk_nUz(s, c):
    return _harmony_among(s, c, A17_NUZ)


def _mk_DUr(s, c):
    return _harmony_among(s, c, A18_DUR)


def _mk_cAsInA(s, c):
    return _among(s, c, A19_CASINA)


def _mk_yDU(s, c):
    return _opt_cons(s, _harmony_among(s, c, A20_YDU), "y")


def _mk_ysA(s, c):
    # no harmony check (turkish.sbl line 297)
    return _opt_cons(s, _among(s, c, A21_YSA), "y")


def _mk_ymUs(s, c):
    return _opt_cons(s, _harmony_among(s, c, A22_YMUS), "y")


def _mk_yken(s, c):
    if s[:c].endswith("ken"):
        return _opt_cons(s, c - 3, "y")
    return None


# -- drivers -------------------------------------------------------------------

def _nominal_verb(s: str):
    """stem_nominal_verb_suffixes: (s', continue_stemming_noun_suffixes)."""
    n = len(s)
    # 1: (ymUs_ | yDU | ysA | yken) ] delete
    for mk in (_mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken):
        c = mk(s, n)
        if c is not None:
            return s[:c], True
    # 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_ ] delete
    c = _mk_cAsInA(s, n)
    if c is not None:
        base = c
        for mk in (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz):
            m = mk(s, c)
            if m is not None:
                base = m
                break
        m = _mk_ymUs(s, base)
        if m is not None:
            return s[:m], True
    # 3: lAr ] delete try([ DUr|yDU|ysA|ymUs_) ] delete; unset flag
    c = _mk_lAr(s, n)
    if c is not None:
        s = s[:c]
        cc = len(s)
        for mk in (_mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs):
            m = mk(s, cc)
            if m is not None:
                cc = m
                break
        return s[:cc], False
    # 4: nUz (yDU | ysA) ] delete
    c = _mk_nUz(s, n)
    if c is not None:
        m = _mk_yDU(s, c)
        if m is None:
            m = _mk_ysA(s, c)
        if m is not None:
            return s[:m], True
    # 5: (sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_) ] delete
    for mk in (_mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm):
        c = mk(s, n)
        if c is not None:
            s = s[:c]
            m = _mk_ymUs(s, len(s))
            return (s[:m] if m is not None else s), True
    # 6: DUr ] delete try([ (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_) ] delete
    c = _mk_DUr(s, n)
    if c is not None:
        s = s[:c]
        base = len(s)
        for mk in (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz):
            m = mk(s, base)
            if m is not None:
                base = m
                break
        m = _mk_ymUs(s, base)
        if m is not None:
            return s[:m], True
        return s, True
    return s, True


def _chain_ki(s: str):
    """stem_suffix_chain_before_ki: rewritten string, or None on failure
    (a failing call performs no deletions)."""
    c1 = _mk_ki(s, len(s))
    if c1 is None:
        return None
    # A: DA ] delete try( lAr ] delete try(chain)
    #                   | possessives ] delete try([ lAr ] delete chain) )
    c2 = _mk_DA(s, c1)
    if c2 is not None:
        s2 = s[:c2]
        c3 = _mk_lAr(s2, len(s2))
        if c3 is not None:
            s3 = s2[:c3]
            r = _chain_ki(s3)
            return r if r is not None else s3
        c3 = _mk_possessives(s2, len(s2))
        if c3 is not None:
            s3 = s2[:c3]
            c4 = _mk_lAr(s3, len(s3))
            if c4 is not None:
                s4 = s3[:c4]
                r = _chain_ki(s4)
                return r if r is not None else s4
            return s3
        return s2
    # B: nUn ] delete try( lArI ] delete
    #                    | [(poss|sU)] delete try([ lAr ] delete chain)
    #                    | chain )
    c2 = _mk_nUn(s, c1)
    if c2 is not None:
        s2 = s[:c2]
        c3 = _mk_lArI(s2, len(s2))
        if c3 is not None:
            return s2[:c3]
        c3 = _mk_possessives(s2, len(s2))
        if c3 is None:
            c3 = _mk_sU(s2, len(s2))
        if c3 is not None:
            s3 = s2[:c3]
            c4 = _mk_lAr(s3, len(s3))
            if c4 is not None:
                s4 = s3[:c4]
                r = _chain_ki(s4)
                return r if r is not None else s4
            return s3
        r = _chain_ki(s2)
        return r if r is not None else s2
    # C: ndA ( lArI ] delete | sU ] delete try([ lAr ] delete chain)
    #        | chain )  — the matched nda+ki tail survives the recursion
    c2 = _mk_ndA(s, c1)
    if c2 is not None:
        c3 = _mk_lArI(s, c2)
        if c3 is not None:
            return s[:c3]
        c3 = _mk_sU(s, c2)
        if c3 is not None:
            s2 = s[:c3]
            c4 = _mk_lAr(s2, len(s2))
            if c4 is not None:
                s3 = s2[:c4]
                r = _chain_ki(s3)
                return r if r is not None else s3
            return s2
        r = _chain_ki(s[:c2])
        if r is not None:
            return r + s[c2:]
        return None
    return None


def _noun_suffixes(s: str) -> str:
    """stem_noun_suffixes (do-wrapped by Stem: failure keeps s)."""
    n = len(s)
    # 1: lAr ] delete try(chain)
    c = _mk_lAr(s, n)
    if c is not None:
        s2 = s[:c]
        r = _chain_ki(s2)
        return r if r is not None else s2
    # 2: ncA ] delete try( lArI ] delete
    #                    | [(poss|sU)] delete try([ lAr ] delete chain)
    #                    | [ lAr ] delete chain )   (2c leaks its delete)
    c = _mk_ncA(s, n)
    if c is not None:
        s2 = s[:c]
        c2 = _mk_lArI(s2, len(s2))
        if c2 is not None:
            return s2[:c2]
        c2 = _mk_possessives(s2, len(s2))
        if c2 is None:
            c2 = _mk_sU(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            c3 = _mk_lAr(s3, len(s3))
            if c3 is not None:
                s4 = s3[:c3]
                r = _chain_ki(s4)
                return r if r is not None else s4
            return s3
        c2 = _mk_lAr(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            r = _chain_ki(s3)
            return r if r is not None else s3
        return s2
    # 3: (ndA|nA) ( lArI ] delete | sU ] delete try([ lAr ] delete chain)
    #             | chain-at-cursor )  — all-fail falls through to 4
    c = _mk_ndA(s, n)
    if c is None:
        c = _mk_nA(s, n)
    if c is not None:
        c2 = _mk_lArI(s, c)
        if c2 is not None:
            return s[:c2]
        c2 = _mk_sU(s, c)
        if c2 is not None:
            s2 = s[:c2]
            c3 = _mk_lAr(s2, len(s2))
            if c3 is not None:
                s3 = s2[:c3]
                r = _chain_ki(s3)
                return r if r is not None else s3
            return s2
        r = _chain_ki(s[:c])
        if r is not None:
            return r + s[c:]
    # 4: (ndAn|nU) ( sU ] delete try([ lAr ] delete chain) | lArI ] delete )
    c = _mk_ndAn(s, n)
    if c is None:
        c = _mk_nU(s, n)
    if c is not None:
        c2 = _mk_sU(s, c)
        if c2 is not None:
            s2 = s[:c2]
            c3 = _mk_lAr(s2, len(s2))
            if c3 is not None:
                s3 = s2[:c3]
                r = _chain_ki(s3)
                return r if r is not None else s3
            return s2
        c2 = _mk_lArI(s, c)
        if c2 is not None:
            return s[:c2]
    # 5: DAn ] delete try( [poss] delete try([ lAr ] delete chain)
    #                    | [lAr] delete try(chain) | chain )
    c = _mk_DAn(s, n)
    if c is not None:
        s2 = s[:c]
        c2 = _mk_possessives(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            c3 = _mk_lAr(s3, len(s3))
            if c3 is not None:
                s4 = s3[:c3]
                r = _chain_ki(s4)
                return r if r is not None else s4
            return s3
        c2 = _mk_lAr(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            r = _chain_ki(s3)
            return r if r is not None else s3
        r = _chain_ki(s2)
        return r if r is not None else s2
    # 6: (nUn|ylA) ] delete try( [lAr] delete chain (fail leaks into 6b)
    #                          | [(poss|sU)] delete try([ lAr ] delete chain)
    #                          | chain )
    c = _mk_nUn(s, n)
    if c is None:
        c = _mk_ylA(s, n)
    if c is not None:
        s2 = s[:c]
        c2 = _mk_lAr(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            r = _chain_ki(s3)
            if r is not None:
                return r
            s2 = s3  # 6a's lAr delete sticks; 6b continues on it
        c2 = _mk_possessives(s2, len(s2))
        if c2 is None:
            c2 = _mk_sU(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            c3 = _mk_lAr(s3, len(s3))
            if c3 is not None:
                s4 = s3[:c3]
                r = _chain_ki(s4)
                return r if r is not None else s4
            return s3
        r = _chain_ki(s2)
        return r if r is not None else s2
    # 7: lArI ] delete
    c = _mk_lArI(s, n)
    if c is not None:
        return s[:c]
    # 8: chain at the word end
    r = _chain_ki(s)
    if r is not None:
        return r
    # 9: (DA|yU|yA) ] delete try( ( [poss] delete try([ lAr ) | [ lAr )
    #                             ] delete [ chain-REQUIRED )
    c = _mk_DA(s, n)
    if c is None:
        c = _mk_yU(s, n)
    if c is None:
        c = _mk_yA(s, n)
    if c is not None:
        s2 = s[:c]
        c2 = _mk_possessives(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            c3 = _mk_lAr(s3, len(s3))
            s4 = s3[:c3] if c3 is not None else s3
            r = _chain_ki(s4)
            return r if r is not None else s4
        c2 = _mk_lAr(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            r = _chain_ki(s3)
            return r if r is not None else s3
        return s2
    # 10: (poss|sU) ] delete try([ lAr ] delete chain) — REQUIRED
    c = _mk_possessives(s, n)
    if c is None:
        c = _mk_sU(s, n)
    if c is not None:
        s2 = s[:c]
        c2 = _mk_lAr(s2, len(s2))
        if c2 is not None:
            s3 = s2[:c2]
            r = _chain_ki(s3)
            return r if r is not None else s3
        return s2
    return s


_TR_LAST = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish_stem(token: str) -> str:
    """Snowball Turkish (TurkishStemmer.cs Stem + SnowballFilter's
    ignore-the-return-value contract — see module docstring)."""
    s = token
    if sum(ch in _TR_VOWELS for ch in s) < 2:
        return s
    s, cont = _nominal_verb(s)
    if not cont:
        return s
    s = _noun_suffixes(s)
    # postlude: is_reserved_word gates the whole postlude
    if s in ("ad", "soyad"):
        return s
    # append_U_to_stems_ending_with_d_or_g (keyed on the LAST vowel)
    if s.endswith(("d", "g")):
        i = len(s) - 1
        while i >= 0 and s[i] not in _TR_VOWELS:
            i -= 1
        if i >= 0:
            v = s[i]
            if v in "aı":
                s += "ı"
            elif v in "ei":
                s += "i"
            elif v in "ou":
                s += "u"
            else:
                s += "ü"
    # post_process_last_consonants
    if s and s[-1] in _TR_LAST:
        s = s[:-1] + _TR_LAST[s[-1]]
    return s


_I_DOTS = re.compile("İ+")


def turkish_fold(text: str) -> str:
    """TurkishLowerCaseFilter's pre-lowercase rewrites at the text level:
    İ -> i, I + combining-dots-above -> i (dots removed), bare I -> ı.
    After this fold, generic lower() equals Turkish-culture lowercasing."""
    if "İ" in text:
        text = text.replace("İ", "i")
    if "I" in text:
        text = _I_DOTS.sub("i", text).replace("I", "ı")
    return text


def apostrophe_truncate(token: str) -> str:
    """ApostropheFilter.cs: keep the text before the FIRST ' or ’."""
    for i, ch in enumerate(token):
        if ch in ("'", "’"):
            return token[:i]
    return token
