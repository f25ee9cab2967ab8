"""Phonetic encoders + PhoneticFilter semantics
(Lucene.Net.Analysis.Phonetic — the commons-codec Language encoders).

Implemented encoders (all re-derived from their published algorithms and
verified against the reference's own TestPhoneticFilter vectors):

  * Soundex (Language/Soundex.cs, US_ENGLISH): Clean keeps letters only,
    uppercases; code = first letter + up to 3 digits from the mapping
    "01230120022455012623010202", vowels ('0') dropped, adjacent repeats
    collapsed, H/W skipped entirely (the default specialCaseHW=true —
    neighbors compare ACROSS them), zero-padded to 4.
  * RefinedSoundex (Language/RefinedSoundex.cs): mapping
    "01360240043788015936020505"; first letter + EVERY char's code
    including vowels' '0', adjacent repeats collapsed, no length cap.
  * Caverphone 2.0 (Language/Caverphone2.cs): the exact 50-step ordered
    regex rewrite cascade, then pad with ten '1's and take 10.

A non-ASCII letter makes Soundex/RefinedSoundex throw in the reference
(Map's index check); PhoneticFilter catches and passes the original token
through. Here the encoders return None for that case and the stream
applies the same pass-through.

PhoneticFilter (PhoneticFilter.cs): per token, encode; on failure, empty
code, or code == original, emit the original only. inject=false replaces
the token; inject=true emits the PHONETIC at the original's position
increment and then the original at increment 0 — both occupy the same
position (stream order: phonetic first), which is exactly what
phonetic_stream returns as (term, position) pairs.
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_SOUNDEX_MAP = "01230120022455012623010202"
_REFINED_MAP = "01360240043788015936020505"


def _clean(token: str) -> str | None:
    """SoundexUtils.Clean + the Map index check: keep letters, uppercase;
    None when a kept letter is outside A-Z (the reference throws there)."""
    letters = [ch for ch in token if ch.isalpha()]
    if any(not ("a" <= ch <= "z" or "A" <= ch <= "Z") for ch in letters):
        return None
    return "".join(letters).upper()


def soundex(token: str) -> str | None:
    s = _clean(token)
    if s is None:
        return None
    if not s:
        return ""
    out = [s[0]]
    last = _SOUNDEX_MAP[ord(s[0]) - 65]
    for ch in s[1:]:
        if len(out) == 4:
            break
        if ch in ("H", "W"):  # ignored completely, last unchanged
            continue
        d = _SOUNDEX_MAP[ord(ch) - 65]
        if d != "0" and d != last:
            out.append(d)
        last = d
    return ("".join(out) + "000")[:4]


def refined_soundex(token: str) -> str | None:
    s = _clean(token)
    if s is None:
        return None
    if not s:
        return ""
    out = [s[0]]
    last = None
    for ch in s:
        cur = _REFINED_MAP[ord(ch) - 65]
        if cur == last:
            continue
        out.append(cur)  # vowels' '0' codes ARE appended (only repeats drop)
        last = cur
    return "".join(out)


_CAVERPHONE2_RULES = [
    (re.compile(p), r)
    for p, r in [
        ("[^a-z]", ""),
        ("e$", ""),
        ("^cough", "cou2f"),
        ("^rough", "rou2f"),
        ("^tough", "tou2f"),
        ("^enough", "enou2f"),
        ("^trough", "trou2f"),
        ("^gn", "2n"),
        ("mb$", "m2"),
        ("cq", "2q"),
        ("ci", "si"),
        ("ce", "se"),
        ("cy", "sy"),
        ("tch", "2ch"),
        ("c", "k"),
        ("q", "k"),
        ("x", "k"),
        ("v", "f"),
        ("dg", "2g"),
        ("tio", "sio"),
        ("tia", "sia"),
        ("d", "t"),
        ("ph", "fh"),
        ("b", "p"),
        ("sh", "s2"),
        ("z", "s"),
        ("^[aeiou]", "A"),
        ("[aeiou]", "3"),
        ("j", "y"),
        ("^y3", "Y3"),
        ("^y", "A"),
        ("y", "3"),
        ("3gh3", "3kh3"),
        ("gh", "22"),
        ("g", "k"),
        ("s+", "S"),
        ("t+", "T"),
        ("p+", "P"),
        ("k+", "K"),
        ("f+", "F"),
        ("m+", "M"),
        ("n+", "N"),
        ("w3", "W3"),
        ("wh3", "Wh3"),
        ("w$", "3"),
        ("w", "2"),
        ("^h", "A"),
        ("h", "2"),
        ("r3", "R3"),
        ("r$", "3"),
        ("r", "2"),
        ("l3", "L3"),
        ("l$", "3"),
        ("l", "2"),
        ("2", ""),
        ("3$", "A"),
        ("3", ""),
    ]
]

_TEN_1 = "1111111111"


def caverphone2(token: str) -> str:
    txt = token.lower()
    for rx, rep in _CAVERPHONE2_RULES:
        txt = rx.sub(rep, txt)
    return (txt + _TEN_1)[:10]


_CAVERPHONE1_RULES = [
    (re.compile(p), r)
    for p, r in [
        ("[^a-z]", ""),
        ("^cough", "cou2f"),
        ("^rough", "rou2f"),
        ("^tough", "tou2f"),
        ("^enough", "enou2f"),
        ("^gn", "2n"),
        ("mb$", "m2"),
        ("cq", "2q"),
        ("ci", "si"),
        ("ce", "se"),
        ("cy", "sy"),
        ("tch", "2ch"),
        ("c", "k"),
        ("q", "k"),
        ("x", "k"),
        ("v", "f"),
        ("dg", "2g"),
        ("tio", "sio"),
        ("tia", "sia"),
        ("d", "t"),
        ("ph", "fh"),
        ("b", "p"),
        ("sh", "s2"),
        ("z", "s"),
        ("^[aeiou]", "A"),
        ("[aeiou]", "3"),
        ("3gh3", "3kh3"),
        ("gh", "22"),
        ("g", "k"),
        ("s+", "S"),
        ("t+", "T"),
        ("p+", "P"),
        ("k+", "K"),
        ("f+", "F"),
        ("m+", "M"),
        ("n+", "N"),
        ("w3", "W3"),
        ("wy", "Wy"),
        ("wh3", "Wh3"),
        ("why", "Why"),
        ("w", "2"),
        ("^h", "A"),
        ("h", "2"),
        ("r3", "R3"),
        ("ry", "Ry"),
        ("r", "2"),
        ("l3", "L3"),
        ("ly", "Ly"),
        ("l", "2"),
        ("j", "y"),
        ("y3", "Y3"),
        ("y", "2"),
        ("2", ""),
        ("3", ""),
    ]
]

_SIX_1 = "111111"


def caverphone1(token: str) -> str:
    """Caverphone 1.0 (Language/Caverphone1.cs): the original rule list —
    no final-e strip, wy/why/ry/ly vowel-like rules, 6-char code."""
    txt = token.lower()
    for rx, rep in _CAVERPHONE1_RULES:
        txt = rx.sub(rep, txt)
    return (txt + _SIX_1)[:6]


_NYSIIS_VOWELS = set("AEIOU")
_NYSIIS_PRE = [
    (re.compile("^MAC"), "MCC"),
    (re.compile("^KN"), "NN"),
    (re.compile("^K"), "C"),
    (re.compile("^(PH|PF)"), "FF"),
    (re.compile("^SCH"), "SSS"),
    (re.compile("(EE|IE)$"), "Y"),
    (re.compile("(DT|RT|RD|NT|ND)$"), "D"),
]


def _nysiis_transcode(prev: str, curr: str, nxt: str, anext: str) -> str:
    """TranscodeRemaining (Nysiis.cs:143-211) over the 4-char window."""
    if curr == "E" and nxt == "V":
        return "AF"
    if curr in _NYSIIS_VOWELS:
        return "A"
    if curr == "Q":
        return "G"
    if curr == "Z":
        return "S"
    if curr == "M":
        return "N"
    if curr == "K":
        return "NN" if nxt == "N" else "C"
    if curr == "S" and nxt == "C" and anext == "H":
        return "SSS"
    if curr == "P" and nxt == "H":
        return "FF"
    if curr == "H" and (prev not in _NYSIIS_VOWELS or nxt not in _NYSIIS_VOWELS):
        return prev
    if curr == "W" and prev in _NYSIIS_VOWELS:
        return prev
    return curr


def nysiis(token: str, strict: bool = True) -> str | None:
    """NYSIIS (Language/Nysiis.cs): prefix/suffix transcodes, then the
    sliding MUTATING window — TranscodeRemaining's output is copied back
    INTO the char array at position i, so later windows see rewritten
    text — append-if-different, S/AY/A tail trims, strict = 6-char cap."""
    s = _clean(token)
    if s is None:
        return None
    if not s:
        return ""
    for rx, rep in _NYSIIS_PRE:
        s = rx.sub(rep, s, count=1)
    chars = list(s)
    n = len(chars)
    key = [chars[0]]
    for i in range(1, n):
        nxt = chars[i + 1] if i < n - 1 else " "
        anext = chars[i + 2] if i < n - 2 else " "
        t = _nysiis_transcode(chars[i - 1], chars[i], nxt, anext)
        for j, ch in enumerate(t):
            chars[i + j] = ch
        if chars[i] != chars[i - 1]:
            key.append(chars[i])
    if len(key) > 1:
        last = key[-1]
        if last == "S":
            key.pop()
            last = key[-1]
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            del key[-2]
        if last == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out


_MET_VOWELS = "AEIOU"
_MET_FRONTV = "EIY"
_MET_VARSON = "CSPTG"


def metaphone(token: str, max_code_len: int = 4) -> str:
    """Original Metaphone (Language/Metaphone.cs GetMetaphone): initial
    two-char exceptions (KN/GN/PN/AE/WR drop the first char, WH -> W,
    X -> S), then the symbol switch over the fixed working string with
    duplicate letters (except C) skipped; D in DGE/DGI/DGY consumes three
    chars. No Clean step — non-letters hit the default arm and encode
    nothing; a single-char input returns itself uppercased."""
    if not token:
        return ""
    if len(token) == 1:
        return token.upper()
    up = token.upper()
    a, b = up[0], up[1]
    if a in "KGP" and b == "N":
        local = up[1:]
    elif a == "A" and b == "E":
        local = up[1:]
    elif a == "W" and b == "R":
        local = up[1:]
    elif a == "W" and b == "H":
        local = "W" + up[2:]
    elif a == "X":
        local = "S" + up[1:]
    else:
        local = up
    wdsz = len(local)
    code: list[str] = []
    n = 0
    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and n > 0 and local[n - 1] == symb:
            n += 1
            continue
        nxt = local[n + 1] if n + 1 < wdsz else ""
        if symb in _MET_VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (n > 0 and local[n - 1] == "M" and n + 1 == wdsz):
                code.append("B")
        elif symb == "C":
            if n > 0 and local[n - 1] == "S" and nxt in _MET_FRONTV:
                pass  # SCI/SCE/SCY: discard
            elif local[n:n + 3] == "CIA":
                code.append("X")
            elif nxt in _MET_FRONTV and nxt:
                code.append("S")  # CI, CE, CY
            elif n > 0 and local[n - 1] == "S" and nxt == "H":
                code.append("K")  # SCH
            elif nxt == "H":
                if n == 0 and wdsz >= 3 and local[2] in _MET_VOWELS:
                    code.append("K")  # CH + consonant cluster head
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if n + 2 < wdsz and nxt == "G" and local[n + 2] in _MET_FRONTV:
                code.append("J")
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            if n + 2 == wdsz and nxt == "H":
                pass  # GH silent at end
            elif n + 2 < wdsz and nxt == "H" and local[n + 2] not in _MET_VOWELS:
                pass  # GH before consonant
            elif n > 0 and (
                local[n:n + 2] == "GN" or local[n:n + 4] == "GNED"
            ):
                pass  # silent G in GN / GNED
            else:
                if nxt in _MET_FRONTV and nxt:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if n + 1 == wdsz:
                pass  # terminal H
            elif n > 0 and local[n - 1] in _MET_VARSON:
                pass
            elif nxt in _MET_VOWELS:
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if not (n > 0 and local[n - 1] == "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if nxt == "H" else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if (
                local[n:n + 2] == "SH"
                or local[n:n + 3] == "SIO"
                or local[n:n + 3] == "SIA"
            ):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if local[n:n + 3] == "TIA" or local[n:n + 3] == "TIO":
                code.append("X")
            elif local[n:n + 3] == "TCH":
                pass
            elif local[n:n + 2] == "TH":
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if nxt in _MET_VOWELS and nxt:
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        # default: non-letters encode nothing
        n += 1
        del code[max_code_len:]
    return "".join(code)


_COLOGNE_PRE = {"Ä": "A", "Ü": "U", "Ö": "O", "ß": "S"}


def cologne_phonetic(token: str) -> str:
    """Kölner Phonetik (Language/ColognePhonetic.cs GetColognePhonetic):
    German-tuned code digits with a consumable input buffer — the X rule
    pushes an 'S' back onto the input (AddLeft). The append condition is
    the reference's exact boolean: a '0' repeats only at word start
    (lastCode '/'), '-' never emits, and leading non-letters are consumed
    silently (the lastCode == '/' continue)."""
    text = "".join(_COLOGNE_PRE.get(c, c) for c in token.upper())
    inp = list(text)
    out: list[str] = []
    last_chr, last_code = "-", "/"
    while inp:
        chr_ = inp.pop(0)
        nxt = inp[0] if inp else "-"
        if chr_ in "AEIJOUY":
            code = "0"
        elif chr_ == "H" or chr_ < "A" or chr_ > "Z":
            if last_code == "/":
                continue
            code = "-"
        elif chr_ == "B" or (chr_ == "P" and nxt != "H"):
            code = "1"
        elif chr_ in "DT" and nxt not in "SCZ":
            code = "2"
        elif chr_ in "WFPV":
            code = "3"
        elif chr_ in "GKQ":
            code = "4"
        elif chr_ == "X" and last_chr not in "CKQ":
            code = "4"
            inp.insert(0, "S")
        elif chr_ in "SZ":
            code = "8"
        elif chr_ == "C":
            if last_code == "/":
                code = "4" if nxt in "AHKLOQRUX" else "8"
            else:
                if last_chr in "SZ" or nxt not in "AHOUKQX":
                    code = "8"
                else:
                    code = "4"
        elif chr_ in "TDX":
            code = "8"
        elif chr_ == "R":
            code = "7"
        elif chr_ == "L":
            code = "5"
        elif chr_ in "MN":
            code = "6"
        else:
            code = chr_
        if code != "-" and (
            (last_code != code and (code != "0" or last_code == "/"))
            or code < "0"
            or code > "8"
        ):
            out.append(code)
        last_chr, last_code = chr_, code
    return "".join(out)


_MRA_PLAIN = (
    "AaEeIiOoUu" "AaEeIiOoUuYy" "AaEeIiOoUuYy" "AaOoNn"
    "AaEeIiOoUuYy" "Aa" "Cc" "OoUu"
)
_MRA_UNI = (
    "ÀàÈèÌìÒòÙù"
    "ÁáÉéÍíÓóÚúÝý"
    "ÂâÊêÎîÔôÛûŶŷ"
    "ÃãÕõÑñ"
    "ÄäËëÏïÖöÜüŸÿ"
    "Åå" "Çç" "ŐőŰű"
)
_MRA_ACCENTS = dict(zip(_MRA_UNI, _MRA_PLAIN))
_MRA_DC = [c + c for c in "BCDFGHJKLMNPQRSTVWXYZ"]
_MRA_NAME_CHARS = re.compile(r"\-|[&]|\'|\.|[\,]")
_MRA_WS = re.compile(r"\s+")
_MRA_VOWEL = re.compile("A|E|I|O|U")
_MRA_VOWEL_WS = re.compile(r"\s{2,}\b")


def _mra_clean(name: str) -> str:
    up = _MRA_NAME_CHARS.sub("", name.upper())
    up = "".join(_MRA_ACCENTS.get(c, c) for c in up)
    return _MRA_WS.sub("", up)


def _mra_devowel_dedouble_f3l3(name: str) -> str:
    first = name[0]  # empty cleaned name raises, like the reference
    nv = _MRA_VOWEL.sub("", name)
    nv = _MRA_VOWEL_WS.sub(" ", nv)
    if first in "AEIOU":
        nv = first + nv
    s = nv.upper()
    for dc in _MRA_DC:
        s = s.replace(dc, dc[0])
    return s[:3] + s[-3:] if len(s) > 6 else s


def match_rating_encode(token: str) -> str | None:
    """Match Rating Approach encode (Language/
    MatchRatingApproachEncoder.cs Encode): trivial inputs (empty/space/
    1-char) encode to '' ; clean -> devowel (leading vowel kept) ->
    double-consonant collapse -> first-3 + last-3. A cleaned-empty name
    raises in the reference (Substring on empty) — None here, so the
    filter passes the original through."""
    if not token or token == " " or len(token) == 1:
        return ""
    name = _mra_clean(token)
    if not name:
        return None
    return _mra_devowel_dedouble_f3l3(name)


def match_rating_equals(name1: str, name2: str) -> bool:
    """IsEncodeEquals: the actual MRA similarity verdict — length-gated,
    minimum rating from the summed code lengths, LtR-then-RtL identical
    character elimination, 6 - longest leftover."""
    if not name1 or name1 == " " or not name2 or name2 == " ":
        return False
    if len(name1) == 1 or len(name2) == 1:
        return False
    if name1.upper() == name2.upper():
        return True
    c1 = _mra_devowel_dedouble_f3l3(_mra_clean(name1))
    c2 = _mra_devowel_dedouble_f3l3(_mra_clean(name2))
    if abs(len(c1) - len(c2)) >= 3:
        return False
    sum_len = abs(len(c1) + len(c2))
    if sum_len <= 4:
        min_rating = 5
    elif sum_len <= 7:
        min_rating = 4
    elif sum_len <= 11:
        min_rating = 3
    elif sum_len == 12:
        min_rating = 2
    else:
        min_rating = 1
    a, b = list(c1), list(c2)
    n1, n2 = len(c1) - 1, len(c2) - 1
    for i in range(len(c1)):
        if i > n2:
            break
        if c1[i] == c2[i]:
            a[i] = " "
            b[i] = " "
        if c1[n1 - i] == c2[n2 - i]:
            a[n1 - i] = " "
            b[n2 - i] = " "
    sa = _MRA_WS.sub("", "".join(a))
    sb = _MRA_WS.sub("", "".join(b))
    count = abs(6 - max(len(sa), len(sb)))
    return count >= min_rating


def _daitch_mokotoff_encode(token: str) -> str:
    from .dmsoundex import daitch_mokotoff_encode

    return daitch_mokotoff_encode(token)


ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "caverphone2": caverphone2,
    "nysiis": nysiis,
    "metaphone": metaphone,
    "cologne": cologne_phonetic,
    "match_rating": match_rating_encode,
    "caverphone1": caverphone1,
    # non-branching Encode(); the branching soundex() lives in dmsoundex
    "daitch_mokotoff": _daitch_mokotoff_encode,
}


def phonetic_stream(
    tokens: list[str], positions: list[int], encoder: str, inject: bool = True
) -> list[tuple[str, int]]:
    """PhoneticFilter.IncrementToken over a (token, position) stream."""
    enc = ENCODERS[encoder]
    out: list[tuple[str, int]] = []
    for t, p in zip(tokens, positions):
        if not t:
            out.append((t, p))
            continue
        try:
            v = enc(t)
        except Exception:
            v = None
        ph = v if v and v != t else None
        if ph is None:
            out.append((t, p))
        elif not inject:
            out.append((ph, p))
        else:
            out.append((ph, p))
            out.append((t, p))
    return out


def phonetic_udf(encoder: str, inject: bool = True, analyzer: str = "standard"):
    """pandas UDF: text:string -> emitted terms array<string> (the
    PhoneticFilter output stream in order — positions ride implicitly,
    inject pairs adjacent)."""
    if encoder not in ENCODERS:
        raise ValueError(f"unknown phonetic encoder {encoder!r}")

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_with_positions

        enc = ENCODERS[encoder]
        memo: dict[str, str | None] = {}  # encode ∝ vocabulary, not stream

        def cached(t):
            if t not in memo:
                try:
                    memo[t] = enc(t)
                except Exception:
                    memo[t] = None
            return memo[t]

        rows = []
        for t in texts:
            toks, poss = tokenize_with_positions(
                t if isinstance(t, str) else None, analyzer
            )
            out = []
            for w, p in zip(toks, poss):
                v = cached(w) if w else None
                ph = v if v and v != w else None
                if ph is None:
                    out.append(w)
                elif not inject:
                    out.append(ph)
                else:
                    out.append(ph)
                    out.append(w)
            rows.append(out)
        return pd.Series(rows, index=texts.index)

    return F.pandas_udf(batch, ArrayType(StringType()))


def match_rating_cte(vocab: str = "vocab") -> str:
    """MRA encode as staged CTEs: clean (upper, punctuation strip, accent
    translate) -> devowel with leading vowel kept -> 21 double-consonant
    collapses -> first-3 + last-3."""
    dd = "nv2"
    for ch in "BCDFGHJKLMNPQRSTVWXYZ":
        dd = f"replace({dd}, '{ch}{ch}', '{ch}')"
    return f"""r1 AS (
  SELECT tok,
         translate(regexp_replace(upper(tok), '-|[&]|''|\\.|[,]', '', 'g'),
                   '{_MRA_UNI}', '{_MRA_PLAIN}') AS s0
  FROM {vocab}
),
r2 AS (
  SELECT tok, s0,
         CASE WHEN substr(s0, 1, 1) IN ('A','E','I','O','U')
              THEN substr(s0, 1, 1) ELSE '' END
         || regexp_replace(s0, 'A|E|I|O|U', '', 'g') AS nv2
  FROM r1
),
r3 AS (SELECT tok, s0, {dd} AS d FROM r2),
encv AS (
  SELECT tok,
         CASE
           WHEN len(tok) <= 1 THEN ''
           WHEN s0 = '' THEN NULL
           WHEN len(d) > 6 THEN substr(d, 1, 3) || substr(d, len(d) - 2, 3)
           ELSE d
         END AS ph
  FROM r3
)"""


# -- ANSI-SQL mirrors (DuckDB) for the oracle side ---------------------------
# Emitted as staged CTE chains over a (tok) vocabulary table, ending in
# encv(tok, ph). ph NULL = unmappable (pass-through), '' = cleaned-empty
# (also pass-through). The gate corpus tokens are lowercase [a-z0-9]+, so
# "unmappable" reduces to "contains a char outside [a-z0-9]" there; the
# Python encoders carry the reference-faithful non-ASCII-letter rule.

_AZ = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_UNMAPPABLE = "regexp_matches(tok, '[^a-z0-9]')"


def soundex_cte(vocab: str = "vocab") -> str:
    return f"""v1 AS (
  SELECT tok, upper(regexp_replace(tok, '[^a-zA-Z]', '', 'g')) AS s
  FROM {vocab}
),
v2 AS (
  SELECT tok, s,
         translate(substr(s, 1, 1), '{_AZ}', '{_SOUNDEX_MAP}')
         || translate(replace(replace(substr(s, 2), 'H', ''), 'W', ''),
                      '{_AZ}', '{_SOUNDEX_MAP}') AS seq
  FROM v1
),
v3 AS (
  SELECT tok, s, list_transform(range(1, len(seq) + 1), i -> seq[i]) AS chs
  FROM v2
),
encv AS (
  SELECT tok,
         CASE
           WHEN {_UNMAPPABLE} THEN NULL
           WHEN s = '' THEN ''
           ELSE substr(rpad(substr(s, 1, 1) || COALESCE(array_to_string(
             list_slice(
               list_filter(chs, (x, i) -> i > 1 AND x <> '0' AND x <> chs[i - 1]),
               1, 3), ''), ''), 4, '0'), 1, 4)
         END AS ph
  FROM v3
)"""


def refined_soundex_cte(vocab: str = "vocab") -> str:
    return f"""v1 AS (
  SELECT tok, upper(regexp_replace(tok, '[^a-zA-Z]', '', 'g')) AS s
  FROM {vocab}
),
v2 AS (SELECT tok, s, translate(s, '{_AZ}', '{_REFINED_MAP}') AS seq FROM v1),
v3 AS (
  SELECT tok, s, list_transform(range(1, len(seq) + 1), i -> seq[i]) AS chs
  FROM v2
),
encv AS (
  SELECT tok,
         CASE
           WHEN {_UNMAPPABLE} THEN NULL
           WHEN s = '' THEN ''
           ELSE substr(s, 1, 1) || COALESCE(array_to_string(
             list_filter(chs, (x, i) -> i = 1 OR x <> chs[i - 1]), ''), '')
         END AS ph
  FROM v3
)"""


def nysiis_cte(vocab: str = "vocab") -> str:
    """NYSIIS as a recursive CTE walking the MUTATING char array: state
    (tok, s, i, key); each step rewrites s at position i with the
    transcode window output, then appends s[i] to key if it differs from
    s[i-1] — the exact Arrays.Copy-into-chars semantics. Needs WITH
    RECURSIVE on the enclosing query."""
    vowel = "IN ('A','E','I','O','U')"
    curr, prev = "substr(s, i, 1)", "substr(s, i - 1, 1)"
    nxt = "CASE WHEN i < len(s) THEN substr(s, i + 1, 1) ELSE ' ' END"
    anx = "CASE WHEN i < len(s) - 1 THEN substr(s, i + 2, 1) ELSE ' ' END"
    t = f"""CASE
      WHEN {curr} = 'E' AND {nxt} = 'V' THEN 'AF'
      WHEN {curr} {vowel} THEN 'A'
      WHEN {curr} = 'Q' THEN 'G'
      WHEN {curr} = 'Z' THEN 'S'
      WHEN {curr} = 'M' THEN 'N'
      WHEN {curr} = 'K' THEN (CASE WHEN {nxt} = 'N' THEN 'NN' ELSE 'C' END)
      WHEN {curr} = 'S' AND {nxt} = 'C' AND {anx} = 'H' THEN 'SSS'
      WHEN {curr} = 'P' AND {nxt} = 'H' THEN 'FF'
      WHEN {curr} = 'H' AND ({prev} NOT {vowel} OR {nxt} NOT {vowel})
        THEN {prev}
      WHEN {curr} = 'W' AND {prev} {vowel} THEN {prev}
      ELSE {curr}
    END"""
    return f"""n0 AS (
  SELECT tok, upper(regexp_replace(tok, '[^a-zA-Z]', '', 'g')) AS s0
  FROM {vocab}
),
n1 AS (
  SELECT tok, s0,
    regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(s0, '^MAC', 'MCC'),
        '^KN', 'NN'), '^K', 'C'), '^(PH|PF)', 'FF'), '^SCH', 'SSS'),
      '(EE|IE)$', 'Y'), '(DT|RT|RD|NT|ND)$', 'D') AS s
  FROM n0
),
nwalk(tok, s, i, key) AS (
  SELECT tok, s, 2, substr(s, 1, 1) FROM n1 WHERE s <> ''
  UNION ALL
  SELECT tok, new_s, i + 1,
         key || CASE WHEN substr(new_s, i, 1) <> substr(new_s, i - 1, 1)
                     THEN substr(new_s, i, 1) ELSE '' END
  FROM (
    SELECT tok, i, key,
           substr(s, 1, i - 1) || t || substr(s, i + len(t)) AS new_s
    FROM (SELECT tok, s, i, key, {t} AS t FROM nwalk WHERE i <= len(s))
  )
),
nfin AS (
  SELECT tok, key FROM nwalk WHERE i = len(s) + 1
),
ntrim AS (
  SELECT tok, key,
         CASE WHEN len(key) > 1 AND substr(key, len(key), 1) = 'S'
              THEN substr(key, 1, len(key) - 1) ELSE key END AS k2
  FROM nfin
),
ntrim2 AS (
  SELECT tok, key, k2,
         CASE WHEN len(key) > 1 AND len(k2) > 2
                   AND substr(k2, len(k2) - 1, 1) = 'A'
                   AND substr(k2, len(k2), 1) = 'Y'
              THEN substr(k2, 1, len(k2) - 2) || 'Y' ELSE k2 END AS k3
  FROM ntrim
),
ntrim3 AS (
  SELECT tok,
         CASE WHEN len(key) > 1 AND substr(k2, len(k2), 1) = 'A'
              THEN substr(k3, 1, len(k3) - 1) ELSE k3 END AS k4
  FROM ntrim2
),
encv AS (
  SELECT n0.tok,
         CASE
           WHEN regexp_matches(n0.tok, '[^a-z0-9]') THEN NULL
           WHEN n0.s0 = '' THEN ''
           ELSE substr(t3.k4, 1, 6)
         END AS ph
  FROM n0 LEFT JOIN ntrim3 t3 ON n0.tok = t3.tok
)"""


def metaphone_cte(vocab: str = "vocab") -> str:
    """Metaphone as a recursive CTE over the FIXED working string: state
    (tok, s, n, code); app/adv computed by parallel CASEs (D in DGE/DGI/
    DGY advances 3), duplicate letters except C skipped, code truncated
    to 4 after each append. Needs WITH RECURSIVE on the enclosing query.
    1-based positions: 0-based guards translate as n0+2<w ⇔ n+2<=w etc."""
    vow = "IN ('A','E','I','O','U')"
    fr = "IN ('E','I','Y')"
    sym = "substr(s, n, 1)"
    prv = "substr(s, n - 1, 1)"  # '' when n = 1
    nx = "substr(s, n + 1, 1)"
    nx2 = "substr(s, n + 2, 1)"
    r2, r3, r4 = "substr(s, n, 2)", "substr(s, n, 3)", "substr(s, n, 4)"
    dup = f"n > 1 AND {sym} <> 'C' AND {sym} = {prv}"
    dge = f"n + 2 <= len(s) AND {nx} = 'G' AND {nx2} {fr}"
    app = f"""CASE
      WHEN {dup} THEN ''
      WHEN {sym} {vow} THEN (CASE WHEN n = 1 THEN {sym} ELSE '' END)
      WHEN {sym} = 'B' THEN
        (CASE WHEN {prv} = 'M' AND n = len(s) THEN '' ELSE 'B' END)
      WHEN {sym} = 'C' THEN (CASE
        WHEN {prv} = 'S' AND n < len(s) AND {nx} {fr} THEN ''
        WHEN {r3} = 'CIA' THEN 'X'
        WHEN n < len(s) AND {nx} {fr} THEN 'S'
        WHEN {prv} = 'S' AND {nx} = 'H' THEN 'K'
        WHEN {nx} = 'H' THEN (CASE
          WHEN n = 1 AND len(s) >= 3 AND substr(s, 3, 1) {vow} THEN 'K'
          ELSE 'X' END)
        ELSE 'K' END)
      WHEN {sym} = 'D' THEN (CASE WHEN {dge} THEN 'J' ELSE 'T' END)
      WHEN {sym} = 'G' THEN (CASE
        WHEN n + 1 = len(s) AND {nx} = 'H' THEN ''
        WHEN n + 1 < len(s) AND {nx} = 'H' AND NOT ({nx2} {vow}) THEN ''
        WHEN n > 1 AND ({r2} = 'GN' OR {r4} = 'GNED') THEN ''
        WHEN n < len(s) AND {nx} {fr} THEN 'J'
        ELSE 'K' END)
      WHEN {sym} = 'H' THEN (CASE
        WHEN n = len(s) THEN ''
        WHEN n > 1 AND {prv} IN ('C','S','P','T','G') THEN ''
        WHEN {nx} {vow} THEN 'H'
        ELSE '' END)
      WHEN {sym} IN ('F','J','L','M','N','R') THEN {sym}
      WHEN {sym} = 'K' THEN
        (CASE WHEN n > 1 AND {prv} = 'C' THEN '' ELSE 'K' END)
      WHEN {sym} = 'P' THEN (CASE WHEN {nx} = 'H' THEN 'F' ELSE 'P' END)
      WHEN {sym} = 'Q' THEN 'K'
      WHEN {sym} = 'S' THEN (CASE
        WHEN {r2} = 'SH' OR {r3} = 'SIO' OR {r3} = 'SIA' THEN 'X'
        ELSE 'S' END)
      WHEN {sym} = 'T' THEN (CASE
        WHEN {r3} = 'TIA' OR {r3} = 'TIO' THEN 'X'
        WHEN {r3} = 'TCH' THEN ''
        WHEN {r2} = 'TH' THEN '0'
        ELSE 'T' END)
      WHEN {sym} = 'V' THEN 'F'
      WHEN {sym} IN ('W','Y') THEN
        (CASE WHEN n < len(s) AND {nx} {vow} THEN {sym} ELSE '' END)
      WHEN {sym} = 'X' THEN 'KS'
      WHEN {sym} = 'Z' THEN 'S'
      ELSE '' END"""
    adv = f"""CASE
      WHEN {dup} THEN 1
      WHEN {sym} = 'D' AND {dge} THEN 3
      ELSE 1 END"""
    return f"""m0 AS (SELECT tok, upper(tok) AS up FROM {vocab}),
m1 AS (
  SELECT tok, up,
    CASE
      WHEN len(up) < 2 THEN up
      WHEN substr(up, 1, 1) IN ('K','G','P') AND substr(up, 2, 1) = 'N'
        THEN substr(up, 2)
      WHEN substr(up, 1, 2) = 'AE' THEN substr(up, 2)
      WHEN substr(up, 1, 2) = 'WR' THEN substr(up, 2)
      WHEN substr(up, 1, 2) = 'WH' THEN 'W' || substr(up, 3)
      WHEN substr(up, 1, 1) = 'X' THEN 'S' || substr(up, 2)
      ELSE up
    END AS s
  FROM m0
),
mwalk(tok, s, n, code) AS (
  -- the single-char shortcut keys on the INPUT length (GetMetaphone's
  -- txt.Length), not the working string: 'wh' -> local 'W' still walks
  SELECT tok, s, 1, '' FROM m1 WHERE len(up) >= 2
  UNION ALL
  SELECT tok, s, n + {adv}, substr(code || {app}, 1, 4)
  FROM mwalk WHERE len(code) < 4 AND n <= len(s)
),
mfin AS (
  SELECT tok, code FROM mwalk WHERE NOT (len(code) < 4 AND n <= len(s))
),
encv AS (
  SELECT m1.tok,
         CASE WHEN len(m1.up) < 2 THEN m1.up ELSE f.code END AS ph
  FROM m1 LEFT JOIN mfin f ON m1.tok = f.tok
)"""


def caverphone1_cte(vocab: str = "vocab") -> str:
    expr = "lower(tok)"
    for rx, rep in _CAVERPHONE1_RULES:
        expr = f"regexp_replace({expr}, '{rx.pattern}', '{rep}', 'g')"
    return f"""encv AS (
  SELECT tok, substr({expr} || '{_SIX_1}', 1, 6) AS ph FROM {vocab}
)"""


def cologne_cte(vocab: str = "vocab") -> str:
    """Kölner Phonetik as a recursive CTE: state (tok, rest, lc, lcode,
    outp); the X rule prepends 'S' to rest (AddLeft); the leading-junk
    continue keeps lc/lcode. Needs WITH RECURSIVE."""
    c = "substr(rest, 1, 1)"
    nxt = "CASE WHEN len(rest) > 1 THEN substr(rest, 2, 1) ELSE '-' END"
    code = f"""CASE
      WHEN {c} IN ('A','E','I','J','O','U','Y') THEN '0'
      WHEN {c} = 'H' OR {c} < 'A' OR {c} > 'Z' THEN '-'
      WHEN {c} = 'B' OR ({c} = 'P' AND {nxt} <> 'H') THEN '1'
      WHEN {c} IN ('D','T') AND {nxt} NOT IN ('S','C','Z') THEN '2'
      WHEN {c} IN ('W','F','P','V') THEN '3'
      WHEN {c} IN ('G','K','Q') THEN '4'
      WHEN {c} = 'X' AND lc NOT IN ('C','K','Q') THEN '4'
      WHEN {c} IN ('S','Z') THEN '8'
      WHEN {c} = 'C' THEN (CASE
        WHEN lcode = '/' THEN
          (CASE WHEN {nxt} IN ('A','H','K','L','O','Q','R','U','X')
                THEN '4' ELSE '8' END)
        WHEN lc IN ('S','Z')
             OR {nxt} NOT IN ('A','H','O','U','K','Q','X') THEN '8'
        ELSE '4' END)
      WHEN {c} IN ('T','D','X') THEN '8'
      WHEN {c} = 'R' THEN '7'
      WHEN {c} = 'L' THEN '5'
      WHEN {c} IN ('M','N') THEN '6'
      ELSE {c}
    END"""
    skip = f"({c} = 'H' OR {c} < 'A' OR {c} > 'Z') AND lcode = '/'"
    xr = f"{c} = 'X' AND lc NOT IN ('C','K','Q')"
    return f"""c0 AS (
  SELECT tok,
         translate(upper(tok), 'ÄÜÖß', 'AUOS') AS s
  FROM {vocab}
),
cwalk(tok, rest, lc, lcode, outp) AS (
  SELECT tok, s, '-', '/', '' FROM c0
  UNION ALL
  SELECT tok,
         CASE WHEN {xr} THEN 'S' || substr(rest, 2) ELSE substr(rest, 2) END,
         CASE WHEN {skip} THEN lc ELSE {c} END,
         CASE WHEN {skip} THEN lcode ELSE {code} END,
         outp || CASE
           WHEN {skip} THEN ''
           WHEN {code} <> '-' AND (
                (lcode <> {code} AND ({code} <> '0' OR lcode = '/'))
                OR {code} < '0' OR {code} > '8')
             THEN {code}
           ELSE '' END
  FROM cwalk WHERE rest <> ''
),
encv AS (
  SELECT c0.tok, w.outp AS ph
  FROM c0 JOIN cwalk w ON c0.tok = w.tok AND w.rest = ''
)"""


def caverphone2_cte(vocab: str = "vocab") -> str:
    expr = "lower(tok)"
    for rx, rep in _CAVERPHONE2_RULES:
        expr = f"regexp_replace({expr}, '{rx.pattern}', '{rep}', 'g')"
    return f"""encv AS (
  SELECT tok, substr({expr} || '{_TEN_1}', 1, 10) AS ph FROM {vocab}
)"""
