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


ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "caverphone2": caverphone2,
    "nysiis": nysiis,
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


def caverphone2_cte(vocab: str = "vocab") -> str:
    expr = "lower(tok)"
    for rx, rep in _CAVERPHONE2_RULES:
        expr = f"regexp_replace({expr}, '{rx.pattern}', '{rep}', 'g')"
    return f"""encv AS (
  SELECT tok, substr({expr} || '{_TEN_1}', 1, 10) AS ph FROM {vocab}
)"""
