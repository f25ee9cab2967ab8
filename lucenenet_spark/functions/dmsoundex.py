"""Daitch-Mokotoff Soundex (Lucene.Net.Analysis.Phonetic/Language/
DaitchMokotoffSoundex.cs:1) — re-derived from the PUBLISHED D-M coding
table (G. Mokotoff, 1985, the genealogy-standard table that
commons-codec ships as dmrules.txt), not transcribed from the C#.

Ported contract, step for step against the cited file:

  * Cleanup: whitespace characters removed, invariant lowercase, then
    the ASCII folding table (GetSoundex -> Cleanup).
  * Rules are bucketed by first character and tried LONGEST pattern
    first (DaitchMokotoffRuleComparer); the first match wins and the
    scan jumps past the whole pattern (index += PatternLength - 1).
  * Replacement context: "at start of word" while no coded character
    has been seen yet (lastChar == '\\0'); otherwise "before a vowel"
    when the character FOLLOWING the pattern is one of a/e/i/o/u
    (Rule.GetReplacements — y is NOT a vowel here); else the default
    column.
  * A replacement column may hold '|'-separated alternatives: with
    branching enabled every (branch x alternative) forks a new branch,
    deduplicated by code string in insertion order (JCG.List semantics
    of Branch.Equals on ToString). Encode() disables branching and
    keeps only the first alternative.
  * Appending (Branch.ProcessNextReplacement): the code is appended
    unless the previous replacement string ENDS WITH the new one
    (adjacent same-sound collapse — note EndsWith, not equality, so
    "54" followed by "4" collapses), overridden by the m/n special
    case: an 'm' directly after 'n' or 'n' directly after 'm' always
    appends (forceAppend). The builder truncates at MAX_LENGTH 6;
    lastReplacement updates even when nothing was appended.
  * lastChar tracks the FIRST character of the last RULED character
    (characters with no rule bucket — digits, punctuation — are
    skipped without touching lastChar, so they are transparent to both
    the at-start and the m/n contexts).
  * Finish: every surviving branch is zero-padded to 6 digits;
    soundex() joins all branches with '|' in insertion order.

A character with no rule bucket contributes nothing (the reference
maps only letters); an input that yields no coded character returns
"000000", as in the reference.
"""
from __future__ import annotations

MAX_LENGTH = 6

_VOWELS = frozenset("aeiou")

# The published Daitch-Mokotoff coding table:
# pattern -> (at start of word, before a vowel, other). '|' separates
# branching alternatives; '' = not coded.
_RULES: dict[str, tuple[str, str, str]] = {
    # vowels
    "a": ("0", "", ""), "e": ("0", "", ""), "i": ("0", "", ""),
    "o": ("0", "", ""), "u": ("0", "", ""),
    # plain consonants
    "b": ("7", "7", "7"), "d": ("3", "3", "3"), "f": ("7", "7", "7"),
    "g": ("5", "5", "5"), "h": ("5", "5", ""), "k": ("5", "5", "5"),
    "l": ("8", "8", "8"), "m": ("6", "6", "6"), "n": ("6", "6", "6"),
    "p": ("7", "7", "7"), "q": ("5", "5", "5"), "r": ("9", "9", "9"),
    "s": ("4", "4", "4"), "t": ("3", "3", "3"), "v": ("7", "7", "7"),
    "w": ("7", "7", "7"), "x": ("5", "54", "54"), "y": ("1", "", ""),
    "z": ("4", "4", "4"),
    # Romanian t-cedilla / t-comma
    "ţ": ("3|4", "3|4", "3|4"), "ț": ("3|4", "3|4", "3|4"),
    # Polish nasal vowels
    "ę": ("", "", "|6"), "ą": ("", "", "|6"),
    # multi-letter groups, any length (bucketing + longest-first is
    # applied at build time below)
    "schtsch": ("2", "4", "4"), "schtsh": ("2", "4", "4"),
    "schtch": ("2", "4", "4"), "shtch": ("2", "4", "4"),
    "shtsh": ("2", "4", "4"), "stsch": ("2", "4", "4"),
    "ttsch": ("4", "4", "4"), "zhdzh": ("2", "4", "4"),
    "shch": ("2", "4", "4"), "scht": ("2", "43", "43"),
    "schd": ("2", "43", "43"), "stch": ("2", "4", "4"),
    "strz": ("2", "4", "4"), "strs": ("2", "4", "4"),
    "stsh": ("2", "4", "4"), "szcz": ("2", "4", "4"),
    "szcs": ("2", "4", "4"), "ttch": ("4", "4", "4"),
    "tsch": ("4", "4", "4"), "ttsz": ("4", "4", "4"),
    "zdzh": ("2", "4", "4"), "zsch": ("4", "4", "4"),
    "chs": ("5", "54", "54"), "csz": ("4", "4", "4"),
    "czs": ("4", "4", "4"), "drz": ("4", "4", "4"),
    "drs": ("4", "4", "4"), "dsh": ("4", "4", "4"),
    "dsz": ("4", "4", "4"), "dzh": ("4", "4", "4"),
    "dzs": ("4", "4", "4"), "sch": ("4", "4", "4"),
    "sht": ("2", "43", "43"), "szt": ("2", "43", "43"),
    "shd": ("2", "43", "43"), "szd": ("2", "43", "43"),
    "tch": ("4", "4", "4"), "trz": ("4", "4", "4"),
    "trs": ("4", "4", "4"), "tsh": ("4", "4", "4"),
    "tts": ("4", "4", "4"), "ttz": ("4", "4", "4"),
    "tzs": ("4", "4", "4"), "tsz": ("4", "4", "4"),
    "zdz": ("2", "4", "4"), "zhd": ("2", "43", "43"),
    "zsh": ("4", "4", "4"),
    "ai": ("0", "1", ""), "aj": ("0", "1", ""), "ay": ("0", "1", ""),
    "au": ("0", "7", ""),
    "cz": ("4", "4", "4"), "cs": ("4", "4", "4"),
    "ds": ("4", "4", "4"), "dz": ("4", "4", "4"),
    "dt": ("3", "3", "3"),
    "ei": ("0", "1", ""), "ej": ("0", "1", ""), "ey": ("0", "1", ""),
    "eu": ("1", "1", ""),
    "fb": ("7", "7", "7"),
    "ia": ("1", "", ""), "ie": ("1", "", ""), "io": ("1", "", ""),
    "iu": ("1", "", ""),
    "ks": ("5", "54", "54"), "kh": ("5", "5", "5"),
    "mn": ("66", "66", "66"), "nm": ("66", "66", "66"),
    "oi": ("0", "1", ""), "oj": ("0", "1", ""), "oy": ("0", "1", ""),
    "pf": ("7", "7", "7"), "ph": ("7", "7", "7"),
    "sh": ("4", "4", "4"), "sc": ("2", "4", "4"),
    "st": ("2", "43", "43"), "sd": ("2", "43", "43"),
    "sz": ("4", "4", "4"),
    "th": ("3", "3", "3"), "ts": ("4", "4", "4"),
    "tc": ("4", "4", "4"), "tz": ("4", "4", "4"),
    "ui": ("0", "1", ""), "uj": ("0", "1", ""), "uy": ("0", "1", ""),
    "ue": ("0", "1", ""),
    "zd": ("2", "43", "43"), "zh": ("4", "4", "4"), "zs": ("4", "4", "4"),
    # branching single/double letters
    "c": ("4|5", "4|5", "4|5"), "ch": ("4|5", "4|5", "4|5"),
    "ck": ("5|45", "5|45", "5|45"),
    "rs": ("4|94", "4|94", "4|94"), "rz": ("4|94", "4|94", "4|94"),
    "j": ("1|4", "|4", "|4"),
}

# the published ASCII folding table (applied before rule matching)
_FOLDINGS = str.maketrans({
    "ß": "s", "à": "a", "á": "a", "â": "a",
    "ã": "a", "ä": "a", "å": "a", "æ": "a",
    "ç": "c", "è": "e", "é": "e", "ê": "e",
    "ë": "e", "ì": "i", "í": "i", "î": "i",
    "ï": "i", "ð": "d", "ñ": "n", "ò": "o",
    "ó": "o", "ô": "o", "õ": "o", "ö": "o",
    "ø": "o", "ù": "u", "ú": "u", "û": "u",
    "ý": "y", "þ": "b", "ÿ": "y", "ć": "c",
    "ł": "l", "ś": "s", "ż": "z", "ź": "z",
})

# bucket by first char, longest pattern first (ties impossible to
# co-match: equal-length same-bucket patterns differ somewhere)
_BUCKETS: dict[str, list[tuple[str, tuple[str, str, str]]]] = {}
for _p, _r in _RULES.items():
    _BUCKETS.setdefault(_p[0], []).append((_p, _r))
for _b in _BUCKETS.values():
    _b.sort(key=lambda pr: -len(pr[0]))


def _cleanup(source: str) -> str:
    return "".join(
        ch for ch in source.lower().translate(_FOLDINGS) if not ch.isspace()
    )


def _branches(source: str, branching: bool) -> list[str]:
    """GetSoundex(source, branching): list of (unpadded) branch codes in
    insertion order, deduplicated by code string."""
    text = _cleanup(source)
    # branch state: (code, last_replacement)
    branches: list[tuple[str, str | None]] = [("", None)]
    last_char = ""
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        bucket = _BUCKETS.get(ch)
        if bucket is None:
            i += 1
            continue  # unmapped char: transparent, lastChar untouched
        for pattern, (r_start, r_vowel, r_other) in bucket:
            if not text.startswith(pattern, i):
                continue
            if last_char == "":
                repl = r_start
            else:
                j = i + len(pattern)
                repl = r_vowel if j < n and text[j] in _VOWELS else r_other
            alts = repl.split("|")
            if not branching:
                alts = alts[:1]
            force = (last_char == "m" and ch == "n") or (
                last_char == "n" and ch == "m"
            )
            nxt: list[tuple[str, str | None]] = []
            seen: set[str] = set()
            for code, last_repl in branches:
                for alt in alts:
                    new_code = code
                    if (
                        last_repl is None
                        or not last_repl.endswith(alt)
                        or force
                    ) and len(code) < MAX_LENGTH:
                        new_code = (code + alt)[:MAX_LENGTH]
                    if branching:
                        if new_code not in seen:
                            seen.add(new_code)
                            nxt.append((new_code, alt))
                    else:
                        nxt.append((new_code, alt))
                        break
            branches = nxt
            i += len(pattern)
            break
        else:
            i += 1
        last_char = ch
    return [code for code, _lr in branches]


def daitch_mokotoff(source: str) -> str:
    """soundex(): all branch codes zero-padded to 6, joined by '|' in
    branch insertion order (e.g. AUERBACH -> '097400|097500')."""
    return "|".join(
        code.ljust(MAX_LENGTH, "0") for code in _branches(source, True)
    )


def daitch_mokotoff_encode(source: str) -> str:
    """Encode(): the non-branching single code (first alternative at
    every fork), zero-padded to 6."""
    return _branches(source, False)[0].ljust(MAX_LENGTH, "0")


# --- independent DuckDB oracle pipelines ---------------------------------
#
# The scan loop unrolled to a fixed stage count (each non-done stage
# consumes >= 1 character, so STAGES bounds the token length — the gate
# corpora cap at 8). State per row: (tok, i, lastch, code, lr) with the
# branching variant adding the branch ordinal `ord`. Rules live in a
# VALUES relation; the longest match wins via a window; per-step branch
# dedup (insertion order = parent ord then alternative index) via
# QUALIFY row-number over the NEW code. ASCII folding is omitted — the
# gate vocab is lowercase ASCII.

STAGES = 12


def _rules_values() -> str:
    rows = []
    for pat, (rs, rv, ro) in _RULES.items():
        rows.append(
            f"('{pat}', {len(pat)}, '{rs}', '{rv}', '{ro}')"
        )
    return ",\n    ".join(rows)


def _dm_stage(k: int, branching: bool) -> str:
    ordc = ", s.ord" if branching else ""
    part = "s.tok, s.ord" if branching else "s.tok"
    m = f"""dmm{k} AS MATERIALIZED (
  SELECT s.tok, s.i, s.lastch, s.code, s.lr{ordc},
         substr(s.tok, s.i + 1, 1) AS ch,
         r.plen,
         CASE WHEN s.lastch = '' THEN r.rs
              WHEN substr(s.tok, s.i + 1 + r.plen, 1) IN ('a','e','i','o','u')
                THEN r.rv
              ELSE r.ro END AS repl,
         ((s.lastch = 'm' AND substr(s.tok, s.i + 1, 1) = 'n') OR
          (s.lastch = 'n' AND substr(s.tok, s.i + 1, 1) = 'm')) AS force
  FROM dms{k - 1} s LEFT JOIN dmrules r
    ON s.i < length(s.tok) AND substr(s.tok, s.i + 1, r.plen) = r.pattern
  QUALIFY row_number() OVER (
    PARTITION BY {part} ORDER BY r.plen DESC NULLS LAST) = 1
)"""
    if not branching:
        return f"""{m},
dms{k} AS MATERIALIZED (
  SELECT tok,
         CASE WHEN plen IS NULL
              THEN CASE WHEN i < length(tok) THEN i + 1 ELSE i END
              ELSE i + plen END AS i,
         CASE WHEN plen IS NULL THEN lastch ELSE ch END AS lastch,
         CASE WHEN plen IS NOT NULL
                   AND (lr IS NULL OR NOT ends_with(lr, string_split(repl, '|')[1]) OR force)
                   AND length(code) < 6
              THEN substr(code || string_split(repl, '|')[1], 1, 6)
              ELSE code END AS code,
         CASE WHEN plen IS NULL THEN lr ELSE string_split(repl, '|')[1] END AS lr
  FROM dmm{k}
)"""
    return f"""{m},
dmb{k} AS MATERIALIZED (
  SELECT tok, i, lastch, code, lr, ch, plen, force,
         string_split(repl, '|')[1] AS alt, ord * 2 AS bord
  FROM dmm{k}
  UNION ALL
  SELECT tok, i, lastch, code, lr, ch, plen, force,
         string_split(repl, '|')[2] AS alt, ord * 2 + 1 AS bord
  FROM dmm{k}
  WHERE plen IS NOT NULL AND contains(repl, '|')
),
dms{k} AS MATERIALIZED (
  SELECT tok, i, lastch, ord, code, lr FROM (
    SELECT tok,
           CASE WHEN plen IS NULL
                THEN CASE WHEN i < length(tok) THEN i + 1 ELSE i END
                ELSE i + plen END AS i,
           CASE WHEN plen IS NULL THEN lastch ELSE ch END AS lastch,
           bord AS ord,
           CASE WHEN plen IS NOT NULL
                     AND (lr IS NULL OR NOT ends_with(lr, alt) OR force)
                     AND length(code) < 6
                THEN substr(code || alt, 1, 6) ELSE code END AS code,
           CASE WHEN plen IS NULL THEN lr ELSE alt END AS lr
    FROM dmb{k}
  )
  QUALIFY row_number() OVER (PARTITION BY tok, code ORDER BY ord) = 1
)"""


def dm_cte(vocab: str = "vocab") -> str:
    """encv(tok, ph): ph = daitch_mokotoff_encode(tok) (non-branching),
    for the phonetic_udf / PhoneticFilter gate."""
    stages = ",\n".join(_dm_stage(k, False) for k in range(1, STAGES + 1))
    return f"""dmrules(pattern, plen, rs, rv, ro) AS (
  VALUES
    {_rules_values()}
),
dms0 AS (
  SELECT tok, 0 AS i, '' AS lastch, '' AS code, CAST(NULL AS VARCHAR) AS lr
  FROM {vocab}
),
{stages},
encv AS (SELECT tok, rpad(code, 6, '0') AS ph FROM dms{STAGES})"""


def dm_branch_cte(vocab: str = "vocab") -> str:
    """encb(tok, ph): ph = daitch_mokotoff(tok) — ALL branch codes
    '|'-joined in branch insertion order."""
    stages = ",\n".join(_dm_stage(k, True) for k in range(1, STAGES + 1))
    return f"""dmrules(pattern, plen, rs, rv, ro) AS (
  VALUES
    {_rules_values()}
),
dms0 AS (
  SELECT tok, 0 AS i, '' AS lastch, 0 AS ord, '' AS code,
         CAST(NULL AS VARCHAR) AS lr
  FROM {vocab}
),
{stages},
encb AS (
  SELECT tok, string_agg(rpad(code, 6, '0'), '|' ORDER BY ord) AS ph
  FROM dms{STAGES} GROUP BY tok
)"""
