"""DoubleMetaphone (Lucene.Net.Analysis.Phonetic/Language/
DoubleMetaphone.cs) — Lawrence Philips' algorithm with primary +
alternate encodings, ported handler by handler.

Semantics pinned from the reference:
  * CleanInput trims and uppercases; empty -> None (encode of nothing)
  * silent starts GN/KN/PN/WR/PS skip the first letter
  * every Handle* advances the index exactly as the C# does (DG[IEY]
    consumes 3, WICZ/WITZ 4, doubled letters 2, ...)
  * the result pair fills independently; appends truncate at maxCodeLen
    and the loop stops when BOTH sides are full (IsComplete)
  * CharAt out of range = '\\0'; Contains is bounds-checked substring
    membership — both reproduced exactly.

DoubleMetaphoneFilter.cs consumption (double_metaphone_stream): for each
token, primary is emitted (injected before the original when inject=true,
replacing it otherwise); if the alternate differs it is emitted too at
the same position. A token whose encode is empty (no letters) passes
through when inject=true and is DROPPED when inject=false — the filter
only ever emits non-empty encodings in replace mode.
"""
from __future__ import annotations

import pandas as pd

VOWELS = "AEIOUY"
SILENT_START = ("GN", "KN", "PN", "WR", "PS")
L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER"
)
L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


def _char_at(v: str, i: int) -> str:
    if i < 0 or i >= len(v):
        return "\0"
    return v[i]


def _contains(v: str, start: int, length: int, *criteria: str) -> bool:
    if start >= 0 and start + length <= len(v):
        return v[start:start + length] in criteria
    return False


class _Result:
    def __init__(self, max_len: int):
        self.max_len = max_len
        self.primary: list[str] = []
        self.alternate: list[str] = []

    def append(self, primary: str, alternate: str | None = None):
        self.append_primary(primary)
        self.append_alternate(primary if alternate is None else alternate)

    def append_primary(self, value: str):
        room = self.max_len - len(self.primary)
        self.primary.extend(value[:room] if len(value) > room else value)

    def append_alternate(self, value: str):
        room = self.max_len - len(self.alternate)
        self.alternate.extend(value[:room] if len(value) > room else value)

    @property
    def is_complete(self) -> bool:
        return (
            len(self.primary) >= self.max_len
            and len(self.alternate) >= self.max_len
        )


def _is_vowel(ch: str) -> bool:
    return ch in VOWELS and ch != ""


def _is_slavo_germanic(v: str) -> bool:
    return "W" in v or "K" in v or "CZ" in v or "WITZ" in v


def _handle_c(v: str, r: _Result, i: int) -> int:
    if _condition_c0(v, i):
        r.append("K")
        return i + 2
    if i == 0 and _contains(v, i, 6, "CAESAR"):
        r.append("S")
        return i + 2
    if _contains(v, i, 2, "CH"):
        return _handle_ch(v, r, i)
    if _contains(v, i, 2, "CZ") and not _contains(v, i - 2, 4, "WICZ"):
        r.append("S", "X")
        return i + 2
    if _contains(v, i + 1, 3, "CIA"):
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "CC") and not (i == 1 and _char_at(v, 0) == "M"):
        return _handle_cc(v, r, i)
    if _contains(v, i, 2, "CK", "CG", "CQ"):
        r.append("K")
        return i + 2
    if _contains(v, i, 2, "CI", "CE", "CY"):
        if _contains(v, i, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        return i + 2
    r.append("K")
    if _contains(v, i + 1, 2, " C", " Q", " G"):
        return i + 3
    if _contains(v, i + 1, 1, "C", "K", "Q") and not _contains(
        v, i + 1, 2, "CE", "CI"
    ):
        return i + 2
    return i + 1


def _handle_cc(v: str, r: _Result, i: int) -> int:
    if _contains(v, i + 2, 1, "I", "E", "H") and not _contains(
        v, i + 2, 2, "HU"
    ):
        if (i == 1 and _char_at(v, i - 1) == "A") or _contains(
            v, i - 1, 5, "UCCEE", "UCCES"
        ):
            r.append("KS")
        else:
            r.append("X")
        return i + 3
    r.append("K")
    return i + 2


def _handle_ch(v: str, r: _Result, i: int) -> int:
    if i > 0 and _contains(v, i, 4, "CHAE"):
        r.append("K", "X")
        return i + 2
    if _condition_ch0(v, i):
        r.append("K")
        return i + 2
    if _condition_ch1(v, i):
        r.append("K")
        return i + 2
    if i > 0:
        if _contains(v, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return i + 2


def _handle_d(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "DG"):
        if _contains(v, i + 2, 1, "I", "E", "Y"):
            r.append("J")
            return i + 3
        r.append("TK")
        return i + 2
    if _contains(v, i, 2, "DT", "DD"):
        r.append("T")
        return i + 2
    r.append("T")
    return i + 1


def _handle_g(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _char_at(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _char_at(v, i + 1) == "N":
        if i == 1 and _is_vowel(_char_at(v, 0)) and not slavo:
            r.append("KN", "N")
        elif (
            not _contains(v, i + 2, 2, "EY")
            and _char_at(v, i + 1) != "Y"
            and not slavo
        ):
            r.append("N", "KN")
        else:
            r.append("KN")
        return i + 2
    if _contains(v, i + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return i + 2
    if i == 0 and (
        _char_at(v, i + 1) == "Y"
        or _contains(v, i + 1, 2, *ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
    ):
        r.append("K", "J")
        return i + 2
    if (
        (_contains(v, i + 1, 2, "ER") or _char_at(v, i + 1) == "Y")
        and not _contains(v, 0, 6, "DANGER", "RANGER", "MANGER")
        and not _contains(v, i - 1, 1, "E", "I")
        and not _contains(v, i - 1, 3, "RGY", "OGY")
    ):
        r.append("K", "J")
        return i + 2
    if _contains(v, i + 1, 1, "E", "I", "Y") or _contains(
        v, i - 1, 4, "AGGI", "OGGI"
    ):
        if (
            _contains(v, 0, 4, "VAN ", "VON ")
            or _contains(v, 0, 3, "SCH")
            or _contains(v, i + 1, 2, "ET")
        ):
            r.append("K")
        elif _contains(v, i + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return i + 2
    if _char_at(v, i + 1) == "G":
        r.append("K")
        return i + 2
    r.append("K")
    return i + 1


def _handle_gh(v: str, r: _Result, i: int) -> int:
    if i > 0 and not _is_vowel(_char_at(v, i - 1)):
        r.append("K")
        return i + 2
    if i == 0:
        if _char_at(v, i + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return i + 2
    if (
        (i > 1 and _contains(v, i - 2, 1, "B", "H", "D"))
        or (i > 2 and _contains(v, i - 3, 1, "B", "H", "D"))
        or (i > 3 and _contains(v, i - 4, 1, "B", "H"))
    ):
        return i + 2
    if i > 2 and _char_at(v, i - 1) == "U" and _contains(
        v, i - 3, 1, "C", "G", "L", "R", "T"
    ):
        r.append("F")
    elif i > 0 and _char_at(v, i - 1) != "I":
        r.append("K")
    return i + 2


def _handle_h(v: str, r: _Result, i: int) -> int:
    if (i == 0 or _is_vowel(_char_at(v, i - 1))) and _is_vowel(
        _char_at(v, i + 1)
    ):
        r.append("H")
        return i + 2
    return i + 1


def _handle_j(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i, 4, "JOSE") or _contains(v, 0, 4, "SAN "):
        if (
            (i == 0 and _char_at(v, i + 4) == " ")
            or len(v) == 4
            or _contains(v, 0, 4, "SAN ")
        ):
            r.append("H")
        else:
            r.append("J", "H")
        return i + 1
    if i == 0 and not _contains(v, i, 4, "JOSE"):
        r.append("J", "A")
    elif (
        _is_vowel(_char_at(v, i - 1))
        and not slavo
        and (_char_at(v, i + 1) == "A" or _char_at(v, i + 1) == "O")
    ):
        r.append("J", "H")
    elif i == len(v) - 1:
        r.append("J", " ")
    elif not _contains(v, i + 1, 1, *L_T_K_S_N_M_B_Z) and not _contains(
        v, i - 1, 1, "S", "K", "L"
    ):
        r.append("J")
    return i + 2 if _char_at(v, i + 1) == "J" else i + 1


def _handle_l(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 1) == "L":
        if _condition_l0(v, i):
            r.append_primary("L")
        else:
            r.append("L")
        return i + 2
    r.append("L")
    return i + 1


def _handle_p(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 1) == "H":
        r.append("F")
        return i + 2
    r.append("P")
    return i + 2 if _contains(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v: str, r: _Result, i: int, slavo: bool) -> int:
    if (
        i == len(v) - 1
        and not slavo
        and _contains(v, i - 2, 2, "IE")
        and not _contains(v, i - 4, 2, "ME", "MA")
    ):
        r.append_alternate("R")
    else:
        r.append("R")
    return i + 2 if _char_at(v, i + 1) == "R" else i + 1


def _handle_s(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i - 1, 3, "ISL", "YSL"):
        return i + 1
    if i == 0 and _contains(v, i, 5, "SUGAR"):
        r.append("X", "S")
        return i + 1
    if _contains(v, i, 2, "SH"):
        if _contains(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")
        else:
            r.append("X")
        return i + 2
    if _contains(v, i, 3, "SIO", "SIA") or _contains(v, i, 4, "SIAN"):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return i + 3
    if (i == 0 and _contains(v, i + 1, 1, "M", "N", "L", "W")) or _contains(
        v, i + 1, 1, "Z"
    ):
        r.append("S", "X")
        return i + 2 if _contains(v, i + 1, 1, "Z") else i + 1
    if _contains(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _contains(v, i - 2, 2, "AI", "OI"):
        r.append_alternate("S")
    else:
        r.append("S")
    return i + 2 if _contains(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 2) == "H":
        if _contains(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(v, i + 3, 2, "ER", "EN"):
                r.append("X", "SK")
            else:
                r.append("SK")
        else:
            if i == 0 and not _is_vowel(_char_at(v, 3)) and _char_at(v, 3) != "W":
                r.append("X", "S")
            else:
                r.append("X")
    elif _contains(v, i + 2, 1, "I", "E", "Y"):
        r.append("S")
    else:
        r.append("SK")
    return i + 3


def _handle_t(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 4, "TION"):
        r.append("X")
        return i + 3
    if _contains(v, i, 3, "TIA", "TCH"):
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "TH") or _contains(v, i, 3, "TTH"):
        if (
            _contains(v, i + 2, 2, "OM", "AM")
            or _contains(v, 0, 4, "VAN ", "VON ")
            or _contains(v, 0, 3, "SCH")
        ):
            r.append("T")
        else:
            r.append("0", "T")
        return i + 2
    r.append("T")
    return i + 2 if _contains(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "WR"):
        r.append("R")
        return i + 2
    if i == 0 and (
        _is_vowel(_char_at(v, i + 1)) or _contains(v, i, 2, "WH")
    ):
        if _is_vowel(_char_at(v, i + 1)):
            r.append("A", "F")
        else:
            r.append("A")
        return i + 1
    if (
        (i == len(v) - 1 and _is_vowel(_char_at(v, i - 1)))
        or _contains(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or _contains(v, 0, 3, "SCH")
    ):
        r.append_alternate("F")
        return i + 1
    if _contains(v, i, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return i + 4
    return i + 1


def _handle_x(v: str, r: _Result, i: int) -> int:
    if i == 0:
        r.append("S")
        return i + 1
    if not (
        i == len(v) - 1
        and (
            _contains(v, i - 3, 3, "IAU", "EAU")
            or _contains(v, i - 2, 2, "AU", "OU")
        )
    ):
        r.append("KS")
    return i + 2 if _contains(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _char_at(v, i + 1) == "H":
        r.append("J")
        return i + 2
    if _contains(v, i + 1, 2, "ZO", "ZI", "ZA") or (
        slavo and i > 0 and _char_at(v, i - 1) != "T"
    ):
        r.append("S", "TS")
    else:
        r.append("S")
    return i + 2 if _char_at(v, i + 1) == "Z" else i + 1


def _condition_c0(v: str, i: int) -> bool:
    if _contains(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_char_at(v, i - 2)):
        return False
    if not _contains(v, i - 1, 3, "ACH"):
        return False
    c = _char_at(v, i + 2)
    return (c != "I" and c != "E") or _contains(
        v, i - 2, 6, "BACHER", "MACHER"
    )


def _condition_ch0(v: str, i: int) -> bool:
    if i != 0:
        return False
    if not _contains(v, i + 1, 5, "HARAC", "HARIS") and not _contains(
        v, i + 1, 3, "HOR", "HYM", "HIA", "HEM"
    ):
        return False
    if _contains(v, 0, 5, "CHORE"):
        return False
    return True


def _condition_ch1(v: str, i: int) -> bool:
    return (
        _contains(v, 0, 4, "VAN ", "VON ")
        or _contains(v, 0, 3, "SCH")
        or _contains(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or _contains(v, i + 2, 1, "T", "S")
        or (
            (_contains(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
            and (
                _contains(v, i + 2, 1, *L_R_N_M_B_H_F_V_W_SPACE)
                or i + 1 == len(v) - 1
            )
        )
    )


def _condition_l0(v: str, i: int) -> bool:
    if i == len(v) - 3 and _contains(v, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    if (
        _contains(v, len(v) - 2, 2, "AS", "OS")
        or _contains(v, len(v) - 1, 1, "A", "O")
    ) and _contains(v, i - 1, 4, "ALLE"):
        return True
    return False


def _condition_m0(v: str, i: int) -> bool:
    if _char_at(v, i + 1) == "M":
        return True
    return _contains(v, i - 1, 3, "UMB") and (
        i + 1 == len(v) - 1 or _contains(v, i + 2, 2, "ER")
    )


def double_metaphone(
    token: str, max_code_len: int = 4
) -> tuple[str, str] | None:
    """(primary, alternate) pair; None for a cleaned-empty input."""
    v = token.strip() if token else token
    if not v:
        return None
    v = v.upper()
    slavo = _is_slavo_germanic(v)
    i = 1 if v.startswith(SILENT_START) else 0
    r = _Result(max_code_len)
    while not r.is_complete and i <= len(v) - 1:
        ch = v[i]
        if ch in "AEIOUY":
            if i == 0:
                r.append("A")
            i += 1
        elif ch == "B":
            r.append("P")
            i += 2 if _char_at(v, i + 1) == "B" else 1
        elif ch == "Ç":
            r.append("S")
            i += 1
        elif ch == "C":
            i = _handle_c(v, r, i)
        elif ch == "D":
            i = _handle_d(v, r, i)
        elif ch == "F":
            r.append("F")
            i += 2 if _char_at(v, i + 1) == "F" else 1
        elif ch == "G":
            i = _handle_g(v, r, i, slavo)
        elif ch == "H":
            i = _handle_h(v, r, i)
        elif ch == "J":
            i = _handle_j(v, r, i, slavo)
        elif ch == "K":
            r.append("K")
            i += 2 if _char_at(v, i + 1) == "K" else 1
        elif ch == "L":
            i = _handle_l(v, r, i)
        elif ch == "M":
            r.append("M")
            i += 2 if _condition_m0(v, i) else 1
        elif ch == "N":
            r.append("N")
            i += 2 if _char_at(v, i + 1) == "N" else 1
        elif ch == "Ñ":
            r.append("N")
            i += 1
        elif ch == "P":
            i = _handle_p(v, r, i)
        elif ch == "Q":
            r.append("K")
            i += 2 if _char_at(v, i + 1) == "Q" else 1
        elif ch == "R":
            i = _handle_r(v, r, i, slavo)
        elif ch == "S":
            i = _handle_s(v, r, i, slavo)
        elif ch == "T":
            i = _handle_t(v, r, i)
        elif ch == "V":
            r.append("F")
            i += 2 if _char_at(v, i + 1) == "V" else 1
        elif ch == "W":
            i = _handle_w(v, r, i)
        elif ch == "X":
            i = _handle_x(v, r, i)
        elif ch == "Z":
            i = _handle_z(v, r, i, slavo)
        else:
            i += 1
    return "".join(r.primary), "".join(r.alternate)


def dmetaphone_udf(
    inject: bool = True, max_code_len: int = 4, analyzer: str = "standard"
):
    """pandas UDF: text:string -> DoubleMetaphoneFilter's emitted term
    stream as array<string> (original first under inject; primary then
    alternate at the same position). Encode memoized per batch —
    cost ∝ vocabulary, not token stream."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_with_positions

        memo: dict[str, tuple[str, str] | None] = {}

        def enc(t):
            if t not in memo:
                memo[t] = double_metaphone(t, max_code_len)
            return memo[t]

        rows = []
        for txt in texts:
            toks, _poss = tokenize_with_positions(
                txt if isinstance(txt, str) else None, analyzer
            )
            out = []
            for t in toks:
                res = enc(t) if t else None
                primary, alternate = res if res else ("", "")
                emit_p = bool(primary) and primary != t
                emit_a = (
                    bool(alternate) and alternate != primary and primary != t
                )
                if inject:
                    out.append(t)
                    if emit_p:
                        out.append(primary)
                    if emit_a:
                        out.append(alternate)
                else:
                    if emit_p:
                        out.append(primary)
                    if emit_a:
                        out.append(alternate)
                    if not emit_p and not emit_a:
                        out.append(t)
            rows.append(out)
        return pd.Series(rows, index=texts.index)

    return F.pandas_udf(batch, ArrayType(StringType()))


# -- ANSI-SQL mirror (DuckDB recursive CTE), generated from the same rule
# -- structure as the Python port. State: (tok, v, slavo, i, pri, alt)
# -- with i 0-based like the C#; every CharAt/Contains is bounds-guarded
# -- because DuckDB substr() WRAPS on negative starts.

def _sql_ca(off) -> str:
    """CharAt(v, i + off) — '' out of range (char.MinValue analogue)."""
    e = f"(i + {off})" if off else "i"
    return (
        f"CASE WHEN {e} < 0 OR {e} >= len(v) THEN ''"
        f" ELSE substr(v, {e} + 1, 1) END"
    )


def _sql_cont(start_off, length: int, *crit: str) -> str:
    """Contains(v, i + start_off, length, crit...)."""
    s = f"(i + {start_off})" if start_off else "i"
    lst = ", ".join(f"'{c}'" for c in crit)
    return (
        f"({s} >= 0 AND {s} + {length} <= len(v)"
        f" AND substr(v, {s} + 1, {length}) IN ({lst}))"
    )


def _sql_cont_abs(start, length: int, *crit: str) -> str:
    """Contains(v, start, length, crit...) with an absolute start expr."""
    lst = ", ".join(f"'{c}'" for c in crit)
    return (
        f"(({start}) >= 0 AND ({start}) + {length} <= len(v)"
        f" AND substr(v, ({start}) + 1, {length}) IN ({lst}))"
    )


def _sql_vowel(ch_expr: str) -> str:
    return f"({ch_expr}) IN ('A','E','I','O','U','Y')"


def _dmp_rules() -> list[tuple[str, str, str, str]]:
    """(condition, primary_append, alternate_append, advance) rows in the
    exact first-match-wins order of the reference's switch + handler
    if-chains. Appends are SQL string literals or ''."""
    ca = _sql_ca
    cont = _sql_cont
    cabs = _sql_cont_abs
    vow = _sql_vowel
    sym = "substr(v, i + 1, 1)"
    last = "i = len(v) - 1"

    def adv2if(cond: str) -> str:
        return f"CASE WHEN {cond} THEN 2 ELSE 1 END"

    c0 = (
        f"({cont(0, 4, 'CHIA')} OR (i > 1 AND NOT {vow(ca(-2))}"
        f" AND {cont(-1, 3, 'ACH')}"
        f" AND (({ca(2)} <> 'I' AND {ca(2)} <> 'E')"
        f" OR {cont(-2, 6, 'BACHER', 'MACHER')})))"
    )
    ch0 = (
        f"(i = 0 AND ({cont(1, 5, 'HARAC', 'HARIS')}"
        f" OR {cont(1, 3, 'HOR', 'HYM', 'HIA', 'HEM')})"
        f" AND NOT {cabs('0', 5, 'CHORE')})"
    )
    ch1 = (
        f"({cabs('0', 4, 'VAN ', 'VON ')} OR {cabs('0', 3, 'SCH')}"
        f" OR {cont(-2, 6, 'ORCHES', 'ARCHIT', 'ORCHID')}"
        f" OR {cont(2, 1, 'T', 'S')}"
        f" OR (({cont(-1, 1, 'A', 'O', 'U', 'E')} OR i = 0)"
        f" AND ({cont(2, 1, *L_R_N_M_B_H_F_V_W_SPACE)}"
        f" OR i + 1 = len(v) - 1)))"
    )
    l0 = (
        f"((i = len(v) - 3 AND {cont(-1, 4, 'ILLO', 'ILLA', 'ALLE')})"
        f" OR (({cabs('len(v) - 2', 2, 'AS', 'OS')}"
        f" OR {cabs('len(v) - 1', 1, 'A', 'O')})"
        f" AND {cont(-1, 4, 'ALLE')}))"
    )
    m0 = (
        f"({ca(1)} = 'M' OR ({cont(-1, 3, 'UMB')}"
        f" AND (i + 1 = len(v) - 1 OR {cont(2, 2, 'ER')})))"
    )
    germanic = (
        f"({cabs('0', 4, 'VAN ', 'VON ')} OR {cabs('0', 3, 'SCH')})"
    )

    R: list[tuple[str, str, str, str]] = []

    # vowels
    R.append((f"{sym} IN ('A','E','I','O','U','Y') AND i = 0", "A", "A", "1"))
    R.append((f"{sym} IN ('A','E','I','O','U','Y')", "", "", "1"))
    # B
    R.append((f"{sym} = 'B'", "P", "P", adv2if(f"{ca(1)} = 'B'")))
    # Ç / Ñ
    R.append((f"{sym} = 'Ç'", "S", "S", "1"))
    R.append((f"{sym} = 'Ñ'", "N", "N", "1"))
    # C
    R.append((f"{sym} = 'C' AND {c0}", "K", "K", "2"))
    R.append((f"{sym} = 'C' AND i = 0 AND {cont(0, 6, 'CAESAR')}", "S", "S", "2"))
    ch_g = f"{sym} = 'C' AND {cont(0, 2, 'CH')}"
    R.append((f"{ch_g} AND i > 0 AND {cont(0, 4, 'CHAE')}", "K", "X", "2"))
    R.append((f"{ch_g} AND {ch0}", "K", "K", "2"))
    R.append((f"{ch_g} AND {ch1}", "K", "K", "2"))
    R.append((f"{ch_g} AND i > 0 AND {cabs('0', 2, 'MC')}", "K", "K", "2"))
    R.append((f"{ch_g} AND i > 0", "X", "K", "2"))
    R.append((ch_g, "X", "X", "2"))
    R.append((
        f"{sym} = 'C' AND {cont(0, 2, 'CZ')} AND NOT {cont(-2, 4, 'WICZ')}",
        "S", "X", "2",
    ))
    R.append((f"{sym} = 'C' AND {cont(1, 3, 'CIA')}", "X", "X", "3"))
    cc_g = (
        f"{sym} = 'C' AND {cont(0, 2, 'CC')}"
        f" AND NOT (i = 1 AND {_sql_ca(-1)} = 'M')"
    )
    cc_ieh = (
        f"{cont(2, 1, 'I', 'E', 'H')} AND NOT {cont(2, 2, 'HU')}"
    )
    R.append((
        f"{cc_g} AND {cc_ieh} AND ((i = 1 AND {ca(-1)} = 'A')"
        f" OR {cont(-1, 5, 'UCCEE', 'UCCES')})",
        "KS", "KS", "3",
    ))
    R.append((f"{cc_g} AND {cc_ieh}", "X", "X", "3"))
    R.append((cc_g, "K", "K", "2"))
    R.append((f"{sym} = 'C' AND {cont(0, 2, 'CK', 'CG', 'CQ')}", "K", "K", "2"))
    R.append((
        f"{sym} = 'C' AND {cont(0, 2, 'CI', 'CE', 'CY')}"
        f" AND {cont(0, 3, 'CIO', 'CIE', 'CIA')}",
        "S", "X", "2",
    ))
    R.append((f"{sym} = 'C' AND {cont(0, 2, 'CI', 'CE', 'CY')}", "S", "S", "2"))
    R.append((
        f"{sym} = 'C'", "K", "K",
        f"CASE WHEN {cont(1, 2, ' C', ' Q', ' G')} THEN 3"
        f" WHEN {cont(1, 1, 'C', 'K', 'Q')}"
        f" AND NOT {cont(1, 2, 'CE', 'CI')} THEN 2 ELSE 1 END",
    ))
    # D
    R.append((
        f"{sym} = 'D' AND {cont(0, 2, 'DG')} AND {cont(2, 1, 'I', 'E', 'Y')}",
        "J", "J", "3",
    ))
    R.append((f"{sym} = 'D' AND {cont(0, 2, 'DG')}", "TK", "TK", "2"))
    R.append((f"{sym} = 'D' AND {cont(0, 2, 'DT', 'DD')}", "T", "T", "2"))
    R.append((f"{sym} = 'D'", "T", "T", "1"))
    # F
    R.append((f"{sym} = 'F'", "F", "F", adv2if(f"{ca(1)} = 'F'")))
    # G -> GH
    gh_g = f"{sym} = 'G' AND {ca(1)} = 'H'"
    R.append((f"{gh_g} AND i > 0 AND NOT {vow(ca(-1))}", "K", "K", "2"))
    R.append((f"{gh_g} AND i = 0 AND {ca(2)} = 'I'", "J", "J", "2"))
    R.append((f"{gh_g} AND i = 0", "K", "K", "2"))
    R.append((
        f"{gh_g} AND ((i > 1 AND {cont(-2, 1, 'B', 'H', 'D')})"
        f" OR (i > 2 AND {cont(-3, 1, 'B', 'H', 'D')})"
        f" OR (i > 3 AND {cont(-4, 1, 'B', 'H')}))",
        "", "", "2",
    ))
    R.append((
        f"{gh_g} AND i > 2 AND {ca(-1)} = 'U'"
        f" AND {cont(-3, 1, 'C', 'G', 'L', 'R', 'T')}",
        "F", "F", "2",
    ))
    R.append((f"{gh_g} AND i > 0 AND {ca(-1)} <> 'I'", "K", "K", "2"))
    R.append((gh_g, "", "", "2"))
    # G -> GN
    gn_g = f"{sym} = 'G' AND {ca(1)} = 'N'"
    R.append((
        f"{gn_g} AND i = 1 AND {vow(ca(-1))} AND NOT slavo",
        "KN", "N", "2",
    ))
    R.append((
        f"{gn_g} AND NOT {cont(2, 2, 'EY')} AND {ca(1)} <> 'Y' AND NOT slavo",
        "N", "KN", "2",
    ))
    R.append((gn_g, "KN", "KN", "2"))
    # G others
    R.append((
        f"{sym} = 'G' AND {cont(1, 2, 'LI')} AND NOT slavo",
        "KL", "L", "2",
    ))
    R.append((
        f"{sym} = 'G' AND i = 0 AND ({ca(1)} = 'Y'"
        f" OR {cont(1, 2, *ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)})",
        "K", "J", "2",
    ))
    R.append((
        f"{sym} = 'G' AND ({cont(1, 2, 'ER')} OR {ca(1)} = 'Y')"
        f" AND NOT {cabs('0', 6, 'DANGER', 'RANGER', 'MANGER')}"
        f" AND NOT {cont(-1, 1, 'E', 'I')}"
        f" AND NOT {cont(-1, 3, 'RGY', 'OGY')}",
        "K", "J", "2",
    ))
    g_ei = (
        f"{sym} = 'G' AND ({cont(1, 1, 'E', 'I', 'Y')}"
        f" OR {cont(-1, 4, 'AGGI', 'OGGI')})"
    )
    R.append((
        f"{g_ei} AND ({germanic} OR {cont(1, 2, 'ET')})", "K", "K", "2",
    ))
    R.append((f"{g_ei} AND {cont(1, 3, 'IER')}", "J", "J", "2"))
    R.append((g_ei, "J", "K", "2"))
    R.append((f"{sym} = 'G' AND {ca(1)} = 'G'", "K", "K", "2"))
    R.append((f"{sym} = 'G'", "K", "K", "1"))
    # H
    R.append((
        f"{sym} = 'H' AND (i = 0 OR {vow(ca(-1))}) AND {vow(ca(1))}",
        "H", "H", "2",
    ))
    R.append((f"{sym} = 'H'", "", "", "1"))
    # J
    j_g = f"{sym} = 'J'"
    jose = f"({cont(0, 4, 'JOSE')} OR {cabs('0', 4, 'SAN ')})"
    R.append((
        f"{j_g} AND {jose} AND (((i = 0 AND {ca(4)} = ' ') OR len(v) = 4)"
        f" OR {cabs('0', 4, 'SAN ')})",
        "H", "H", "1",
    ))
    R.append((f"{j_g} AND {jose}", "J", "H", "1"))
    jadv = adv2if(f"{ca(1)} = 'J'")
    R.append((f"{j_g} AND i = 0", "J", "A", jadv))
    R.append((
        f"{j_g} AND {vow(ca(-1))} AND NOT slavo"
        f" AND ({ca(1)} = 'A' OR {ca(1)} = 'O')",
        "J", "H", jadv,
    ))
    R.append((f"{j_g} AND {last}", "J", " ", jadv))
    R.append((
        f"{j_g} AND NOT {cont(1, 1, *L_T_K_S_N_M_B_Z)}"
        f" AND NOT {cont(-1, 1, 'S', 'K', 'L')}",
        "J", "J", jadv,
    ))
    R.append((j_g, "", "", jadv))
    # K
    R.append((f"{sym} = 'K'", "K", "K", adv2if(f"{ca(1)} = 'K'")))
    # L
    R.append((f"{sym} = 'L' AND {ca(1)} = 'L' AND {l0}", "L", "", "2"))
    R.append((f"{sym} = 'L' AND {ca(1)} = 'L'", "L", "L", "2"))
    R.append((f"{sym} = 'L'", "L", "L", "1"))
    # M / N
    R.append((f"{sym} = 'M'", "M", "M", adv2if(m0)))
    R.append((f"{sym} = 'N'", "N", "N", adv2if(f"{ca(1)} = 'N'")))
    # P
    R.append((f"{sym} = 'P' AND {ca(1)} = 'H'", "F", "F", "2"))
    R.append((f"{sym} = 'P'", "P", "P", adv2if(cont(1, 1, "P", "B"))))
    # Q
    R.append((f"{sym} = 'Q'", "K", "K", adv2if(f"{ca(1)} = 'Q'")))
    # R
    radv = adv2if(f"{ca(1)} = 'R'")
    R.append((
        f"{sym} = 'R' AND {last} AND NOT slavo AND {cont(-2, 2, 'IE')}"
        f" AND NOT {cont(-4, 2, 'ME', 'MA')}",
        "", "R", radv,
    ))
    R.append((f"{sym} = 'R'", "R", "R", radv))
    # S
    s_g = f"{sym} = 'S'"
    R.append((f"{s_g} AND {cont(-1, 3, 'ISL', 'YSL')}", "", "", "1"))
    R.append((f"{s_g} AND i = 0 AND {cont(0, 5, 'SUGAR')}", "X", "S", "1"))
    R.append((
        f"{s_g} AND {cont(0, 2, 'SH')}"
        f" AND {cont(1, 4, 'HEIM', 'HOEK', 'HOLM', 'HOLZ')}",
        "S", "S", "2",
    ))
    R.append((f"{s_g} AND {cont(0, 2, 'SH')}", "X", "X", "2"))
    sio = f"({cont(0, 3, 'SIO', 'SIA')} OR {cont(0, 4, 'SIAN')})"
    R.append((f"{s_g} AND {sio} AND slavo", "S", "S", "3"))
    R.append((f"{s_g} AND {sio}", "S", "X", "3"))
    R.append((
        f"{s_g} AND ((i = 0 AND {cont(1, 1, 'M', 'N', 'L', 'W')})"
        f" OR {cont(1, 1, 'Z')})",
        "S", "X", adv2if(cont(1, 1, "Z")),
    ))
    sc_g = f"{s_g} AND {cont(0, 2, 'SC')}"
    sch = f"{ca(2)} = 'H'"
    dutch = cont(3, 2, "OO", "ER", "EN", "UY", "ED", "EM")
    R.append((
        f"{sc_g} AND {sch} AND {dutch} AND {cont(3, 2, 'ER', 'EN')}",
        "X", "SK", "3",
    ))
    R.append((f"{sc_g} AND {sch} AND {dutch}", "SK", "SK", "3"))
    ch3 = _sql_cont_abs("3", 1, "A", "E", "I", "O", "U", "Y")
    ch3w = _sql_cont_abs("3", 1, "W")
    R.append((
        f"{sc_g} AND {sch} AND i = 0 AND NOT {ch3} AND NOT {ch3w}",
        "X", "S", "3",
    ))
    R.append((f"{sc_g} AND {sch}", "X", "X", "3"))
    R.append((f"{sc_g} AND {cont(2, 1, 'I', 'E', 'Y')}", "S", "S", "3"))
    R.append((sc_g, "SK", "SK", "3"))
    sadv = adv2if(cont(1, 1, "S", "Z"))
    R.append((
        f"{s_g} AND {last} AND {cont(-2, 2, 'AI', 'OI')}", "", "S", sadv,
    ))
    R.append((s_g, "S", "S", sadv))
    # T
    R.append((f"{sym} = 'T' AND {cont(0, 4, 'TION')}", "X", "X", "3"))
    R.append((f"{sym} = 'T' AND {cont(0, 3, 'TIA', 'TCH')}", "X", "X", "3"))
    th = f"({cont(0, 2, 'TH')} OR {cont(0, 3, 'TTH')})"
    R.append((
        f"{sym} = 'T' AND {th} AND ({cont(2, 2, 'OM', 'AM')} OR {germanic})",
        "T", "T", "2",
    ))
    R.append((f"{sym} = 'T' AND {th}", "0", "T", "2"))
    R.append((f"{sym} = 'T'", "T", "T", adv2if(cont(1, 1, "T", "D"))))
    # V
    R.append((f"{sym} = 'V'", "F", "F", adv2if(f"{ca(1)} = 'V'")))
    # W
    R.append((f"{sym} = 'W' AND {cont(0, 2, 'WR')}", "R", "R", "2"))
    R.append((f"{sym} = 'W' AND i = 0 AND {vow(ca(1))}", "A", "F", "1"))
    R.append((f"{sym} = 'W' AND i = 0 AND {cont(0, 2, 'WH')}", "A", "A", "1"))
    R.append((
        f"{sym} = 'W' AND (({last} AND {vow(ca(-1))})"
        f" OR {cont(-1, 5, 'EWSKI', 'EWSKY', 'OWSKI', 'OWSKY')}"
        f" OR {cabs('0', 3, 'SCH')})",
        "", "F", "1",
    ))
    R.append((f"{sym} = 'W' AND {cont(0, 4, 'WICZ', 'WITZ')}", "TS", "FX", "4"))
    R.append((f"{sym} = 'W'", "", "", "1"))
    # X
    R.append((f"{sym} = 'X' AND i = 0", "S", "S", "1"))
    xadv = adv2if(cont(1, 1, "C", "X"))
    R.append((
        f"{sym} = 'X' AND {last} AND ({cont(-3, 3, 'IAU', 'EAU')}"
        f" OR {cont(-2, 2, 'AU', 'OU')})",
        "", "", xadv,
    ))
    R.append((f"{sym} = 'X'", "KS", "KS", xadv))
    # Z
    R.append((f"{sym} = 'Z' AND {ca(1)} = 'H'", "J", "J", "2"))
    zadv = adv2if(f"{ca(1)} = 'Z'")
    R.append((
        f"{sym} = 'Z' AND ({cont(1, 2, 'ZO', 'ZI', 'ZA')}"
        f" OR (slavo AND i > 0 AND {ca(-1)} <> 'T'))",
        "S", "TS", zadv,
    ))
    R.append((f"{sym} = 'Z'", "S", "S", zadv))
    # default (non-letters etc.)
    R.append(("TRUE", "", "", "1"))
    return R


def dmetaphone_cte(vocab: str = "vocab", max_code_len: int = 4) -> str:
    """DoubleMetaphone as one recursive CTE over (tok, v, slavo, i, pri,
    alt); the transition's three outputs (primary append, alternate
    append, advance) are parallel first-match-wins CASEs generated from
    the SAME ordered rule list. Ends in encv(tok, pri, alt). Needs WITH
    RECURSIVE on the enclosing query."""
    rules = _dmp_rules()
    p_case = "CASE\n      " + "\n      ".join(
        f"WHEN {c} THEN '{p}'" for c, p, a, adv in rules
    ) + "\n      ELSE '' END"
    a_case = "CASE\n      " + "\n      ".join(
        f"WHEN {c} THEN '{a}'" for c, p, a, adv in rules
    ) + "\n      ELSE '' END"
    adv_case = "CASE\n      " + "\n      ".join(
        f"WHEN {c} THEN ({adv})" for c, p, a, adv in rules
    ) + "\n      ELSE 1 END"
    m = max_code_len
    return f"""d0 AS (
  SELECT tok, upper(trim(tok)) AS v FROM {vocab}
),
d1 AS (
  SELECT tok, v,
         (v LIKE '%W%' OR v LIKE '%K%' OR v LIKE '%CZ%'
          OR v LIKE '%WITZ%') AS slavo,
         CASE WHEN substr(v, 1, 2) IN ('GN','KN','PN','WR','PS')
              THEN 1 ELSE 0 END AS i0
  FROM d0 WHERE v <> ''
),
dwalk(tok, v, slavo, i, pri, alt) AS (
  SELECT tok, v, slavo, i0, '', '' FROM d1
  UNION ALL
  SELECT tok, v, slavo,
         i + ({adv_case}),
         substr(pri || ({p_case}), 1, {m}),
         substr(alt || ({a_case}), 1, {m})
  FROM dwalk
  WHERE (len(pri) < {m} OR len(alt) < {m}) AND i <= len(v) - 1
),
dfin AS (
  SELECT tok, pri, alt FROM dwalk
  WHERE NOT ((len(pri) < {m} OR len(alt) < {m}) AND i <= len(v) - 1)
),
encv AS (
  SELECT d0.tok, f.pri, f.alt
  FROM d0 LEFT JOIN dfin f ON d0.tok = f.tok
)"""


def double_metaphone_stream(
    tokens: list[str],
    positions: list[int],
    inject: bool = True,
    max_code_len: int = 4,
) -> list[tuple[str, int]]:
    """DoubleMetaphoneFilter.IncrementToken, traced from the queue logic:
    inject=true emits the ORIGINAL first (it keeps the real position
    increment), then the primary, then the alternate — all at the same
    position; a primary equal to the original is skipped, and the
    alternate needs both alternate != primary and primary != original.
    inject=false replaces the token with primary (then alternate at
    increment 0) — but when no encoding qualifies the ORIGINAL passes
    through unchanged (the loop returns the unmodified token)."""
    out: list[tuple[str, int]] = []
    for t, p in zip(tokens, positions):
        res = double_metaphone(t, max_code_len) if t else None
        primary, alternate = res if res else ("", "")
        emit_primary = bool(primary) and primary != t
        emit_alternate = (
            bool(alternate) and alternate != primary and primary != t
        )
        if inject:
            out.append((t, p))
            if emit_primary:
                out.append((primary, p))
            if emit_alternate:
                out.append((alternate, p))
        else:
            if emit_primary:
                out.append((primary, p))
            if emit_alternate:
                out.append((alternate, p))
            if not emit_primary and not emit_alternate:
                out.append((t, p))
    return out
