"""ClassicTokenizer + ClassicFilter (the pre-3.1 StandardTokenizer).

Reference semantics:
- ClassicTokenizer grammar (JFlex, longest-match):
  src/Lucene.Net.Analysis.Common/Analysis/Standard/ClassicTokenizerImpl.cs
  (generated from ClassicTokenizerImpl.jflex — the rule set below is the
  published grammar: ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST,
  NUM, CJ, ACRONYM_DEP)
- ACRONYM_DEP handling (emit as HOST, strip the trailing dot):
  Standard/ClassicTokenizer.cs:160-175
- ClassicFilter (strip trailing 's from APOSTROPHE tokens, strip dots
  from ACRONYM tokens): Standard/ClassicFilter.cs:40-75
- maxTokenLength=255 drop-with-position-bump: ClassicAnalyzer.cs:60,
  ClassicTokenizer.cs:120-130

JFlex resolves a match by taking the LONGEST match across every rule,
breaking ties by rule order in the grammar file. A plain regex alternation
picks the FIRST alternative that matches at all, which is wrong here in
both directions ("62.46" must be HOST, not NUM, at equal length — rule
order; "a.b2/c3" must be one NUM token, not the shorter HOST "a.b2" —
longest match). So this scanner tries every rule's anchored pattern at
each candidate start and keeps the longest, first-listed match — exactly
the JFlex discipline.

Verified against the reference's own expectations in
Lucene.Net.Tests.Analysis.Common/Analysis/Core/TestClassicAnalyzer.cs
(see tests/test_coreanalyzers.py: underscores, apostrophes, company,
email, host, number, acronym, C++/C#, max-token-length vectors).

Letter-class convention matches functions/analysis.py: Python's
``[^\\W\\d_]`` stands in for the Unicode letter property (the documented
divergence on Nl/No numerals carries over); the CJ and KOREAN classes are
the grammar's literal BMP ranges.
"""
from __future__ import annotations

import re

# The grammar's CJ class (CJK chars tokenized ONE PER CHAR, type <CJ>) and
# the KOREAN class (Hangul joins ALPHANUM runs like letters/digits do).
_CJ_CLASS = (
    "㄀-ㄯ぀-ヿㇰ-ㇿ㌀-㍿"
    "㐀-䶿一-鿿豈-﫿"
)
_KOREAN_CLASS = "가-힯ᄀ-ᇿ"

# LETTER = [:letter:] minus CJ (the grammar's !(![:letter:]|{CJ}))
_L = f"(?:(?![{_CJ_CLASS}])[^\\W\\d_])"
_D = r"\d"
_K = f"[{_KOREAN_CLASS}]"
# ALPHANUM = ({LETTER}|{DIGIT}|{KOREAN})+
_AN = f"(?:{_L}|{_D}|{_K})+"
# ALPHA = {LETTER}+
_ALPHA = f"{_L}+"
# HAS_DIGIT = ({LETTER}|{DIGIT})* {DIGIT} ({LETTER}|{DIGIT})*  — linear form
_HD = f"(?:{_L}|{_D})*{_D}(?:{_L}|{_D})*"
# P = ("_"|"-"|"/"|"."|",")
_P = r"[_\-/.,]"

# NUM: the grammar's six alternatives union to "two or more P-separated
# letter/digit segments where every other segment contains a digit". The
# two greedy forms below each maximal-munch one parity; the scanner takes
# the longer of the two (both registered under type NUM, adjacent priority).
_NUM_ODD = f"{_HD}{_P}{_AN}(?:{_P}{_HD}{_P}{_AN})*(?:{_P}{_HD})?"
_NUM_EVEN = f"{_AN}{_P}{_HD}(?:{_P}{_AN}{_P}{_HD})*(?:{_P}{_AN})?"

ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM, CJ, ACRONYM_DEP = (
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>", "<EMAIL>",
    "<HOST>", "<NUM>", "<CJ>", "<ACRONYM_DEP>",
)

# (type, compiled anchored pattern) in grammar-file order — the tie-break
# order of JFlex rule resolution. NUM's two parities sit at the same spot.
_RULES: list[tuple[str, re.Pattern]] = [
    (ALPHANUM, re.compile(_AN)),
    (APOSTROPHE, re.compile(f"{_ALPHA}(?:'{_ALPHA})+")),
    (ACRONYM, re.compile(f"{_L}\\.(?:{_L}\\.)+")),
    (COMPANY, re.compile(f"{_ALPHA}[&@]{_ALPHA}")),
    (
        EMAIL,
        re.compile(f"{_AN}(?:[.\\-_]{_AN})*@{_AN}(?:[.\\-]{_AN})+"),
    ),
    (HOST, re.compile(f"{_AN}(?:\\.{_AN})+")),
    (NUM, re.compile(_NUM_ODD)),
    (NUM, re.compile(_NUM_EVEN)),
    (CJ, re.compile(f"[{_CJ_CLASS}]")),
    (ACRONYM_DEP, re.compile(f"{_AN}\\.(?:{_AN}\\.)+")),
]

# candidate token starts: anything ALPHANUM or CJ can begin with
_START = re.compile(f"[^\\W_]|[{_CJ_CLASS}]")

# fast path: text made of plain letter/digit runs only (none of the join
# chars any compound rule needs) tokenizes as ALPHANUM runs — one C-speed
# containment scan picks the path, like analysis._NEEDS_FULL
_NEEDS_RULES = re.compile(f"['&@.,_/\\-]|[{_CJ_CLASS}]").search
_RUN = re.compile(f"(?:{_L}|{_D}|{_K})+")


def classic_scan(text: str) -> list[tuple[str, int, int, str]]:
    """Tokenize like ClassicTokenizerImpl: (raw_token, start, end, type)
    per match, longest-match-first-rule semantics. ACRONYM_DEP is already
    rewritten to HOST with its trailing dot dropped (the token END still
    covers the consumed dot, like the reference's scanner position)."""
    out: list[tuple[str, int, int, str]] = []
    if not text:
        return out
    if not _NEEDS_RULES(text):
        for m in _RUN.finditer(text):
            out.append((m.group(0), m.start(), m.end(), ALPHANUM))
        return out
    i, n = 0, len(text)
    while i < n:
        m0 = _START.search(text, i)
        if m0 is None:
            break
        i = m0.start()
        best_len = 0
        best_type = ALPHANUM
        for ttype, pat in _RULES:
            m = pat.match(text, i)
            if m is not None and m.end() - i > best_len:
                best_len = m.end() - i
                best_type = ttype
        tok = text[i : i + best_len]
        end = i + best_len
        if best_type == ACRONYM_DEP:
            # ClassicTokenizer.cs:166-171 — emit as HOST minus the final '.'
            out.append((tok[:-1], i, end, HOST))
        else:
            out.append((tok, i, end, best_type))
        i = end
    return out


def classic_filter(tok: str, ttype: str) -> str:
    """ClassicFilter.cs: strip a trailing 's (or 'S) from APOSTROPHE
    tokens; remove every '.' from ACRONYM tokens. Case runs BEFORE the
    LowerCaseFilter in ClassicAnalyzer's chain, hence the 'S arm."""
    if ttype == APOSTROPHE and len(tok) >= 2 and tok[-2] == "'" and tok[-1] in "sS":
        return tok[:-2]
    if ttype == ACRONYM:
        return tok.replace(".", "")
    return tok


def classic_matches(text: str):
    """(filtered_token, start, end) triples for the analysis-chain
    tokenizer dispatch: ClassicFilter applied, offsets raw. The >255 drop
    happens in the chain on the RAW span length (end - start), matching
    ClassicTokenizer's scanner-length check."""
    for tok, s, e, ttype in classic_scan(text):
        yield classic_filter(tok, ttype), s, e
