"""WikipediaTokenizer (Analysis/Wikipedia/WikipediaTokenizer.cs +
WikipediaTokenizerImpl.cs — the wiki-markup JFlex grammar's observable
contract, re-derived as a hand scanner and verified against the
reference's own vector suite).

Constructs and their token types:
  * plain text: the classic word grammar (ALPHANUM/APOSTROPHE/HOST/...);
    digit-bearing dotted tokens type <NUM> (the wiki grammar's rule
    order differs from ClassicTokenizer's HOST-first there).
  * [[link]] / [[link|display info]]: every word inside is il
    (INTERNAL_LINK); [[Category:body]] (optionally [[:Category:...]])
    types the body words c (CATEGORY).
  * [scheme://url anchor words]: the raw URL is one elu token, anchor
    words are el — and the FIRST anchor word stacks at the URL's
    position (increment 0).
  * ''...'' / '''...''' / '''''...''''' regions type their words
    i / b / bi. An embedded [[...]] inside a quote region emits its own
    category/link tokens, after which ONLY an immediately-following
    quote run still closes the region — anything else returns the
    scanner to plain text (the vectors' "never closed" behavior).
  * ==h== / ===sh=== type their words h / sh.
  * <ref>...</ref> words type ci (CITATION); any other HTML tag is
    stripped and its contents stay plain.

Output modes (TOKENS_ONLY / UNTOKENIZED_ONLY / BOTH) with
`untokenized_types`: a region whose type is in the set collapses to ONE
token spanning its raw body (flags = UNTOKENIZED_TOKEN_FLAG);
BOTH emits the collapsed token first, then the words with the FIRST at
position increment 0.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

_SCHEMES = ("http://", "https://", "ftp://")


def _words(text: str, base: int, ttype: str | None = None):
    """classic-grammar words of a segment, offset by `base`; wiki retypes
    digit-bearing dotted tokens <HOST> -> <NUM>."""
    from .classic import classic_scan

    out = []
    for tok, s, e, ty in classic_scan(text):
        if ttype is not None:
            ty = ttype
        elif ty == "<HOST>" and any(c.isdigit() for c in tok):
            ty = "<NUM>"
        out.append([tok, base + s, base + e, ty, 1, 0])
    return out


def _quote_run(text: str, i: int) -> int:
    j = i
    while j < len(text) and text[j] == "'":
        j += 1
    return j - i


def wikipedia_scan(
    text: str,
    token_output: int = TOKENS_ONLY,
    untokenized_types: frozenset = frozenset(),
) -> list[tuple[str, int, int, str, int, int]]:
    """(term, start, end, type, pos_increment, flags) rows."""
    out: list[list] = []
    n = len(text)
    i = 0
    plain_start = 0

    def flush_plain(upto: int):
        if upto > plain_start:
            out.extend(_words(text[plain_start:upto], plain_start))

    def emit_region(body_start: int, body_end: int, ttype: str,
                    first_inc: int = 1):
        """Region words under the output mode; returns nothing."""
        rows = _words(text[body_start:body_end], body_start, ttype)
        if rows:
            rows[0][4] = first_inc
        if ttype in untokenized_types and token_output != TOKENS_ONLY:
            span = [
                text[body_start:body_end],
                body_start,
                body_end,
                ttype,
                1,
                UNTOKENIZED_TOKEN_FLAG,
            ]
            if token_output == UNTOKENIZED_ONLY:
                out.append(span)
                return
            # BOTH: span first, then the words with the first at inc 0
            out.append(span)
            if rows:
                rows[0][4] = 0
            out.extend(rows)
            return
        out.extend(rows)

    def scan_bracketed(start: int) -> int:
        """Handle '[[...]]' starting at `start`; returns the next index."""
        close = text.find("]]", start + 2)
        end = close if close != -1 else n
        content_start = start + 2
        body = text[content_start:end]
        bs = content_start
        if body.startswith(":"):
            body = body[1:]
            bs += 1
        if body.startswith("Category:"):
            bs += len("Category:")
            emit_region(bs, end, CATEGORY)
        else:
            emit_region(content_start, end, INTERNAL_LINK)
        return (close + 2) if close != -1 else n

    while i < n:
        c = text[i]
        if c == "[" and text.startswith("[[", i):
            flush_plain(i)
            i = scan_bracketed(i)
            plain_start = i
            continue
        if c == "[" and text[i + 1 : i + 9].lower().startswith(_SCHEMES):
            flush_plain(i)
            j = i + 1
            while j < n and not text[j].isspace() and text[j] != "]":
                j += 1
            out.append([text[i + 1 : j], i + 1, j, EXTERNAL_LINK_URL, 1, 0])
            close = text.find("]", j)
            anchor_end = close if close != -1 else n
            emit_region(j, anchor_end, EXTERNAL_LINK, first_inc=0)
            i = (close + 1) if close != -1 else n
            plain_start = i
            continue
        if c == "'":
            run = _quote_run(text, i)
            if run >= 2:
                flush_plain(i)
                if run >= 5:
                    marker, ttype = "'''''", BOLD_ITALICS
                elif run >= 3:
                    marker, ttype = "'''", BOLD
                else:
                    marker, ttype = "''", ITALICS
                i = i + len(marker)
                body_start = i
                # scan the region: ends at its closer, at '[[' (embedded
                # category/link), or at EOF
                while True:
                    nq = text.find(marker, i)
                    nb = text.find("[[", i)
                    if nb != -1 and (nq == -1 or nb < nq):
                        emit_region(body_start, nb, ttype)
                        i = scan_bracketed(nb)
                        # only an IMMEDIATE quote run still closes; anything
                        # else returns to plain
                        run2 = _quote_run(text, i)
                        if run2 >= 2:
                            i += run2
                        plain_start = i
                        break
                    if nq == -1:
                        # unclosed: the words since body_start are typed,
                        # per the reference's backtracking the region's own
                        # words still carry the type until EOF
                        emit_region(body_start, n, ttype)
                        i = n
                        plain_start = i
                        break
                    emit_region(body_start, nq, ttype)
                    i = nq + len(marker)
                    plain_start = i
                    break
                continue
        if c == "=" and text.startswith("==", i):
            flush_plain(i)
            if text.startswith("===", i):
                marker, ttype = "===", SUB_HEADING
            else:
                marker, ttype = "==", HEADING
            body_start = i + len(marker)
            close = text.find(marker, body_start)
            nl = text.find("\n", body_start)
            end = close if close != -1 and (nl == -1 or close < nl) else (
                nl if nl != -1 else n
            )
            emit_region(body_start, end, ttype)
            i = (end + len(marker)) if end == close else end
            plain_start = i
            continue
        if c == "<":
            if text[i : i + 5].lower() == "<ref>":
                flush_plain(i)
                close = text.lower().find("</ref>", i + 5)
                end = close if close != -1 else n
                emit_region(i + 5, end, CITATION)
                i = (close + 6) if close != -1 else n
                plain_start = i
                continue
            # any other tag: strip it, contents stay plain
            if i + 1 < n and (text[i + 1].isalpha() or text[i + 1] == "/"):
                gt = text.find(">", i + 1)
                if gt != -1:
                    flush_plain(i)
                    i = gt + 1
                    plain_start = i
                    continue
        i += 1
    flush_plain(n)
    return [tuple(r) for r in out]


def wikipedia_udf(
    token_output: int = TOKENS_ONLY, untokenized_types: frozenset = frozenset()
):
    def batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [t for t, *_rest in
                 wikipedia_scan(x, token_output, untokenized_types)]
                if isinstance(x, str)
                else []
                for x in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
