"""HTMLStripCharFilter (Analysis/CharFilter/HTMLStripCharFilter.cs — the
generated JFlex scanner's observable contract, re-derived as a hand
scanner; the 32k-line DFA is storage detail).

Contract, verified against the reference's own vector tests:
  * character entities `&name;` (the HTML 4.01 table, with nbsp -> ' '
    — a SPACE, the reference's table value — plus apos and the six
    uppercase variants QUOT/COPY/GT/LT/REG/AMP) and numeric
    `&#ddd;`/`&#xhhh;` decode; anything else after '&' stays literal.
  * comments `<!-- ... -->` (incl. `<!---...--->`), bang tags
    `<! ... >`, and processing instructions `<? ... >` (quote-aware)
    strip to nothing; unterminated comments eat to EOF.
  * `<![CDATA[ ... ]]>` emits the inner text VERBATIM (not re-parsed).
  * open/close tags parse quote-aware (attribute values may hold '>',
    newlines, embedded comment-lookalikes); tag names may be any
    alphabetic run incl. supplementary CJK. INLINE elements (the
    grammar's InlineElment set) strip to nothing; everything else is
    block-level and becomes '\\n'; BR start AND end become '\\n'.
  * SCRIPT/STYLE elements swallow their content and emit ONE '\\n';
    inside script, `<!-- ... -->` script-comments respect single/double
    quoted strings with backslash escapes, so neither `-->` in quotes
    nor `</script>` inside the comment ends anything early.
  * escapedTags (case-insensitive): matching open/close tags pass
    through verbatim; escaped SCRIPT/STYLE keep their tags but still
    drop their content.
  * a '<' or '&' that starts no valid construct is emitted literally.
"""
from __future__ import annotations

import html.entities as _ent

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

ENTITIES: dict[str, str] = dict(_ent.entitydefs)
ENTITIES["apos"] = "'"
ENTITIES["nbsp"] = " "  # the reference table maps nbsp to a plain space
for _lower, _upper in (
    ("quot", "QUOT"), ("copy", "COPY"), ("gt", "GT"),
    ("lt", "LT"), ("reg", "REG"), ("amp", "AMP"),
):
    ENTITIES[_upper] = ENTITIES[_lower]

INLINE_ELEMENTS = frozenset(
    "a abbr acronym b basefont bdo big cite code dfn em font i img input "
    "kbd label q s samp select small span strike strong sub sup textarea "
    "tt u var".split()
)


def _entity_end(text: str, i: int) -> tuple[str, int] | None:
    """Decode an entity starting at text[i] == '&'; (value, next) or None."""
    semi = text.find(";", i + 1, i + 32)
    if semi == -1:
        return None
    body = text[i + 1 : semi]
    if body.startswith("#"):
        num = body[1:]
        try:
            cp = int(num[1:], 16) if num[:1] in ("x", "X") else int(num)
        except ValueError:
            return None
        if not 0 <= cp <= 0x10FFFF:
            return None
        return chr(cp), semi + 1
    if body in ENTITIES:
        return ENTITIES[body], semi + 1
    return None


def _skip_quoted(text: str, i: int) -> int:
    """Skip a quoted string starting at text[i] (backslash escapes)."""
    q = text[i]
    i += 1
    n = len(text)
    while i < n:
        if text[i] == "\\":
            i += 2
            continue
        if text[i] == q:
            return i + 1
        i += 1
    return n


def _skip_script_comment(text: str, i: int) -> int:
    """From just after '<!--' inside script: to just after the unquoted
    '-->' (quoted strings respected), or EOF."""
    n = len(text)
    while i < n:
        c = text[i]
        if c in "'\"":
            i = _skip_quoted(text, i)
        elif text.startswith("-->", i):
            return i + 3
        else:
            i += 1
    return n


def _find_tag_end(text: str, i: int) -> int:
    """Index just after the '>' closing a tag whose '<' is behind `i`
    (quote-aware attribute scan), or -1 when unterminated."""
    n = len(text)
    while i < n:
        c = text[i]
        if c in "'\"":
            i = _skip_quoted(text, i)
        elif c == ">":
            return i + 1
        else:
            i += 1
    return -1


def _parse_close_tag(text: str, i: int) -> tuple[str, int] | None:
    """Parse '</ ws* name ws* >' starting at '<'; (name, next) or None."""
    n = len(text)
    j = i + 2
    while j < n and text[j].isspace():
        j += 1
    start = j
    while j < n and not text[j].isspace() and text[j] != ">":
        j += 1
    name = text[start:j]
    if not name or not name[0].isalpha():
        return None
    while j < n and text[j].isspace():
        j += 1
    if j < n and text[j] == ">":
        return name, j + 1
    return None


def _skip_element_content(text: str, i: int, name: str) -> tuple[int, int]:
    """Skip script/style content from `i`: returns (close_tag_start,
    next_index). Script comments respected. EOF -> (n, n)."""
    n = len(text)
    low = name.lower()
    while i < n:
        if text.startswith("<!--", i):
            i = _skip_script_comment(text, i + 4)
            continue
        if text.startswith("</", i):
            parsed = _parse_close_tag(text, i)
            if parsed is not None and parsed[0].lower() == low:
                return i, parsed[1]
        i += 1
    return n, n


def html_strip(text: str, escaped_tags=None) -> str:
    esc = frozenset(t.lower() for t in (escaped_tags or ()))
    out: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "&":
            ent = _entity_end(text, i)
            if ent is not None:
                out.append(ent[0])
                i = ent[1]
            else:
                out.append("&")
                i += 1
            continue
        if c != "<":
            out.append(c)
            i += 1
            continue
        # markup candidates
        if text.startswith("<!--", i):
            end = text.find("-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        if text.startswith("<![CDATA[", i):
            end = text.find("]]>", i + 9)
            if end == -1:
                out.append(text[i + 9 :])
                i = n
            else:
                out.append(text[i + 9 : end])
                i = end + 3
            continue
        if text.startswith("<!", i) or text.startswith("<?", i):
            end = _find_tag_end(text, i + 2)
            i = n if end == -1 else end
            continue
        if text.startswith("</", i):
            parsed = _parse_close_tag(text, i)
            if parsed is None:
                out.append("<")
                i += 1
                continue
            name, nxt = parsed
            low = name.lower()
            if low in esc:
                out.append(text[i:nxt])
            elif low == "br" or low not in INLINE_ELEMENTS:
                out.append("\n")
            i = nxt
            continue
        # open tag?
        if i + 1 < n and text[i + 1].isalpha():
            j = i + 1
            while j < n and not text[j].isspace() and text[j] not in ">/":
                j += 1
            name = text[i + 1 : j]
            end = _find_tag_end(text, j)
            if end == -1:
                out.append("<")
                i += 1
                continue
            low = name.lower()
            self_closing = text[i:end].rstrip(">").rstrip().endswith("/")
            if low in ("script", "style"):
                if low in esc:
                    out.append(text[i:end])  # the open tag, verbatim
                    if not self_closing:
                        close_start, nxt = _skip_element_content(
                            text, end, low
                        )
                        out.append(text[close_start:nxt])
                        i = nxt
                    else:
                        i = end
                else:
                    out.append("\n")
                    i = (
                        end
                        if self_closing
                        else _skip_element_content(text, end, low)[1]
                    )
            elif low in esc:
                out.append(text[i:end])
                i = end
            elif low == "br" or low not in INLINE_ELEMENTS:
                out.append("\n")
                i = end
            else:
                i = end
            continue
        out.append("<")
        i += 1
    return "".join(out)


def html_strip_udf(escaped_tags=None, analyzer: str = "whitespace"):
    esc = tuple(escaped_tags or ())

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_text

        return pd.Series(
            [
                tokenize_text(html_strip(t, esc), analyzer)
                if isinstance(t, str)
                else []
                for t in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
