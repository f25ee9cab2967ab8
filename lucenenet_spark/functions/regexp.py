"""Lucene regexp syntax -> Java regex translation.

The reference compiles RegexpQuery patterns with its own automaton grammar
(Util/Automaton/RegExp.cs, default flags ALL), which differs from Java
regex in ways that mis-match silently if the pattern is passed through:

- matching is ANCHORED (the automaton accepts the whole term) — the caller
  anchors, this module only translates;
- `^` and `$` are ordinary literal characters (not anchors);
- `\\c` always means the literal character c (`\\d` is a literal 'd', NOT
  the Java digit class);
- `"..."` quotes a literal string;
- `@` is any-string, `#` the empty language;
- `~` (complement), `&` (intersection) and `<n-m>` (numeric interval)
  build automata with no regex equivalent — translating them silently is
  impossible, so they raise loudly instead (RegExp.cs kleene ops).

A recursive-descent walk of the RegExp.cs grammar (parseUnionExp ->
parseInterExp -> parseConcatExp -> parseRepeatExp -> parseComplExp ->
parseCharClassExp -> parseSimpleExp) emits the equivalent Java pattern.
"""
from __future__ import annotations


class UnsupportedRegexp(NotImplementedError):
    """A Lucene-automaton construct with no Java-regex equivalent."""


def _lit(c: str) -> str:
    """A literal char, escaped iff Java regex could treat it specially.

    Escaping any punctuation is always legal in Java regex; escaping an
    alphanumeric that is not a defined escape is a syntax error — so
    alphanumerics are emitted bare (which is also the Lucene meaning)."""
    return c if (c.isalnum() or c == "_") else "\\" + c


def lucene_regexp_to_java(pattern: str) -> str:
    """Translate a Lucene RegExp.cs pattern to an (unanchored) Java regex.

    Raises UnsupportedRegexp on `~`, `&`, `<n-m>` — constructs whose
    automaton semantics Java regex cannot express."""
    pos = 0
    n = len(pattern)

    def peek() -> str | None:
        return pattern[pos] if pos < n else None

    def take() -> str:
        nonlocal pos
        if pos >= n:
            raise ValueError(f"unexpected end of regexp {pattern!r}")
        c = pattern[pos]
        pos += 1
        return c

    def union_exp() -> str:
        out = inter_exp()
        while peek() == "|":
            take()
            out += "|" + inter_exp()
        return out

    def inter_exp() -> str:
        out = concat_exp()
        if peek() == "&":
            raise UnsupportedRegexp(
                "Lucene regexp intersection '&' has no Java-regex equivalent "
                f"(pattern {pattern!r}); rewrite the query or use two "
                "RegexpQuery clauses under MUST"
            )
        return out

    def concat_exp() -> str:
        parts = []
        while peek() not in (None, "|", ")", "&"):
            parts.append(repeat_exp())
        return "".join(parts)

    def repeat_exp() -> str:
        out = compl_exp()
        while True:
            c = peek()
            if c in ("?", "*", "+"):
                take()
                out += c
            elif c == "{":
                take()
                digits = ""
                while peek() is not None and peek().isdigit():
                    digits += take()
                if not digits:
                    raise ValueError(
                        f"malformed repeat in regexp {pattern!r} (RegExp.cs "
                        "expects {n}, {n,} or {n,m})"
                    )
                spec = "{" + digits
                if peek() == ",":
                    take()
                    spec += ","
                    while peek() is not None and peek().isdigit():
                        spec += take()
                if take() != "}":
                    raise ValueError(f"unclosed repeat in regexp {pattern!r}")
                out += spec + "}"
            else:
                return out

    def compl_exp() -> str:
        if peek() == "~":
            raise UnsupportedRegexp(
                "Lucene regexp complement '~' has no Java-regex equivalent "
                f"(pattern {pattern!r}); express the exclusion as a MUST_NOT "
                "clause instead"
            )
        return char_class_exp()

    def char_class_exp() -> str:
        if peek() != "[":
            return simple_exp()
        take()
        out = "["
        if peek() == "^":
            take()
            out += "^"
        while True:
            c = take()
            if c == "]":
                return out + "]"
            if c == "\\":
                # Lucene: always the literal next char; Java class: bare
                # alnum is literal, escaped punctuation is literal
                out += _lit(take())
            elif c == "-":
                out += "-"
            else:
                out += _lit(c) if c not in "^" else "\\^"

    def simple_exp() -> str:
        c = take()
        if c == ".":
            return "."
        if c == "#":
            return "(?!x)x"  # the empty language: matches nothing
        if c == "@":
            return "(?:.*)"  # any string
        if c == '"':
            out = ""
            while True:
                q = take()
                if q == '"':
                    return "(?:" + out + ")"
                out += _lit(q)
        if c == "(":
            if peek() == ")":
                take()
                return "(?:)"  # the empty string
            inner = union_exp()
            if take() != ")":
                raise ValueError(f"unclosed group in regexp {pattern!r}")
            return "(?:" + inner + ")"
        if c == "<":
            raise UnsupportedRegexp(
                "Lucene regexp numeric interval '<n-m>' has no Java-regex "
                f"equivalent (pattern {pattern!r}); use a NumericRangeQuery "
                "on a typed column instead"
            )
        if c == "\\":
            return _lit(take())
        return _lit(c)

    out = union_exp()
    if pos != n:
        raise ValueError(f"trailing characters in regexp {pattern!r} at {pos}")
    return out
