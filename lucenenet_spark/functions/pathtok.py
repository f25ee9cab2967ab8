"""Path-hierarchy tokenizers + PositionFilter.

  * PathHierarchyTokenizer (Path/PathHierarchyTokenizer.cs): emits the
    growing prefix path at each delimiter — "/a/b/c" -> /a, /a/b, /a/b/c —
    with delimiter->replacement substitution, `skip` leading segments
    dropped (their chars move the start offset), a trailing delimiter
    emitted as one extra token, and position increment 1 for the first
    token then 0 (all prefixes stack at one position). The port below
    keeps the reference loop's exact control flow (added/skipped/
    endDelimiter state), including the quirk that the very first char of
    a token never sets endDelimiter (so "//" emits "/" then "//").
  * ReversePathHierarchyTokenizer (Path/ReversePathHierarchyTokenizer.cs):
    buffers the whole input (delimiters replaced), records
    delimiterPositions = [0, pos-after-each-delimiter, (+length if no
    trailing delimiter)], drops the last `skip` segments by ending every
    token at delimiterPositions[count-1-skip], and emits suffixes starting
    at each kept delimiter position: "/a/b/c" -> /a/b/c, a/b/c, b/c, c.
  * PositionFilter (Position/PositionFilter.cs): first token's increment
    unchanged, every later token's increment forced to the configured
    value (default 0 — the whole stream stacks at one position).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def path_hierarchy_tokens(
    path: str,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> list[tuple[str, int, int, int]]:
    """(term, start_offset, end_offset, pos_increment) rows, the exact
    IncrementToken loop of PathHierarchyTokenizer.cs."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement
    out: list[tuple[str, int, int, int]] = []
    result_token = ""
    start_position = 0
    skipped = 0
    end_delimiter = False
    pos = 0
    n = len(path)
    while True:
        term = result_token
        posinc = 1 if result_token == "" else 0
        length = 0
        added = False
        if end_delimiter:
            term += repl
            length += 1
            end_delimiter = False
            added = True
        emitted = None
        while True:
            c = path[pos] if pos < n else None
            if c is not None:
                pos += 1
            if c is None:
                if skipped > skip:
                    length += len(result_token)
                    emitted = added
                else:
                    emitted = False
                break
            if not added:
                added = True
                skipped += 1
                if skipped > skip:
                    term += repl if c == delimiter else c
                    length += 1
                else:
                    start_position += 1
            elif c == delimiter:
                if skipped > skip:
                    end_delimiter = True
                    break
                skipped += 1
                if skipped > skip:
                    term += repl
                    length += 1
                else:
                    start_position += 1
            elif skipped > skip:
                term += c
                length += 1
            else:
                start_position += 1
        if emitted is None:
            # broke at a delimiter: emit the current prefix token
            length += len(result_token)
            out.append(
                (term, start_position, start_position + length, posinc)
            )
            result_token = term
            continue
        if emitted:
            out.append(
                (term, start_position, start_position + length, posinc)
            )
            result_token = term
            continue
        return out


def reverse_path_hierarchy_tokens(
    path: str,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> list[tuple[str, int, int, int]]:
    """(term, start_offset, end_offset, pos_increment) rows of
    ReversePathHierarchyTokenizer.cs."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement
    buf: list[str] = []
    delim_positions = [0]
    length = 0
    for c in path:
        length += 1
        if c == delimiter:
            delim_positions.append(length)
            buf.append(repl)
        else:
            buf.append(c)
    if delim_positions[-1] < length:
        delim_positions.append(length)
    count = len(delim_positions)
    idx = count - 1 - skip
    if idx < 0:
        return []
    end_position = delim_positions[idx]
    text = "".join(buf)
    out: list[tuple[str, int, int, int]] = []
    for i in range(count - skip - 1):
        start = delim_positions[i]
        out.append(
            (text[start:end_position], start, end_position, 1 if i == 0 else 0)
        )
    return out


def position_filter(
    increments: list[int], position_increment: int = 0
) -> list[int]:
    """PositionFilter.cs: first token's increment kept, later increments
    forced to `position_increment`."""
    if position_increment < 0:
        raise ValueError("positionIncrement may not be negative")
    return [
        inc if i == 0 else position_increment
        for i, inc in enumerate(increments)
    ]


def path_hierarchy_udf(
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
    reverse: bool = False,
):
    fn = reverse_path_hierarchy_tokens if reverse else path_hierarchy_tokens

    def batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [t for t, _s, _e, _p in fn(x, delimiter, replacement, skip)]
                if isinstance(x, str)
                else []
                for x in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
