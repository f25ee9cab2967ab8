"""WordDelimiterFilter (Lucene.Net.Analysis.Common/Analysis/Miscellaneous/
WordDelimiterFilter.cs + WordDelimiterIterator.cs), ported control-flow
for control-flow.

The iterator walks subwords of one token: bounds-trimmed of leading /
trailing delimiters, split at SUBWORD_DELIM chars, at case changes
(UPPER->letter never splits — "PowerShot" is Power/Shot via lower->UPPER),
at alpha<->digit transitions, with trailing 's stripped per subword
(STEM_ENGLISH_POSSESSIVE). The filter then emits, per flags: the parts
(GENERATE_WORD_PARTS / GENERATE_NUMBER_PARTS), same-type catenations
(CATENATE_WORDS / CATENATE_NUMBERS — flushed when an incompatible type
arrives; a single-subword catenation whose part was already generated is
skipped), the whole-token catenation (CATENATE_ALL — skipped when it
duplicates the just-flushed catenation), and PRESERVE_ORIGINAL.

Emission order and position increments follow the reference exactly:
  * a token with no delimiters (or protected) passes through
  * an all-delimiter token disappears (posInc absorbed, the accumPosInc--
    quirk included) unless PRESERVE_ORIGINAL
  * the original (PRESERVE) and a bounds-trimmed single word emit
    immediately; everything else is BUFFERED and sorted by
    (startOffset asc, posIncrement desc) before emission — the
    OffsetSorter — with Position()'s inject/first-after-original rules
    computed at generation time and travelling with the tokens
  * a leading buffered token with increment 0 is bumped to 1 (the
    "strange combinations" guard).
"""
from __future__ import annotations

import unicodedata

import pandas as pd

LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = 0x03

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

DEFAULT_FLAGS = (
    GENERATE_WORD_PARTS
    | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE
    | SPLIT_ON_NUMERICS
    | STEM_ENGLISH_POSSESSIVE
)

_DONE = -1


def _char_type(ch: str) -> int:
    """WordDelimiterIterator.GetType via unicode categories."""
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return UPPER
    if cat == "Ll":
        return LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return ALPHA
    if cat in ("Nd", "Nl", "No"):
        return DIGIT
    if cat in ("Cs",):
        return ALPHA | DIGIT
    return SUBWORD_DELIM


class _Iter:
    def __init__(
        self,
        text: str,
        split_case: bool,
        split_num: bool,
        stem_poss: bool,
    ):
        self.text = text
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        self.length = self.end_bounds = len(text)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        self._set_bounds()

    def _ends_with_possessive(self, pos: int) -> bool:
        t = self.text
        return (
            self.stem_poss
            and pos > 2
            and t[pos - 2] == "'"
            and t[pos - 1] in ("s", "S")
            and (_char_type(t[pos - 3]) & ALPHA) != 0
            and (
                pos == self.end_bounds
                or (_char_type(t[pos]) & SUBWORD_DELIM) != 0
            )
        )

    def _set_bounds(self):
        t = self.text
        while (
            self.start_bounds < self.length
            and (_char_type(t[self.start_bounds]) & SUBWORD_DELIM) != 0
        ):
            self.start_bounds += 1
        while (
            self.end_bounds > self.start_bounds
            and (_char_type(t[self.end_bounds - 1]) & SUBWORD_DELIM) != 0
        ):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _is_break(self, last_type: int, type_: int) -> bool:
        if (type_ & last_type) != 0:
            return False
        if (
            not self.split_case
            and (last_type & ALPHA) != 0
            and (type_ & ALPHA) != 0
        ):
            return False
        if (last_type & UPPER) != 0 and (type_ & ALPHA) != 0:
            return False
        if not self.split_num and (
            ((last_type & ALPHA) != 0 and (type_ & DIGIT) != 0)
            or ((last_type & DIGIT) != 0 and (type_ & ALPHA) != 0)
        ):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        t = self.text
        while self.current < self.end_bounds:
            last_type = _char_type(t[self.current])
            if (last_type & SUBWORD_DELIM) == 0:
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            type_ = _char_type(t[self.end])
            if self._is_break(last_type, type_):
                break
            last_type = type_
            self.end += 1
        if self.end < self.end_bounds - 1 and self._ends_with_possessive(
            self.end + 2
        ):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == _DONE:
            return 0
        t = _char_type(self.text[self.current])
        return ALPHA if t in (LOWER, UPPER) else t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return (
                self.current == self.start_bounds
                and self.end == self.end_bounds - 2
            )
        return (
            self.current == self.start_bounds and self.end == self.end_bounds
        )


class _Concat:
    __slots__ = ("parts", "type", "count", "start")

    def __init__(self):
        self.parts: list[str] = []
        self.type = 0
        self.count = 0
        self.start = 0

    @property
    def empty(self) -> bool:
        return not self.parts

    def append(self, text: str, start: int):
        if not self.parts:
            self.start = start
        self.parts.append(text)
        self.count += 1

    def text(self) -> str:
        return "".join(self.parts)

    def clear(self):
        self.parts = []
        self.type = self.count = self.start = 0


def word_delimiter_stream(
    tokens: list[str],
    positions: list[int],
    flags: int = DEFAULT_FLAGS,
    prot: frozenset[str] | set[str] = frozenset(),
) -> list[tuple[str, int]]:
    """The filter over a (token, position) stream -> emitted
    (term, position) pairs, reference emission order and increments."""

    def has(f: int) -> bool:
        return (flags & f) != 0

    def should_parts(wtype: int) -> bool:
        return (has(GENERATE_WORD_PARTS) and (wtype & ALPHA) != 0) or (
            has(GENERATE_NUMBER_PARTS) and (wtype & DIGIT) != 0
        )

    def should_concat(wtype: int) -> bool:
        return (has(CATENATE_WORDS) and (wtype & ALPHA) != 0) or (
            has(CATENATE_NUMBERS) and (wtype & DIGIT) != 0
        )

    out: list[tuple[str, int]] = []
    state = {
        "accum": 0,
        "first": True,
        "has_output": False,
        "has_following": False,
        "pos": -1,
    }

    def emit(term: str, posinc: int):
        state["pos"] += posinc
        out.append((term, state["pos"]))

    def position(inject: bool) -> int:
        pi = state["accum"]
        if state["has_output"]:
            state["accum"] = 0
            return 0 if inject else max(1, pi)
        state["has_output"] = True
        if not state["has_following"]:
            state["has_following"] = True
            return 0
        state["accum"] = 0
        return max(1, pi)

    prev_in = -1
    for tok, p in zip(tokens, positions):
        inc_in = p - prev_in
        prev_in = p
        state["accum"] += inc_in
        it = _Iter(
            tok,
            has(SPLIT_ON_CASE_CHANGE),
            has(SPLIT_ON_NUMERICS),
            has(STEM_ENGLISH_POSSESSIVE),
        )
        it.next()
        if (it.current == 0 and it.end == len(tok)) or tok in prot:
            emit(tok, state["accum"])
            state["accum"] = 0
            state["first"] = False
            continue
        if it.end == _DONE and not has(PRESERVE_ORIGINAL):
            if inc_in == 1 and not state["first"]:
                state["accum"] -= 1
            continue
        state["has_output"] = False
        state["has_following"] = not has(PRESERVE_ORIGINAL)
        last_concat_count = 0
        concat = _Concat()
        concat_all = _Concat()
        buffered: list[tuple[int, int, int, str]] = []  # (startoff, -pi, seq, term)

        if has(PRESERVE_ORIGINAL):
            emit(tok, state["accum"])
            state["accum"] = 0
            state["first"] = False

        def buffer(term: str, pi: int, startoff: int):
            buffered.append((startoff, -pi, len(buffered), term))

        def flush(c: _Concat) -> bool:
            nonlocal last_concat_count
            last_concat_count = c.count
            if c.count != 1 or not should_parts(c.type):
                pi = position(True)
                state["accum"] = 0
                buffer(c.text(), pi, c.start)
                c.clear()
                return True
            c.clear()
            return False

        while True:
            if it.end == _DONE:
                if not concat.empty:
                    flush(concat)
                if not concat_all.empty:
                    if concat_all.count > last_concat_count:
                        pi = position(True)
                        state["accum"] = 0
                        buffer(concat_all.text(), pi, concat_all.start)
                    concat_all.clear()
                # InPlaceMergeSorter is STABLE: (startOff asc, posInc desc),
                # generation order preserved on full ties
                for _so, npi, _seq, term in sorted(buffered):
                    pi = -npi
                    if state["first"] and pi == 0:
                        pi = 1
                    emit(term, pi)
                    state["first"] = False
                break
            if it.is_single_word():
                emit(tok[it.current:it.end], position(False))
                state["first"] = False
                it.next()
                continue
            wtype = it.type()
            if not concat.empty and (concat.type & wtype) == 0:
                flushed = flush(concat)
                state["has_output"] = False
                if flushed:
                    continue  # reprocess this subword with an empty concat
            if should_concat(wtype):
                if concat.empty:
                    concat.type = wtype
                concat.append(tok[it.current:it.end], it.current)
            if has(CATENATE_ALL):
                concat_all.append(tok[it.current:it.end], it.current)
            if should_parts(wtype):
                buffer(tok[it.current:it.end], position(False), it.current)
            it.next()
    return out


def word_delimiter_udf(
    flags: int = DEFAULT_FLAGS | CATENATE_ALL, analyzer: str = "standard"
):
    """pandas UDF: text -> emitted terms array<string> over the analyzed
    stream (emission order preserved; positions ride implicitly)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_with_positions

        rows = []
        for txt in texts:
            toks, poss = tokenize_with_positions(
                txt if isinstance(txt, str) else None, analyzer
            )
            rows.append(
                [w for w, _p in word_delimiter_stream(toks, poss, flags)]
            )
        return pd.Series(rows, index=texts.index)

    return F.pandas_udf(batch, ArrayType(StringType()))
