"""TeeSinkTokenFilter + the Sinks package (Analysis/Sinks/*.cs).

TeeSinkTokenFilter splits ONE tokenizer pass into the pass-through
source plus any number of sink streams, each gated by a SinkFilter's
Accept(state). In Spark the same shape is one pandas-UDF pass emitting a
STRUCT of token arrays — the text is analyzed once and every sink reads
the same captured token states (the reference's cached-states contract).

  * DateRecognizerSinkFilter: the token parses as a date. The reference
    delegates to DateTime.TryParse[Exact] with a culture; here explicit
    strptime formats keep it deterministic (the TryParseExact arm).
  * TokenRangeSinkFilter: accept the half-open token-ordinal range
    [lower, upper) counted over ALL tokens seen (count increments on
    every Accept call).
  * TokenTypeSinkFilter: accept tokens whose type attribute equals the
    configured type (typed scans: standard_typed_scan / classic_scan).
"""
from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType


def date_recognizer_accept(token: str, formats: tuple[str, ...]) -> bool:
    for fmt in formats:
        try:
            datetime.strptime(token, fmt)
            return True
        except ValueError:
            continue
    return False


def token_range_accept(index: int, lower: int, upper: int) -> bool:
    if lower < 1:
        raise ValueError("lower must be greater than zero")
    if lower > upper:
        raise ValueError("lower must not be greater than upper")
    return lower <= index < upper


def tee_sink(
    rows: list[tuple[str, str]],
    sinks: dict[str, callable],
) -> dict[str, list[str]]:
    """One pass over (token, type) rows; each sink's Accept sees every
    token state exactly once, in order."""
    out: dict[str, list[str]] = {name: [] for name in sinks}
    for i, (tok, ty) in enumerate(rows):
        for name, accept in sinks.items():
            if accept(i, tok, ty):
                out[name].append(tok)
    return out


def tee_sink_udf(
    date_formats: tuple[str, ...] = ("%Y%m%d",),
    range_lower: int = 1,
    range_upper: int = 3,
    type_to_match: str = "<NUM>",
):
    """One tokenizer pass -> struct of three sink arrays (dates, ranged,
    typed) + the pass-through source."""
    token_range_accept(range_lower, range_lower, range_upper)  # validate

    schema = StructType(
        [
            StructField("source", ArrayType(StringType())),
            StructField("dates", ArrayType(StringType())),
            StructField("ranged", ArrayType(StringType())),
            StructField("typed", ArrayType(StringType())),
        ]
    )

    def batch(texts: pd.Series) -> pd.DataFrame:
        from .miscfilters2 import standard_typed_scan

        srcs, dates, ranged, typed = [], [], [], []
        for t in texts:
            rows = (
                [(tok, ty) for tok, _s, _e, ty in standard_typed_scan(t)]
                if isinstance(t, str)
                else []
            )
            sinks = tee_sink(
                rows,
                {
                    "dates": lambda i, tok, ty: date_recognizer_accept(
                        tok, date_formats
                    ),
                    "ranged": lambda i, tok, ty: token_range_accept(
                        i, range_lower, range_upper
                    ),
                    "typed": lambda i, tok, ty: ty == type_to_match,
                },
            )
            srcs.append([tok for tok, _ty in rows])
            dates.append(sinks["dates"])
            ranged.append(sinks["ranged"])
            typed.append(sinks["typed"])
        return pd.DataFrame(
            {
                "source": srcs,
                "dates": dates,
                "ranged": ranged,
                "typed": typed,
            },
            index=texts.index,
        )

    return F.pandas_udf(batch, schema)
