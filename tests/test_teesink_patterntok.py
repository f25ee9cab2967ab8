"""PatternTokenizer + TeeSink sinks — reference-vector parity
(TestPatternTokenizer.cs TestSplitting, TestTeeSinkTokenFilter.cs)."""
import pytest

from lucenenet_spark.functions.patterntok import pattern_tokenize
from lucenenet_spark.functions.teesink import (
    date_recognizer_accept,
    tee_sink,
    token_range_accept,
)

QPAT = r"\'([^\']+)\'"

SPLIT_VECTORS = [
    (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
    (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
    (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
    (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
    (-1, "o", "boo:and:foo", ["b", ":and:f"]),
    (0, ":", "boo:and:foo", [":", ":"]),
    (0, QPAT, "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
    (1, QPAT, "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
]


@pytest.mark.parametrize("group,pat,inp,want", SPLIT_VECTORS)
def test_pattern_tokenizer_vectors(group, pat, inp, want):
    assert [t for t, _s, _e in pattern_tokenize(inp, pat, group)] == want


def test_pattern_tokenizer_offsets():
    got = pattern_tokenize("aaa--bbb--ccc", "--", -1)
    assert got == [("aaa", 0, 3), ("bbb", 5, 8), ("ccc", 10, 13)]


def test_tee_sink_general():
    # TestGeneral: one pass, a case-insensitive 'the' detector sink
    text = "The quick burgundy Fox jumped over the lazy little dogs"
    rows = [(t, "word") for t in text.split()]
    sinks = tee_sink(
        rows, {"the": lambda i, tok, ty: tok.lower() == "the"}
    )
    assert sinks["the"] == ["The", "the"]


def test_tee_sink_multiple_sinks_one_pass():
    text = "Dogs The dogs the Dogs"
    rows = [(t, "word") for t in text.split()]
    sinks = tee_sink(
        rows,
        {
            "the": lambda i, tok, ty: tok.lower() == "the",
            "dogs": lambda i, tok, ty: tok.lower() == "dogs",
        },
    )
    assert sinks["the"] == ["The", "the"]
    assert sinks["dogs"] == ["Dogs", "dogs", "Dogs"]


def test_token_range_sink():
    # count is 0-based; lower >= 1 means the FIRST token never passes
    assert [i for i in range(6) if token_range_accept(i, 1, 3)] == [1, 2]
    with pytest.raises(ValueError):
        token_range_accept(0, 0, 3)
    with pytest.raises(ValueError):
        token_range_accept(0, 4, 3)


def test_date_recognizer():
    assert date_recognizer_accept("20240101", ("%Y%m%d",))
    assert not date_recognizer_accept("20241399", ("%Y%m%d",))
    assert not date_recognizer_accept("notadate", ("%Y%m%d",))
    assert date_recognizer_accept("2024-01-01", ("%Y%m%d", "%Y-%m-%d"))


def test_tee_sink_udf(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.teesink import tee_sink_udf

    df = spark.createDataFrame(
        [("alpha 20240101 beta 42 gamma",)], "text string"
    )
    row = df.select(tee_sink_udf()("text").alias("s")).collect()[0]["s"]
    assert row["source"] == ["alpha", "20240101", "beta", "42", "gamma"]
    assert row["dates"] == ["20240101"]
    assert row["ranged"] == ["20240101", "beta"]  # 0-based ordinals 1..2
    assert row["typed"] == ["20240101", "42"]
