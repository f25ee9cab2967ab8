"""WordDelimiterFilter — the reference's own TestWordDelimiterFilter
vectors (terms + position increments rendered as absolute positions).

References: Analysis/Miscellaneous/WordDelimiterFilter.cs,
WordDelimiterIterator.cs, TestWordDelimiterFilter.cs (TestOffsets,
TestPositionIncrements, TestLotsOfConcatenating, TestLotsOfConcatenating2).
"""
from lucenenet_spark.functions.worddelim import (
    CATENATE_ALL,
    CATENATE_NUMBERS,
    CATENATE_WORDS,
    DEFAULT_FLAGS,
    PRESERVE_ORIGINAL,
    word_delimiter_stream,
)

FLAGS = DEFAULT_FLAGS | CATENATE_ALL


def _pos_from_incs(incs):
    pos, out = -1, []
    for i in incs:
        pos += i
        out.append(pos)
    return out


def test_clean_and_all_delim_tokens():
    # "LUCENE / SOLR": the all-delimiter '/' disappears, increment absorbed
    got = word_delimiter_stream(["LUCENE", "/", "SOLR"], [0, 1, 2], FLAGS)
    assert got == [("LUCENE", 0), ("SOLR", 1)]


def test_case_split_with_catenate_all():
    got = word_delimiter_stream(["LUCENE", "/", "solR"], [0, 1, 2], FLAGS)
    want_terms = ["LUCENE", "sol", "solR", "R"]
    want_pos = _pos_from_incs([1, 1, 0, 1])
    assert got == list(zip(want_terms, want_pos))


def test_protected_words_pass_through():
    got = word_delimiter_stream(
        ["LUCENE", "/", "NUTCH", "SOLR"], [0, 1, 2, 3], FLAGS,
        prot=frozenset({"NUTCH"}),
    )
    assert got == [("LUCENE", 0), ("NUTCH", 1), ("SOLR", 2)]


def test_large_gap_increments_preserved():
    # '/' itself carried an increment of 10
    got = word_delimiter_stream(["LUCENE", "/", "SOLR"], [0, 10, 11], FLAGS)
    assert got == [("LUCENE", 0), ("SOLR", 11)]
    got = word_delimiter_stream(["LUCENE", "/", "solR"], [0, 10, 11], FLAGS)
    assert got == list(
        zip(["LUCENE", "sol", "solR", "R"], _pos_from_incs([1, 11, 0, 1]))
    )


def test_stopword_gap_carries():
    # "the lucene.solr" after a stop filter: token at position 1
    got = word_delimiter_stream(["lucene.solr"], [1], FLAGS)
    assert got == list(
        zip(["lucene", "lucenesolr", "solr"], _pos_from_incs([2, 0, 1]))
    )


def test_lots_of_concatenating():
    flags = FLAGS | CATENATE_WORDS | CATENATE_NUMBERS
    got = word_delimiter_stream(["abc-def-123-456"], [0], flags)
    terms = ["abc", "abcdef", "abcdef123456", "def", "123", "123456", "456"]
    assert got == list(zip(terms, _pos_from_incs([1, 0, 0, 1, 1, 0, 1])))


def test_lots_of_concatenating_preserve_original():
    flags = FLAGS | CATENATE_WORDS | CATENATE_NUMBERS | PRESERVE_ORIGINAL
    got = word_delimiter_stream(["abc-def-123-456"], [0], flags)
    terms = [
        "abc-def-123-456", "abc", "abcdef", "abcdef123456", "def",
        "123", "123456", "456",
    ]
    assert got == list(
        zip(terms, _pos_from_incs([1, 0, 0, 0, 1, 1, 0, 1]))
    )


def test_offsets_order_foo_bar():
    # TestOffsets: "foo-bar" -> foo, foobar, bar (offset-sorted emission)
    got = word_delimiter_stream(["foo-bar"], [0], FLAGS)
    assert [t for t, _p in got] == ["foo", "foobar", "bar"]


def test_possessive_and_bounds():
    # "O'Neil's" -> O, Neil (possessive stripped; bounds-trimmed subwords)
    got = word_delimiter_stream(["O'Neil's"], [0], DEFAULT_FLAGS)
    assert [t for t, _p in got] == ["O", "Neil"]
    # bounds-trimmed single word emits even without generate flags
    got = word_delimiter_stream(["-foo-"], [0], 0)
    assert [t for t, _p in got] == ["foo"]


def test_power_shot_case_and_numeric_splits():
    got = word_delimiter_stream(["PowerShot"], [0], DEFAULT_FLAGS)
    assert [t for t, _p in got] == ["Power", "Shot"]
    got = word_delimiter_stream(["j2se"], [0], DEFAULT_FLAGS)
    assert [t for t, _p in got] == ["j", "2", "se"]
    # UPPER->letter never splits: "SOLR" stays whole even with case split
    got = word_delimiter_stream(["SOLRx"], [0], DEFAULT_FLAGS)
    assert [t for t, _p in got] == ["SOLRx"]
