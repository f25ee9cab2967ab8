"""WikipediaTokenizer — reference-vector parity
(WikipediaTokenizerTest.cs: TestSimple, TestHandwritten, TestLinkPhrases,
TestLinks, TestLucene1133, TestBoth)."""
from lucenenet_spark.functions.wikipedia import (
    BOTH,
    TOKENS_ONLY,
    UNTOKENIZED_ONLY,
    UNTOKENIZED_TOKEN_FLAG,
    wikipedia_scan,
)

LINK_PHRASES = (
    "click [[link here again]] click "
    "[http://lucene.apache.org here again] [[Category:a b c d]]"
)


def _terms(rows):
    return [r[0] for r in rows]


def _types(rows):
    return [r[3] for r in rows]


def test_simple():
    rows = wikipedia_scan("This is a [[Category:foo]]")
    assert _terms(rows) == ["This", "is", "a", "foo"]
    assert [(r[1], r[2]) for r in rows] == [(0, 4), (5, 7), (8, 9), (21, 24)]
    assert _types(rows) == ["<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "c"]
    assert [r[4] for r in rows] == [1, 1, 1, 1]


def test_link_phrases_and_posincs():
    rows = wikipedia_scan(LINK_PHRASES)
    assert _terms(rows) == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c", "d",
    ]
    assert [r[4] for r in rows] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_links():
    test = (
        "[http://lucene.apache.org/java/docs/index.html#news here] "
        "[http://lucene.apache.org/java/docs/index.html?b=c here] "
        "[https://lucene.apache.org/java/docs/index.html?b=c here]"
    )
    rows = wikipedia_scan(test)
    assert _terms(rows) == [
        "http://lucene.apache.org/java/docs/index.html#news", "here",
        "http://lucene.apache.org/java/docs/index.html?b=c", "here",
        "https://lucene.apache.org/java/docs/index.html?b=c", "here",
    ]
    assert _types(rows) == ["elu", "el", "elu", "el", "elu", "el"]


def test_handwritten():
    test = (
        "[[link]] This is a [[Category:foo]] Category  This is a linked "
        "[[:Category:bar none withstanding]] "
        "Category This is (parens) This is a [[link]]  This is an external "
        "URL [http://lucene.apache.org] "
        "Here is ''italics'' and ''more italics'', '''bold''' and "
        "'''''five quotes''''' "
        " This is a [[link|display info]]  This is a period.  Here is $3.25 "
        "and here is 3.50.  Here's Johnny.  "
        "==heading== ===sub head=== followed by some text  "
        "[[Category:blah| ]] "
        "''[[Category:ital_cat]]''  here is some that is ''italics "
        "[[Category:foo]] but is never closed."
        "'''same [[Category:foo]] goes for this '''''and2 [[Category:foo]] "
        "and this"
        " [http://foo.boo.com/test/test/ Test Test] "
        "[http://foo.boo.com/test/test/test.html Test Test]"
        " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
        "<ref>Citation</ref> <sup>martian</sup> <span class=\"glue\">"
        "code</span>"
    )
    rows = wikipedia_scan(test)
    assert _terms(rows) == [
        "link", "This", "is", "a", "foo", "Category", "This", "is", "a",
        "linked", "bar", "none", "withstanding", "Category", "This", "is",
        "parens", "This", "is", "a", "link", "This", "is", "an", "external",
        "URL", "http://lucene.apache.org", "Here", "is", "italics", "and",
        "more", "italics", "bold", "and", "five", "quotes", "This", "is",
        "a", "link", "display", "info", "This", "is", "a", "period", "Here",
        "is", "3.25", "and", "here", "is", "3.50", "Here's", "Johnny",
        "heading", "sub", "head", "followed", "by", "some", "text", "blah",
        "ital", "cat", "here", "is", "some", "that", "is", "italics", "foo",
        "but", "is", "never", "closed", "same", "foo", "goes", "for",
        "this", "and2", "foo", "and", "this",
        "http://foo.boo.com/test/test/", "Test", "Test",
        "http://foo.boo.com/test/test/test.html", "Test", "Test",
        "http://foo.boo.com/test/test/test.html?g=b&c=d", "Test", "Test",
        "Citation", "martian", "code",
    ]
    assert _types(rows) == [
        "il", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "c", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "c", "c",
        "c", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "il", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "elu",
        "<ALPHANUM>", "<ALPHANUM>", "i", "<ALPHANUM>", "i", "i", "b",
        "<ALPHANUM>", "bi", "bi", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "il", "il", "il", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<APOSTROPHE>", "<ALPHANUM>",
        "h", "sh", "sh", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "c", "c", "c", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "i", "c", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "b", "c", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "bi", "c", "<ALPHANUM>", "<ALPHANUM>",
        "elu", "el", "el", "elu", "el", "el", "elu", "el", "el", "ci",
        "<ALPHANUM>", "<ALPHANUM>",
    ]


UNTOKS = frozenset({"c", "i"})
L1133 = (
    "[[Category:a b c d]] [[Category:e f g]] [[link here]] [[link there]] "
    "''italics here'' something ''more italics'' [[Category:h   i   j]]"
)


def test_lucene1133():
    # TOKENS_ONLY ignores the untokenized set entirely
    rows = wikipedia_scan(LINK_PHRASES, TOKENS_ONLY, UNTOKS)
    assert [r[4] for r in rows] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]

    rows = wikipedia_scan(L1133, UNTOKENIZED_ONLY, UNTOKS)
    assert _terms(rows) == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j",
    ]
    assert [(r[1], r[2]) for r in rows] == [
        (11, 18), (32, 37), (42, 46), (47, 51), (56, 60), (61, 66),
        (71, 83), (86, 95), (98, 110), (124, 133),
    ]
    assert [r[4] for r in rows] == [1] * 10


def test_both_mode():
    rows = wikipedia_scan(L1133, BOTH, UNTOKS)
    assert _terms(rows) == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g", "link",
        "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics", "h   i   j",
        "h", "i", "j",
    ]
    assert [(r[1], r[2]) for r in rows] == [
        (11, 18), (11, 12), (13, 14), (15, 16), (17, 18), (32, 37),
        (32, 33), (34, 35), (36, 37), (42, 46), (47, 51), (56, 60),
        (61, 66), (71, 83), (71, 78), (79, 83), (86, 95), (98, 110),
        (98, 102), (103, 110), (124, 133), (124, 125), (128, 129),
        (132, 133),
    ]
    assert [r[4] for r in rows] == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1,
        0, 1, 1,
    ]
    assert [r[5] for r in rows] == [
        UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0,
        0, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
        UNTOKENIZED_TOKEN_FLAG, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
    ]


def test_wikipedia_udf(spark):
    from lucenenet_spark.functions.wikipedia import wikipedia_udf

    df = spark.createDataFrame(
        [("This is a [[Category:foo]] and ''it''",)], "text string"
    )
    got = df.select(wikipedia_udf()("text")).collect()[0][0]
    assert got == ["This", "is", "a", "foo", "and", "it"]
