"""XML query parser: CoreParser element grammar compiles onto the query IR
(Lucene.Net.QueryParser/Xml/CoreParser.cs + Builders/*, TestParser.cs-style
fixtures), and compiled queries score exactly like hand-built ones."""
import pytest

from lucenenet_spark.operators import spans as sp
from lucenenet_spark.plans import parser as classic
from lucenenet_spark.plans.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    FilteredQuery,
    MatchAllQuery,
    PayloadTermQuery,
    TermQuery,
)
from lucenenet_spark.plans.xmlparser import CoreParser, ParserException, parse_xml

from .conftest import hits
from .test_surround import _pairs


# -- compilation shapes -------------------------------------------------------


def test_term_query():
    q = parse_xml('<TermQuery fieldName="text" boost="2.5">popcorn</TermQuery>')
    assert q == TermQuery(term="popcorn", field="text", boost=2.5)


def test_fieldname_inherits_from_ancestor():
    # DOMUtils.GetAttributeWithInheritance: nearest ancestor provides it
    q = parse_xml(
        '<BooleanQuery fieldName="role">'
        '<Clause occurs="must"><TermQuery>user</TermQuery></Clause>'
        "</BooleanQuery>"
    )
    assert q.must[0] == TermQuery(term="user", field="role")


def test_fieldname_missing_fails():
    with pytest.raises(ParserException, match="fieldName"):
        parse_xml("<TermQuery>popcorn</TermQuery>")


def test_boolean_occurs_routing_and_msm():
    q = parse_xml(
        '<BooleanQuery fieldName="text" minimumNumberShouldMatch="2" boost="1.5">'
        '<Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>beta</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>gamma</TermQuery></Clause>'
        "<Clause><TermQuery>delta</TermQuery></Clause>"
        "</BooleanQuery>"
    )
    assert q == BooleanQuery(
        must=(TermQuery(term="alpha"),),
        must_not=(TermQuery(term="beta"),),
        should=(TermQuery(term="gamma"), TermQuery(term="delta")),
        min_should_match=2,
        boost=1.5,
    )


def test_boolean_bad_occurs_fails():
    with pytest.raises(ParserException, match="occurs"):
        parse_xml(
            '<BooleanQuery fieldName="text">'
            '<Clause occurs="filter"><TermQuery>x</TermQuery></Clause>'
            "</BooleanQuery>"
        )


def test_disable_coord_rejected_loudly():
    with pytest.raises(ParserException, match="disableCoord"):
        parse_xml(
            '<BooleanQuery fieldName="text" disableCoord="true">'
            "<Clause><TermQuery>x</TermQuery></Clause></BooleanQuery>"
        )


def test_terms_query_analyzes_and_keeps_msm():
    # TermsQueryBuilder analyzes the content: stopword 'the' drops, case folds
    q = parse_xml(
        '<TermsQuery fieldName="text" minimumNumberShouldMatch="2">'
        "the Alpha BETA</TermsQuery>"
    )
    assert q == BooleanQuery(
        should=(TermQuery(term="alpha"), TermQuery(term="beta")),
        min_should_match=2,
    )


def test_match_all():
    assert parse_xml("<MatchAllDocsQuery/>") == MatchAllQuery()


def test_dismax():
    q = parse_xml(
        '<DisjunctionMaxQuery tieBreaker="0.3" fieldName="text">'
        "<TermQuery>alpha</TermQuery><TermQuery>beta</TermQuery>"
        "</DisjunctionMaxQuery>"
    )
    assert q == DisMaxQuery(
        queries=(TermQuery(term="alpha"), TermQuery(term="beta")),
        tie_breaker=pytest.approx(0.3),
    )


def test_user_query_is_classic_parse_with_boost_overwrite():
    q = parse_xml('<UserQuery boost="3">alpha AND beta</UserQuery>')
    want = classic.parse("alpha AND beta")
    assert q.must == want.must and q.boost == 3.0


def test_span_near_requires_slop_in_order_defaults_false():
    with pytest.raises(ParserException, match="slop"):
        parse_xml(
            '<SpanNear fieldName="text"><SpanTerm>a</SpanTerm>'
            "<SpanTerm>b</SpanTerm></SpanNear>"
        )
    q = parse_xml(
        '<SpanNear fieldName="text" slop="4">'
        "<SpanTerm>alpha</SpanTerm><SpanTerm>beta</SpanTerm></SpanNear>"
    )
    assert q == sp.SpanNearQuery(
        clauses=(sp.SpanTermQuery(term="alpha"), sp.SpanTermQuery(term="beta")),
        slop=4,
        in_order=False,
    )


def test_span_not_first_or_terms():
    q = parse_xml(
        '<SpanNot fieldName="text">'
        "<Include><SpanTerm>alpha</SpanTerm></Include>"
        "<Exclude><SpanTerm>beta</SpanTerm></Exclude></SpanNot>"
    )
    assert q == sp.SpanNotQuery(
        include=sp.SpanTermQuery(term="alpha"),
        exclude=sp.SpanTermQuery(term="beta"),
    )
    q = parse_xml('<SpanFirst fieldName="text"><SpanTerm>a</SpanTerm></SpanFirst>')
    assert q == sp.SpanFirstQuery(match=sp.SpanTermQuery(term="a"), end=1)
    q = parse_xml('<SpanOrTerms fieldName="text">the Alpha beta</SpanOrTerms>')
    assert q == sp.SpanOrQuery(
        clauses=(sp.SpanTermQuery(term="alpha"), sp.SpanTermQuery(term="beta"))
    )


def test_boosting_term_is_payload_avg():
    q = parse_xml('<BoostingTermQuery fieldName="text">alpha</BoostingTermQuery>')
    assert q == PayloadTermQuery(
        term="alpha", function="avg", include_span_score=True
    )


def test_numeric_range_query_and_filtered_query():
    q = parse_xml(
        '<NumericRangeQuery fieldName="turn_idx" lowerTerm="1" upperTerm="3"'
        ' includeUpper="false"/>'
    )
    assert q == FilteredQuery(
        query=MatchAllQuery(), where="turn_idx >= 1 AND turn_idx < 3"
    )
    q = parse_xml(
        "<FilteredQuery><Filter>"
        '<NumericRangeFilter fieldName="turn_idx" lowerTerm="0" upperTerm="2"/>'
        '</Filter><Query><TermQuery fieldName="text">alpha</TermQuery></Query>'
        "</FilteredQuery>"
    )
    assert q == FilteredQuery(
        query=TermQuery(term="alpha"),
        where="turn_idx >= 0 AND turn_idx <= 2",
    )


def test_constant_score_over_range_filter():
    q = parse_xml(
        '<ConstantScoreQuery boost="2">'
        '<RangeFilter fieldName="role" lowerTerm="assistant" upperTerm="tool"/>'
        "</ConstantScoreQuery>"
    )
    assert q == ConstantScoreQuery(
        query=FilteredQuery(
            query=MatchAllQuery(),
            where="role >= 'assistant' AND role <= 'tool'",
        ),
        boost=2.0,
    )


def test_range_filter_on_text_rejected():
    with pytest.raises(ParserException, match="RangeFilter"):
        parse_xml(
            "<ConstantScoreQuery>"
            '<RangeFilter fieldName="text" lowerTerm="a" upperTerm="b"/>'
            "</ConstantScoreQuery>"
        )


def test_unknown_tags_fail_loudly():
    with pytest.raises(ParserException, match="No QueryObjectBuilder"):
        parse_xml("<FuzzyLikeThisQuery>x</FuzzyLikeThisQuery>")
    with pytest.raises(ParserException, match="No SpanQueryObjectBuilder"):
        parse_xml(
            '<SpanNear fieldName="text" slop="1"><TermQuery>x</TermQuery>'
            "</SpanNear>"
        )
    with pytest.raises(ParserException, match="NumericRange type"):
        parse_xml(
            '<NumericRangeQuery fieldName="turn_idx" lowerTerm="1"'
            ' upperTerm="2" type="decimal"/>'
        )
    with pytest.raises(ParserException, match="Error parsing XML"):
        parse_xml("<TermQuery fieldName='text'>unclosed")


def test_english_analyzer_flows_into_terms_query():
    q = CoreParser(analyzer="english").parse(
        '<TermsQuery fieldName="text">merging</TermsQuery>'
    )
    assert q.should[0].term == "merg"


# -- engine parity ------------------------------------------------------------


def test_xml_boolean_scores_like_hand_built(searcher, corpus_pdf):
    (t1, t2), (t3, _) = _pairs(corpus_pdf)
    q = parse_xml(
        f'<BooleanQuery fieldName="text">'
        f'<Clause occurs="must"><TermQuery>{t1}</TermQuery></Clause>'
        f'<Clause occurs="should"><TermQuery>{t2}</TermQuery></Clause>'
        f'<Clause occurs="mustNot"><TermQuery>{t3}</TermQuery></Clause>'
        f"</BooleanQuery>"
    )
    want = hits(
        searcher.search(
            BooleanQuery(
                must=(TermQuery(term=t1),),
                should=(TermQuery(term=t2),),
                must_not=(TermQuery(term=t3),),
            ),
            10,
        )
    )
    got = hits(searcher.search(q, 10))
    assert got == want and got


def test_xml_span_near_scores_like_hand_built(searcher, corpus_pdf):
    (t1, t2), _ = _pairs(corpus_pdf)
    q = parse_xml(
        f'<SpanNear fieldName="text" slop="3" inOrder="true">'
        f"<SpanTerm>{t1}</SpanTerm><SpanTerm>{t2}</SpanTerm></SpanNear>"
    )
    want = hits(
        sp.span_search(
            searcher,
            sp.SpanNearQuery(
                clauses=(sp.SpanTermQuery(term=t1), sp.SpanTermQuery(term=t2)),
                slop=3,
                in_order=True,
            ),
            10,
        )
    )
    got = hits(sp.span_search(searcher, q, 10))
    assert got == want and got


def test_xml_filtered_range_scores_like_parser_range(searcher, corpus_pdf):
    (t1, _), _ = _pairs(corpus_pdf)
    q = parse_xml(
        "<FilteredQuery><Filter>"
        '<NumericRangeFilter fieldName="turn_idx" lowerTerm="0" upperTerm="20"/>'
        f'</Filter><Query><TermQuery fieldName="text">{t1}</TermQuery></Query>'
        "</FilteredQuery>"
    )
    want = hits(
        searcher.search(
            FilteredQuery(
                query=TermQuery(term=t1),
                where="turn_idx >= 0 AND turn_idx <= 20",
            ),
            10,
        )
    )
    got = hits(searcher.search(q, 10))
    assert got == want and got
