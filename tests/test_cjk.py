"""CJK analyzer slot: width folding, bigram stream stage, and engine
parity on Japanese/Chinese/Korean text (positions included)."""
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.functions.analysis import (
    tokenize_text,
    tokenize_with_positions,
)
from lucenenet_spark.functions.cjk import cjk_expand, cjk_width
from lucenenet_spark.plans.query import PhraseQuery, TermQuery

from .conftest import hits
from .test_multilingual_engine import _build, _pdf


def test_width_fixtures():
    assert cjk_width("Ｔｅｓｔ１２３") == "Test123"
    assert cjk_width("ｶﾞｷ") == "ガキ"          # voice mark combines
    assert cjk_width("ﾊﾟﾝ") == "パン"           # half-voiced combines
    assert cjk_width("ｱｲｳ") == "アイウ"
    # uncombinable voice mark falls back to the combining codepoint
    assert cjk_width("ﾞ") == "゙"


def test_bigram_expansion():
    assert cjk_expand("一二三") == ["一二", "二三"]
    assert cjk_expand("一") == ["一"]            # lone char -> unigram
    assert cjk_expand("漢tables漢字") == ["漢", "tables", "漢字"]
    assert cjk_expand("merge") == ["merge"]
    assert cjk_expand("한국어") == ["한국", "국어"]
    assert cjk_expand("カタカナー") == ["カタ", "タカ", "カナ", "ナー"]


def test_cjk_chain_and_positions():
    assert tokenize_text("一二三 and 漢字 merge", "cjk") == [
        "一二", "二三", "漢字", "merge"
    ]
    # each emitted token consumes one slot; the stop 'and' keeps its gap
    toks, poss = tokenize_with_positions("一二三 and 漢字", "cjk")
    assert toks == ["一二", "二三", "漢字"] and poss == [0, 1, 3]
    # whitespace breaks bigram adjacency (the reference's offset check)
    assert tokenize_text("一 二", "cjk") == ["一", "二"]


def test_sql_cjk_fuzz_matches_python():
    import random

    import duckdb

    from lucenenet_spark.entry_support import _cjk_expand_sql, _cjk_width_sql

    rng = random.Random(23)
    alphabet = (
        [chr(c) for c in range(0xFF01, 0xFFA0)]
        + [chr(c) for c in range(0x30A1, 0x30FE)]
        + list("abc漢字一二한국こんにち")
    )
    words = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(700)
        }
    )
    con = duckdb.connect()
    bad = []
    for w in words:
        if "'" in w:
            continue
        got_w = con.execute(
            "SELECT " + _cjk_width_sql("?"), [w]
        ).fetchone()[0]
        if got_w != cjk_width(w):
            bad.append(("width", w, got_w, cjk_width(w)))
        got_e = con.execute(
            "SELECT " + _cjk_expand_sql("?"), [got_w]
        ).fetchone()[0]
        if got_e != cjk_expand(got_w):
            bad.append(("expand", w, got_e, cjk_expand(got_w)))
    assert not bad, (len(bad), bad[:5])


def test_cjk_engine_parity(spark, tmp_path_factory):
    from lucenenet_spark.operators.search import IndexSearcher

    texts = [
        "東京は日本の首都です",
        "日本語のテキストを検索する",
        "検索エンジンの性能テスト",
        "一二三 merge 一二",
        "ｶﾞｷの使い",
        "한국어 텍스트 검색",
    ]
    idx = _build(spark, tmp_path_factory, "cjk", texts)
    oidx = oracle.build_index(
        _pdf(texts).sort_values(["conv_id", "turn_idx"])["text"].tolist(),
        analyzer="cjk",
    )
    s = IndexSearcher(spark, idx)
    for term in ["日本", "検索", "一二", "merge", "ガキ", "텍스"]:
        got = hits(s.search(TermQuery(term=term), 10))
        want = oracle.top_k(oracle.term_scores(oidx, term), 10)
        assert want, term
        assert got == want, term
    # bigrams are positional: the phrase 日本+本語 (consecutive bigrams of
    # 日本語) matches only the doc containing the trigram
    q = PhraseQuery(terms=("日本", "本語"), slop=0)
    got = hits(s.search(q, 10))
    want = oracle.top_k(oracle.phrase_scores(oidx, ["日本", "本語"], slop=0), 10)
    assert got == want and len(got) == 1
