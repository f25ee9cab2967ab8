"""Oracle golden tests against reference-derived fixtures (FIXTURES.md §2).

termscorer6 is the TestTermScorer corpus (src/Lucene.Net.Tests/Search/
TestTermScorer.cs:45); boolmini follows TestBooleanQuery.cs:96 with
stopword-free tokens. Scores are checked structurally (df/tf/norm/tie-break)
and against the exact closed-form float32 BM25 arithmetic.
"""
import math

import numpy as np

from lucenenet_spark import oracle
from lucenenet_spark.functions.smallfloat import NORM_TABLE, encode_norm

TERMSCORER6 = ["all", "dogs dogs", "like", "playing", "fetch", "all"]
BOOLMINI = ["aa bb cc dd", "aa bb cc dd ee", "aa bb cc dd ee ff", "xx yy zz"]


def test_termscorer6_stats():
    idx = oracle.build_index(TERMSCORER6)
    assert idx.max_doc == 6 and idx.doc_count == 6
    assert idx.sum_ttf == 7  # 'dogs dogs' counts twice
    assert [d for d, _ in idx.postings["all"]] == [0, 5]
    assert idx.postings["dogs"] == [(1, 2)]
    assert float(idx.avgdl) == np.float32(7 / 6)


def test_termscorer6_exact_scores_and_tiebreak():
    idx = oracle.build_index(TERMSCORER6)
    scores = oracle.term_scores(idx, "all")
    # closed-form float32 recomputation
    t_idf = np.float32(math.log(1 + (6 - 2 + 0.5) / (2 + 0.5)))
    w = np.float32(np.float32(t_idf) * np.float32(2.2))
    cache = oracle.norm_cache(1.2, 0.75, idx.avgdl)
    nb = encode_norm(np.array([1]))[0]
    expect = np.float32(w * np.float32(1.0) / (np.float32(1.0) + cache[nb]))
    assert scores[0] == expect and scores[5] == expect
    # equal scores -> docID ascending (HitQueue.cs:97-100)
    assert oracle.top_k(scores, 2) == [(0, expect), (5, expect)]


def test_high_tf_saturation():
    idx = oracle.build_index(TERMSCORER6)
    s = oracle.term_scores(idx, "dogs")[1]
    # tf=2 score must stay below the weight asymptote idf*(k1+1)
    t_idf = np.float32(math.log(1 + (6 - 1 + 0.5) / (1 + 0.5)))
    assert 0 < float(s) < float(t_idf) * 2.2


def test_boolmini_boolean_semantics():
    idx = oracle.build_index(BOOLMINI)
    a = oracle.boolean_scores(idx, must=["aa", "bb"])
    assert set(a) == {0, 1, 2}
    o = oracle.boolean_scores(idx, should=["ee", "xx"])
    assert set(o) == {1, 2, 3}
    n = oracle.boolean_scores(idx, must=["aa"], must_not=["ff"])
    assert set(n) == {0, 1}
    m = oracle.boolean_scores(idx, should=["aa", "ee", "xx"], min_should_match=2)
    assert set(m) == {1, 2}  # docs matching >=2 of the three
    # MUST+SHOULD: SHOULD only adds score, never restricts
    ms = oracle.boolean_scores(idx, must=["aa"], should=["ee"])
    assert set(ms) == {0, 1, 2}
    assert float(ms[1]) > float(ms[0])  # doc1 also matches 'ee'... modulo norms
    # boolean sum == float32 sum of clause scores, clause order
    ta, te = oracle.term_scores(idx, "aa"), oracle.term_scores(idx, "ee")
    assert ms[1] == np.float32(np.float32(np.float32(0.0) + ta[1]) + te[1])


def test_empty_and_absent():
    idx = oracle.build_index(TERMSCORER6)
    assert oracle.term_scores(idx, "nope") == {}
    assert oracle.boolean_scores(idx, must=["all", "nope"]) == {}
    assert oracle.boolean_scores(idx, should=["nope"]) == {}


def test_stopword_and_empty_docs():
    idx = oracle.build_index(["", "the of and", "hello"])
    assert idx.max_doc == 3 and idx.doc_count == 1
    assert idx.norm_bytes[0] == 255 and idx.norm_bytes[1] == 255
    assert oracle.term_scores(idx, "the") == {}
    assert set(oracle.term_scores(idx, "hello")) == {2}


def test_idf_formula_float32():
    v = oracle.idf(3, 100)
    assert v == np.float32(math.log(1 + (100 - 3 + 0.5) / (3 + 0.5)))
    assert v.dtype == np.float32


def test_search_after_pagination():
    idx = oracle.build_index(["zz"] * 10)  # 10 equal-score docs
    scores = oracle.term_scores(idx, "zz")
    p1 = oracle.top_k(scores, 4)
    assert [d for d, _ in p1] == [0, 1, 2, 3]
    p2 = oracle.search_after(scores, 4, float(p1[-1][1]), p1[-1][0])
    assert [d for d, _ in p2] == [4, 5, 6, 7]


def test_dismax():
    idx = oracle.build_index(BOOLMINI)
    dm = oracle.dismax_scores(idx, ["aa", "xx"], tie_breaker=0.0)
    assert set(dm) == {0, 1, 2, 3}
    ta, tx = oracle.term_scores(idx, "aa"), oracle.term_scores(idx, "xx")
    assert dm[3] == tx[3]  # only one clause matches -> max == that clause
    dm5 = oracle.dismax_scores(idx, ["aa", "cc"], tie_breaker=0.5)
    a0, c0 = ta[0], oracle.term_scores(idx, "cc")[0]
    mx, mn = max(a0, c0), min(a0, c0)
    ssum = np.float32(np.float32(np.float32(0.0) + a0) + c0) if a0 >= c0 else np.float32(np.float32(np.float32(0.0) + a0) + c0)
    assert dm5[0] == np.float32(np.float32(mx) + np.float32(0.5) * np.float32(ssum - mx))
