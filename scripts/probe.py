"""Verify probes: resume, parser, paging, collectors, hostile inputs."""
import os, time
import numpy as np
from lucenenet_spark.session import get_spark
from lucenenet_spark.datagen import transcripts_spark, generate_transcripts
from lucenenet_spark.operators.index_build import IndexBuilder
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.parser import parse
from lucenenet_spark.plans.query import *
from lucenenet_spark import oracle

OUT = "/tmp/smoke_index"
spark = get_spark(cores=8)

# probe 1: resume — re-running build must skip completed stages (fast)
t0 = time.time()
b = IndexBuilder(spark, OUT, n_buckets=8, n_segments=8, salt_target=500)
df = transcripts_spark(spark, 2000, partitions=4)
b.build(df)
print("PROBE resume: rebuild wall %.1fs (should be seconds, not 76s)" % (time.time()-t0))

s = IndexSearcher(spark, OUT)
pdf = generate_transcripts(2000).sort_values(["conv_id","turn_idx"]).reset_index(drop=True)
oidx = oracle.build_index(pdf["text"].tolist())

# probe 2: parser end-to-end
q = parse("+popcorn word7 -rare12")
print("PROBE parse:", q)
got = [(r["docid"], np.float32(r["score"])) for r in s.search(q, 5).collect()]
exp = oracle.top_k(oracle.boolean_scores(oidx, must=["popcorn"], should=["word7"], must_not=["rare12"]), 5)
print("  parsed-query parity:", got == exp, got[:2])
assert got == exp

# probe 3: search_after paging == oracle paging
scores = oracle.boolean_scores(oidx, should=["word7","popcorn"])
page1 = oracle.top_k(scores, 5)
after_s, after_d = float(page1[-1][1]), page1[-1][0]
exp2 = oracle.search_after(scores, 5, after_s, after_d)
got2 = [(r["docid"], np.float32(r["score"])) for r in
        s.search_after(BooleanQuery(should=(TermQuery(term="word7"), TermQuery(term="popcorn"))), 5, after_s, after_d).collect()]
print("PROBE search_after:", got2 == exp2, got2[:2])
assert got2 == exp2

# probe 4: count / facet / group collectors run
n = s.count(TermQuery(term="popcorn"))
print("PROBE count(popcorn):", n, "oracle:", len(oracle.term_scores(oidx,'popcorn')))
assert n == len(oracle.term_scores(oidx, "popcorn"))
fc = {r["role"]: r["count"] for r in s.facet_counts(TermQuery(term="popcorn")).collect()}
print("PROBE facets:", fc, "sum==count:", sum(fc.values()) == n)
g = s.group_top_k(TermQuery(term="popcorn"), "conv_id", 2)
print("PROBE grouping rows:", g.count())

# probe 5: multiterm queries (prefix via >1024-term expansion, fuzzy, wildcard)
exp_docs = {d for t, pl in oidx.postings.items() if t.startswith("rare1") for d, _ in pl}
got_n = s.count(PrefixQuery(prefix="rare1"))
print("PROBE prefix rare1* (huge expansion): spark", got_n, "oracle", len(exp_docs))
assert got_n == len(exp_docs)
exp_docs_w = {d for t, pl in oidx.postings.items() if t.startswith("word7") and len(t) == len("word7")+1 for d, _ in pl}
got_w = s.count(WildcardQuery(pattern="word7?"))
print("PROBE wildcard word7?:", got_w, "oracle", len(exp_docs_w))
assert got_w == len(exp_docs_w)
fz = s.search(FuzzyQuery(term="popcorm", max_edits=1), 3).collect()
print("PROBE fuzzy popcorm~1 hits:", len(fz))
assert len(fz) == 3

# probe 6: hostile — absent MUST term, stopword-only, minShouldMatch, empty query text
assert s.search(BooleanQuery(must=(TermQuery(term="zzz_nope"), TermQuery(term="word7"))), 5).count() == 0
print("PROBE absent-MUST -> 0 hits ok")
assert s.count(parse("the of and")) == 0 or parse("the of and") == BooleanQuery()  # stopwords vanish
print("PROBE stopword-only query:", parse("the of and"))
msm = BooleanQuery(should=tuple(TermQuery(term=t) for t in ["word7","popcorn","rare12","hello"]), min_should_match=2)
gotm = [(r["docid"], np.float32(r["score"])) for r in s.search(msm, 10, prune=False).collect()]
expm = oracle.top_k(oracle.boolean_scores(oidx, should=["word7","popcorn","rare12","hello"], min_should_match=2), 10)
print("PROBE minShouldMatch=2 parity:", gotm == expm)
assert gotm == expm

# probe 7: dismax
dm = DisMaxQuery(queries=(TermQuery(term="word7"), TermQuery(term="popcorn")), tie_breaker=0.3)
gotd = [(r["docid"], np.float32(r["score"])) for r in s.search(dm, 10).collect()]
expd = oracle.top_k(oracle.dismax_scores(oidx, ["word7","popcorn"], 0.3), 10)
print("PROBE dismax parity:", gotd == expd)
assert gotd == expd

print("ALL PROBES PASS")
spark.stop()
