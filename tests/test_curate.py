"""Dataset-curation operators (pipeline/curate.py): PII scrubbing,
deterministic splits, repetition metrics. Each is checked against an
independent pure-Python recomputation on the real gate corpus AND on
planted fixtures the random corpus can't exercise (emails, IPs,
phone-shaped runs, pathological repetition).
"""
import hashlib
import re
from collections import Counter

import pytest

from lucenenet_spark.pipeline import curate

SF = "/root/testdata/sf0.001"
TOKEN_RE = re.compile(r"[^\W_]+(?:\.[0-9]+)*", re.UNICODE)

# Python re with re.ASCII mirrors Java/RE2 \d \b on these patterns
_PY_STAGES = [
    (name, re.compile(rx, re.ASCII), repl)
    for name, rx, repl in curate._PII_STAGES
]


def py_scrub(text):
    t = text or ""
    counts = {}
    for name, rx, repl in _PY_STAGES:
        counts[name] = len(rx.findall(t))
        t = rx.sub(repl, t)
    return counts, hashlib.md5(t.encode()).hexdigest()


def py_tokens(text):
    return [t.lower() for t in TOKEN_RE.findall(text or "")]


def py_repetition(text, n=2):
    toks = py_tokens(text)
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return 0, 0.0, 0.0
    c = Counter(grams)
    total = len(grams)
    dup = sum(v for v in c.values() if v > 1)
    top = max(c.values())
    return total, round(dup / total, 6), round(top / total, 6)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas().sort_values("doc_id").reset_index(drop=True)


PLANTED = [
    (1, "mail me at a.b+c@exa-mple.org or x@y.io thanks"),
    (2, "server 10.0.0.1 and 192.168.001.255 rebooted"),
    (3, "call +1 415-555-0199 or 08 1234 5678 now"),
    (4, "card 4111111111111111 ref 123456789"),
    # an IP must be redacted as <IP>, not later double-counted as a phone;
    # the trailing 9-digit run still counts as a longnum
    (5, "trace 8.8.8.8 then 987654321"),
    (6, ""),
    (7, "no pii here, just words and the number 42"),
    # email whose local part would otherwise match the phone pattern
    (8, "reach 12345678901@example.com today"),
]


def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(PLANTED, ["doc_id", "text"])
    got = curate.pii_scrub(df).toPandas().set_index("doc_id").sort_index()
    for doc_id, text in PLANTED:
        counts, md5 = py_scrub(text)
        row = got.loc[doc_id]
        for name in counts:
            assert row[f"n_{name}"] == counts[name], (doc_id, name)
        assert row["scrubbed_md5"] == md5, doc_id


def test_pii_scrub_corpus(docs, docs_pd):
    got = curate.pii_scrub(docs).toPandas().set_index("doc_id").sort_index()
    assert len(got) == len(docs_pd)
    for _, row in docs_pd.head(60).iterrows():
        counts, md5 = py_scrub(row["text"])
        assert got.loc[row["doc_id"], "scrubbed_md5"] == md5
        for name in counts:
            assert got.loc[row["doc_id"], f"n_{name}"] == counts[name]


def test_split_assign(docs, docs_pd):
    got = curate.split_assign(docs).toPandas().set_index("doc_id").sort_index()
    n = {"train": 0, "val": 0, "test": 0}
    for doc_id in docs_pd["doc_id"]:
        h = hashlib.md5(f"v1:{doc_id}".encode()).hexdigest()
        bucket = int(h[:8], 16) % 1000
        want = "train" if bucket < 800 else ("val" if bucket < 900 else "test")
        assert got.loc[doc_id, "bucket"] == bucket
        assert got.loc[doc_id, "split"] == want
        n[want] += 1
    # sanity: all three splits are populated at 500 docs
    assert min(n.values()) > 0


def test_split_assign_stable_under_growth(spark, docs):
    # a doc's split must not change when the corpus grows (hash of the id,
    # not of position) — re-run on a half corpus and compare
    half = docs.filter("doc_id % 2 = 0")
    a = curate.split_assign(docs).toPandas().set_index("doc_id")["split"]
    b = curate.split_assign(half).toPandas().set_index("doc_id")["split"]
    assert (a.loc[b.index] == b).all()


def test_repetition_planted(spark):
    rows = [
        (1, "a b a b a b"),            # grams: 5x, dup all, top 'a b' 3/5
        (2, "the cat sat on the mat"),  # all 5 bigrams unique
        (3, "x x x x"),                 # 'x x' * 3 -> dup=3/3 top=3/3
        (4, "one"),                     # < n tokens -> 0 grams
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = curate.repetition_metrics(df).toPandas().set_index("doc_id").sort_index()
    for doc_id, text in rows:
        total, dup_frac, top_frac = py_repetition(text)
        assert got.loc[doc_id, "n_grams"] == total, doc_id
        assert got.loc[doc_id, "dup_frac"] == pytest.approx(dup_frac, abs=1e-9)
        assert got.loc[doc_id, "top_frac"] == pytest.approx(top_frac, abs=1e-9)
    assert got.loc[1, "dup_frac"] == 1.0 and got.loc[2, "dup_frac"] == 0.0


def test_repetition_corpus(docs, docs_pd):
    got = (
        curate.repetition_metrics(docs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(docs_pd)
    for _, row in docs_pd.head(40).iterrows():
        total, dup_frac, top_frac = py_repetition(row["text"])
        assert got.loc[row["doc_id"], "n_grams"] == total
        assert got.loc[row["doc_id"], "dup_frac"] == pytest.approx(
            dup_frac, abs=1e-9
        )
        assert got.loc[row["doc_id"], "top_frac"] == pytest.approx(
            top_frac, abs=1e-9
        )


# -- wave 2: boilerplate removal, unigram surprisal, stratified sampling --------

import math
from collections import defaultdict


def test_strip_boilerplate_planted(spark):
    rows = [
        (1, "unique alpha\nCopyright Footer\nbody one"),
        (2, "unique beta\ncopyright footer  \nbody two"),   # normalizes equal
        (3, "unique gamma\nCOPYRIGHT FOOTER\nbody three"),
        (4, "copyright footer\ncopyright footer"),           # all lines removed
        (5, ""),                                             # one empty line, df=1 -> kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = (
        curate.strip_boilerplate(df, min_df=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # corpus-wide python recomputation
    df_count = defaultdict(set)
    for doc_id, text in rows:
        for line in text.split("\n"):
            df_count[line.strip().lower()].add(doc_id)
    for doc_id, text in rows:
        lines = text.split("\n")
        kept = [l for l in lines if len(df_count[l.strip().lower()]) < 3]
        assert got.loc[doc_id, "n_lines"] == len(lines)
        assert got.loc[doc_id, "n_kept"] == len(kept)
        assert got.loc[doc_id, "cleaned_md5"] == hashlib.md5(
            "\n".join(kept).encode()
        ).hexdigest()
    # the footer really was removed everywhere, bodies survived
    assert got.loc[4, "n_kept"] == 0
    assert got.loc[1, "n_kept"] == 2


def test_strip_boilerplate_within_doc_repeat(spark):
    # a line repeated inside ONE doc counts once toward df -> stays kept
    rows = [(1, "dup line\ndup line\nx"), (2, "y"), (3, "z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = (
        curate.strip_boilerplate(df, min_df=2)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "n_kept"] == 3


def test_unigram_logprob(docs, docs_pd):
    got = (
        curate.unigram_logprob(docs).toPandas().set_index("doc_id").sort_index()
    )
    # corpus unigram model in python
    cnt = Counter()
    for t in docs_pd["text"]:
        cnt.update(py_tokens(t))
    T, V = sum(cnt.values()), len(cnt)
    for _, row in docs_pd.head(40).iterrows():
        toks = py_tokens(row["text"])
        assert got.loc[row["doc_id"], "n_tokens"] == len(toks)
        if not toks:
            assert got.loc[row["doc_id"], "bits_per_token"] == 0.0
            continue
        # fold in sorted-term order exactly like both engines
        acc = 0.0
        for term in sorted(set(toks)):
            tf = sum(1 for x in toks if x == term)
            acc -= tf * math.log2((cnt[term] + 1.0) / (T + V))
        assert got.loc[row["doc_id"], "bits_per_token"] == pytest.approx(
            round(acc / len(toks), 6), abs=2e-6
        )
    # common-token docs must score lower than the corpus max
    assert got["bits_per_token"].min() < got["bits_per_token"].max()


def test_stratified_sample(docs, docs_pd):
    rates = {"src0": 1.0, "src3": 0.5, "src7": 0.25}
    got = curate.stratified_sample(docs, rates, default_rate=0.1).toPandas()
    kept = set(got["doc_id"])
    for _, row in docs_pd.iterrows():
        h = hashlib.md5(f"v1:{row['doc_id']}".encode()).hexdigest()
        bucket = int(h[:8], 16) % 1000000
        cut = int(rates.get(row["source"], 0.1) * 1000000)
        assert (row["doc_id"] in kept) == (bucket < cut)
    # rate 1.0 keeps every src0 doc
    n_src0 = (docs_pd["source"] == "src0").sum()
    assert (got["source"] == "src0").sum() == n_src0


def test_stratified_sample_stable_under_growth(docs):
    rates = {"src0": 0.5}
    full = curate.stratified_sample(docs, rates, default_rate=0.2).toPandas()
    half = curate.stratified_sample(
        docs.filter("doc_id % 2 = 0"), rates, default_rate=0.2
    ).toPandas()
    assert set(half["doc_id"]) == {
        d for d in full["doc_id"] if d % 2 == 0
    }


# -- wave 3: sequence packing -----------------------------------------------------


def test_pack_sequences(spark, docs, docs_pd):
    got = (
        curate.pack_sequences(docs, 64).toPandas().set_index("doc_id").sort_index()
    )
    # python recompute: concat in doc_id order, chunk every 64
    off = 0
    for _, row in docs_pd.sort_values("doc_id").iterrows():
        n = len(py_tokens(row["text"]))
        r = got.loc[row["doc_id"]]
        assert r["n_tokens"] == n
        assert r["start_tok"] == off
        assert r["first_chunk"] == off // 64
        if n:
            assert r["last_chunk"] == (off + n - 1) // 64
            assert r["n_chunks"] == (off + n - 1) // 64 - off // 64 + 1
        else:
            assert r["n_chunks"] == 0
        off += n
    # stream is gapless: chunks tile the total token count
    assert got["n_tokens"].sum() == off


def test_pack_sequences_empty_doc(spark):
    rows = [(1, "one two three"), (2, ""), (3, "four")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = curate.pack_sequences(df, 2).toPandas().set_index("doc_id")
    assert got.loc[1].tolist() == [3, 0, 0, 1, 2]
    assert got.loc[2].tolist() == [0, 3, 1, 1, 0]
    assert got.loc[3].tolist() == [1, 3, 1, 1, 1]


def test_pack_sequences_sharded_matches_single(docs):
    # force many shards (doc_id div 16) and prove bit-identical offsets
    a = curate.pack_sequences(docs, 64).toPandas().sort_values("doc_id")
    b = (
        curate.pack_sequences(docs, 64, shard_size=16)
        .toPandas()
        .sort_values("doc_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
