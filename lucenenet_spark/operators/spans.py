"""Span queries: position-algebra retrieval (Search/Spans re-derivation).

Span algebra over per-doc sorted (start, end) span lists — each node
materializes its matches from its children's (the lazy iterator chain of
the reference, unrolled per document):

- SpanTerm      (Spans/SpanTermQuery.cs): one (p, p+1) span per position.
- SpanOr        (SpanOrQuery.cs): merged child spans, duplicates kept.
- SpanNear ordered (SpanNearQuery.cs + NearSpansOrdered.cs): for each
  match anchor of the LAST clause, pick for every earlier clause the
  LATEST span strictly ordered before its successor (the
  ShrinkToAfterShortestMatch minimal-match rule,
  NearSpansOrdered.cs:340-437); slop = sum of non-overlapping gaps
  (:417); emit (first.start, last.end) when slop <= allowed.
- SpanNear unordered (NearSpansUnordered.cs): min-start pointer sweep;
  window = (min start, max end); match when windowLen - sum(childLens)
  <= slop; advance the min-start child each step.
- SpanFirst     (SpanFirstQuery.cs / SpanPositionRangeQuery): spans with
  end <= n.
- SpanNot       (SpanNotQuery.cs): include spans overlapping no exclude
  span.

DOCUMENTED DIVERGENCE: match ENUMERATION follows the minimal-match
definitions above rather than a 1:1 port of the reference's stateful
iterator advancement, so pathological overlapping-span cases can count a
different number of matches than Lucene; the emitted span set is the same
on non-overlapping inputs (fixture-tested against hand-traces of the
reference algorithms).

Scoring (Spans/SpanScorer.cs:79-95): freq = float32 fold over a doc's
matches of sloppyFreq(end - start) = 1/(1 + matchLength); weight = the
phrase chain (f32 sum of leaf idfs, duplicates counted, * boost * (k1+1));
score = weight * freq / (freq + norm_cache[norm_byte]).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.query import Query

Span = tuple[int, int]


@dataclass(frozen=True)
class SpanTermQuery(Query):
    term: str = ""
    field: str = "text"


@dataclass(frozen=True)
class SpanOrQuery(Query):
    clauses: tuple = ()


@dataclass(frozen=True)
class SpanNearQuery(Query):
    clauses: tuple = ()
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    match: Query | None = None
    end: int = 1


@dataclass(frozen=True)
class SpanNotQuery(Query):
    include: Query | None = None
    exclude: Query | None = None


@dataclass(frozen=True)
class PayloadNearQuery(Query):
    """Payload-scored ordered SpanNear (Search/Payloads/PayloadNearQuery.cs).

    Flat SpanTermQuery clauses only (the reference also accepts nested span
    trees; its GetPayloads recursion then re-processes nested nears'
    payloads — a quirk we do not reproduce). in_order=True only
    (NearSpansUnordered payload collection order is heap-dependent;
    documented out of scope).

    Scoring (PayloadNearSpanScorer.SetFreqCurrentDoc + GetScore):
    per minimal match, freq += sloppyFreq(end - start) in span order; the
    match's payloads are processed through the PayloadFunction in
    NearSpansOrdered collection order — LAST clause first, then clauses
    n-2 .. 0 (ShrinkToAfterShortestMatch unions the last clause's payload
    before the backward shrink loop, NearSpansOrdered.cs:357-434).
    Payload factor = the 4-byte float payload (PayloadHelper.DecodeSingle,
    as in PayloadTermQuery). Final score = spanScore * DocScore where
    DocScore = avg|min|max of seen factors (1.0 when none seen)."""

    clauses: tuple = ()  # SpanTermQuery only
    slop: int = 0
    in_order: bool = True
    function: str = "avg"  # avg | min | max


@dataclass(frozen=True)
class SpanMultiTermQueryWrapper(Query):
    """Span wrapper over a MultiTermQuery (Search/Spans/
    SpanMultiTermQueryWrapper.cs): rewrites to a SpanOrQuery containing a
    SpanTermQuery for every term the wrapped query matches in the index,
    visited in term (bytes) order like ScoringRewrite's TermsEnum walk —
    the idf-sum fold order is therefore sorted-term order. SpanOrQuery
    accepts all terms (CheckMaxClauseCount is a no-op, :185-188); the
    optional top_terms cap mirrors TopTermsSpanBooleanQueryRewrite with the
    constant-boost tie-break (equal boosts -> lexicographically smallest
    terms survive, TopTermsRewrite ScoreTerm comparer)."""

    query: Query | None = None  # Prefix/Wildcard/Regexp/TermRange query
    field: str = "text"
    top_terms: int | None = None


def expand_span_multiterm(searcher, q: Query) -> Query:
    """Replace every SpanMultiTermQueryWrapper in the tree with its
    SpanOrQuery expansion against the searcher's terms dict (one distributed
    predicate scan per wrapper; only the matched TERM STRINGS reach the
    driver — the same driver-side footprint as Lucene's rewrite, which
    enumerates matching terms to build the SpanOr)."""
    if isinstance(q, SpanMultiTermQueryWrapper):
        cond = searcher._multiterm_cond(q.query)
        if cond is None:
            raise TypeError(
                f"not a multi-term query: {type(q.query).__name__}"
            )
        rows = (
            searcher._stat_rows()
            .filter(F.col("field") == q.field)
            .filter(cond)
            .select("term")
            .distinct()
            .orderBy("term")
        )
        if q.top_terms is not None:
            rows = rows.limit(q.top_terms)
        terms = [r["term"] for r in rows.collect()]
        return SpanOrQuery(
            clauses=tuple(SpanTermQuery(term=t, field=q.field) for t in terms),
            boost=q.boost,
        )
    if isinstance(q, SpanOrQuery):
        return SpanOrQuery(
            clauses=tuple(expand_span_multiterm(searcher, c) for c in q.clauses),
            boost=q.boost,
        )
    if isinstance(q, SpanNearQuery):
        return SpanNearQuery(
            clauses=tuple(expand_span_multiterm(searcher, c) for c in q.clauses),
            slop=q.slop,
            in_order=q.in_order,
            boost=q.boost,
        )
    if isinstance(q, SpanFirstQuery):
        return SpanFirstQuery(
            match=expand_span_multiterm(searcher, q.match), end=q.end, boost=q.boost
        )
    if isinstance(q, SpanNotQuery):
        return SpanNotQuery(
            include=expand_span_multiterm(searcher, q.include),
            exclude=expand_span_multiterm(searcher, q.exclude),
            boost=q.boost,
        )
    return q


def leaf_terms(q: Query) -> list[tuple[str, str]]:
    """(field, term) leaves in query order (duplicates kept — idf sums them)."""
    if isinstance(q, SpanTermQuery):
        return [(q.field, q.term)]
    if isinstance(q, SpanOrQuery):
        return [t for c in q.clauses for t in leaf_terms(c)]
    if isinstance(q, SpanNearQuery):
        return [t for c in q.clauses for t in leaf_terms(c)]
    if isinstance(q, SpanFirstQuery):
        return leaf_terms(q.match)
    if isinstance(q, SpanNotQuery):
        return leaf_terms(q.include) + leaf_terms(q.exclude)
    raise TypeError(f"not a span query: {type(q).__name__}")


def required_terms(q: Query) -> set[tuple[str, str]]:
    """Leaves every match REQUIRES (for candidate pruning): all clauses of
    a near, the include side of a not; none under an or."""
    if isinstance(q, SpanTermQuery):
        return {(q.field, q.term)}
    if isinstance(q, SpanOrQuery):
        return set()
    if isinstance(q, SpanNearQuery):
        out: set = set()
        for c in q.clauses:
            out |= required_terms(c)
        return out
    if isinstance(q, SpanFirstQuery):
        return required_terms(q.match)
    if isinstance(q, SpanNotQuery):
        return required_terms(q.include)
    raise TypeError(f"not a span query: {type(q).__name__}")


def eval_spans(q: Query, positions: dict[tuple[str, str], list[int]]) -> list[Span]:
    """Evaluate a span tree for ONE document given leaf positions."""
    if isinstance(q, SpanTermQuery):
        return [(p, p + 1) for p in sorted(positions.get((q.field, q.term), []))]
    if isinstance(q, SpanOrQuery):
        out: list[Span] = []
        for c in q.clauses:
            out.extend(eval_spans(c, positions))
        return sorted(out)
    if isinstance(q, SpanFirstQuery):
        return [s for s in eval_spans(q.match, positions) if s[1] <= q.end]
    if isinstance(q, SpanNotQuery):
        inc = eval_spans(q.include, positions)
        exc = eval_spans(q.exclude, positions)
        return [
            s
            for s in inc
            if not any(not (s[1] <= e[0] or s[0] >= e[1]) for e in exc)
        ]
    if isinstance(q, SpanNearQuery):
        children = [eval_spans(c, positions) for c in q.clauses]
        if any(not ch for ch in children):
            return []
        if q.in_order:
            return _near_ordered(children, q.slop)
        return _near_unordered(children, q.slop)
    raise TypeError(f"not a span query: {type(q).__name__}")


def _ordered(a: Span, b: Span) -> bool:
    # DocSpansOrdered (NearSpansOrdered.cs:312-321)
    return (a[1] < b[1]) if a[0] == b[0] else (a[0] < b[0])


def _near_ordered_chains(
    children: list[list[Span]], slop: int
) -> list[tuple[Span, tuple[Span, ...]]]:
    """Minimal ordered matches WITH their per-clause chain spans (payload
    collection needs the chain; one candidate per anchor of the last
    clause — NearSpansOrdered emits at most one match per Next())."""
    out: list[tuple[Span, tuple[Span, ...]]] = []
    n = len(children)
    for anchor in children[-1]:
        chain = [anchor]
        ok = True
        for i in range(n - 2, -1, -1):
            nxt = chain[-1]
            # latest span of child i strictly ordered before nxt
            best = None
            for s in children[i]:
                if _ordered(s, nxt):
                    best = s
                else:
                    break  # sorted: once unordered, all later are too
            if best is None:
                ok = False
                break
            chain.append(best)
        if not ok:
            continue
        chain.reverse()
        match_slop = 0
        for prev, cur in zip(chain, chain[1:]):
            if cur[0] > prev[1]:  # only non-overlapping spans add to slop
                match_slop += cur[0] - prev[1]
        if match_slop <= slop:
            out.append(((chain[0][0], chain[-1][1]), tuple(chain)))
    return out


def _near_ordered(children: list[list[Span]], slop: int) -> list[Span]:
    # minimal matches can coincide for different anchors; keep one each
    return sorted({m for m, _chain in _near_ordered_chains(children, slop)})


def payload_near_doc_score(
    children: list[list[Span]],
    slop: int,
    payload_of: list[dict[int, float]],
    function: str,
) -> tuple[np.float32, np.float32]:
    """(freq, DocScore) for ONE document (PayloadNearSpanScorer semantics).

    children[i] = sorted (p, p+1) spans of flat term clause i; payload_of[i]
    maps position -> decoded f32 payload. Matches fold in span order; each
    match's payloads process in collection order (last clause, then
    clauses n-2 .. 0 — NearSpansOrdered.cs:357-434)."""
    matches = _near_ordered_chains(children, slop)
    matches.sort(key=lambda mc: mc[0])
    freq = np.float32(0.0)
    acc = np.float32(0.0)
    seen = 0
    mn = np.float32(np.inf)
    mx = np.float32(-np.inf)
    for (s0, e0), chain in matches:
        freq = np.float32(freq + np.float32(1.0) / np.float32(1 + (e0 - s0)))
        order = [len(chain) - 1] + list(range(len(chain) - 2, -1, -1))
        for i in order:
            v = payload_of[i].get(chain[i][0])
            if v is None or np.isnan(v):
                continue  # IsPayloadAvailable gate: absent payloads skip
            v32 = np.float32(v)
            acc = np.float32(acc + v32)
            seen += 1
            mn = min(mn, v32)
            mx = max(mx, v32)
    if seen == 0:
        return freq, np.float32(1.0)
    if function == "avg":
        ds = np.float32(acc / np.float32(seen))
    elif function == "min":
        ds = mn
    elif function == "max":
        ds = mx
    else:
        raise ValueError(f"unknown payload function {function!r}")
    return freq, ds


def _near_unordered(children: list[list[Span]], slop: int) -> list[Span]:
    idx = [0] * len(children)
    out: list[Span] = []
    while True:
        cur = [ch[i] for ch, i in zip(children, idx)]
        lo = min(s[0] for s in cur)
        hi = max(s[1] for s in cur)
        tot = sum(s[1] - s[0] for s in cur)
        if (hi - lo) - tot <= slop:
            out.append((lo, hi))
        # advance the min-start child (NearSpansUnordered queue pop)
        k = min(range(len(cur)), key=lambda j: (cur[j][0], cur[j][1]))
        idx[k] += 1
        if idx[k] >= len(children[k]):
            return sorted(set(out))


def span_freq(spans: list[Span]) -> np.float32:
    """float32 fold of 1/(1+matchLength) in span order (SpanScorer.cs:79-88)."""
    freq = np.float32(0.0)
    for s, e in spans:
        freq = np.float32(freq + np.float32(1.0) / np.float32(1 + (e - s)))
    return freq


def span_scores_oracle(index, q: Query, k1=1.2, b=0.75, boost=1.0):
    """Oracle-side: docid -> float32 span score over an OracleIndex."""
    from ..oracle import idf as idf_f32
    from ..oracle import norm_cache

    leaves = leaf_terms(q)
    s = np.float32(0.0)
    for _f, t in leaves:
        s = np.float32(s + idf_f32(len(index.postings.get(t, [])), index.max_doc))
    w = np.float32(
        np.float32(s * np.float32(boost))
        * np.float32(np.float32(k1) + np.float32(1.0))
    )
    cache = norm_cache(k1, b, index.avgdl)
    req = required_terms(q)
    cand: set[int] | None = None
    for _f, t in req or {lf for lf in leaves}:
        docs = set(index.positions.get(t, {}))
        cand = docs if cand is None else cand & docs
    if req == set():  # pure-or tree: union of leaves
        cand = set()
        for _f, t in leaves:
            cand |= set(index.positions.get(t, {}))
    out = {}
    for d in sorted(cand or ()):
        pos = {
            (f, t): index.positions.get(t, {}).get(d, []) for f, t in set(leaves)
        }
        spans = eval_spans(q, pos)
        if not spans:
            continue
        freq = span_freq(spans)
        norm = cache[index.norm_bytes[d]]
        out[d] = np.float32(w * freq / (freq + norm))
    return out


def span_scores_sim_oracle(index, q: Query, similarity: str, boost=1.0):
    """Oracle-side span scores under a non-BM25 similarity: the span freq
    machinery + the shared SimScorer kernel step (SpanWeight computes
    stats over ALL leaf termStats; SimilarityBase multi-stats sums the
    per-term kernels at the span freq)."""
    from ..oracle import sim_scores_from_freqs

    leaves = leaf_terms(q)
    req = required_terms(q)
    cand: set[int] | None = None
    for _f, t in req or {lf for lf in leaves}:
        docs = set(index.positions.get(t, {}))
        cand = docs if cand is None else cand & docs
    if req == set():  # pure-or tree: union of leaves
        cand = set()
        for _f, t in leaves:
            cand |= set(index.positions.get(t, {}))
    freqs: dict[int, np.float32] = {}
    for d in sorted(cand or ()):
        pos = {
            (f, t): index.positions.get(t, {}).get(d, []) for f, t in set(leaves)
        }
        spans = eval_spans(q, pos)
        if not spans:
            continue
        freqs[d] = np.float32(span_freq(spans))
    return sim_scores_from_freqs(
        index, [t for _f, t in leaves], freqs, similarity, boost=boost
    )


def payload_near_scores_oracle_sim(
    index, q: "PayloadNearQuery", similarity: str, mu: float = 2000.0,
    lam: float = 0.1,
) -> dict[int, np.float32]:
    """Oracle PayloadNearQuery under a non-BM25 similarity: the shared
    sloppyFreq/factor folds (payload_near_doc_score) feed the ACTIVE
    kernel via sim_scores_from_freqs, then f32(span * factor) —
    PayloadNearQuery.cs GetScore through Similarity.SimScorer."""
    from ..oracle import sim_scores_from_freqs

    terms = [c.term for c in q.clauses]
    cand: set[int] | None = None
    for t in terms:
        docs = set(index.positions.get(t, {}))
        cand = docs if cand is None else cand & docs
    freqs: dict[int, np.float32] = {}
    factors: dict[int, np.float32] = {}
    for d in sorted(cand or ()):
        children = [
            [(p, p + 1) for p in sorted(index.positions.get(t, {}).get(d, []))]
            for t in terms
        ]
        payload_of = [
            {
                p: float(np.float32(np.float32(p) + np.float32(1.0)))
                for p in index.positions.get(t, {}).get(d, [])
            }
            for t in terms
        ]
        freq, ds = payload_near_doc_score(children, q.slop, payload_of, q.function)
        if freq <= 0:
            continue
        freqs[d] = np.float32(freq)
        factors[d] = np.float32(ds)
    span = sim_scores_from_freqs(
        index, terms, freqs, similarity, boost=q.boost, mu=mu, lam=lam
    )
    return {d: np.float32(span[d] * factors[d]) for d in freqs}


def payload_near_scores_oracle(
    index, q: "PayloadNearQuery", k1=1.2, b=0.75
) -> dict[int, np.float32]:
    """Oracle-side PayloadNearQuery scores over an OracleIndex (the
    position_float provider: payload at occurrence p = f32(f32(p) + 1f))."""
    from ..oracle import idf as idf_f32
    from ..oracle import norm_cache

    terms = [c.term for c in q.clauses]
    s = np.float32(0.0)
    for t in terms:
        s = np.float32(s + idf_f32(len(index.postings.get(t, [])), index.max_doc))
    w = np.float32(
        np.float32(s * np.float32(q.boost))
        * np.float32(np.float32(k1) + np.float32(1.0))
    )
    cache = norm_cache(k1, b, index.avgdl)
    cand: set[int] | None = None
    for t in terms:
        docs = set(index.positions.get(t, {}))
        cand = docs if cand is None else cand & docs
    out: dict[int, np.float32] = {}
    for d in sorted(cand or ()):
        children = [
            [(p, p + 1) for p in sorted(index.positions.get(t, {}).get(d, []))]
            for t in terms
        ]
        payload_of = [
            {
                p: float(np.float32(np.float32(p) + np.float32(1.0)))
                for p in index.positions.get(t, {}).get(d, [])
            }
            for t in terms
        ]
        freq, ds = payload_near_doc_score(children, q.slop, payload_of, q.function)
        if freq <= 0:
            continue
        norm = cache[index.norm_bytes[d]]
        out[d] = np.float32(np.float32(w * freq / (freq + norm)) * ds)
    return out


def span_scores(searcher, q: Query) -> DataFrame:
    """Engine-side: DataFrame(docid, score) for a span query.

    Same shape as the sloppy-phrase scorer: decode (docid, leaf, pos) rows
    for the tree's terms (conjunction-pruned by the required set), gather
    per candidate doc, evaluate the span algebra per doc (few docs survive),
    score with the phrase weight chain."""
    q = expand_span_multiterm(searcher, q)
    leaves = leaf_terms(q)
    if not leaves:
        # e.g. a wrapper whose multi-term query matched nothing
        return searcher._empty_hits()
    keys = sorted(set(leaves))
    dfs = searcher.doc_freqs(keys)
    req = required_terms(q)
    if any(dfs[k] == 0 for k in req):
        return searcher._empty_hits()
    from ..oracle import idf as idf_f32

    s = np.float32(0.0)
    for k in leaves:
        s = np.float32(s + idf_f32(dfs[k], searcher.max_doc))
    w = np.float32(
        np.float32(s * np.float32(q.boost))
        * np.float32(np.float32(searcher.k1) + np.float32(1.0))
    )
    blocks = searcher._blocks_for(keys)
    if len(req) >= 2:
        blocks = searcher._conjunction_prune(blocks, sorted(req))
    clause_of = {k: i for i, k in enumerate(keys)}
    cache = searcher._field_caches[keys[0][0]]
    req_mask = 0
    for k in req:
        req_mask |= 1 << clause_of[k]
    qq = q
    R = searcher.BULK_RANGE
    # non-BM25 similarity: the span machinery emits (docid, spanFreq, norm)
    # and the shared phrase/span finalize applies the active kernel (the
    # reference scores spans under every Similarity via SpanWeight ->
    # Similarity.ComputeWeight over all leaf termStats)
    emit_freq = searcher.similarity != "bm25"

    # Scale-safe gather (VERDICT r02 #2): positions are shuffled as docid-
    # range-sliced BINARY sub-arrays — O(blocks) rows, never one row per
    # position occurrence (the previous groupBy(docid).collect_list built
    # per-position Spark rows; for a pure-OR tree with empty required set
    # that was O(total positions of all matching terms)). Each range
    # evaluates the span algebra per doc locally, emitting scored rows.
    def slice_ranges(it):
        from .codec import decode_block, decode_positions

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                docids, tfs = decode_block(
                    r.docids_enc, r.tfs_enc, r.first_docid, r.count
                )
                if r.docbase:
                    docids = docids + r.docbase
                nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                poss = decode_positions(r.pos_enc, int(tfs.sum()))
                drep = np.repeat(docids, tfs)
                nrep = np.repeat(nbytes, tfs)
                rid = drep // R
                change = np.nonzero(rid[1:] != rid[:-1])[0]
                bounds = np.concatenate([[0], change + 1, [len(drep)]])
                leaf = clause_of[(r.field, r.term)]
                for b0, b1 in zip(bounds[:-1], bounds[1:]):
                    rows.append(
                        (
                            int(rid[b0]),
                            leaf,
                            drep[b0:b1].tobytes(),
                            poss[b0:b1].tobytes(),
                            nrep[b0:b1].tobytes(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["rid", "leaf", "docids", "pos", "norms"]
            )

    w32 = np.float32(w)

    def reduce_ranges(it):
        bufs = [p for p in it if len(p)]
        if not bufs:
            return
        pdf = pd.concat(bufs, ignore_index=True) if len(bufs) > 1 else bufs[0]
        counts = np.array([len(b) // 8 for b in pdf["docids"]], dtype=np.int64)
        d = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in pdf["docids"]])
        p = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in pdf["pos"]])
        nb = np.concatenate([np.frombuffer(b, dtype=np.uint8) for b in pdf["norms"]])
        lf = np.repeat(pdf["leaf"].to_numpy(), counts)
        order = np.lexsort((p, lf, d))
        d, p, nb, lf = d[order], p[order], nb[order], lf[order]
        starts = np.concatenate([[0], np.nonzero(d[1:] != d[:-1])[0] + 1, [len(d)]])
        out_d, out_s = [], []
        for g0, g1 in zip(starts[:-1], starts[1:]):
            present = 0
            for leaf in lf[g0:g1]:
                present |= 1 << int(leaf)
            if (present & req_mask) != req_mask:
                continue
            pos: dict = {k: [] for k in keys}
            for i in range(g0, g1):
                pos[keys[int(lf[i])]].append(int(p[i]))
            spans = eval_spans(qq, pos)
            if not spans:
                continue
            freq = span_freq(spans)
            out_d.append(int(d[g0]))
            if emit_freq:
                out_s.append((np.float32(freq), int(nb[g0])))
            else:
                out_s.append(np.float32(w32 * freq / (freq + cache[int(nb[g0])])))
        if out_d:
            if emit_freq:
                yield pd.DataFrame(
                    {
                        "docid": np.array(out_d, dtype=np.int64),
                        "freq": np.array([x[0] for x in out_s], dtype=np.float32),
                        "nb": np.array([x[1] for x in out_s], dtype=np.int16),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "docid": np.array(out_d, dtype=np.int64),
                        "score": np.array(out_s, dtype=np.float32),
                    }
                )

    n_shuffle = max(
        int(searcher.spark.conf.get("spark.sql.shuffle.partitions", "32")), 8
    )
    sliced = blocks.select(
        "field", "term", "first_docid", "count", "docids_enc", "tfs_enc",
        "norms_enc", "pos_enc", "docbase",
    ).mapInPandas(
        slice_ranges,
        "rid long, leaf int, docids binary, pos binary, norms binary",
    )
    out_schema = (
        "docid long, freq float, nb short"
        if emit_freq
        else "docid long, score float"
    )
    out = sliced.repartition(n_shuffle, "rid").mapInPandas(
        reduce_ranges, out_schema
    )
    if emit_freq:
        flat = [(i, t) for i, (_f, t) in enumerate(leaves)]
        return searcher._phrase_finalize(out, flat, keys[0][0], q.boost)
    return out


def span_search(searcher, q: Query, k: int = 10) -> DataFrame:
    """Top-k span search with the standard tie-break."""
    # _apply_live_docs carries the broadcast-vs-shuffle size guard
    scored = searcher._apply_live_docs(span_scores(searcher, q))
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def payload_near_scores(searcher, q: PayloadNearQuery) -> DataFrame:
    """DataFrame(docid, score) for a PayloadNearQuery (flat term clauses).

    Same scale-safe shape as span_scores — positions AND the aligned f32
    payload channel ship as docid-range-sliced binary sub-arrays (O(blocks)
    shuffle rows), evaluated per range. The candidate set is conjunction-
    pruned on all clauses (a near requires every clause).

    Scored under EVERY similarity (r5): PayloadNearSpanScorer routes the
    span kernel through the active SimScorer (Search/Payloads/
    PayloadNearQuery.cs; ComputeSlopFactor = 1/(distance+1) in every
    family, so the sloppyFreq fold is shared) — non-BM25 emits
    (docid, freq, nb, factor) and _phrase_finalize applies the kernel,
    exactly the PayloadTermQuery route."""
    if not q.in_order:
        raise NotImplementedError(
            "PayloadNearQuery: unordered payload collection order is "
            "heap-dependent in the reference (NearSpansUnordered); ordered "
            "only here"
        )
    kernel_path = searcher.similarity != "bm25"
    for c in q.clauses:
        if not isinstance(c, SpanTermQuery):
            raise TypeError(
                "PayloadNearQuery clauses must be SpanTermQuery, got "
                f"{type(c).__name__}"
            )
    fields = {c.field for c in q.clauses}
    if len(fields) > 1:
        # SpanNearQuery ctor: "all clauses must have same field"
        raise ValueError(
            f"PayloadNearQuery clauses must share one field, got {sorted(fields)}"
        )
    for seg in searcher.segments:
        if seg["manifest"].get("payload_provider") is None:
            raise NotImplementedError(
                "payload queries need an index built with a payload_provider"
            )
    clauses = [(c.field, c.term) for c in q.clauses]
    keys = sorted(set(clauses))
    dfs = searcher.doc_freqs(keys)
    if any(dfs[k] == 0 for k in keys):
        return searcher._empty_hits()
    from ..oracle import idf as idf_f32

    s = np.float32(0.0)
    for k in clauses:
        s = np.float32(s + idf_f32(dfs[k], searcher.max_doc))
    w32 = np.float32(
        np.float32(s * np.float32(q.boost))
        * np.float32(np.float32(searcher.k1) + np.float32(1.0))
    )
    blocks = searcher._blocks_for(keys)
    if len(keys) >= 2:
        blocks = searcher._conjunction_prune(blocks, keys)
    key_of = {k: i for i, k in enumerate(keys)}
    clause_keys = [key_of[c] for c in clauses]
    cache = searcher._field_caches[keys[0][0]]
    req_mask = 0
    for k in keys:
        req_mask |= 1 << key_of[k]
    slop, fn = q.slop, q.function
    if fn not in ("avg", "min", "max"):
        raise ValueError(f"unknown payload function {fn!r}")
    R = searcher.BULK_RANGE

    def slice_ranges(it):
        from .codec import decode_block, decode_float_payloads, decode_positions

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                docids, tfs = decode_block(
                    r.docids_enc, r.tfs_enc, r.first_docid, r.count
                )
                if r.docbase:
                    docids = docids + r.docbase
                nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                n_pos = int(tfs.sum())
                poss = decode_positions(r.pos_enc, n_pos)
                pays = decode_float_payloads(r.pay_enc, n_pos)
                drep = np.repeat(docids, tfs)
                nrep = np.repeat(nbytes, tfs)
                rid = drep // R
                change = np.nonzero(rid[1:] != rid[:-1])[0]
                bounds = np.concatenate([[0], change + 1, [len(drep)]])
                leaf = key_of[(r.field, r.term)]
                for b0, b1 in zip(bounds[:-1], bounds[1:]):
                    rows.append(
                        (
                            int(rid[b0]),
                            leaf,
                            drep[b0:b1].tobytes(),
                            poss[b0:b1].tobytes(),
                            pays[b0:b1].astype(np.float32).tobytes(),
                            nrep[b0:b1].tobytes(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["rid", "leaf", "docids", "pos", "pay", "norms"]
            )

    def reduce_ranges(it):
        bufs = [p for p in it if len(p)]
        if not bufs:
            return
        pdf = pd.concat(bufs, ignore_index=True) if len(bufs) > 1 else bufs[0]
        counts = np.array([len(b) // 8 for b in pdf["docids"]], dtype=np.int64)
        d = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in pdf["docids"]])
        p = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in pdf["pos"]])
        pv = np.concatenate([np.frombuffer(b, dtype=np.float32) for b in pdf["pay"]])
        nb = np.concatenate([np.frombuffer(b, dtype=np.uint8) for b in pdf["norms"]])
        lf = np.repeat(pdf["leaf"].to_numpy(), counts)
        order = np.lexsort((p, lf, d))
        d, p, pv, nb, lf = d[order], p[order], pv[order], nb[order], lf[order]
        starts = np.concatenate([[0], np.nonzero(d[1:] != d[:-1])[0] + 1, [len(d)]])
        out_d, out_s = [], []
        for g0, g1 in zip(starts[:-1], starts[1:]):
            present = 0
            for leaf in lf[g0:g1]:
                present |= 1 << int(leaf)
            if (present & req_mask) != req_mask:
                continue
            pos_k: list[list[int]] = [[] for _ in keys]
            pay_k: list[dict] = [{} for _ in keys]
            for i in range(g0, g1):
                ki = int(lf[i])
                pos_k[ki].append(int(p[i]))
                pay_k[ki][int(p[i])] = float(pv[i])
            children = [
                [(pp, pp + 1) for pp in pos_k[ck]] for ck in clause_keys
            ]
            payload_of = [pay_k[ck] for ck in clause_keys]
            freq, ds = payload_near_doc_score(children, slop, payload_of, fn)
            if freq <= 0:
                continue
            out_d.append(int(d[g0]))
            if kernel_path:
                # hand (freq, norm byte, factor) to the active kernel
                out_s.append((np.float32(freq), int(nb[g0]), np.float32(ds)))
            else:
                span_score = np.float32(
                    w32 * freq / (freq + cache[int(nb[g0])])
                )
                out_s.append(np.float32(span_score * ds))
        if out_d:
            if kernel_path:
                fr, nbv, fac = zip(*out_s)
                yield pd.DataFrame(
                    {
                        "docid": np.array(out_d, dtype=np.int64),
                        "freq": np.array(fr, dtype=np.float32),
                        "nb": np.array(nbv, dtype=np.int16),
                        "factor": np.array(fac, dtype=np.float32),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "docid": np.array(out_d, dtype=np.int64),
                        "score": np.array(out_s, dtype=np.float32),
                    }
                )

    n_shuffle = max(
        int(searcher.spark.conf.get("spark.sql.shuffle.partitions", "32")), 8
    )
    sliced = blocks.select(
        "field", "term", "first_docid", "count", "docids_enc", "tfs_enc",
        "norms_enc", "pos_enc", "pay_enc", "docbase",
    ).mapInPandas(
        slice_ranges,
        "rid long, leaf int, docids binary, pos binary, pay binary, norms binary",
    )
    shuffled = sliced.repartition(n_shuffle, "rid")
    if kernel_path:
        pf = shuffled.mapInPandas(
            reduce_ranges, "docid long, freq float, nb short, factor float"
        )
        # weight stats fold over clauses in DECLARATION order (duplicates
        # kept), like PayloadNearSpanWeight's multi-stats ComputeWeight
        flat = [(i, t) for i, (_f, t) in enumerate(clauses)]
        return searcher._phrase_finalize(
            pf, flat, keys[0][0], q.boost, factor_col="factor"
        )
    return shuffled.mapInPandas(reduce_ranges, "docid long, score float")


def payload_near_search(searcher, q: PayloadNearQuery, k: int = 10) -> DataFrame:
    scored = searcher._apply_live_docs(payload_near_scores(searcher, q))
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
