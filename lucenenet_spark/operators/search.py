"""Query execution: BM25 top-k over the block-encoded index, Spark-first.

Lifecycle mirrors IndexSearcher.Search (SURVEY.md §3.1):
 1. rewrite()  — MultiTermQuery expansion against the terms dict
                 (MultiTermQuery.cs:65-118; fixpoint IndexSearcher.cs:753-760)
 2. weights    — global stats (field_stats/term_stats, counting all docs like
                 Lucene counts deleted-until-merged) -> frozen float32
                 weightValue = idf * boost * (k1+1) per clause
 3. scoring    — bucket- and term-pruned scan of posting blocks; numpy decode
                 + vectorized float32 BM25 inside mapInPandas (Arrow batches);
                 boolean algebra relationally: MUST = match-count filter,
                 SHOULD = sum, MUST_NOT = left_anti join, minShouldMatch =
                 count filter (BooleanScorer's bucket table == Catalyst hash
                 aggregate, BooleanScorer.cs:28-55)
 4. collect    — orderBy(score desc, docid asc).limit(k): Spark's
                 TakeOrderedAndProject is per-partition heaps + driver merge,
                 exactly TopScoreDocCollector + TopDocs.Merge semantics
                 (HitQueue.cs:88-100, TopDocs.cs:157-191)

Block-max pruning (north rule; absent in Lucene 4.8 — SURVEY.md §4.1):
two-phase WAND-style. Phase 1 decodes only the top ceil(k/128) blocks per
term by stored max_score_bound and computes a lower bound θ on the k-th
score from partial sums. Phase 2 keeps block b of term t only if
w_t*bound_b + Σ_{t'≠t} w_t'*maxbound_t' >= θ (ties kept, so rank-identity is
preserved — asserted in tests). Both phases are plain DataFrame filters on
block *metadata* columns, so pruned blocks are never even read past the
parquet row-group footer.

Float32 parity: clause scores are summed in clause order with float32
accumulation (a sorted-fold in a pandas UDF), matching Lucene's scorer-order
summation; see oracle.py for the cited arithmetic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from ..oracle import idf as idf_f32
from ..oracle import norm_cache
from ..plans.query import (
    BooleanQuery,
    CommonTermsQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    FilteredQuery,
    FuzzyQuery,
    MatchAllQuery,
    MultiPhraseQuery,
    NGramPhraseQuery,
    PayloadTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from .codec import BLOCK_SIZE
from .index_build import (
    FIELD,
    FKEY_SEP,
    docs_view,
    load_manifest,
    omit_norms_cache,
    term_bucket,
)

SCORE_ROWS_SCHEMA = "docid long, clause int, score float"


@dataclass
class Clause:
    clause_id: int
    term: str
    weight: np.float32  # idf * boost * (k1+1), float32
    field: str = FIELD

    @property
    def key(self) -> tuple[str, str]:
        return (self.field, self.term)


class IndexSearcher:
    """Searcher over one or more index segments.

    Multi-segment semantics mirror the reference exactly: per-segment docIDs
    are shifted by a cumulative docBase (AtomicReaderContext.cs:36,44-48),
    term/collection stats are summed ACROSS segments before weights freeze
    (TermContext.cs:90-145, IndexSearcher.cs:1089-1115), and the global top-k
    orderBy subsumes TopDocs.Merge (TopDocs.cs:157-191). Block-max pruning is
    only enabled on single-segment (compacted) indexes: stored bounds were
    computed against the segment's own avgdl, which is not a valid upper bound
    under merged global stats — compaction re-derives them.
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str | list[str],
        prune_min_postings: int = 1 << 16,
        wand_min_postings: int | None = None,
        similarity: str = "bm25",
        mu: float = 2000.0,
        lam: float = 0.1,
    ):
        self.spark = spark
        dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
        if not dirs:
            raise ValueError("at least one index segment required")
        self.index_dir = dirs[0]
        self.segments = []
        docbase = 0
        for d in dirs:
            m = load_manifest(d)
            self.segments.append({"dir": d, "manifest": m, "docbase": docbase})
            docbase += int(m["max_doc"])
        self.manifest = self.segments[0]["manifest"]
        self.k1 = float(self.manifest["k1"])
        self.b = float(self.manifest["b"])
        # the index's analysis chain — query-side analysis (parser, MLT,
        # highlighting re-analysis) must run the same chain or stemmed
        # indexes silently miss (QueryParser(analyzer) parity)
        self.analyzer = self.manifest.get("analyzer", "standard")
        assert all(
            s["manifest"].get("analyzer", "standard") == self.analyzer
            for s in self.segments
        ), "segments indexed with different analyzers"
        assert all(
            float(s["manifest"]["k1"]) == self.k1 and float(s["manifest"]["b"]) == self.b
            for s in self.segments
        ), "segments indexed with different BM25 parameters"
        self.max_doc = docbase
        sum_ttf = sum(int(s["manifest"]["sum_ttf"]) for s in self.segments)
        self.avgdl = (
            np.float32(np.float64(sum_ttf) / np.float64(self.max_doc))
            if sum_ttf > 0
            else np.float32(1.0)
        )
        self._cache256 = norm_cache(self.k1, self.b, self.avgdl)
        # per-field denominator caches: the analyzed text field uses the
        # byte315 norm cache; omitNorms keyword fields score with norm = k1
        # (b treated as 0, BM25Similarity.cs:262) — a constant cache
        fields_info: dict[str, dict] = {}
        for s in self.segments:
            for f, info in (s["manifest"].get("fields") or {}).items():
                if f in fields_info:
                    # cross-segment field stats SUM (TermContext-style)
                    for key in ("doc_count", "sum_ttf"):
                        fields_info[f][key] = fields_info[f].get(key, 0) + info.get(key, 0)
                else:
                    fields_info[f] = dict(info)
        if FIELD not in fields_info:
            fields_info[FIELD] = {"omit_norms": False, "sum_ttf": sum_ttf}
        self.fields_info = fields_info
        kwc = omit_norms_cache(self.k1)
        self._field_caches = {
            f: (self._cache256 if not info.get("omit_norms") else kwc)
            for f, info in fields_info.items()
        }
        # pluggable similarity: "bm25" (default) or "classic" (TF-IDF /
        # DefaultSimilarity). Norm bytes are similarity-independent
        # (SURVEY §4.2), so this is a pure query-time switch; classic
        # decodes them raw (byte315ToFloat), omitNorms fields score raw
        # (norms == null -> no multiply, TFIDFSimScorer.Score:691)
        from .simbase import parse_spec

        self.sim_spec = parse_spec(similarity)  # DFR/IB matrix member or None
        # SweetSpotSimilarity (Lucene.Net.Misc/Misc/SweetSpotSimilarity.cs):
        # DefaultSimilarity with BaselineTf swapped in at query time —
        # "sweetspot[:<tf_base>:<tf_min>]". The plateau LengthNorm half is
        # an index-time choice (IndexBuilder norm_spec); this searcher
        # simply decodes whatever norm bytes the index stored, exactly like
        # classic. Defaults (0, 0) degrade BaselineTf to sqrt(freq).
        self.tf_params: tuple | None = None
        if similarity.startswith("sweetspot"):
            parts = similarity.split(":")
            if len(parts) not in (1, 3):
                raise ValueError(
                    "sweetspot takes none or both tf factors: "
                    "sweetspot[:<tf_base>:<tf_min>]"
                )
            base = np.float32(parts[1]) if len(parts) > 1 else np.float32(0.0)
            mn = np.float32(parts[2]) if len(parts) > 2 else np.float32(0.0)
            self.tf_params = (base, mn)
        elif similarity not in ("bm25", "classic", "lmd", "lmjm") and (
            self.sim_spec is None
        ):
            raise ValueError(f"unknown similarity {similarity!r}")
        self.similarity = similarity
        self.mu = float(mu)  # LMDirichletSimilarity default mu=2000
        self.lam = float(lam)  # LMJelinekMercerSimilarity lambda
        from ..functions.smallfloat import DECODE_TABLE

        ones = np.ones(256, dtype=np.float32)
        self._decode_tables = {
            f: (DECODE_TABLE if not info.get("omit_norms") else ones)
            for f, info in fields_info.items()
        }
        # (field, term) -> (df, max_block_bound); one pruned scan per term
        self._stats_cache: dict[tuple[str, str], tuple[int, float]] = {}
        # CachingWrapperFilter's per-searcher docid-set cache
        self._filter_cache: dict = {}
        # below this many candidate postings, block-max pruning costs more
        # (2 extra jobs) than the decode it saves — scan-and-score instead
        self.prune_min_postings = prune_min_postings
        # Block-max WAND has a HIGHER engage threshold than the other
        # adaptive guards: it costs 2 extra jobs (block-bound probe +
        # theta), while the vectorized decode it avoids runs ~10^8
        # postings/s — measured at sf1 (df 573k) pruning was a net 0.75 s
        # LOSS. Local crossover sits around ~4M candidate postings; on a
        # cluster the same rule holds per-executor-job overhead. Callers
        # that customize prune_min_postings (tests forcing the path) keep
        # the old coupled behavior.
        if wand_min_postings is not None:
            self.wand_min_postings = wand_min_postings
        elif prune_min_postings == (1 << 16):
            self.wand_min_postings = 1 << 22
        else:
            self.wand_min_postings = prune_min_postings
        self._prunable = len(self.segments) == 1
        self._live_docs_cache: DataFrame | None | bool = False  # False = unloaded
        self._deleted_count_cache: int | None = None  # capped; see _deleted_count_capped

    # -- table accessors -------------------------------------------------------
    def postings(self) -> DataFrame:
        # block_no >= 0 excludes the per-partition checkpoint meta rows
        out = None
        for s in self.segments:
            df = (
                self.spark.read.parquet(s["manifest"]["tables"]["postings"])
                .filter(F.col("block_no") >= 0)
                .withColumn("docbase", F.lit(s["docbase"]))
            )
            out = df if out is None else out.unionByName(df)
        return out

    def docs(self) -> DataFrame:
        out = None
        for s in self.segments:
            df = docs_view(self.spark, s["manifest"])
            if s["docbase"]:
                df = df.withColumn("docid", F.col("docid") + F.lit(s["docbase"]))
            out = df if out is None else out.unionByName(df)
        return out

    def term_stats(self) -> DataFrame:
        from .index_build import term_stats_view

        out = None
        for s in self.segments:
            df = term_stats_view(self.spark, s["manifest"]["tables"]["postings"])
            out = df if out is None else out.unionByName(df)
        if len(self.segments) > 1:
            out = out.groupBy("field", "term").agg(
                F.sum("df").alias("df"),
                F.sum("ttf").alias("ttf"),
                F.max("max_bound").alias("max_bound"),
            )
        return out

    def _stat_rows(self, terms=None) -> DataFrame:
        """RAW terms-dict stat rows (block_no == -2), one per (field, term,
        salt, segment) — NO aggregation, so uses that only need term
        membership (semi-joins) or can sum driver-side (term_meta) skip the
        groupBy shuffle entirely. terms: optional term refs to prune the
        scan to their bucket dirs + row-group term stats (VERDICT r02 #1:
        the per-query stats aggregate was the q_prefix regression)."""
        tset = None
        if terms is not None:
            tset = sorted({t for _f, t in self._as_keys(terms)})
        out = None
        for s in self.segments:
            df = self.spark.read.parquet(
                s["manifest"]["tables"]["postings"]
            ).filter(F.col("block_no") == -2)
            if tset is not None:
                nb = int(s["manifest"]["n_buckets"])
                buckets = sorted({term_bucket(t, nb) for t in tset})
                df = df.filter(F.col("bucket").isin(buckets)).filter(
                    F.col("term").isin(tset)
                )
            df = df.select(
                "field", "term", "count", "sum_tf", "max_score_bound"
            )
            out = df if out is None else out.unionByName(df)
        return out

    # -- stats -------------------------------------------------------------------
    @staticmethod
    def _as_keys(terms) -> list[tuple[str, str]]:
        """Normalize term refs: 'term' -> (FIELD, term); (field, term) kept."""
        return [(FIELD, t) if isinstance(t, str) else tuple(t) for t in terms]

    def term_meta(self, terms) -> dict[tuple[str, str], tuple[int, int, float]]:
        """(df, ttf, max_block_bound) per (field, term) (one pruned scan;
        cached).

        The stats role of TermContext.cs:90-145 plus the WAND per-term upper
        bound, precomputed at build time so planning needs no metadata job."""
        keys = set(self._as_keys(terms))
        missing = [k for k in keys if k not in self._stats_cache]
        if missing:
            # bucket-dir + row-group-pruned scan of the RAW stat rows (one
            # per (field, term, salt, segment)); the tiny sum over salts/
            # segments happens here on the driver — a single-stage job, no
            # groupBy shuffle (TermContext.cs:90-145 sums the same way)
            rows = (
                self._stat_rows(missing)
                .filter(
                    F.concat_ws(FKEY_SEP, "field", "term").isin(
                        [f + FKEY_SEP + t for f, t in missing]
                    )
                )
                .collect()
            )
            found: dict[tuple[str, str], list] = {}
            for r in rows:
                acc = found.setdefault((r["field"], r["term"]), [0, 0, 0.0])
                acc[0] += int(r["count"])
                acc[1] += int(r["sum_tf"])
                acc[2] = max(acc[2], float(r["max_score_bound"]))
            for k in missing:
                self._stats_cache[k] = tuple(found.get(k, (0, 0, 0.0)))
        return {k: self._stats_cache[k] for k in keys}

    def doc_freqs(self, terms) -> dict[tuple[str, str], int]:
        return {k: m[0] for k, m in self.term_meta(terms).items()}

    def _df_of(self, clause: "Clause") -> int:
        return self.doc_freqs([clause.key])[clause.key]

    # -- deletes (liveDocs) ----------------------------------------------------
    def _deleted_docids(self) -> DataFrame | None:
        """Union of per-segment delete logs, docbase-shifted to global ids.

        None when no segment has deletes (the common case — zero overhead)."""
        if self._live_docs_cache is not False:
            return self._live_docs_cache
        from .deletes import DeleteLog

        out = None
        for s in self.segments:
            d = DeleteLog(self.spark, s["dir"]).deleted()
            if d is None:
                continue
            if s["docbase"]:
                d = d.select((F.col("docid") + F.lit(s["docbase"])).alias("docid"))
            out = d if out is None else out.unionByName(d)
        self._live_docs_cache = out
        return out

    # A docid-set probe above this is never broadcast: 10^7 longs is ~80 MB
    # serialized — at Spark's broadcast ceiling and a per-executor memory
    # cliff at 1000 executors. Above it the anti-join runs as a plain
    # shuffled left_anti, the right plan for a NOT clause on a hot term
    # (df ~10^9 at the 10^12-turn target) or a mass-delete backlog.
    MAX_BROADCAST_DOCIDS = 10_000_000

    def _anti_join_docids(
        self, scored: DataFrame, docids: DataFrame, bound: int | None
    ) -> DataFrame:
        """left_anti docid mask with a size-guarded broadcast.

        `bound` is an upper bound on the docid-set row count (Σdf for term
        sets, the capped cached count for the delete set); None = unknown =
        never broadcast. Join SEMANTICS are identical either way — only the
        physical strategy changes (acceptDocs, SegmentReader.cs:100)."""
        if bound is not None and bound <= self.MAX_BROADCAST_DOCIDS:
            docids = F.broadcast(docids)
        return scored.join(docids, "docid", "left_anti")

    def _must_not_mask(self, scored: DataFrame, not_keys) -> DataFrame:
        """Mask MUST_NOT term matches (BooleanWeight prohibited scorers).

        Σdf over the prohibited terms — from the cached term_meta scan, no
        extra job — bounds the probe size, so a NOT on a hot term degrades
        to a shuffled anti-join instead of an oversized broadcast."""
        not_keys = list(not_keys)
        if not not_keys:
            return scored
        bound = sum(m[0] for m in self.term_meta(not_keys).values())
        return self._anti_join_docids(
            scored, self._docids_of_terms(not_keys, dedupe=False), bound
        )

    def _deleted_count_capped(self) -> int:
        """Delete-set size, counted once per delete generation and capped at
        MAX_BROADCAST_DOCIDS + 1 — only the broadcast decision needs it."""
        if self._deleted_count_cache is None:
            d = self._deleted_docids()
            self._deleted_count_cache = (
                0 if d is None else d.limit(self.MAX_BROADCAST_DOCIDS + 1).count()
            )
        return self._deleted_count_cache

    def _apply_live_docs(self, scored: DataFrame) -> DataFrame:
        """acceptDocs mask (SegmentReader.cs:100,136,272): deleted docs never
        match; stats still count them until merged away — exactly Lucene.
        The mask broadcast has the same size cliff as the bulk scorer's
        MAX_BULK_DELETES: an oversized delete set shuffles instead."""
        dels = self._deleted_docids()
        if dels is None:
            return scored
        return self._anti_join_docids(scored, dels, self._deleted_count_capped())

    def delete_docids(self, docids: DataFrame) -> None:
        """Record global docids as deleted, routed to their owning segments."""
        from .deletes import DeleteLog

        for s in self.segments:
            base, n = s["docbase"], int(s["manifest"]["max_doc"])
            local = docids.filter(
                (F.col("docid") >= base) & (F.col("docid") < base + n)
            ).select((F.col("docid") - F.lit(base)).alias("docid"))
            if local.limit(1).count():
                DeleteLog(self.spark, s["dir"]).delete_docids(local)
        self._live_docs_cache = False  # invalidate
        self._deleted_count_cache = None

    def delete_by_term(self, term: str) -> None:
        """IndexWriter.DeleteDocuments(Term) analogue."""
        self.delete_docids(self.scores(TermQuery(term=term)).select("docid"))

    def delete_by_query(self, q: Query) -> None:
        self.delete_docids(self.scores(q).select("docid"))

    def weight(self, term: str, boost: float = 1.0, field: str = FIELD) -> np.float32:
        df = self.doc_freqs([(field, term)])[(field, term)]
        if df == 0:
            return np.float32(0.0)
        w = np.float32(idf_f32(df, self.max_doc) * np.float32(boost))
        return np.float32(w * np.float32(np.float32(self.k1) + np.float32(1.0)))

    # -- block scan --------------------------------------------------------------
    def _blocks_for(self, terms) -> DataFrame:
        """Posting blocks of the given term refs ('term' or (field, term))."""
        keys = sorted(set(self._as_keys(terms)))
        tset = sorted({t for _f, t in keys})
        fkeys = [f + FKEY_SEP + t for f, t in keys]
        out = None
        for s in self.segments:
            nb = int(s["manifest"]["n_buckets"])
            buckets = sorted({term_bucket(t, nb) for t in tset})
            df = (
                self.spark.read.parquet(s["manifest"]["tables"]["postings"])
                .filter(F.col("bucket").isin(buckets))  # dir partition pruning
                .filter(F.col("term").isin(tset))  # row-group stats pruning
                .filter(F.concat_ws(FKEY_SEP, "field", "term").isin(fkeys))
                .filter(F.col("block_no") >= 0)
                .withColumn("docbase", F.lit(s["docbase"]))
            )
            out = df if out is None else out.unionByName(df)
        return out

    def _score_blocks(
        self, blocks: DataFrame, clauses: list[Clause], classic: bool = False
    ) -> DataFrame:
        """Decode + score blocks -> rows (docid, clause, score:float32).

        classic=False: BM25 kernel (weight*freq)/(freq + cache[norm]).
        classic=True: TF-IDF kernel f32(f32(sqrt(freq) * value) *
        decodeNorm[norm]) (TFIDFSimScorer.Score:687-692); `weight` then
        carries the normalized IDFStats.Value."""
        by_key: dict[tuple[str, str], list[tuple[int, float]]] = {}
        for c in clauses:
            by_key.setdefault(c.key, []).append((c.clause_id, float(c.weight)))
        caches = self._field_caches
        decodes = self._decode_tables
        tf_params = self.tf_params  # sweetspot BaselineTf; None = sqrt

        def score_batches(it):
            from .codec import decode_block  # executor-side import

            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    docids, tfs = decode_block(
                        r.docids_enc, r.tfs_enc, r.first_docid, r.count
                    )
                    if r.docbase:
                        docids = docids + r.docbase  # leafDocBase shift
                    nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                    freq = tfs.astype(np.float32)
                    if classic:
                        if tf_params is not None:
                            from ..functions.sweetspot import baseline_tf

                            tfv = baseline_tf(freq, *tf_params)
                        else:
                            tfv = np.sqrt(freq)  # f32 sqrt == (float)Math.Sqrt
                        dec = decodes[r.field][nbytes]
                        for clause_id, w in by_key[(r.field, r.term)]:
                            outs.append(
                                pd.DataFrame(
                                    {
                                        "docid": docids,
                                        "clause": clause_id,
                                        "score": (tfv * np.float32(w)) * dec,
                                    }
                                )
                            )
                        continue
                    denom = freq + caches[r.field][nbytes]  # float32, vectorized
                    for clause_id, w in by_key[(r.field, r.term)]:
                        # (weight * freq) / (freq + norm), left-to-right in
                        # float32 exactly like BM25Similarity.cs:263
                        outs.append(
                            pd.DataFrame(
                                {
                                    "docid": docids,
                                    "clause": clause_id,
                                    "score": (np.float32(w) * freq) / denom,
                                }
                            )
                        )
                yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                    {"docid": pd.Series(dtype="int64"), "clause": pd.Series(dtype="int32"), "score": pd.Series(dtype="float32")}
                )

        cols = ["field", "term", "first_docid", "count", "docids_enc", "tfs_enc", "norms_enc", "docbase"]
        return blocks.select(cols).mapInPandas(score_batches, SCORE_ROWS_SCHEMA)

    @property
    def _classic_like(self) -> bool:
        """classic TF-IDF kernel, possibly with SweetSpot's BaselineTf."""
        return self.similarity == "classic" or self.tf_params is not None

    def _classic_tf_expr(self):
        """tf(freq) as a Catalyst expression over the `freq` column:
        sqrt(freq) for DefaultSimilarity (TFIDFSimScorer.Score:687), or
        BaselineTf (SweetSpotSimilarity.cs:172-180) under sweetspot —
        float32 operand steps, the sqrt in double, one cast back."""
        f = F.col("freq").cast("float")
        if self.tf_params is None:
            return F.sqrt(f).cast("float")
        base, mn = self.tf_params
        bb = np.float32(base * base)
        op = (
            (f + F.lit(float(bb)).cast("float")).cast("float")
            - F.lit(float(mn)).cast("float")
        ).cast("float")
        tf = F.sqrt(op.cast("double")).cast("float")
        return F.when(
            f <= F.lit(float(mn)).cast("float"), F.lit(float(base)).cast("float")
        ).otherwise(tf)

    def _docids_of_terms(self, terms: list[str], dedupe: bool = True) -> DataFrame:
        """Matching docids only (for MUST_NOT / constant score) — no scoring.

        dedupe=False skips the distinct shuffle: correct whenever duplicates
        are harmless (semi/anti-join probes) or impossible (a single
        (field, term) key has one row per docid by construction)."""
        if not terms:
            return self.spark.range(0).select(F.col("id").alias("docid"))
        keys = self._as_keys(terms)
        if len(set(keys)) == 1:
            dedupe = False  # single term-salt chain: docids already unique
        return self._decode_docids(self._blocks_for(keys), dedupe=dedupe)

    def _decode_docids(self, blocks: DataFrame, dedupe: bool = True) -> DataFrame:
        """Decode docids (only) from block rows -> docid DF (distinct when
        dedupe, which only matters across multiple terms)."""

        def decode_batches(it):
            from .codec import decode_block

            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    docids, _ = decode_block(r.docids_enc, r.tfs_enc, r.first_docid, r.count)
                    outs.append(pd.DataFrame({"docid": docids + r.docbase}))
                yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                    {"docid": pd.Series(dtype="int64")}
                )

        cols = blocks.select("first_docid", "count", "docids_enc", "tfs_enc", "docbase")
        out = cols.mapInPandas(decode_batches, "docid long")
        return out.distinct() if dedupe else out

    # -- float32 ordered fold (pure Catalyst, whole-stage codegen) --------------
    # Spark FloatType addition is IEEE float32 (verified bit-exact vs numpy),
    # and adding +0.0f is an exact identity on the non-negative BM25 scores,
    # so the Lucene scorer-order sum = pivot per clause + nested float adds.
    @staticmethod
    def _pivot_agg(rows: DataFrame, n_clauses: int) -> DataFrame:
        return rows.groupBy("docid").agg(
            *[
                F.max(F.when(F.col("clause") == i, F.col("score"))).alias(f"s{i}")
                for i in range(n_clauses)
            ]
        )

    @staticmethod
    def _fold_expr(n_clauses: int):
        zero = F.lit(0.0).cast("float")
        acc = F.coalesce(F.col("s0"), zero)
        for i in range(1, n_clauses):
            acc = acc + F.coalesce(F.col(f"s{i}"), zero)  # float32 each step
        return acc.alias("score")

    # -- rewrite -------------------------------------------------------------------
    def _multiterm_cond(self, q: Query):
        """Terms-dict predicate for a MultiTermQuery node, or None."""
        if isinstance(q, PrefixQuery):
            return F.col("term").startswith(q.prefix)
        if isinstance(q, WildcardQuery):
            rx = "^" + "".join(
                ".*" if ch == "*" else "." if ch == "?" else "\\" + ch if ch in ".^$+{}[]()|\\" else ch
                for ch in q.pattern
            ) + "$"
            return F.col("term").rlike(rx)
        if isinstance(q, RegexpQuery):
            # Lucene-automaton grammar, not Java regex: `\d` is a literal
            # 'd', `^`/`$` are literals, `"..."` quotes, `<n-m>` is a
            # numeric interval, and the automaton is anchored
            # (Util/Automaton/RegExp.cs). Whole-term complement `~(...)`
            # and intersection `&` decompose into a boolean condition tree
            # over the terms dict; embedded ones raise loudly.
            from ..functions.regexp import lucene_regexp_to_tree

            def cond(node):
                if isinstance(node, str):
                    return F.col("term").rlike("^(?:" + node + ")$")
                kind = node[0]
                if kind == "not":
                    return ~cond(node[1])
                parts = [cond(t) for t in node[1]]
                out = parts[0]
                for p in parts[1:]:
                    out = (out & p) if kind == "and" else (out | p)
                return out

            return cond(lucene_regexp_to_tree(q.pattern))
        if isinstance(q, TermRangeQuery):
            cond = F.lit(True)
            if q.lower is not None:
                cond = cond & (F.col("term") >= q.lower if q.include_lower else F.col("term") > q.lower)
            if q.upper is not None:
                cond = cond & (F.col("term") <= q.upper if q.include_upper else F.col("term") < q.upper)
            return cond
        return None

    def rewrite(self, q: Query) -> Query:
        """Rewrite fixpoint (IndexSearcher.cs:753-760).

        FuzzyQuery expands to its 50 best terms (boolean constant-score);
        the other MultiTermQuery kinds stay as-is and are evaluated as a
        distributed semi-join against the terms dict in scores() — the
        scale-safe equivalent of Lucene's CONSTANT_SCORE filter rewrite
        (MultiTermQuery.cs:95): no term list ever hits the driver."""
        if isinstance(q, FuzzyQuery):
            # Lucene's FuzzyQuery uses Damerau-Levenshtein automata
            # (transpositions=true, LevenshteinAutomata.cs); matched with a
            # vectorized OSA distance over the length-banded vocab slice.
            ts = (
                self._stat_rows()
                .filter(F.col("field") == FIELD)
                .filter(
                    F.length("term").between(
                        len(q.term) - q.max_edits, len(q.term) + q.max_edits
                    )
                )
                .select("term")
                .distinct()
            )
            cand = (
                _with_dl_edits(ts, q.term)
                .filter(F.col("edits") <= q.max_edits)
                .orderBy("edits", "term")
                .limit(50)  # FuzzyQuery maxExpansions default
            )
            terms = [r["term"] for r in cand.select("term").collect()]
            return ConstantScoreQuery(
                boost=q.boost, query=BooleanQuery(should=tuple(TermQuery(term=t) for t in terms))
            )
        elif isinstance(q, CommonTermsQuery):
            return self._rewrite_common_terms(q)
        elif isinstance(q, NGramPhraseQuery):
            # NGramPhraseQuery.cs Rewrite: slop=0, n>=2, >=3 terms at
            # consecutive positions -> keep every n-th term plus the last
            # (positions preserved); otherwise behave as a plain phrase
            positions = q.offsets
            consecutive = all(
                positions[i - 1] + 1 == positions[i]
                for i in range(1, len(positions))
            )
            if q.slop != 0 or q.n < 2 or len(q.terms) < 3 or not consecutive:
                return PhraseQuery(
                    boost=q.boost, terms=q.terms, positions=q.positions,
                    slop=q.slop, field=q.field,
                )
            last = len(q.terms) - 1
            keep = [
                i for i in range(len(q.terms)) if i % q.n == 0 or i >= last
            ]
            return PhraseQuery(
                boost=q.boost,
                terms=tuple(q.terms[i] for i in keep),
                positions=tuple(positions[i] for i in keep),
                slop=0,
                field=q.field,
            )
        elif isinstance(q, PhraseQuery) and len(q.terms) == 1:
            # 1-term phrase rewrites to TermQuery (PhraseQuery.cs Rewrite)
            return TermQuery(term=q.terms[0], field=q.field, boost=q.boost)
        elif isinstance(q, MultiPhraseQuery):
            # MultiPhraseQuery.cs Rewrite: 1 slot -> BooleanQuery of SHOULD
            # TermQueries; all-singleton slots -> plain PhraseQuery
            if len(q.term_arrays) == 1:
                return BooleanQuery(
                    boost=q.boost,
                    should=tuple(
                        TermQuery(term=t, field=q.field)
                        for t in q.term_arrays[0]
                    ),
                )
            if all(len(a) == 1 for a in q.term_arrays):
                return PhraseQuery(
                    boost=q.boost,
                    terms=tuple(a[0] for a in q.term_arrays),
                    positions=q.positions,
                    slop=q.slop,
                    field=q.field,
                )
            return q
        elif isinstance(q, BooleanQuery):
            return BooleanQuery(
                boost=q.boost,
                must=tuple(self.rewrite(c) for c in q.must),
                should=tuple(self.rewrite(c) for c in q.should),
                must_not=tuple(self.rewrite(c) for c in q.must_not),
                min_should_match=q.min_should_match,
            )
        elif isinstance(q, DisMaxQuery):
            return DisMaxQuery(
                boost=q.boost, tie_breaker=q.tie_breaker,
                queries=tuple(self.rewrite(c) for c in q.queries),
            )
        else:
            return q

    def _rewrite_common_terms(self, q: CommonTermsQuery) -> Query:
        """CommonTermsQuery.Rewrite + BuildQuery (CommonTermsQuery.cs:153-259).

        One doc_freqs job classifies every term; group boosts and the outer
        boost fold multiplicatively into the leaf TermQuery boosts (exact:
        with queryNorm=1 a weight's boost enters the score once, as the
        product of the boosts on the path to the root — BooleanWeight
        Normalize). The rewritten tree is the reference's: an outer
        BooleanQuery with the low-frequency group as MUST and the
        high-frequency group as SHOULD, degenerating to a single group
        (all-high flips its SHOULD clauses to MUST: conjunction of common
        terms to keep the query bounded)."""
        for occ, name in (
            (q.low_freq_occur, "low_freq_occur"),
            (q.high_freq_occur, "high_freq_occur"),
        ):
            if occ not in ("MUST", "SHOULD"):
                raise ValueError(f"{name} should be MUST or SHOULD but was {occ!r}")
        if not q.terms:
            return BooleanQuery()
        if len(q.terms) == 1:
            return TermQuery(term=q.terms[0], field=q.field, boost=q.boost)
        keys = [(q.field, t) for t in q.terms]
        dfs = self.doc_freqs(sorted(set(keys)))
        # (int)Math.Ceiling(maxTermFrequency * (float)maxDoc) — float32 mult
        rel_thr = int(
            math.ceil(float(np.float32(q.max_term_frequency) * np.float32(self.max_doc)))
        )
        low: list[str] = []
        high: list[str] = []
        for t in q.terms:
            df = dfs[(q.field, t)]
            # absent terms (null TermContext) always classify low
            if df > 0 and (
                (q.max_term_frequency >= 1.0 and df > q.max_term_frequency)
                or df > rel_thr
            ):
                high.append(t)
            else:
                low.append(t)

        def _min_nr(f: float, num_optional: int) -> int:
            if f >= 1.0 or f == 0.0:
                return int(f)
            # CommonTermsQuery.cs:189 multiplies in float32 BEFORE Math.Round;
            # 0.7f*5 != 0.7*5 at the round-half-even boundary.
            return int(round(float(np.float32(f) * np.float32(num_optional))))

        def _group(terms, occur, boost, msm_f, force_must=False):
            leaves = tuple(
                TermQuery(term=t, field=q.field, boost=float(np.float32(boost)))
                for t in terms
            )
            if occur == "MUST" or force_must:
                return BooleanQuery(must=leaves)
            return BooleanQuery(should=leaves, min_should_match=_min_nr(msm_f, len(leaves)))

        if not low:
            # all-high: conjunction rewrite unless msm/MUST already bounds it.
            # The reference OVERWRITES the group boost with the outer boost
            # here (highFreq.Boost = Boost — CommonTermsQuery.cs:241), so
            # high_freq_boost does not apply in this branch (same for the
            # all-low branch below).
            msm = _min_nr(q.high_freq_min_should_match, len(high))
            flip = msm == 0 and q.high_freq_occur != "MUST"
            return _group(
                high,
                q.high_freq_occur,
                q.boost,
                q.high_freq_min_should_match,
                force_must=flip,
            )
        if not high:
            return _group(low, q.low_freq_occur, q.boost, q.low_freq_min_should_match)
        low_q = _group(
            low,
            q.low_freq_occur,
            np.float32(q.low_freq_boost) * np.float32(q.boost),
            q.low_freq_min_should_match,
        )
        high_q = _group(
            high,
            q.high_freq_occur,
            np.float32(q.high_freq_boost) * np.float32(q.boost),
            q.high_freq_min_should_match,
        )
        return BooleanQuery(must=(low_q,), should=(high_q,))

    # -- scoring (returns docid/score DF, unordered) --------------------------------
    def scores(self, q: Query, prune_k: int | None = None) -> DataFrame:
        """Evaluate a query -> DataFrame(docid long, score float). Unordered.

        prune_k: if set and the query shape allows (pure disjunction / term),
        applies block-max pruning safe for top-prune_k retrieval.
        Deleted docs are masked out (acceptDocs) after scoring.
        """
        return self._apply_live_docs(self._scores_raw(q, prune_k))

    def _filter_docids(self, f) -> DataFrame:
        """Evaluate a Filter tree to its docid set (Search/Filter.cs
        GetDocIdSet, distributed: every set op is a docid-keyed
        join/union — never a driver-side bitset).

        - TermsFilter: union of the (field, term) postings
          (Lucene.Net.Queries/TermsFilter.cs)
        - FieldValueFilter: docsWithField via the typed docs column
          (Search/FieldValueFilter.cs)
        - QueryWrapperFilter: inner query's matches, scores dropped
          (Search/QueryWrapperFilter.cs)
        - BooleanFilter: OR(shoulds) -> AndNot(nots; from ALL docs when no
          should clause) -> And(musts) (Lucene.Net.Queries/BooleanFilter.cs)
        - ChainedFilter: InitialResult + DoChain fold with per-filter
          OR/AND/ANDNOT/XOR (Lucene.Net.Queries/ChainedFilter.cs)
        """
        from ..plans.query import (
            CHAIN_AND,
            CHAIN_ANDNOT,
            CHAIN_XOR,
            BooleanFilter,
            CachingWrapperFilter,
            ChainedFilter,
            DocTermOrdsRangeFilter,
            FieldCacheRangeFilter,
            FieldCacheTermsFilter,
            FieldValueFilter,
            NumericRangeFilter,
            PrefixFilter,
            QueryWrapperFilter,
            TermsFilter,
            ValueSourceFilter,
        )

        if isinstance(f, ValueSourceFilter):
            # Lucene.Net.Spatial/Util/ValueSourceFilter.cs: docs of the
            # starting filter whose double value source value sits in the
            # INCLUSIVE [min, max] window. The circle arm of
            # PointVectorStrategy: bbox ranges prune first (pushed-down
            # numeric predicates), then the vectorized haversine UDF runs
            # over the survivors only.
            from .spatial import distance_column

            base = self.docs()
            if f.filter is not None:
                base = base.join(
                    self._filter_docids(f.filter), "docid", "left_semi"
                )
            v = distance_column(f.source)
            return base.filter(
                (v >= F.lit(f.min)) & (v <= F.lit(f.max))
            ).select("docid")
        if isinstance(f, TermsFilter):
            return self._docids_of_terms([tuple(p) for p in f.terms])
        if isinstance(f, PrefixFilter):
            # MultiTermQueryWrapperFilter over the prefix enum: terms-dict
            # range pushdown, then decode docids (never a term collect)
            blocks = self.postings().filter(F.col("field") == f.field).filter(
                (F.col("term") >= f.prefix)
                & (F.col("term") < f.prefix + "￿")
            )
            return self._decode_docids(blocks)
        if isinstance(f, (NumericRangeFilter, FieldCacheRangeFilter)):
            col = F.col(f.field)
            cond = F.lit(True)
            if f.lower is not None:
                cond = cond & (
                    (col >= f.lower) if f.include_lower else (col > f.lower)
                )
            if f.upper is not None:
                cond = cond & (
                    (col <= f.upper) if f.include_upper else (col < f.upper)
                )
            return self.docs().filter(cond).select("docid")
        if isinstance(f, FieldCacheTermsFilter):
            return (
                self.docs()
                .filter(F.col(f.field).isin(list(f.terms)))
                .select("docid")
            )
        if isinstance(f, DocTermOrdsRangeFilter):
            blocks = self.postings().filter(F.col("field") == f.field)
            if f.lower is not None:
                blocks = blocks.filter(
                    (F.col("term") >= f.lower)
                    if f.include_lower
                    else (F.col("term") > f.lower)
                )
            if f.upper is not None:
                blocks = blocks.filter(
                    (F.col("term") <= f.upper)
                    if f.include_upper
                    else (F.col("term") < f.upper)
                )
            return self._decode_docids(blocks)
        if isinstance(f, CachingWrapperFilter):
            key = f.filter
            cached = self._filter_cache.get(key)
            if cached is None:
                cached = self._filter_docids(key).cache()
                self._filter_cache[key] = cached
            return cached
        if isinstance(f, FieldValueFilter):
            col = F.col(f.field)
            cond = col.isNull() if f.negate else col.isNotNull()
            return self.docs().filter(cond).select("docid")
        if isinstance(f, QueryWrapperFilter):
            return self._scores_raw(f.query, None).select("docid").distinct()
        if isinstance(f, BooleanFilter):
            res = None
            for c in f.should:
                d = self._filter_docids(c)
                res = d if res is None else res.union(d)
            if res is not None:
                res = res.distinct()
            for c in f.must_not:
                if res is None:  # no SHOULD clauses: start from ALL docs
                    res = self.docs().select("docid")
                res = res.join(
                    self._filter_docids(c), "docid", "left_anti"
                )
            for c in f.must:
                d = self._filter_docids(c)
                res = d if res is None else res.join(d, "docid", "left_semi")
            if res is None:
                return self.spark.range(0).select(F.col("id").alias("docid"))
            return res
        if isinstance(f, ChainedFilter):
            logic = list(f.logic) or [0] * len(f.filters)
            if len(logic) != len(f.filters):
                raise ValueError("Invalid number of elements in logic array")
            i = 0
            if logic[0] == CHAIN_AND:
                res = self._filter_docids(f.filters[0]).distinct()
                i = 1
            elif logic[0] == CHAIN_ANDNOT:
                res = self.docs().select("docid").join(
                    self._filter_docids(f.filters[0]), "docid", "left_anti"
                )
                i = 1
            else:
                res = self.spark.range(0).select(F.col("id").alias("docid"))
            for j in range(i, len(f.filters)):
                d = self._filter_docids(f.filters[j])
                lg = logic[j]
                if lg == CHAIN_AND:
                    res = res.join(d, "docid", "left_semi")
                elif lg == CHAIN_ANDNOT:
                    res = res.join(d, "docid", "left_anti")
                elif lg == CHAIN_XOR:
                    both = res.join(d, "docid", "left_semi")
                    res = (
                        res.union(d).distinct().join(both, "docid", "left_anti")
                    )
                else:  # OR (and the reference's DEFAULT fallthrough)
                    res = res.union(d).distinct()
            return res
        raise TypeError(f"unknown Filter {type(f).__name__}")

    def _scores_raw(self, q: Query, prune_k: int | None = None) -> DataFrame:
        if isinstance(q, FilteredQuery):
            # doc-side predicate: semi-join scores against the filtered docs
            # view — the predicate pushes down to the typed parquet columns
            passing = self.docs().filter(F.expr(q.where)).select("docid")
            if q.filter is not None:
                passing = passing.join(
                    self._filter_docids(q.filter), "docid", "left_semi"
                )
            # prune_k deliberately NOT propagated: block-max pruning bounds the
            # unfiltered top-k; a filter could surface docs below that θ
            return self._scores_raw(q.query, None).join(
                passing, "docid", "left_semi"
            )
        q = self.rewrite(q)
        if isinstance(q, MatchAllQuery):
            return self.docs().select("docid", F.lit(float(np.float32(q.boost))).cast("float").alias("score"))
        cond = self._multiterm_cond(q)
        if cond is not None:
            # CONSTANT_SCORE filter rewrite, distributed. Prefix/range
            # predicates are plain term comparisons, so they evaluate
            # DIRECTLY on the (term-sorted) postings scan and push down to
            # parquet row-group min/max stats — one job, no terms-dict
            # expansion at all. Wildcard/regexp keep the broadcast
            # semi-join against the raw stat rows (regex runs once per
            # vocab row, the block scan then hash-probes; duplicates
            # across salts are harmless under left_semi, no groupBy job).
            blocks = self.postings().filter(F.col("field") == FIELD)
            if isinstance(q, PrefixQuery):
                blocks = blocks.filter(
                    (F.col("term") >= q.prefix) & (F.col("term") < q.prefix + "￿")
                )
            elif isinstance(q, TermRangeQuery):
                blocks = blocks.filter(cond)
            else:
                matching = F.broadcast(
                    self._stat_rows()
                    .filter(F.col("field") == FIELD)
                    .filter(cond)
                    .select("term")
                )
                blocks = blocks.join(matching, "term", "left_semi")
            docids = self._decode_docids(blocks)
            return docids.select(
                "docid", F.lit(float(np.float32(q.boost))).cast("float").alias("score")
            )
        if isinstance(q, ConstantScoreQuery):
            # ConstantScoreQuery.cs: matches exactly the docs the wrapped
            # query (or filter) matches, score = boost. Docid-union of the
            # inner terms is only that set for a pure term disjunction (the
            # FuzzyQuery rewrite shape) — anything else evaluates the inner
            # query and keeps its docids.
            inner = q.query
            const = F.lit(float(np.float32(q.boost))).cast("float").alias("score")
            if q.filter is not None:
                return self._filter_docids(q.filter).select("docid", const)
            pure_should = isinstance(inner, TermQuery) or (
                isinstance(inner, BooleanQuery)
                and not inner.must
                and not inner.must_not
                and inner.min_should_match <= 1
                and all(isinstance(c, TermQuery) for c in inner.should)
            )
            if pure_should:
                terms = _collect_terms(inner)
                docids = self._docids_of_terms(terms)
                return docids.select("docid", const)
            return self._scores_raw(inner, None).select("docid", const)
        if isinstance(q, PayloadTermQuery):
            # scored under EVERY similarity: the span kernel routes through
            # the active SimScorer exactly like phrases (_phrase_finalize)
            return self._payload_term_scores(q)
        if isinstance(q, TermQuery):
            q = BooleanQuery(should=(q,))
        if self.similarity != "bm25":
            if isinstance(q, BooleanQuery):
                pure_terms = all(
                    isinstance(c, TermQuery)
                    for c in q.must + q.should + q.must_not
                )
                if self._classic_like:
                    return self._classic_boolean_scores(q)
                if pure_terms:
                    if self.sim_spec is not None:
                        return self._dfr_boolean_scores(q)
                    return self._lmd_boolean_scores(q)
                # SimilarityBase members have queryNorm = 1 and coord = 1
                # (SimilarityBase.cs Coord/QueryNorm), so a boolean with
                # phrase/span-shaped clauses composes by the plain f32
                # clause-order fold — the generic nested path is exact.
                # Push the outer boost into the clauses first (each
                # clause's kernel multiplies its own f32 boost).
                if float(q.boost) != 1.0:
                    import dataclasses

                    b = np.float32(q.boost)
                    q = BooleanQuery(
                        must=tuple(
                            dataclasses.replace(
                                c, boost=float(np.float32(np.float32(c.boost) * b))
                            )
                            for c in q.must
                        ),
                        should=tuple(
                            dataclasses.replace(
                                c, boost=float(np.float32(np.float32(c.boost) * b))
                            )
                            for c in q.should
                        ),
                        must_not=q.must_not,
                        min_should_match=q.min_should_match,
                    )
                return self._boolean_scores_nested(q)
            if isinstance(q, (PhraseQuery, MultiPhraseQuery)):
                # every Similarity scores every Scorer in the reference
                # (SimilarityBase.cs Score(stats, freq, docLen);
                # TestSimilarityBase exercises PhraseQuery under all sims):
                # the phrase machinery computes (docid, phraseFreq, norm)
                # and _phrase_finalize applies the active kernel
                return self._phrase_scores(q)
            if isinstance(q, DisMaxQuery):
                if self._classic_like:
                    return self._classic_dismax_scores(q)
                return self._dismax_scores_nested(q)
            raise NotImplementedError(
                f"{self.similarity} similarity supports term/boolean/phrase/"
                f"dismax queries (got {type(q).__name__})"
            )
        if isinstance(q, (PhraseQuery, MultiPhraseQuery)):
            return self._phrase_scores(q)
        if isinstance(q, DisMaxQuery):
            return self._dismax_scores(q)
        if isinstance(q, BooleanQuery):
            return self._boolean_scores(q, prune_k)
        # SpanQuery as a scores() citizen: a span clause inside a boolean
        # (the reference's SpanQuery IS-A Query) routes through the span
        # machinery, which already honors the active similarity
        from . import spans as _spans

        if isinstance(
            q,
            (
                _spans.SpanTermQuery,
                _spans.SpanOrQuery,
                _spans.SpanNearQuery,
                _spans.SpanFirstQuery,
                _spans.SpanNotQuery,
                _spans.SpanMultiTermQueryWrapper,
            ),
        ):
            return _spans.span_scores(self, q)
        raise TypeError(f"unsupported query node {type(q).__name__}")

    def _term_clauses(self, qs: tuple[Query, ...], start_id: int) -> list[Clause]:
        out = []
        for i, sub in enumerate(qs):
            if not isinstance(sub, TermQuery):
                raise TypeError("v1 scores nested non-term clauses via scores() recursion")
            out.append(
                Clause(
                    start_id + i,
                    sub.term,
                    self.weight(sub.term, sub.boost, sub.field),
                    field=sub.field,
                )
            )
        return out

    def _empty_hits(self) -> DataFrame:
        return self.spark.range(0).select(
            F.col("id").alias("docid"), F.lit(0.0).cast("float").alias("score")
        )

    def _boolean_scores(self, q: BooleanQuery, prune_k: int | None) -> DataFrame:
        if not q.must and not q.should:
            # clause-less query (e.g. all terms were stopwords) matches nothing
            return self._empty_hits()
        n_must = len(q.must)
        simple = all(isinstance(c, TermQuery) for c in q.must + q.should)
        if not simple:
            return self._boolean_scores_nested(q)
        must_c = self._term_clauses(q.must, 0)
        should_c = self._term_clauses(q.should, n_must)
        clauses = must_c + should_c
        live = [c for c in clauses if float(c.weight) > 0.0 or c.clause_id < n_must]
        # a MUST term with df=0 means zero hits
        if any(float(c.weight) == 0.0 and self._df_of(c) == 0 for c in must_c):
            return self.spark.range(0).select(
                F.col("id").alias("docid"), F.lit(0.0).cast("float").alias("score")
            )
        not_terms = []
        for c in q.must_not:
            if isinstance(c, TermQuery):
                not_terms.append((c.field, c.term))
            else:
                raise TypeError("v1 supports term clauses under MUST_NOT")

        blocks = self._blocks_for([c.key for c in live])
        if n_must:
            # leapfrog analogue: restrict every clause's blocks to the
            # rarest MUST clause's docid ranges before decode
            blocks = self._conjunction_prune(blocks, [c.key for c in must_c])
        # adaptive block-max pruning: only worth its 2 extra (tiny) jobs when
        # the candidate posting volume is large; below the threshold a single
        # scan-and-score pass is strictly faster. Rank-safe either way.
        total_df = sum(self._df_of(c) for c in live)
        can_prune = (
            prune_k is not None
            and self._prunable
            and n_must == 0
            and not not_terms
            and q.min_should_match <= 1
            and len(live) > 0
            and total_df >= self.wand_min_postings
            # deletes inflate probe θ (a high-scoring deleted doc is masked
            # only after scoring) — pruning with a delete log could drop
            # blocks holding live true top-k hits
            and self._deleted_docids() is None
        )
        if can_prune:
            blocks, _ = self._prune_blocks(blocks, live, prune_k)

        rows = self._score_blocks(blocks, live)
        msm = q.min_should_match
        need_should = msm if n_must else max(1, msm) if q.should else 0

        # single-clause fast path: no clause combination -> no groupBy shuffle;
        # rows are already (docid, score). TermScorer's direct path. Only valid
        # when the minShouldMatch constraint is satisfiable by the live clauses
        # (a lone MUST clause with need_should>=1 and every SHOULD term df=0
        # must return empty, which the pivot path gets right).
        n_live_should = sum(1 for c in live if c.clause_id >= n_must)
        if (
            len(live) == 1
            and n_must <= 1
            and not not_terms
            and (need_should == 0 or n_live_should >= need_should)
            and need_should <= 1
        ):
            return rows.select("docid", "score")

        n_total = len(clauses)
        agg = self._pivot_agg(rows, n_total)
        cond = F.lit(True)
        for i in range(n_must):
            cond = cond & F.col(f"s{i}").isNotNull()
        if need_should:
            matched = None
            for j in range(n_must, n_total):
                c = F.when(F.col(f"s{j}").isNotNull(), 1).otherwise(0)
                matched = c if matched is None else matched + c
            cond = cond & (matched >= need_should)
        scored = agg.filter(cond).select("docid", self._fold_expr(n_total))
        if not_terms:
            scored = self._must_not_mask(scored, not_terms)
        return scored

    def _classic_boolean_scores(self, q: BooleanQuery) -> DataFrame:
        """BooleanQuery under DefaultSimilarity (TF-IDF), float32-exact.

        Per clause: queryWeight = f32(idf * boost); query-level
        sumOfSquaredWeights = f32 fold of qw^2 over non-prohibited clauses
        (incl. df=0 ones) * f32(boost^2) (BooleanWeight); queryNorm =
        (float)(1/sqrt(sum)); value = f32(f32(qw*qnorm)*idf)
        (IDFStats.Normalize). Doc score = f32 clause-order sum of kernel
        scores * coord(overlap, maxOverlap) where maxOverlap counts ALL
        non-prohibited clauses (BooleanWeight maxCoord)."""
        from ..oracle import classic_idf

        if not q.must and not q.should:
            return self._empty_hits()
        ok_types = (TermQuery, PhraseQuery, MultiPhraseQuery)
        if not all(isinstance(c, ok_types) for c in q.must_not):
            raise NotImplementedError(
                "classic MUST_NOT supports term/phrase clauses"
            )
        if not all(isinstance(c, ok_types) for c in q.must + q.should):
            raise NotImplementedError(
                "classic similarity scores term/phrase clauses"
            )
        clauses_q = list(q.must) + list(q.should)
        n_must = len(q.must)

        def _clause_flat(c):
            """(field, term) pairs in declaration order (phrase: all
            (slot, term) pairs — TFIDFSimilarity.IdfExplain allTermStats)."""
            if isinstance(c, TermQuery):
                return [(c.field, c.term)]
            if isinstance(c, PhraseQuery):
                return [(c.field, t) for t in c.terms]
            return [(c.field, t) for arr in c.term_arrays for t in arr]

        all_keys = sorted({k for c in clauses_q for k in _clause_flat(c)})
        dfs = self.doc_freqs(all_keys)

        def _clause_matchable(c):
            if isinstance(c, TermQuery):
                return dfs[(c.field, c.term)] > 0
            if isinstance(c, PhraseQuery):
                return all(dfs[(c.field, t)] > 0 for t in c.terms)
            return all(
                any(dfs[(c.field, t)] > 0 for t in arr) for arr in c.term_arrays
            )

        if any(not _clause_matchable(c) for c in clauses_q[:n_must]):
            return self._empty_hits()
        # per-clause idf: f32 fold over the clause's term stats
        idfs = []
        for c in clauses_q:
            acc = np.float32(0.0)
            for k in _clause_flat(c):
                acc = np.float32(acc + classic_idf(dfs[k], self.max_doc))
            idfs.append(acc)
        qws = [
            np.float32(i * np.float32(c.boost)) for i, c in zip(idfs, clauses_q)
        ]
        ssq = np.float32(0.0)
        for qw in qws:
            ssq = np.float32(ssq + np.float32(qw * qw))
        ssq = np.float32(ssq * np.float32(np.float32(q.boost) * np.float32(q.boost)))
        qnorm = (
            np.float32(np.float64(1.0) / np.sqrt(np.float64(ssq)))
            if ssq > 0
            else np.float32(1.0)
        )
        values = [np.float32(np.float32(qw * qnorm) * i) for qw, i in zip(qws, idfs)]
        term_ids = [
            i for i, c in enumerate(clauses_q) if isinstance(c, TermQuery)
        ]
        phrase_ids = [
            i for i, c in enumerate(clauses_q) if not isinstance(c, TermQuery)
        ]
        clauses = [
            Clause(i, clauses_q[i].term, values[i], field=clauses_q[i].field)
            for i in term_ids
        ]
        live = [c for c in clauses if dfs[c.key] > 0]
        rows = None
        if live:
            blocks = self._blocks_for([c.key for c in live])
            must_term_keys = [
                (clauses_q[i].field, clauses_q[i].term)
                for i in term_ids
                if i < n_must
            ]
            if must_term_keys and len(must_term_keys) == n_must:
                blocks = self._conjunction_prune(blocks, must_term_keys)
            rows = self._score_blocks(blocks, live, classic=True)
        # phrase clauses: freq stream + the TFIDF kernel with the SHARED
        # queryNorm-folded value (sqrt(freq) * value * byte315Decode)
        from ..functions.smallfloat import DECODE_TABLE

        for i in phrase_ids:
            c = clauses_q[i]
            if not _clause_matchable(c):
                continue
            pf, _flat = self._phrase_scores(c, return_freqs=True)
            raw = (
                self._classic_tf_expr()
                * F.lit(float(values[i])).cast("float")
            ).cast("float")
            omit = c.field in {
                f
                for f, info in self.fields_info.items()
                if info.get("omit_norms")
            }
            if omit:
                sc = raw
            else:
                dec = F.array(
                    *[F.lit(float(x)).cast("float") for x in DECODE_TABLE]
                )
                sc = (raw * F.element_at(dec, F.col("nb").cast("int") + 1)).cast(
                    "float"
                )
            prow = pf.select(
                "docid", F.lit(i).cast("int").alias("clause"), sc.alias("score")
            )
            rows = prow if rows is None else rows.unionByName(prow)
        if rows is None:
            return self._empty_hits()
        n_total = len(clauses_q)
        agg = self._pivot_agg(rows, n_total)
        cond = F.lit(True)
        for i in range(n_must):
            cond = cond & F.col(f"s{i}").isNotNull()
        msm = q.min_should_match
        need_should = msm if n_must else max(1, msm) if q.should else 0
        matched_should = None
        overlap = None
        for j in range(n_total):
            c = F.when(F.col(f"s{j}").isNotNull(), 1).otherwise(0)
            overlap = c if overlap is None else overlap + c
            if j >= n_must:
                matched_should = c if matched_should is None else matched_should + c
        if need_should:
            cond = cond & (matched_should >= need_should)
        zero = F.lit(0.0).cast("float")
        acc = F.coalesce(F.col("s0"), zero)
        for i in range(1, n_total):
            acc = acc + F.coalesce(F.col(f"s{i}"), zero)
        coord = overlap.cast("float") / F.lit(float(np.float32(n_total))).cast("float")
        scored = agg.filter(cond).select(
            "docid", (acc * coord.cast("float")).cast("float").alias("score")
        )
        not_keys = [
            (c.field, c.term) for c in q.must_not if isinstance(c, TermQuery)
        ]
        if not_keys:
            scored = self._must_not_mask(scored, not_keys)
        for c in q.must_not:
            if not isinstance(c, TermQuery):
                pf, _fl = self._phrase_scores(c, return_freqs=True)
                scored = scored.join(
                    pf.select("docid"), "docid", "left_anti"
                )
        return scored

    def _lmd_boolean_scores(self, q: BooleanQuery) -> DataFrame:
        """BooleanQuery under LM smoothing (Dirichlet or Jelinek-Mercer),
        float32-exact.

        Shared (LMSimilarity DefaultCollectionModel:158-161):
          cp = f32(f32(ttf) + 1) / f32(f32(sumTotalTermFreq) + 1);
          docLen = 1/(byte315Decode)^2 = NORM_TABLE
          (SimilarityBase.cs:227-238,259-262,307); omitNorms fields use
          docLen = 1; queryNorm = coord = 1 -> plain f32 clause-order sum.
        Dirichlet (LMDirichletSimilarity.cs:74-78):
          score = f32(boost) * f32( ln(f32(1 + f32(freq / f32(mu*cp))))
                                  + ln(f32(mu / f32(docLen + mu))) ),
          clamped at 0.
        Jelinek-Mercer (LMJelinekMercerSimilarity.cs:57-60):
          score = f32(boost) * f32(ln(f32(1 +
                  f32(f32(f32((1-λ)*freq) / docLen) / f32(λ*cp)))))."""
        from ..functions.smallfloat import NORM_TABLE

        if not q.must and not q.should:
            return self._empty_hits()
        if not all(isinstance(c, TermQuery) for c in q.must + q.should + q.must_not):
            raise NotImplementedError("lmd similarity scores term clauses")
        terms = list(q.must) + list(q.should)
        n_must = len(q.must)
        keys = [(c.field, c.term) for c in terms]
        metas = self.term_meta(keys)
        if any(metas[k][0] == 0 for k in keys[:n_must]):
            return self._empty_hits()
        mu = np.float32(self.mu)
        smooth = np.float32(self.lam) if self.similarity == "lmjm" else mu
        field_tokens = {
            f: int(info.get("sum_ttf", 0)) for f, info in self.fields_info.items()
        }
        params = []  # per clause: (boost32, f32(smooth * cp), field)
        for c, k in zip(terms, keys):
            cp = np.float32(
                (np.float32(metas[k][1]) + np.float32(1.0))
                / (np.float32(field_tokens.get(c.field, 0)) + np.float32(1.0))
            )
            params.append(
                (np.float32(np.float32(c.boost) * np.float32(q.boost)),
                 np.float32(smooth * cp), c.field)
            )
        live = [i for i, k in enumerate(keys) if metas[k][0] > 0]
        by_key: dict[tuple[str, str], list[tuple[int, float, float]]] = {}
        for i in live:
            by_key.setdefault(keys[i], []).append(
                (i, float(params[i][0]), float(params[i][1]))
            )
        blocks = self._blocks_for([keys[i] for i in live])
        if n_must:
            blocks = self._conjunction_prune(blocks, keys[:n_must])
        omit = {f for f, info in self.fields_info.items() if info.get("omit_norms")}
        mu_f = float(self.mu)
        jm = self.similarity == "lmjm"
        oml = np.float32(np.float32(1.0) - np.float32(self.lam))

        def score_batches(it):
            from .codec import decode_block

            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    docids, tfs = decode_block(
                        r.docids_enc, r.tfs_enc, r.first_docid, r.count
                    )
                    if r.docbase:
                        docids = docids + r.docbase
                    nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                    freq = tfs.astype(np.float32)
                    dl = (
                        np.ones(len(freq), dtype=np.float32)
                        if r.field in omit
                        else NORM_TABLE[nbytes]
                    )
                    if not jm:
                        l2 = np.log(
                            (np.float32(mu_f) / (dl + np.float32(mu_f))).astype(
                                np.float64
                            )
                        )
                    for cid, boost, scp in by_key[(r.field, r.term)]:
                        if jm:
                            # ((1-λ)*freq / docLen) / (λ*cp), left-to-right f32
                            inner = np.float32(1.0) + ((oml * freq) / dl) / np.float32(scp)
                            sc = np.float32(boost) * np.log(
                                inner.astype(np.float64)
                            ).astype(np.float32)
                        else:
                            inner1 = np.float32(1.0) + freq / np.float32(scp)
                            sc = (
                                np.float32(boost)
                                * (np.log(inner1.astype(np.float64)) + l2).astype(
                                    np.float32
                                )
                            )
                            np.maximum(sc, np.float32(0.0), out=sc)
                        outs.append(
                            pd.DataFrame(
                                {"docid": docids, "clause": cid, "score": sc}
                            )
                        )
                yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                    {
                        "docid": pd.Series(dtype="int64"),
                        "clause": pd.Series(dtype="int32"),
                        "score": pd.Series(dtype="float32"),
                    }
                )

        cols = [
            "field", "term", "first_docid", "count", "docids_enc", "tfs_enc",
            "norms_enc", "docbase",
        ]
        rows = blocks.select(cols).mapInPandas(score_batches, SCORE_ROWS_SCHEMA)
        n_total = len(terms)
        agg = self._pivot_agg(rows, n_total)
        cond = F.lit(True)
        for i in range(n_must):
            cond = cond & F.col(f"s{i}").isNotNull()
        msm = q.min_should_match
        need_should = msm if n_must else max(1, msm) if q.should else 0
        if need_should:
            matched = None
            for j in range(n_must, n_total):
                c = F.when(F.col(f"s{j}").isNotNull(), 1).otherwise(0)
                matched = c if matched is None else matched + c
            cond = cond & (matched >= need_should)
        scored = agg.filter(cond).select("docid", self._fold_expr(n_total))
        not_keys = [(c.field, c.term) for c in q.must_not]
        if not_keys:
            scored = self._must_not_mask(scored, not_keys)
        return scored

    def _dfr_boolean_scores(self, q: BooleanQuery) -> DataFrame:
        """BooleanQuery under any SimilarityBase matrix member (DFR basic
        model x after-effect x normalization, or IB distribution x lambda x
        normalization) — see operators/simbase.py for the cited float32-exact
        component kernels (SimilarityBase.cs:117-139, DFRSimilarity.cs:121-125,
        IBSimilarity.cs:90-93). docLen comes from the byte315^-2 table
        (1 for omitNorms fields); per-clause stats are driver-side scalars,
        so each decoded block scores in a few numpy SIMD passes."""
        from ..functions.smallfloat import NORM_TABLE
        from . import simbase

        if not q.must and not q.should:
            return self._empty_hits()
        if not all(isinstance(c, TermQuery) for c in q.must + q.should + q.must_not):
            raise NotImplementedError("dfr/ib similarity scores term clauses")
        terms = list(q.must) + list(q.should)
        n_must = len(q.must)
        keys = [(c.field, c.term) for c in terms]
        metas = self.term_meta(keys)
        if any(metas[k][0] == 0 for k in keys[:n_must]):
            return self._empty_hits()
        field_tokens = {
            f: int(info.get("sum_ttf", 0)) for f, info in self.fields_info.items()
        }
        by_key: dict[tuple[str, str], list[tuple]] = {}
        for i, (c, k) in enumerate(zip(terms, keys)):
            df_, ttf, _b = metas[k]
            if df_ == 0:
                continue
            st = simbase.make_stats(
                self.max_doc, df_, ttf, field_tokens.get(c.field, 0)
            )
            boost = np.float32(np.float32(c.boost) * np.float32(q.boost))
            by_key.setdefault(k, []).append((i, float(boost), st))
        if not by_key:
            return self._empty_hits()
        blocks = self._blocks_for(list(by_key))
        if n_must:
            blocks = self._conjunction_prune(blocks, keys[:n_must])
        omit = {f for f, info in self.fields_info.items() if info.get("omit_norms")}
        spec = self.sim_spec

        def score_batches(it):
            from .codec import decode_block

            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    docids, tfs = decode_block(
                        r.docids_enc, r.tfs_enc, r.first_docid, r.count
                    )
                    if r.docbase:
                        docids = docids + r.docbase
                    nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                    freq = tfs.astype(np.float32)
                    dl = (
                        np.ones(len(freq), dtype=np.float32)
                        if r.field in omit
                        else NORM_TABLE[nbytes]
                    )
                    for cid, boost, st in by_key[(r.field, r.term)]:
                        sc = simbase.block_scores(spec, st, boost, freq, dl)
                        outs.append(
                            pd.DataFrame(
                                {"docid": docids, "clause": cid, "score": sc}
                            )
                        )
                yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                    {
                        "docid": pd.Series(dtype="int64"),
                        "clause": pd.Series(dtype="int32"),
                        "score": pd.Series(dtype="float32"),
                    }
                )

        cols = [
            "field", "term", "first_docid", "count", "docids_enc", "tfs_enc",
            "norms_enc", "docbase",
        ]
        rows = blocks.select(cols).mapInPandas(score_batches, SCORE_ROWS_SCHEMA)
        n_total = len(terms)
        agg = self._pivot_agg(rows, n_total)
        cond = F.lit(True)
        for i in range(n_must):
            cond = cond & F.col(f"s{i}").isNotNull()
        msm = q.min_should_match
        need_should = msm if n_must else max(1, msm) if q.should else 0
        if need_should:
            matched = None
            for j in range(n_must, n_total):
                c = F.when(F.col(f"s{j}").isNotNull(), 1).otherwise(0)
                matched = c if matched is None else matched + c
            cond = cond & (matched >= need_should)
        scored = agg.filter(cond).select("docid", self._fold_expr(n_total))
        not_keys = [(c.field, c.term) for c in q.must_not]
        if not_keys:
            scored = self._must_not_mask(scored, not_keys)
        return scored

    def _boolean_scores_nested(self, q: BooleanQuery) -> DataFrame:
        """General path: recursively score sub-queries, combine relationally.

        Mirrors BooleanScorer2's composition of req/opt/prohibited scorers
        (Search/BooleanScorer2.cs) with joins + an ordered float32 fold."""
        if not q.must and not q.should:
            return self._empty_hits()
        parts = []
        for i, sub in enumerate(q.must):
            parts.append((i, True, self.scores(sub)))
        for j, sub in enumerate(q.should):
            parts.append((len(q.must) + j, False, self.scores(sub)))
        union = None
        for cid, _req, df in parts:
            tagged = df.select("docid", F.lit(cid).alias("clause"), "score")
            union = tagged if union is None else union.unionByName(tagged)
        n_must = len(q.must)
        n_total = len(parts)
        need_should = q.min_should_match if n_must else max(1, q.min_should_match) if q.should else 0
        agg = self._pivot_agg(union, n_total)
        cond = F.lit(True)
        for i in range(n_must):
            cond = cond & F.col(f"s{i}").isNotNull()
        if need_should:
            matched = None
            for j in range(n_must, n_total):
                c = F.when(F.col(f"s{j}").isNotNull(), 1).otherwise(0)
                matched = c if matched is None else matched + c
            cond = cond & (matched >= need_should)
        scored = agg.filter(cond).select("docid", self._fold_expr(n_total))
        for sub in q.must_not:
            scored = scored.join(self.scores(sub).select("docid"), "docid", "left_anti")
        return scored

    # -- conjunction skipping (Advance analogue) -------------------------------
    def _conjunction_prune(
        self,
        blocks: DataFrame,
        required_keys: list[tuple[str, str]],
        max_rare_df: int = 1 << 17,
        max_ranges: int = 4096,
        selectivity: int = 4,
    ) -> DataFrame:
        """Skip-list Advance analogue for conjunctions: every result doc
        must appear in EVERY required clause, so only blocks that can hold
        a docid of the RAREST required clause can contribute — prune the
        rest before decode (ConjunctionScorer.cs:49-66 cost ordering; skip
        read Lucene41PostingsReader.cs:474-534).

        Two regimes, both broadcast semi-joins over block *metadata*:
        - rare df <= max_rare_df: DECODE the rare list (cheap) and keep
          only blocks whose [first_docid, last_docid] CONTAINS one of its
          docids — exact leapfrog granularity, works even when the rare
          docids are uniformly spread (where whole-list ranges are vacuous).
        - larger rare lists: interval-overlap against the rare clause's
          block ranges (helps when its docids cluster).
        Decoded-block count becomes ∝ rare df, not hot df. Rank/score-safe:
        only blocks that cannot hold a match are dropped."""
        metas = self.term_meta(required_keys)
        keys = list(set(required_keys))
        rare = min(keys, key=lambda k: metas[k][0])
        df_rare = metas[rare][0]
        if df_rare == 0:
            return blocks  # conjunction is empty anyway
        total_other = sum(metas[k][0] for k in keys if k != rare)
        # adaptive like block-max pruning: the extra planning jobs only pay
        # for themselves once the avoided decode volume is substantial
        if total_other < max(df_rare * selectivity, self.prune_min_postings):
            return blocks
        fkey = F.concat_ws(FKEY_SEP, "field", "term")
        rkey = rare[0] + FKEY_SEP + rare[1]
        rare_blocks = blocks.filter(fkey == rkey)
        others = blocks.filter(fkey != rkey)
        glo = F.col("first_docid") + F.col("docbase")
        ghi = F.col("last_docid") + F.col("docbase")
        if df_rare <= max_rare_df:
            # dedupe=False: one (field, term) -> docids unique by
            # construction; skipping distinct makes planning a 1-stage job
            ids = F.broadcast(
                self._decode_docids(self._blocks_for([rare]), dedupe=False)
            )
            pruned = others.join(
                ids, (glo <= F.col("docid")) & (ghi >= F.col("docid")), "left_semi"
            )
            return rare_blocks.unionByName(pruned)
        if df_rare // BLOCK_SIZE + 1 > max_ranges:
            return blocks
        ranges = F.broadcast(
            self._blocks_for([rare]).select(
                (F.col("first_docid") + F.col("docbase")).alias("lo"),
                (F.col("last_docid") + F.col("docbase")).alias("hi"),
            )
        )
        pruned = others.join(
            ranges, (glo <= F.col("hi")) & (ghi >= F.col("lo")), "left_semi"
        )
        return rare_blocks.unionByName(pruned)

    # -- phrase scoring --------------------------------------------------------
    def _phrase_scores(self, q, return_freqs: bool = False):
        """Phrase / MultiPhrase scorer, relational-first.

        Exact (slop=0): decode (docid, clause, pos - queryOffset) rows for
        the phrase terms' blocks (conjunction-pruned to the rarest
        single-term slot's docid ranges), then alignment = groupBy(docid,
        basePos) having all clauses, phraseFreq = alignments per doc
        (ExactPhraseScorer.cs). Sloppy (slop>0): candidate docs containing
        every clause gather their adjusted position lists and run the
        SloppyPhraseScorer merge per doc (few docs survive the conjunction;
        the loop is per-doc, not per-row of the corpus). MultiPhraseQuery
        (Search/MultiPhraseQuery.cs): a slot with several alternative terms
        maps them all to the same clause id — exactly
        UnionDocsAndPositionsEnum's position union. Scoring: weight = f32
        fold of idf over every (slot, term) pair in declaration order
        (MultiPhraseWeight allTermStats), through the term weight chain;
        score = w*freq/(freq + norm_cache[norm_byte]) — same float32
        operation order as TermScorer."""
        if isinstance(q, PhraseQuery):
            arrays = tuple((t,) for t in q.terms)
        else:
            arrays = tuple(tuple(a) for a in q.term_arrays)
        offsets = list(q.offsets)

        def _empty(reason=None):
            if return_freqs:
                pf0 = self.spark.range(0).select(
                    F.col("id").alias("docid"),
                    F.lit(0.0).cast("float").alias("freq"),
                    F.lit(0).cast("short").alias("nb"),
                )
                return pf0, []
            return self._empty_hits()

        if not arrays:
            return _empty()
        if any(
            s["manifest"].get("index_options") == "docs_freqs"
            for s in self.segments
        ):
            raise NotImplementedError(
                "phrase queries need positions; this index was built with "
                "index_options='docs_freqs'"
            )
        flat = [(slot, t) for slot, arr in enumerate(arrays) for t in arr]
        keys = [(q.field, t) for _slot, t in flat]
        dfs = self.doc_freqs(set(keys))
        # a slot with no present alternative can never match
        # (MultiPhraseQuery.cs:268-272 returns a null scorer)
        for arr in arrays:
            if all(dfs[(q.field, t)] == 0 for t in arr):
                return _empty()
        # idf fold over ALL (slot, term) pairs in declaration order,
        # absent terms included with df=0 stats (allTermStats)
        s = np.float32(0.0)
        for _slot, t in flat:
            s = np.float32(s + idf_f32(dfs[(q.field, t)], self.max_doc))
        w = np.float32(
            np.float32(s * np.float32(q.boost))
            * np.float32(np.float32(self.k1) + np.float32(1.0))
        )
        emit_freq = return_freqs or self.similarity != "bm25"
        live_keys = sorted({k for k in keys if dfs[k] > 0})
        blocks = self._blocks_for(live_keys)
        single_keys = [
            (q.field, arr[0])
            for arr in arrays
            if len(arr) == 1 and dfs[(q.field, arr[0])] > 0
        ]
        if single_keys:
            blocks = self._conjunction_prune(blocks, single_keys)
        by_term: dict[str, list[tuple[int, int]]] = {}
        for slot, t in flat:
            if dfs[(q.field, t)] > 0:
                by_term.setdefault(t, []).append((slot, offsets[slot]))

        # hot x hot: when no rare single-term slot bounds the candidate set,
        # the per-position-row shuffle below is O(total positions of all
        # matching terms). Switch to the bulk-scorer shape (VERDICT r02
        # #2): docid-range-sliced BINARY position sub-arrays (O(blocks)
        # shuffle rows), evaluated per range in mapInPandas — Lucene
        # streams positions docid-at-a-time under the conjunction; this is
        # the partition-granular analogue. The rule mirrors
        # _conjunction_prune's own pay-off condition: gather ONLY when the
        # rare-slot prune actually bounds it.
        mode = getattr(self, "phrase_mode", "auto")
        rare_df = min((dfs[k] for k in single_keys), default=None)
        total_df = sum(dfs[k] for k in set(keys))
        prune_bounds = rare_df is not None and (
            total_df - rare_df
        ) >= max(rare_df * 4, self.prune_min_postings)
        use_bulk = len(arrays) <= 63 and (
            mode == "bulk" or (mode == "auto" and not prune_bounds)
        )
        if use_bulk:
            out = self._phrase_scores_bulk(
                blocks, by_term, len(arrays), int(q.slop), q.field, w,
                emit_freq=emit_freq,
            )
            if return_freqs:
                return out, flat
            if emit_freq:
                out = self._phrase_finalize(out, flat, q.field, q.boost)
            return out

        def expand(it):
            from .codec import decode_block, decode_positions

            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    docids, tfs = decode_block(
                        r.docids_enc, r.tfs_enc, r.first_docid, r.count
                    )
                    if r.docbase:
                        docids = docids + r.docbase
                    nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                    poss = decode_positions(r.pos_enc, int(tfs.sum()))
                    drep = np.repeat(docids, tfs)
                    nrep = np.repeat(nbytes, tfs).astype(np.int16)
                    for cid, off in by_term[r.term]:
                        outs.append(
                            pd.DataFrame(
                                {
                                    "docid": drep,
                                    "clause": np.int32(cid),
                                    "bpos": poss - off,
                                    "norm_byte": nrep,
                                }
                            )
                        )
                yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                    {
                        "docid": pd.Series(dtype="int64"),
                        "clause": pd.Series(dtype="int32"),
                        "bpos": pd.Series(dtype="int64"),
                        "norm_byte": pd.Series(dtype="int16"),
                    }
                )

        rows = blocks.select(
            "term", "first_docid", "count", "docids_enc", "tfs_enc",
            "norms_enc", "pos_enc", "docbase",
        ).mapInPandas(expand, "docid long, clause int, bpos long, norm_byte short")

        n = len(arrays)
        cache = self._field_caches[q.field]
        nc_arr = F.array(*[F.lit(float(c)).cast("float") for c in cache])
        w_lit = F.lit(float(w)).cast("float")
        if q.slop == 0:
            aligned = (
                rows.groupBy("docid", "bpos")
                .agg(
                    F.countDistinct("clause").alias("nc"),
                    F.max("norm_byte").alias("nb"),
                )
                .filter(F.col("nc") == n)
            )
            pf = aligned.groupBy("docid").agg(
                F.count("*").cast("float").alias("freq"), F.max("nb").alias("nb")
            )
        else:
            present = (
                rows.groupBy("docid")
                .agg(
                    F.countDistinct("clause").alias("ncl"),
                    F.max("norm_byte").alias("nb"),
                    F.collect_list(F.struct("clause", "bpos")).alias("ps"),
                )
                .filter(F.col("ncl") == n)
            )
            slop = int(q.slop)

            def sloppy(it):
                from ..oracle import sloppy_phrase_freq

                for pdf in it:
                    out_rows = []
                    for r in pdf.itertuples(index=False):
                        per: list[list[int]] = [[] for _ in range(n)]
                        for st in r.ps:
                            per[int(st["clause"])].append(int(st["bpos"]))
                        freq = sloppy_phrase_freq(per, [0] * n, slop)
                        if freq > 0:
                            out_rows.append((int(r.docid), float(freq), int(r.nb)))
                    yield pd.DataFrame(
                        out_rows, columns=["docid", "freq", "nb"]
                    ) if out_rows else pd.DataFrame(
                        {
                            "docid": pd.Series(dtype="int64"),
                            "freq": pd.Series(dtype="float32"),
                            "nb": pd.Series(dtype="int16"),
                        }
                    )

            pf = present.select("docid", "nb", "ps").mapInPandas(
                sloppy, "docid long, freq float, nb short"
            )
        pf = pf.filter(F.col("freq") > 0)
        if return_freqs:
            return pf.select("docid", "freq", "nb"), flat
        if emit_freq:
            return self._phrase_finalize(
                pf.select("docid", "freq", "nb"), flat, q.field, q.boost
            )
        freq_f = F.col("freq").cast("float")
        nc = F.element_at(nc_arr, F.col("nb").cast("int") + 1)
        return pf.select(
            "docid", ((w_lit * freq_f) / (freq_f + nc)).cast("float").alias("score")
        )

    def _phrase_scores_bulk(
        self,
        blocks: DataFrame,
        by_term: dict[str, list[tuple[int, int]]],
        n: int,
        slop: int,
        field: str,
        w: np.float32,
        emit_freq: bool = False,
    ) -> DataFrame:
        """Scale-safe phrase evaluation: positions shuffled as docid-range-
        sliced binary sub-arrays (one row per (range, clause, block-slice),
        never one row per position), each range evaluated vectorized.

        Exact: lexsort (docid, bpos) + bitwise_or.reduceat of clause masks
        -> alignments where every slot matched (ExactPhraseScorer counting,
        all-numpy). Sloppy: per-doc SloppyPhraseScorer merge inside the
        range, bounded by docs that hold every clause. Bit-identical to the
        gather path (same freq, same float32 score chain) — asserted by
        tests/test_phrase.py bulk-parity cases."""
        R = self.BULK_RANGE
        cache = self._field_caches[field]
        full_mask = (1 << n) - 1

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
                    for cid, off in by_term[r.term]:
                        bpos = poss - off
                        for b0, b1 in zip(bounds[:-1], bounds[1:]):
                            rows.append(
                                (
                                    int(rid[b0]),
                                    cid,
                                    drep[b0:b1].tobytes(),
                                    bpos[b0:b1].tobytes(),
                                    nrep[b0:b1].tobytes(),
                                )
                            )
                yield pd.DataFrame(
                    rows, columns=["rid", "clause", "docids", "bpos", "norms"]
                )

        def reduce_ranges(it):
            from ..oracle import sloppy_phrase_freq

            bufs = [p for p in it if len(p)]
            if not bufs:
                return
            pdf = pd.concat(bufs, ignore_index=True) if len(bufs) > 1 else bufs[0]
            counts = np.array([len(b) // 8 for b in pdf["docids"]], dtype=np.int64)
            d = np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in pdf["docids"]]
            )
            p = np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in pdf["bpos"]]
            )
            nb = np.concatenate(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["norms"]]
            )
            cl = np.repeat(pdf["clause"].to_numpy(), counts)
            if slop == 0:
                order = np.lexsort((p, d))
                d, p, nb, cl = d[order], p[order], nb[order], cl[order]
                grp = (d[1:] != d[:-1]) | (p[1:] != p[:-1])
                starts = np.concatenate([[0], np.nonzero(grp)[0] + 1])
                mask = np.bitwise_or.reduceat(
                    (np.uint64(1) << cl.astype(np.uint64)), starts
                )
                full = mask == np.uint64(full_mask)
                if not full.any():
                    return
                gd = d[starts][full]
                uniq_d, freq = np.unique(gd, return_counts=True)
                nbu = nb[np.searchsorted(d, uniq_d)]
                f32 = freq.astype(np.float32)
                if emit_freq:
                    yield pd.DataFrame(
                        {"docid": uniq_d, "freq": f32, "nb": nbu.astype(np.int16)}
                    )
                    return
                sc = (np.float32(w) * f32) / (f32 + cache[nbu])
                yield pd.DataFrame({"docid": uniq_d, "score": sc})
                return
            # sloppy: per-doc merge over docs holding every clause
            order = np.lexsort((p, cl, d))
            d, p, nb, cl = d[order], p[order], nb[order], cl[order]
            starts = np.concatenate(
                [[0], np.nonzero(d[1:] != d[:-1])[0] + 1, [len(d)]]
            )
            out_d, out_s = [], []
            for g0, g1 in zip(starts[:-1], starts[1:]):
                cmask = 0
                for c in cl[g0:g1]:
                    cmask |= 1 << int(c)
                if cmask != full_mask:
                    continue
                per: list[list[int]] = [[] for _ in range(n)]
                for i in range(g0, g1):
                    per[int(cl[i])].append(int(p[i]))
                freq = sloppy_phrase_freq(per, [0] * n, slop)
                if freq > 0:
                    fr = np.float32(freq)
                    out_d.append(int(d[g0]))
                    if emit_freq:
                        out_s.append((fr, int(nb[g0])))
                    else:
                        out_s.append(
                            np.float32(
                                np.float32(w) * fr / (fr + cache[int(nb[g0])])
                            )
                        )
            if out_d:
                if emit_freq:
                    yield pd.DataFrame(
                        {
                            "docid": np.array(out_d, dtype=np.int64),
                            "freq": np.array(
                                [x[0] for x in out_s], dtype=np.float32
                            ),
                            "nb": np.array(
                                [x[1] for x in out_s], dtype=np.int16
                            ),
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
            int(self.spark.conf.get("spark.sql.shuffle.partitions", "32")), 8
        )
        sliced = blocks.select(
            "term", "first_docid", "count", "docids_enc", "tfs_enc",
            "norms_enc", "pos_enc", "docbase",
        ).mapInPandas(
            slice_ranges,
            "rid long, clause int, docids binary, bpos binary, norms binary",
        )
        out_schema = (
            "docid long, freq float, nb short"
            if emit_freq
            else "docid long, score float"
        )
        return sliced.repartition(n_shuffle, "rid").mapInPandas(
            reduce_ranges, out_schema
        )

    def _phrase_finalize(
        self, pf: DataFrame, flat: list[tuple[int, str]], field: str,
        qboost: float, factor_col: str | None = None,
    ) -> DataFrame:
        """Score phrase candidates (docid, freq float, nb short) under the
        active non-BM25 similarity.

        factor_col names an extra float column multiplied into the kernel
        score LAST (f32) — the payload route: PayloadTermSpanScorer.Score()
        is GetSpanScore() * GetPayloadScore(), where the span score is the
        ACTIVE similarity's kernel at the sloppy freq
        (Search/Payloads/PayloadTermQuery.cs GetScore via
        Similarity.SimScorer ComputeSlopFactor/ComputePayloadFactor).

        Reference semantics (every Similarity scores every Scorer):
        - classic TF-IDF: PhraseWeight idf = f32 SUM of per-term idfs over
          allTermStats in declaration order (TFIDFSimilarity.IdfExplain);
          one IDFStats value; score = f32(f32(sqrt(freq)) * value) *
          DecodeNormValue(norm) (TFIDFSimScorer.Score) — no coord (a
          standalone phrase has no BooleanWeight).
        - SimilarityBase members (LM-Dirichlet/JM, DFR, IB): ComputeWeight
          over several termStats builds ONE BasicStats per term, and
          MultiSimilarity.MultiSimScorer SUMS the per-term kernels at the
          SAME phrase freq (SimilarityBase.cs GetSimScorer multi branch) —
          f32 accumulation in declaration order."""
        from ..functions.smallfloat import DECODE_TABLE, NORM_TABLE

        keys = [(field, t) for _slot, t in flat]
        omit = field in {
            f for f, info in self.fields_info.items() if info.get("omit_norms")
        }
        if self._classic_like:
            from ..oracle import classic_idf

            dfs = self.doc_freqs(sorted(set(keys)))
            s = np.float32(0.0)
            for k in keys:
                s = np.float32(s + classic_idf(dfs[k], self.max_doc))
            qw = np.float32(s * np.float32(qboost))
            ssq = np.float32(qw * qw)
            qnorm = (
                np.float32(np.float64(1.0) / np.sqrt(np.float64(ssq)))
                if ssq > 0
                else np.float32(1.0)
            )
            value = np.float32(np.float32(qw * qnorm) * s)
            raw = (
                self._classic_tf_expr()
                * F.lit(float(value)).cast("float")
            ).cast("float")
            if omit:
                sc = raw
            else:
                dec = F.array(
                    *[F.lit(float(x)).cast("float") for x in DECODE_TABLE]
                )
                sc = (
                    raw * F.element_at(dec, F.col("nb").cast("int") + 1)
                ).cast("float")
            if factor_col is not None:
                sc = (sc * F.col(factor_col).cast("float")).cast("float")
            return pf.select("docid", sc.alias("score"))

        # SimilarityBase family: per-term scalar params, kernels summed at
        # the shared phrase freq in one tiny mapInPandas over the few
        # surviving candidates (one row per matching doc)
        metas = self.term_meta(sorted(set(keys)))
        field_tokens = {
            f: int(info.get("sum_ttf", 0)) for f, info in self.fields_info.items()
        }
        nft = field_tokens.get(field, 0)
        boost32 = np.float32(qboost)
        if self.sim_spec is not None:
            from . import simbase

            spec = self.sim_spec
            stats = [
                simbase.make_stats(self.max_doc, metas[k][0], metas[k][1], nft)
                for k in keys
            ]

            def fin(it):
                for pdf in it:
                    if not len(pdf):
                        continue
                    freq = pdf["freq"].to_numpy().astype(np.float32)
                    nb = pdf["nb"].to_numpy().astype(np.int64) & 0xFF
                    dl = (
                        np.ones(len(freq), dtype=np.float32)
                        if omit
                        else NORM_TABLE[nb]
                    )
                    total = np.zeros(len(freq), dtype=np.float32)
                    for st in stats:
                        sc = simbase.block_scores(spec, st, boost32, freq, dl)
                        total = (total + sc).astype(np.float32)
                    if factor_col is not None:
                        fac = pdf[factor_col].to_numpy().astype(np.float32)
                        total = (total * fac).astype(np.float32)
                    yield pd.DataFrame({"docid": pdf["docid"], "score": total})

        else:  # lmd / lmjm
            mu = np.float32(self.mu)
            jm = self.similarity == "lmjm"
            smooth = np.float32(self.lam) if jm else mu
            oml = np.float32(np.float32(1.0) - np.float32(self.lam))
            scps = []
            for k in keys:
                cp = np.float32(
                    (np.float32(metas[k][1]) + np.float32(1.0))
                    / (np.float32(nft) + np.float32(1.0))
                )
                scps.append(np.float32(smooth * cp))
            mu_f = float(self.mu)

            def fin(it):
                for pdf in it:
                    if not len(pdf):
                        continue
                    freq = pdf["freq"].to_numpy().astype(np.float32)
                    nb = pdf["nb"].to_numpy().astype(np.int64) & 0xFF
                    dl = (
                        np.ones(len(freq), dtype=np.float32)
                        if omit
                        else NORM_TABLE[nb]
                    )
                    if not jm:
                        l2 = np.log(
                            (np.float32(mu_f) / (dl + np.float32(mu_f))).astype(
                                np.float64
                            )
                        )
                    total = np.zeros(len(freq), dtype=np.float32)
                    for scp in scps:
                        if jm:
                            inner = (
                                np.float32(1.0)
                                + ((oml * freq) / dl) / np.float32(scp)
                            )
                            sc = boost32 * np.log(inner.astype(np.float64)).astype(
                                np.float32
                            )
                        else:
                            inner1 = np.float32(1.0) + freq / np.float32(scp)
                            sc = boost32 * (
                                np.log(inner1.astype(np.float64)) + l2
                            ).astype(np.float32)
                            np.maximum(sc, np.float32(0.0), out=sc)
                        total = (total + sc).astype(np.float32)
                    if factor_col is not None:
                        fac = pdf[factor_col].to_numpy().astype(np.float32)
                        total = (total * fac).astype(np.float32)
                    yield pd.DataFrame({"docid": pdf["docid"], "score": total})

        return pf.mapInPandas(fin, "docid long, score float")

    def _payload_term_scores(self, q: PayloadTermQuery) -> DataFrame:
        """PayloadTermQuery scorer (Search/Payloads/PayloadTermQuery.cs).

        Span score: each term occurrence is a (p, p+1) span, so every match
        contributes sloppyFreq(1) = 0.5f (Spans/SpanScorer.cs:79-95 +
        BM25Similarity sloppy scorer ComputeSlopFactor) — freq = 0.5*tf,
        exact in float32 for tf < 2^25, then the usual w*freq/(freq+norm)
        kernel. Payload score: the per-occurrence 4-byte float payload
        (PayloadHelper.DecodeSingle) folds through the chosen
        PayloadFunction in position order (ProcessPayload is called once per
        span in doc order):
          avg — payloadScore += factor, DocScore = payloadScore/seen
                (AveragePayloadFunction.cs; strict left-to-right float32
                fold, emulated with an O(max_tf) vectorized column sweep)
          min/max — running min/max, order-independent
                (Min/MaxPayloadFunction.cs; vectorized reduceat)
        No payloads seen -> DocScore = 1. Final score = f32(spanScore *
        DocScore), or DocScore alone when include_span_score=False
        (PayloadTermQuery.cs GetScore). One job: the term's blocks decode
        and score in a single mapInPandas — no shuffle before top-k.

        Non-BM25 similarities (the reference routes the span score through
        the ACTIVE SimScorer — Similarity.SimScorer ComputeSlopFactor is
        1/(distance+1) in every family, so freq = 0.5*tf everywhere): the
        decode pass emits (docid, freq, nb, factor) and _phrase_finalize
        applies the active kernel * factor — still two chained narrow maps,
        no shuffle."""
        for s in self.segments:
            if s["manifest"].get("payload_provider") is None:
                raise NotImplementedError(
                    "payload queries need an index built with a "
                    "payload_provider (this segment has none)"
                )
        key = (q.field, q.term)
        if self.doc_freqs([key])[key] == 0:
            return self._empty_hits()
        fn, include_span = q.function, q.include_span_score
        if fn not in ("avg", "min", "max"):
            raise ValueError(f"unknown payload function {fn!r}")
        kernel_path = include_span and self.similarity != "bm25"
        w = (
            self.weight(q.term, q.boost, q.field)
            if include_span and not kernel_path
            else np.float32(0.0)
        )
        caches = self._field_caches

        def score_batches(it):
            from .codec import decode_block, decode_float_payloads

            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    docids, tfs = decode_block(
                        r.docids_enc, r.tfs_enc, r.first_docid, r.count
                    )
                    if r.docbase:
                        docids = docids + r.docbase
                    n_pos = int(tfs.sum())
                    vals = decode_float_payloads(r.pay_enc, n_pos)
                    valid = ~np.isnan(vals)
                    starts = np.concatenate(
                        [[0], np.cumsum(tfs.astype(np.int64))[:-1]]
                    )
                    m = len(tfs)
                    if fn == "avg":
                        # strict left-to-right f32 fold per doc, vectorized
                        # across the block's docs one occurrence-column at a
                        # time (payloadScore accumulates per match in C#)
                        acc = np.zeros(m, dtype=np.float32)
                        cnt = np.zeros(m, dtype=np.int64)
                        for j in range(int(tfs.max())):
                            live = np.nonzero(tfs > j)[0]
                            v = vals[starts[live] + j]
                            ok = valid[starts[live] + j]
                            upd = live[ok]
                            acc[upd] = (acc[upd] + v[ok]).astype(np.float32)
                            cnt[upd] += 1
                        factor = np.where(
                            cnt > 0,
                            acc / cnt.astype(np.float32),
                            np.float32(1.0),
                        ).astype(np.float32)
                    else:
                        fill = np.float32(np.inf if fn == "min" else -np.inf)
                        red = np.minimum if fn == "min" else np.maximum
                        filled = np.where(valid, vals, fill).astype(np.float32)
                        factor = red.reduceat(filled, starts).astype(np.float32)
                        cnt = np.add.reduceat(
                            valid.astype(np.int64), starts
                        )
                        factor = np.where(
                            cnt > 0, factor, np.float32(1.0)
                        ).astype(np.float32)
                    if kernel_path:
                        # hand (freq, norm byte, factor) to the active
                        # similarity kernel — exactly the phrase route
                        freq = tfs.astype(np.float32) * np.float32(0.5)
                        nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                        outs.append(
                            pd.DataFrame(
                                {
                                    "docid": docids,
                                    "freq": freq,
                                    "nb": nbytes.astype(np.int16),
                                    "factor": factor,
                                }
                            )
                        )
                        continue
                    if include_span:
                        freq = tfs.astype(np.float32) * np.float32(0.5)
                        nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                        span = (np.float32(w) * freq) / (
                            freq + caches[r.field][nbytes]
                        )
                        score = (span * factor).astype(np.float32)
                    else:
                        score = factor
                    outs.append(pd.DataFrame({"docid": docids, "score": score}))
                if outs:
                    yield pd.concat(outs, ignore_index=True)
                elif kernel_path:
                    yield pd.DataFrame(
                        {
                            "docid": pd.Series(dtype="int64"),
                            "freq": pd.Series(dtype="float32"),
                            "nb": pd.Series(dtype="int16"),
                            "factor": pd.Series(dtype="float32"),
                        }
                    )
                else:
                    yield pd.DataFrame(
                        {
                            "docid": pd.Series(dtype="int64"),
                            "score": pd.Series(dtype="float32"),
                        }
                    )

        cols = [
            "field", "first_docid", "count", "docids_enc", "tfs_enc",
            "norms_enc", "pay_enc", "docbase",
        ]
        blocks = self._blocks_for([key]).select(cols)
        if kernel_path:
            pf = blocks.mapInPandas(
                score_batches, "docid long, freq float, nb short, factor float"
            )
            return self._phrase_finalize(
                pf, [(0, q.term)], q.field, q.boost, factor_col="factor"
            )
        return blocks.mapInPandas(score_batches, "docid long, score float")

    def _dismax_scores_nested(self, q: DisMaxQuery) -> DataFrame:
        """DisjunctionMaxQuery under a SimilarityBase member: queryNorm = 1,
        so each sub-query scores independently under the active similarity
        and DisjunctionMaxScorer's fold composes them — score =
        f32(max + tie * (sum - max)) with the sum accumulated f32 in
        clause order (Search/DisjunctionMaxScorer.cs)."""
        if not q.queries:
            return self._empty_hits()
        import dataclasses

        b = np.float32(q.boost)
        parts = []
        for i, sub in enumerate(q.queries):
            if float(q.boost) != 1.0:
                sub = dataclasses.replace(
                    sub, boost=float(np.float32(np.float32(sub.boost) * b))
                )
            parts.append(
                self.scores(sub).select(
                    "docid", F.lit(i).alias("clause"), "score"
                )
            )
        union = parts[0]
        for pdf in parts[1:]:
            union = union.unionByName(pdf)
        n = len(parts)
        agg = self._pivot_agg(union, n)
        zero = F.lit(0.0).cast("float")
        cols = [F.coalesce(F.col(f"s{i}"), zero) for i in range(n)]
        mx = cols[0] if n == 1 else F.greatest(*cols)
        ssum = cols[0]
        for c in cols[1:]:
            ssum = ssum + c
        tie = F.lit(float(np.float32(q.tie_breaker))).cast("float")
        return agg.select("docid", (mx + tie * (ssum - mx)).alias("score"))

    def _classic_dismax_scores(self, q: DisMaxQuery) -> DataFrame:
        """DisjunctionMaxQuery under classic TFIDF: the shared query norm
        sums every sub-clause's queryWeight^2 (DisjunctionMaxWeight
        GetValueForNormalization), then each clause scores with its
        normalized value and DisjunctionMaxScorer folds max + tie*(rest).
        Term and phrase sub-queries supported; no coord (not a boolean)."""
        from ..functions.smallfloat import DECODE_TABLE
        from ..oracle import classic_idf

        clauses_q = list(q.queries)
        if not clauses_q:
            return self._empty_hits()
        ok_types = (TermQuery, PhraseQuery, MultiPhraseQuery)
        if not all(isinstance(c, ok_types) for c in clauses_q):
            raise NotImplementedError(
                "classic dismax scores term/phrase sub-queries"
            )

        def _flat(c):
            if isinstance(c, TermQuery):
                return [(c.field, c.term)]
            if isinstance(c, PhraseQuery):
                return [(c.field, t) for t in c.terms]
            return [(c.field, t) for arr in c.term_arrays for t in arr]

        all_keys = sorted({k for c in clauses_q for k in _flat(c)})
        dfs = self.doc_freqs(all_keys)
        idfs = []
        for c in clauses_q:
            acc = np.float32(0.0)
            for k in _flat(c):
                acc = np.float32(acc + classic_idf(dfs[k], self.max_doc))
            idfs.append(acc)
        qws = [
            np.float32(i * np.float32(c.boost)) for i, c in zip(idfs, clauses_q)
        ]
        ssq = np.float32(0.0)
        for qw in qws:
            ssq = np.float32(ssq + np.float32(qw * qw))
        ssq = np.float32(
            ssq * np.float32(np.float32(q.boost) * np.float32(q.boost))
        )
        qnorm = (
            np.float32(np.float64(1.0) / np.sqrt(np.float64(ssq)))
            if ssq > 0
            else np.float32(1.0)
        )
        values = [
            np.float32(np.float32(qw * qnorm) * i) for qw, i in zip(qws, idfs)
        ]
        term_ids = [
            i for i, c in enumerate(clauses_q) if isinstance(c, TermQuery)
        ]
        rows = None
        live = [
            Clause(i, clauses_q[i].term, values[i], field=clauses_q[i].field)
            for i in term_ids
            if dfs[(clauses_q[i].field, clauses_q[i].term)] > 0
        ]
        if live:
            rows = self._score_blocks(
                self._blocks_for([c.key for c in live]), live, classic=True
            )
        for i, c in enumerate(clauses_q):
            if isinstance(c, TermQuery):
                continue
            pf, _flat2 = self._phrase_scores(c, return_freqs=True)
            raw = (
                self._classic_tf_expr()
                * F.lit(float(values[i])).cast("float")
            ).cast("float")
            dec = F.array(
                *[F.lit(float(x)).cast("float") for x in DECODE_TABLE]
            )
            sc = (raw * F.element_at(dec, F.col("nb").cast("int") + 1)).cast(
                "float"
            )
            prow = pf.select(
                "docid", F.lit(i).cast("int").alias("clause"), sc.alias("score")
            )
            rows = prow if rows is None else rows.unionByName(prow)
        if rows is None:
            return self._empty_hits()
        n = len(clauses_q)
        agg = self._pivot_agg(rows, n)
        zero = F.lit(0.0).cast("float")
        cols = [F.coalesce(F.col(f"s{i}"), zero) for i in range(n)]
        mx = cols[0] if n == 1 else F.greatest(*cols)
        ssum = cols[0]
        for c in cols[1:]:
            ssum = ssum + c
        tie = F.lit(float(np.float32(q.tie_breaker))).cast("float")
        return agg.select("docid", (mx + tie * (ssum - mx)).alias("score"))

    def _dismax_scores(self, q: DisMaxQuery) -> DataFrame:
        """max + tie*(sum-max) over clause scores (DisjunctionMaxScorer).

        Pure-Catalyst float32: greatest() for the max, nested float adds for
        the ordered sum, then mx + tie*(sum-mx) — each op single-precision,
        matching the oracle's numpy float32 chain bit for bit."""
        clauses = self._term_clauses(q.queries, 0)
        rows = self._score_blocks(self._blocks_for([c.key for c in clauses]), clauses)
        n = len(clauses)
        agg = self._pivot_agg(rows, n)
        zero = F.lit(0.0).cast("float")
        cols = [F.coalesce(F.col(f"s{i}"), zero) for i in range(n)]
        mx = cols[0] if n == 1 else F.greatest(*cols)
        ssum = cols[0]
        for c in cols[1:]:
            ssum = ssum + c  # float32 each step
        tie = F.lit(float(np.float32(q.tie_breaker))).cast("float")
        return agg.select("docid", (mx + tie * (ssum - mx)).alias("score"))

    # -- bulk DAAT scorer ------------------------------------------------------------
    BULK_RANGE = 1 << 17  # docids per dense accumulator (512 KB float32)

    def _try_bulk_topk(self, q: Query, k: int, prune: bool) -> DataFrame | None:
        """Range-bucketed dense-accumulator scoring for heavy multi-clause
        queries — Lucene's windowed BooleanScorer bucket table
        (BooleanScorer.cs:28-55), vectorized and distributed.

        Decoded postings are re-sliced at fixed docid-range boundaries in the
        map stage and shuffled as BINARY sub-arrays (O(blocks) rows, never one
        row per posting); each reduce range scatters clause kernels into dense
        float32/count accumulators IN CLAUSE ORDER (bit-identical to the
        pivot fold), applies MUST/minShouldMatch/MUST_NOT/liveDocs masks
        vectorized, and emits only its local top-k — TopScoreDocCollector per
        partition, merged by the global orderBy. Returns None when the query
        shape or volume doesn't warrant it."""
        if self.similarity != "bm25":
            return None  # bulk kernel is BM25-specific
        q = self.rewrite(q)
        if isinstance(q, DisMaxQuery):
            if not all(isinstance(c, TermQuery) for c in q.queries):
                return None
            clauses = self._term_clauses(q.queries, 0)
            n_must, need_should, not_terms = 0, 1, []
            mode = ("dismax", float(np.float32(q.tie_breaker)))
        elif isinstance(q, BooleanQuery):
            if not all(
                isinstance(c, TermQuery) for c in q.must + q.should + q.must_not
            ):
                return None
            n_must = len(q.must)
            clauses = self._term_clauses(q.must, 0) + self._term_clauses(
                q.should, n_must
            )
            not_terms = [(c.field, c.term) for c in q.must_not]
            msm = q.min_should_match
            need_should = msm if n_must else max(1, msm) if q.should else 0
            mode = ("sum", 0.0)
        else:
            return None
        dfs = self.doc_freqs([c.key for c in clauses])
        # a MUST term with df=0 can never match; but weight can also be 0 with
        # boost=0 while df>0 — such a clause stays live as a zero-contribution
        # match constraint (mirrors _boolean_scores / Lucene semantics)
        if any(dfs[c.key] == 0 and c.clause_id < n_must for c in clauses):
            return self._empty_hits()
        live = [
            c
            for c in clauses
            if float(c.weight) > 0.0 or (c.clause_id < n_must and dfs[c.key] > 0)
        ]
        if len(live) < 2:
            return None  # single-list path is already shuffle-free
        total_df = sum(self._df_of(c) for c in live)
        if total_df < self.prune_min_postings * 4:
            return None
        # prohibited terms ride along as extra clause ids
        n_score = len(clauses)
        proh = [
            Clause(n_score + i, t, np.float32(0.0), field=f)
            for i, (f, t) in enumerate(not_terms)
        ]
        allc = live + proh
        blocks = self._blocks_for([c.key for c in allc])
        if n_must:
            blocks = self._conjunction_prune(
                blocks, [c.key for c in clauses if c.clause_id < n_must]
            )
        if (
            prune
            and self._prunable
            and n_must == 0
            and not not_terms
            and need_should <= 1
            and mode[0] == "sum"
            and self._deleted_docids() is None  # see can_prune in _boolean_scores
        ):
            blocks, _ = self._prune_blocks(blocks, live, k)

        by_key: dict[tuple[str, str], list[tuple[int, float]]] = {}
        for c in allc:
            by_key.setdefault(c.key, []).append((c.clause_id, float(c.weight)))
        caches = self._field_caches
        R = self.BULK_RANGE
        deleted = self._deleted_array()
        if deleted is None:
            return None  # delete set too large for the dense path; anti-join instead

        def slice_ranges(it):
            from .codec import decode_block

            for pdf in it:
                rows = []
                for r in pdf.itertuples(index=False):
                    docids, tfs = decode_block(
                        r.docids_enc, r.tfs_enc, r.first_docid, r.count
                    )
                    if r.docbase:
                        docids = docids + r.docbase
                    nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                    freq = tfs.astype(np.float32)
                    rid = docids // R
                    change = np.nonzero(rid[1:] != rid[:-1])[0]
                    bounds = np.concatenate([[0], change + 1, [len(docids)]])
                    for clause_id, w in by_key[(r.field, r.term)]:
                        sc = (np.float32(w) * freq) / (freq + caches[r.field][nbytes]) \
                            if w else np.zeros(len(docids), dtype=np.float32)
                        for b0, b1 in zip(bounds[:-1], bounds[1:]):
                            rows.append(
                                (
                                    int(rid[b0]),
                                    clause_id,
                                    (docids[b0:b1] - rid[b0] * R)
                                    .astype(np.uint32)
                                    .tobytes(),
                                    sc[b0:b1].tobytes(),
                                )
                            )
                yield pd.DataFrame(
                    rows, columns=["rid", "clause", "offs", "scores"]
                )

        tie = np.float32(mode[1])
        is_dismax = mode[0] == "dismax"

        def reduce_ranges(it):
            bufs = [p for p in it if len(p)]
            if not bufs:
                return
            pdf = pd.concat(bufs, ignore_index=True) if len(bufs) > 1 else bufs[0]
            order = np.lexsort((pdf["clause"].to_numpy(), pdf["rid"].to_numpy()))
            rids = pdf["rid"].to_numpy()[order]
            cls = pdf["clause"].to_numpy()[order]
            offs_b = pdf["offs"].to_numpy()[order]
            sc_b = pdf["scores"].to_numpy()[order]
            change = np.nonzero(rids[1:] != rids[:-1])[0]
            bounds = np.concatenate([[0], change + 1, [len(rids)]])
            out_ids, out_scores = [], []
            for g0, g1 in zip(bounds[:-1], bounds[1:]):
                base = int(rids[g0]) * R
                acc = np.zeros(R, dtype=np.float32)
                mx = np.zeros(R, dtype=np.float32) if is_dismax else None
                nm = np.zeros(R, dtype=np.int16)
                ns = np.zeros(R, dtype=np.int16)
                banned = np.zeros(R, dtype=bool)
                for i in range(g0, g1):  # clause-ascending within the range
                    offs = np.frombuffer(offs_b[i], dtype=np.uint32)
                    cid = int(cls[i])
                    if cid >= n_score:
                        banned[offs] = True
                        continue
                    sc = np.frombuffer(sc_b[i], dtype=np.float32)
                    acc[offs] = acc[offs] + sc  # float32, clause order
                    if is_dismax:
                        mx[offs] = np.maximum(mx[offs], sc)
                        ns[offs] += 1
                    elif cid < n_must:
                        nm[offs] += 1
                    else:
                        ns[offs] += 1
                if is_dismax:
                    mask = ns > 0
                else:
                    mask = (nm == n_must) if n_must else (ns > 0)
                    if need_should:
                        mask &= ns >= need_should
                mask &= ~banned
                if deleted.size:
                    lo = np.searchsorted(deleted, base)
                    hi = np.searchsorted(deleted, base + R)
                    mask[(deleted[lo:hi] - base)] = False
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                if is_dismax:
                    scores = mx[cand] + tie * (acc[cand] - mx[cand])
                else:
                    scores = acc[cand]
                if len(cand) > k:
                    o = np.lexsort((cand, -scores))[:k]
                    cand, scores = cand[o], scores[o]
                out_ids.append(base + cand.astype(np.int64))
                out_scores.append(scores.astype(np.float32))
            if out_ids:
                yield pd.DataFrame(
                    {
                        "docid": np.concatenate(out_ids),
                        "score": np.concatenate(out_scores),
                    }
                )

        n_shuffle = max(
            int(self.spark.conf.get("spark.sql.shuffle.partitions", "32")), 8
        )
        cols = [
            "field", "term", "first_docid", "count", "docids_enc", "tfs_enc",
            "norms_enc", "docbase",
        ]
        sliced = blocks.select(cols).mapInPandas(
            slice_ranges, "rid long, clause int, offs binary, scores binary"
        )
        return sliced.repartition(n_shuffle, "rid").mapInPandas(
            reduce_ranges, "docid long, score float"
        )

    # above this many deletes the bulk path's driver-side delete array is a
    # memory cliff — fall back to the relational path's anti-join instead
    MAX_BULK_DELETES = 1 << 24

    def _deleted_array(self) -> np.ndarray | None:
        """Sorted global delete set for the bulk scorer, or None when it is
        too large to ship through the driver (caller falls back)."""
        d = self._deleted_docids()
        if d is None:
            return np.empty(0, dtype=np.int64)
        if d.limit(self.MAX_BULK_DELETES + 1).count() > self.MAX_BULK_DELETES:
            return None
        return np.sort(np.array([r["docid"] for r in d.collect()], dtype=np.int64))

    # -- block-max pruning -----------------------------------------------------------
    def _prune_blocks(
        self, blocks: DataFrame, clauses: list[Clause], k: int
    ) -> tuple[DataFrame, dict]:
        """Two-phase WAND-style pruning over block metadata. Rank-safe."""
        w_by_key = {c.key: float(c.weight) for c in clauses}
        fkey_col = F.concat_ws(FKEY_SEP, "field", "term")
        w_expr = F.create_map(
            *[
                x
                for (f, t), w in w_by_key.items()
                for x in (F.lit(f + FKEY_SEP + t), F.lit(w))
            ]
        )
        meta = blocks.withColumn("ub", w_expr[fkey_col] * F.col("max_score_bound"))

        # per-term global max upper bound — precomputed in term_stats at build
        # time (no metadata job here)
        tm = self.term_meta(list(w_by_key))
        maxes = {key: w * tm[key][2] for key, w in w_by_key.items()}
        total_max = sum(maxes.values())

        # phase 1: top ceil(k/BLOCK)+1 blocks per term by bound -> partial θ
        j = max(1, math.ceil(k / BLOCK_SIZE)) + 1
        win = Window.partitionBy("field", "term", "salt").orderBy(
            F.desc("ub"), F.asc("block_no")
        )
        probe = meta.withColumn("rk", F.row_number().over(win)).filter(F.col("rk") <= j).drop("rk", "ub")
        probe_scores = (
            self._score_blocks(probe, clauses)
            .groupBy("docid")
            .agg(F.sum("score").alias("partial"))
            .orderBy(F.desc("partial"))
            .limit(k)
            .collect()
        )
        theta = float(probe_scores[-1]["partial"]) if len(probe_scores) >= k else float("-inf")
        # guard band: partial sums are float64 while true scores fold in
        # float32 — shave a few ulps so rounding can never prune a true hit
        if math.isfinite(theta):
            theta -= abs(theta) * 1e-5

        # phase 2: keep blocks whose optimistic total can reach θ (ties kept)
        def keep_threshold(key: tuple[str, str]) -> float:
            others = total_max - maxes.get(key, 0.0)
            return theta - others

        thr_expr = F.create_map(
            *[
                x
                for (f, t) in w_by_key
                for x in (F.lit(f + FKEY_SEP + t), F.lit(keep_threshold((f, t))))
            ]
        )
        survivors = meta.filter(F.col("ub") >= thr_expr[fkey_col]).drop("ub")
        return survivors, {"theta": theta, "per_term_max": maxes}

    # -- public search API --------------------------------------------------------------
    def search(self, q: Query, k: int = 10, prune: bool = True) -> DataFrame:
        """Top-k: (docid, score) ordered score desc, docid asc (HitQueue order)."""
        bulk = self._try_bulk_topk(q, k, prune)
        if bulk is not None:
            return bulk.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        scored = self.scores(q, prune_k=k if prune else None)
        return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def search_after(self, q: Query, k: int, after_score: float, after_doc: int) -> DataFrame:
        """Deep paging (IndexSearcher.cs:282-301): hits strictly after cursor."""
        s = self.scores(q)
        return (
            s.filter(
                (F.col("score") < float(after_score))
                | ((F.col("score") == float(after_score)) & (F.col("docid") > int(after_doc)))
            )
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def count(self, q: Query) -> int:
        """TotalHitCountCollector analogue."""
        return self.scores(q).count()

    def explain(self, q: Query, k: int = 10) -> DataFrame:
        """IndexSearcher.Explain parity for TermQuery (IndexSearcher.cs:
        Explain -> Weight.Explain): the NUMERIC LEAVES of the Explanation
        tree for the query's top-k hits, one flat row per doc — the tree
        nesting is a rendering concern; the leaf values carry the contract.

        BM25 (BM25Similarity.cs ExplainScore:296-320): freq, docFreq, idf,
        the byte-decoded norm denominator k1*((1-b) + b*dl/avgdl), and the
        recomposed score — bit-identical to search().
        Classic (TFIDFSimilarity.cs ExplainScore:720-767): freq, docFreq,
        idf, queryNorm, the byte315-decoded fieldNorm, and the score.

        Every float column repeats the engine's own f32 operation order, so
        leaves recompose exactly: BM25 score == f32(f32(weight*freq) /
        f32(freq + norm_k)); classic score == f32(f32(f32(sqrt(freq)) *
        f32(f32(idf*boost*qnorm)*idf)) * field_norm).
        """
        if isinstance(q, BooleanQuery) and not q.must and not q.must_not \
                and len(q.should) == 1 and isinstance(q.should[0], TermQuery):
            q = q.should[0]
        if not isinstance(q, TermQuery):
            raise NotImplementedError(
                "explain() covers TermQuery (term scorers are the leaves "
                "every other Explanation composes)"
            )
        if self.similarity not in ("bm25", "classic"):
            raise NotImplementedError(
                "explain() covers bm25 and classic similarities"
            )
        key = (q.field, q.term)
        df = self.doc_freqs([key])[key]
        classic = self.similarity == "classic"
        leaf_schema = "docid long, freq long, nrm float"
        if df == 0:
            # empty result with the final schema — skipping the score
            # arithmetic keeps ANSI constant folding away from 0/0
            cols = (
                "docid long, freq long, df long, idf float, "
                + ("query_norm float, field_norm float, score float"
                   if classic else "norm_k float, score float")
            )
            return self.spark.createDataFrame([], cols)
        else:
            table = (
                self._decode_tables[q.field] if classic
                else self._field_caches[q.field]
            )

            def leaf_batches(it):
                from .codec import decode_block  # executor-side import

                for pdf in it:
                    outs = []
                    for r in pdf.itertuples(index=False):
                        docids, tfs = decode_block(
                            r.docids_enc, r.tfs_enc, r.first_docid, r.count
                        )
                        nbytes = np.frombuffer(r.norms_enc, dtype=np.uint8)
                        outs.append(pd.DataFrame({
                            "docid": docids + r.docbase,
                            "freq": tfs.astype(np.int64),
                            "nrm": table[nbytes],
                        }))
                    yield pd.concat(outs, ignore_index=True) if outs else (
                        pd.DataFrame({
                            "docid": pd.Series(dtype="int64"),
                            "freq": pd.Series(dtype="int64"),
                            "nrm": pd.Series(dtype="float32"),
                        })
                    )

            cols = ["first_docid", "count", "docids_enc", "tfs_enc",
                    "norms_enc", "docbase"]
            rows = self._blocks_for([key]).select(cols).mapInPandas(
                leaf_batches, leaf_schema
            )
        rows = self._apply_live_docs(rows)
        freq32 = F.col("freq").cast("float")
        dfl = F.lit(int(df)).cast("long").alias("df")
        if classic:
            from ..oracle import classic_idf

            idf = classic_idf(df, self.max_doc) if df else np.float32(0.0)
            qw = np.float32(idf * np.float32(q.boost))
            ssq = np.float32(qw * qw)
            qnorm = (
                np.float32(np.float64(1.0) / np.sqrt(np.float64(ssq)))
                if ssq > 0 else np.float32(1.0)
            )
            value = np.float32(np.float32(qw * qnorm) * idf)
            score = (
                (F.sqrt(F.col("freq").cast("double")).cast("float")
                 * F.lit(float(value)).cast("float"))
                * F.col("nrm")
            ).alias("score")
            out = rows.select(
                "docid", "freq", dfl,
                F.lit(float(idf)).cast("float").alias("idf"),
                F.lit(float(qnorm)).cast("float").alias("query_norm"),
                F.col("nrm").alias("field_norm"),
                score,
            )
        else:
            idf = idf_f32(df, self.max_doc) if df else np.float32(0.0)
            w = self.weight(q.term, q.boost, q.field)
            score = (
                (F.lit(float(w)).cast("float") * freq32)
                / (freq32 + F.col("nrm"))
            ).alias("score")
            out = rows.select(
                "docid", "freq", dfl,
                F.lit(float(idf)).cast("float").alias("idf"),
                F.col("nrm").alias("norm_k"),
                score,
            )
        return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    # below this many (bounded) hits, the hits side of a collector's
    # docs join is broadcast — the big docs scan then probes a hash map
    # instead of shuffling both sides (VERDICT r01 collector fetch-join)
    BROADCAST_HITS_MAX = 1 << 20

    def fetch(self, hits: DataFrame, hits_bound: int | None = None) -> DataFrame:
        """Stored-field fetch: join top-k back to the docs table (SURVEY §1.1).

        hits_bound: a known upper bound on |hits| (e.g. Σ df of the query
        terms). When it fits a broadcast, the join is hits-broadcast so the
        docs side never shuffles — at 10^9 docs that is the difference
        between a map-side hash probe and a full shuffle join."""
        if hits_bound is not None and hits_bound <= self.BROADCAST_HITS_MAX:
            return self.docs().join(F.broadcast(hits), "docid", "inner")
        return hits.join(self.docs(), "docid", "inner")

    def _hits_bound(self, q: Query) -> int | None:
        """Upper bound on the match count: Σ df over the query's terms
        (None when the query shape doesn't expose one, e.g. MatchAll)."""
        q = (
            self.rewrite(q)
            if isinstance(q, (FuzzyQuery, BooleanQuery, CommonTermsQuery))
            else q
        )
        if isinstance(q, (MatchAllQuery, PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery)):
            return None
        keys = _collect_terms(q)
        if not keys:
            return None
        dfs = self.doc_freqs(keys)
        return int(sum(dfs.values()))

    # -- satellite collectors (Grouping / Facets / Sort — SURVEY §2.6) -------------------
    def group_top_k(self, q: Query, group_col: str = "conv_id", k_per_group: int = 3) -> DataFrame:
        """Top-k hits per group (Lucene.Net.Grouping two-pass collectors)."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        win = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("docid"))
        return hits.withColumn("rank_in_group", F.row_number().over(win)).filter(
            F.col("rank_in_group") <= k_per_group
        )

    def facet_counts(self, q: Query, facet_col: str = "role") -> DataFrame:
        """Counts per category over matching docs (Lucene.Net.Facet)."""
        return self.fetch(self.scores(q), self._hits_bound(q)).groupBy(facet_col).agg(
            F.count("*").alias("count")
        )

    def facet_drilldown(
        self, q: Query, drill: dict[str, str], facet_col: str
    ) -> DataFrame:
        """DrillDownQuery analogue (Lucene.Net.Facet DrillDownQuery.cs):
        narrow the base query by category equalities, then count the
        remaining matches per facet value. The drill predicates are
        doc-side typed-column filters (pushed to the parquet scan);
        null facet values are excluded like unset taxonomy labels."""
        where = " AND ".join(f"{c} = '{v}'" for c, v in drill.items()) or "true"
        narrowed = FilteredQuery(query=q, where=where)
        return (
            self.fetch(self.scores(narrowed), self._hits_bound(q))
            .filter(F.col(facet_col).isNotNull())
            .groupBy(facet_col)
            .agg(F.count("*").alias("count"))
        )

    def facet_taxonomy(
        self, q: Query, path_cols: tuple[str, ...] = ("role", "tool")
    ) -> DataFrame:
        """Hierarchical taxonomy counts (Lucene.Net.Facet/Taxonomy/
        TaxonomyFacetCounts): every node of the path hierarchy
        path_cols[0]/path_cols[1]/... gets the count of matching docs under
        it. One Catalyst ROLLUP over the fetched hits — GROUPING() flags
        separate 'rolled up' from 'value is null' so unset labels (null
        path components, like Lucene's unlabeled docs) never form nodes.
        Output: (path, n), path = '/'-joined prefix, ordered by path."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        cols = list(path_cols)
        agg = hits.rollup(*cols).agg(
            F.count("*").alias("n"),
            *[F.grouping(c).alias(f"_g{i}") for i, c in enumerate(cols)],
        )
        # keep nodes: at least one level present, every present level
        # non-null (rollup already guarantees prefix-shaped grouping sets)
        keep = F.col("_g0") == 0
        for i, c in enumerate(cols):
            keep = keep & ((F.col(f"_g{i}") == 1) | F.col(c).isNotNull())
        parts = [
            F.when(F.col(f"_g{i}") == 0, F.col(c)) for i, c in enumerate(cols)
        ]
        path = F.concat_ws("/", *parts)
        return (
            agg.filter(keep)
            .select(path.alias("path"), "n")
            .orderBy("path")
        )

    def drill_sideways(self, q: Query, drills: dict[str, str]) -> DataFrame:
        """DrillSideways (Lucene.Net.Facet DrillSideways.cs): for each drill
        dimension, facet counts computed with every OTHER drill applied but
        its own relaxed — the 'what would I get if I un-picked this one'
        view. Output: (dim, value, n)."""
        out = None
        for dim in drills:
            where = (
                " AND ".join(
                    f"{c} = '{v}'" for c, v in drills.items() if c != dim
                )
                or "true"
            )
            narrowed = FilteredQuery(query=q, where=where)
            counts = (
                self.fetch(self.scores(narrowed), self._hits_bound(q))
                .filter(F.col(dim).isNotNull())
                .groupBy(F.col(dim).alias("value"))
                .agg(F.count("*").alias("n"))
                .select(F.lit(dim).alias("dim"), "value", "n")
            )
            out = counts if out is None else out.unionByName(counts)
        return out.orderBy("dim", "value")

    def sort_by_field(self, q: Query, sort_cols: list[str], k: int = 10, ascending: bool = True) -> DataFrame:
        """Sort matches by field values (Sort/TopFieldCollector)."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        cols = [F.asc(c) if ascending else F.desc(c) for c in sort_cols]
        return hits.orderBy(*cols).limit(k)

    def sort_by_fields(
        self, q: Query, specs: list[tuple[str, bool, bool]], k: int = 10
    ) -> DataFrame:
        """TopFieldCollector under a multi-SortField chain
        (Lucene.Net/Search/Sort.cs, SortField.cs, TopFieldCollector.cs):
        compare field by field, docid asc as the final tie-break (the
        collector's implicit doc tie-break). Each spec is
        (col, reverse, missing_last); missing_last mirrors
        SortField.MissingValue (e.g. STRING_LAST) for docs without the
        field — here a null column value. One TakeOrderedAndProject, no
        full sort."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        order = []
        for col, reverse, missing_last in specs:
            if reverse:
                order.append(
                    F.desc_nulls_last(col) if missing_last
                    else F.desc_nulls_first(col)
                )
            else:
                order.append(
                    F.asc_nulls_last(col) if missing_last
                    else F.asc_nulls_first(col)
                )
        order.append(F.asc("docid"))
        return hits.orderBy(*order).limit(k)

    def search_after_fields(
        self,
        q: Query,
        specs: list[tuple[str, bool, bool]],
        after_values: list,
        after_doc: int,
        k: int = 10,
    ) -> DataFrame:
        """Field-sorted searchAfter (TopFieldCollector's paging collector:
        IndexSearcher.SearchAfter with a FieldDoc): keep only docs strictly
        AFTER the (field-values, docid) cursor in the sort order, then
        take the next k. The cursor must carry concrete (non-null) values,
        like the reference's FieldDoc. The page filter is a lexicographic
        predicate pushed into the scan — no offset materialization."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        cond = F.lit(False)
        eq = F.lit(True)
        order = []
        for (col, reverse, missing_last), av in zip(specs, after_values):
            c = F.col(col)
            gt = (c < F.lit(av)) if reverse else (c > F.lit(av))
            if missing_last:
                # null sorts last: everything null is after any concrete
                # cursor value
                gt = gt | c.isNull()
            cond = cond | (eq & gt)
            eq = eq & (c == F.lit(av))
            if reverse:
                order.append(
                    F.desc_nulls_last(col) if missing_last
                    else F.desc_nulls_first(col)
                )
            else:
                order.append(
                    F.asc_nulls_last(col) if missing_last
                    else F.asc_nulls_first(col)
                )
        cond = cond | (eq & (F.col("docid") > F.lit(int(after_doc))))
        order.append(F.asc("docid"))
        return hits.filter(cond).orderBy(*order).limit(k)

    def facet_ranges(
        self,
        q: Query,
        col: str,
        ranges: list[tuple[str, int, int, bool, bool]],
    ) -> DataFrame:
        """Numeric range facets (Lucene.Net.Facet/Range/
        LongRangeFacetCounts.cs; LongRange.cs accept()): count matching
        docs per range. Ranges may overlap — a doc counts once in every
        range accepting it; min/max bounds are each inclusive or exclusive
        per range. One conditional-sum aggregate over the hits (a single
        map-side-combined pass), never one rescan per range.
        ranges: (label, lo, hi, min_inclusive, max_inclusive).

        Float bounds give DoubleRangeFacetCounts (Facet/Range/
        DoubleRangeFacetCounts.cs) semantics: col may be any numeric hit
        column including 'score' — the reference's DoubleValuesSource
        over scores — and the comparisons promote to double exactly like
        DoubleRange.accept()."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        aggs = []
        for i, (_label, lo, hi, min_incl, max_incl) in enumerate(ranges):
            c = F.col(col)
            pred = (c >= F.lit(lo)) if min_incl else (c > F.lit(lo))
            pred = pred & ((c <= F.lit(hi)) if max_incl else (c < F.lit(hi)))
            aggs.append(
                F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"_r{i}")
            )
        row = hits.agg(*aggs)
        pairs = ", ".join(
            f"'{label}', _r{i}" for i, (label, *_rest) in enumerate(ranges)
        )
        return row.selectExpr(f"stack({len(ranges)}, {pairs}) AS (label, n)")

    def diversified_top_k(
        self, q: Query, key_col: str, max_per_key: int, k: int = 10
    ) -> DataFrame:
        """DiversifiedTopDocsCollector (Lucene.Net.Misc/Search/
        DiversifiedTopDocsCollector.cs): global top-k with at most
        max_per_key hits per key. Equivalent set form of the reference's
        streaming queue: the globally best k — by the collector's total
        order (score desc, docid asc) — among hits that sit within their
        own key's top max_per_key; a hit outside its key's top cap can
        never survive the per-key eviction, and the global queue's min
        never decreases, so skipped hits never re-enter."""
        hits = self.fetch(self.scores(q), self._hits_bound(q)).select(
            F.col(key_col).alias("key"), "docid", "score"
        )
        win = Window.partitionBy("key").orderBy(F.desc("score"), F.asc("docid"))
        return (
            hits.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") <= max_per_key)
            .drop("_rk")
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    # -- Expressions module (Lucene.Net.Expressions) --------------------------
    def _expression_col(self, expr_src: str, extra: dict | None = None):
        """Compile a JS expression against SimpleBindings-style defaults:
        _score -> the hit's score (ScoreValueSource), any numeric doc
        column -> its double value (SortField binding). Unknown names
        raise, like SimpleBindings.GetValueSource."""
        from ..plans.expressions import compile_expression

        numeric = {
            f.name
            for f in self.docs().schema.fields
            if f.dataType.typeName()
            in ("integer", "long", "short", "double", "float")
        }

        def resolve(name: str):
            if extra and name in extra:
                return extra[name]
            if name == "_score":
                return F.col("score").cast("double")
            if name in numeric:
                return F.col(name).cast("double")
            raise ValueError(f"unbound expression variable {name!r}")

        return compile_expression(expr_src, resolve)

    def expression_sort(
        self, q: Query, expr_src: str, k: int = 10, reverse: bool = True
    ) -> DataFrame:
        """ExpressionSortField / ExpressionComparator
        (Lucene.Net.Expressions/ExpressionSortField.cs): sort matches by a
        compiled JavaScript expression over doc values and _score; double
        compare, docid asc tie-break. Output (docid, sortval)."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        out = hits.withColumn("sortval", self._expression_col(expr_src))
        order = F.desc("sortval") if reverse else F.asc("sortval")
        return out.select("docid", "sortval").orderBy(
            order, F.asc("docid")
        ).limit(k)

    def expression_rescore(
        self, q: Query, expr_src: str, n: int = 20, k: int = 10
    ) -> DataFrame:
        """ExpressionRescorer (Expressions/ExpressionRescorer.cs — a
        SortRescorer over the reverse expression sort): re-rank the top-n
        hits of the original ranking by the expression, _score bound to
        the first-pass score. Output (docid, sortval) for the top k."""
        top = self.search(q, n).select("docid", "score")
        hits = self.fetch(top, n)
        out = hits.withColumn("sortval", self._expression_col(expr_src))
        return out.select("docid", "sortval").orderBy(
            F.desc("sortval"), F.asc("docid")
        ).limit(k)

    def all_groups(self, q: Query, group_col: str = "conv_id") -> DataFrame:
        """TermAllGroupsCollector (Lucene.Net.Grouping/Term/
        TermAllGroupsCollector.cs): the distinct set of group values among
        matching docs. A doc with no group value (ord -1) contributes the
        null group, so nulls survive the distinct. Output: (grp) asc,
        nulls first (the reference returns an unordered set; the order
        here is just a stable presentation)."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        return (
            hits.select(F.col(group_col).alias("grp"))
            .distinct()
            .orderBy(F.asc_nulls_first("grp"))
        )

    def group_heads(
        self,
        q: Query,
        group_col: str,
        specs: list[tuple[str, bool, bool]],
    ) -> DataFrame:
        """TermAllGroupHeadsCollector (Lucene.Net.Grouping/Term/
        TermAllGroupHeadsCollector.cs): for EVERY group the single head doc
        under sortWithinGroup. The collector replaces a head only when the
        candidate compares strictly before it, and docs arrive in docid
        order — so equal sort values keep the earliest doc: docid asc is
        the implicit final tie-break. specs are (col, reverse,
        missing_last) like sort_by_fields. Output: (grp, docid) ordered by
        group."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        order = []
        for col, reverse, missing_last in specs:
            if reverse:
                order.append(
                    F.desc_nulls_last(col) if missing_last
                    else F.desc_nulls_first(col)
                )
            else:
                order.append(
                    F.asc_nulls_last(col) if missing_last
                    else F.asc_nulls_first(col)
                )
        order.append(F.asc("docid"))
        win = Window.partitionBy(group_col).orderBy(*order)
        return (
            hits.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") == 1)
            .select(F.col(group_col).alias("grp"), "docid")
            .orderBy(F.asc_nulls_first("grp"))
        )

    def distinct_values(
        self, q: Query, group_col: str, count_col: str
    ) -> DataFrame:
        """TermDistinctValuesCollector (Lucene.Net.Grouping/Term/
        TermDistinctValuesCollector.cs): per group, how many DISTINCT
        count-field values its matching docs carry. A doc with no count
        value adds null to the unique set (the countOrd == -1 arm), so a
        group with any missing value counts one extra. Output:
        (grp, n_values) ordered by group."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        c = F.col(count_col)
        return (
            hits.groupBy(F.col(group_col).alias("grp"))
            .agg(
                (
                    F.countDistinct(c)
                    + F.max(F.when(c.isNull(), 1).otherwise(0))
                )
                .cast("long")
                .alias("n_values")
            )
            .orderBy(F.asc_nulls_first("grp"))
        )

    def grouped_facets(
        self, q: Query, group_col: str, facet_col: str
    ) -> DataFrame:
        """TermGroupFacetCollector (Lucene.Net.Grouping/Term/
        TermGroupFacetCollector.cs): facet counts where each GROUP counts
        at most once per facet value — per value, the number of distinct
        groups having at least one matching doc carrying it. Docs without
        the facet value contribute their group to the missing count: the
        NULL-value row here. Output (value, n_groups), value asc with the
        missing row first."""
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        return (
            hits.groupBy(F.col(facet_col).alias("value"))
            .agg(F.countDistinct(group_col).cast("long").alias("n_groups"))
            .orderBy(F.asc_nulls_first("value"))
        )

    def sort_by_sorted_set(
        self,
        q: Query,
        set_expr: str,
        selector: str = "min",
        k: int = 10,
        reverse: bool = False,
        missing_last: bool = False,
    ) -> DataFrame:
        """SortedSetSortField (Lucene.Net.Sandbox/Queries/
        SortedSetSortField.cs): sort matches by a per-doc representative
        of the multi-valued field's SORTED DISTINCT value set. Selectors:
        min, max, middle_min (lower middle of an even set), middle_max
        (upper middle). An empty set is the missing value, placed first
        or last like SortField.SetMissingValue. docid asc tie-break.
        set_expr is a SQL array<string> expression over the docs view
        (SortedSetDocValues as a derived column). Output (docid, sortkey)."""
        if selector not in ("min", "max", "middle_min", "middle_max"):
            raise ValueError(f"unknown selector {selector!r}")
        hits = self.fetch(self.scores(q), self._hits_bound(q))
        s = F.array_sort(F.array_distinct(F.expr(set_expr)))
        n = F.size(s)
        idx = {
            "min": F.lit(1),
            "max": n,
            "middle_min": ((n + 1) / 2).cast("int"),
            "middle_max": (n / 2).cast("int") + 1,
        }[selector]
        key = F.when(n > 0, F.element_at(s, idx))
        out = hits.withColumn("sortkey", key)
        if reverse:
            order = (
                F.desc_nulls_last("sortkey") if missing_last
                else F.desc_nulls_first("sortkey")
            )
        else:
            order = (
                F.asc_nulls_last("sortkey") if missing_last
                else F.asc_nulls_first("sortkey")
            )
        return out.select("docid", "sortkey").orderBy(
            order, F.asc("docid")
        ).limit(k)

    def facet_sum_value(self, q: Query, facet_col: str = "role") -> DataFrame:
        """TaxonomyFacetSumValueSource (Lucene.Net.Facet/Taxonomy/
        TaxonomyFacetSumValueSource.cs) with the score value source: per
        facet value, the float32 sum of matching docs' scores, accumulated
        in docid order — exactly the collector's values[ord] += value walk
        over docs. Unlabeled (null) docs contribute nothing. The fold
        reuses the bounded flat/segmented machinery of _fold_from_hits so
        a hot facet value never materializes one unbounded aggregation
        row. Output: (value, sum_score) ordered by value."""
        bound = self._hits_bound(q)
        hits = (
            self.fetch(self.scores(q), bound)
            .select(F.col(facet_col).alias("value"), "docid", "score")
            .filter(F.col("value").isNotNull())
        )
        folded = self._fold_from_hits(hits, "total", bound, group_col="value")
        return folded.select(
            "value", F.col("jscore").alias("sum_score")
        ).orderBy("value")

    def duplicate_filter(
        self,
        q: Query,
        key_col: str = "conv_id",
        keep: str = "last",
        mode: str = "full",
        k: int = 10,
    ) -> DataFrame:
        """DuplicateFilter (Lucene.Net.Sandbox/Queries/DuplicateFilter.cs):
        restrict matches to one kept occurrence per key.

        keep: KM_USE_FIRST/LAST_OCCURRENCE — the min/max docid among LIVE
        docs carrying the key (CorrectBits/FastBits walk each term's
        postings, which respect acceptDocs, in docid order).
        mode: PM_FULL_VALIDATION ('full') matches ONLY docs that carry the
        field; PM_FAST_INVALIDATION ('fast') starts from the all-set
        bitset and only clears keyed duplicates, so docs WITHOUT the field
        also match. Output: (docid, score) ranked."""
        if keep not in ("first", "last"):
            raise ValueError(f"unknown keep mode {keep!r}")
        if mode not in ("full", "fast"):
            raise ValueError(f"unknown processing mode {mode!r}")
        keyed = self._apply_live_docs(
            self.docs()
            .filter(F.col(key_col).isNotNull())
            .select("docid", F.col(key_col).alias("_k"))
        )
        pick = F.min("docid") if keep == "first" else F.max("docid")
        kept = keyed.groupBy("_k").agg(pick.alias("docid")).select("docid")
        if mode == "fast":
            kept = kept.unionByName(
                self._apply_live_docs(
                    self.docs()
                    .filter(F.col(key_col).isNull())
                    .select("docid")
                )
            )
        out = self.scores(q).join(kept, "docid", "semi")
        return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def to_parent_join(
        self, q: Query, score_mode: str = "max", k: int = 10,
        parent_col: str = "conv_id",
    ) -> DataFrame:
        """Parent/child block join: score CONVERSATIONS by their matching
        turns (Lucene.Net.Join ToParentBlockJoinQuery; a conversation is the
        parent block, its turns the children — exactly the transcript
        shape).

        score_mode (ToParentBlockJoinQuery.ScoreMode):
          max   — parent score = max child score (float32 max)
          total — parent score = f32 fold of child scores in child docid
                  order (the scorer's accumulation order)
          avg   — f32(total / f32(n_children_matched))
        Output: (parent, score, n_hits) ranked score desc, parent asc.
        The child->parent mapping is the docs view's parent_col (a
        broadcast-bounded join when the query's df bounds the hit count)."""
        if score_mode not in ("max", "total", "avg"):
            raise ValueError(f"unknown score_mode {score_mode!r}")
        hits = self.fetch(self.scores(q), self._hits_bound(q)).select(
            F.col(parent_col).alias("parent"), "docid", "score"
        )
        if score_mode == "max":
            agg = hits.groupBy("parent").agg(
                F.max("score").alias("score"), F.count("*").alias("n_hits")
            )
        else:
            # ordered f32 fold over children (docid asc) via sorted collect
            folded = hits.groupBy("parent").agg(
                F.sort_array(F.collect_list(F.struct("docid", "score"))).alias("ch")
            )
            total = F.aggregate(
                F.col("ch"),
                F.lit(0.0).cast("float"),
                lambda acc, x: (acc + x["score"]).cast("float"),
            )
            n = F.size("ch")
            score = (
                total
                if score_mode == "total"
                else (total / n.cast("float")).cast("float")
            )
            agg = folded.select(
                "parent", score.alias("score"), n.cast("long").alias("n_hits")
            )
        return agg.orderBy(F.desc("score"), F.asc("parent")).limit(k)

    def join_terms(
        self, from_query: Query, from_field: str, to_field: str,
        score_mode: str = "none", k: int = 10, boost: float = 1.0,
        docs_df: DataFrame | None = None,
    ) -> DataFrame:
        """Query-time term join (Lucene.Net.Join/JoinUtil.cs
        CreateJoinQuery, tests Lucene.Net.Tests.Join/TestJoinUtil.cs):
        collect the from_field terms of the from-query's hits, then match
        every doc whose to_field carries one of those terms.

        score_mode (JoinUtil ScoreMode):
          none  — constant score = boost (TermsQuery rewrite)
          total — to-doc score = f32 fold of the from-hits' scores for its
                  term, in from-docid order (TermsWithScoreCollector
                  accumulation order)
          max   — float32 max over the term's from-hit scores
          avg   — f32(total / f32(count))
        Fields are the doc-side keyword columns — single-valued string OR
        multi-valued array<string> on either side (the reference's SortedSet
        doc-values path, JoinUtil.cs + TestJoinUtil.cs multi-value cases):
        an array from_field contributes every element as a join term (the
        from-doc's score counted once per DISTINCT term, like the SortedSet
        ords walk); an array to_field matches when ANY element matches
        (scored modes: max over matched elements' term scores would be
        ambiguous in Lucene too — the reference's TermsQuery matches and the
        collector keeps ONE score per to-doc; we keep the max jscore to stay
        deterministic). Null from_field values contribute no term, null
        to_field never matches.

        Spark shape: the per-term score table is <= distinct terms of the
        from side; it broadcasts into the to-side scan only when the
        from-query's Σdf bounds it under MAX_BROADCAST_DOCIDS (else a
        shuffled join — same result). total/avg folds f32 in from-docid
        order (TermsWithScoreCollector.cs accumulation order); above
        JOIN_FLAT_FOLD_MAX from-hits the fold runs segmented (see
        _fold_from_hits) so no single aggregation row holds the from side."""
        if score_mode not in ("none", "total", "max", "avg"):
            raise ValueError(f"unknown score_mode {score_mode!r}")
        # docs_df lets callers join on derived columns (e.g. an
        # array<string> built from stored fields — the SortedSet analogue)
        docs = docs_df if docs_df is not None else self.docs()
        hits = self.scores(from_query)
        from_is_arr = isinstance(docs.schema[from_field].dataType, ArrayType)
        to_is_arr = isinstance(docs.schema[to_field].dataType, ArrayType)
        jfrom = (
            F.explode(F.array_distinct(from_field))
            if from_is_arr
            else F.col(from_field)
        )
        fromv = (
            docs.select("docid", jfrom.alias("jterm"))
            .join(hits, "docid")
            .filter(F.col("jterm").isNotNull())
        )
        bound = self._hits_bound(from_query)
        may_bc = bound is not None and bound <= self.MAX_BROADCAST_DOCIDS
        if to_is_arr:
            # explode the to side once, join on the element, re-group to one
            # row per to-doc (any-element-matches semantics)
            to_side = docs.select(
                "docid", F.explode(to_field).alias("jterm")
            )
        else:
            to_side = docs.select("docid", F.col(to_field).alias("jterm"))
        if score_mode == "none":
            terms = fromv.select("jterm").distinct()
            if may_bc:
                terms = F.broadcast(terms)
            out = to_side.join(terms, "jterm", "left_semi").select(
                "docid",
                F.lit(float(np.float32(boost))).cast("float").alias("score"),
            )
            if to_is_arr:
                out = out.distinct()
        else:
            if score_mode == "max":
                per_term = fromv.groupBy("jterm").agg(
                    F.max("score").alias("jscore")
                )
            else:
                per_term = self._fold_from_hits(fromv, score_mode, bound)
            if may_bc:
                per_term = F.broadcast(per_term)
            out = to_side.join(per_term, "jterm").select(
                "docid", F.col("jscore").alias("score")
            )
            if to_is_arr:
                out = out.groupBy("docid").agg(F.max("score").alias("score"))
        out = self._apply_live_docs(out)
        return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    # Above this many from-hits, total/avg's per-term collect_list of
    # (docid, score) structs is a single-buffer memory cliff: a 3-value
    # from_field puts n/3 structs in ONE aggregation row (r4 verdict weak
    # #3). The segmented fold below bounds level-1 groups at
    # JOIN_FOLD_RANGE docids each.
    JOIN_FLAT_FOLD_MAX = 1 << 20
    JOIN_FOLD_RANGE = 1 << 20

    def _fold_from_hits(
        self,
        fromv: DataFrame,
        score_mode: str,
        bound: int | None,
        group_col: str = "jterm",
    ) -> DataFrame:
        """Per-group f32 fold of hit scores in docid order — the exact
        accumulation order of TermsWithScoreCollector.cs (and of
        TaxonomyFacetSumValueSource's values[ord] += walk, which
        facet_sum_value reuses this for).

        Flat path (from-hit bound known and small): one sorted collect per
        group. Segmented path: level 1 groups (group, docid-range) into
        packed float arrays (<= JOIN_FOLD_RANGE docids each, ranges spread
        across executors); level 2 folds range arrays in range order with
        the accumulator CARRIED across ranges by a nested aggregate —
        bit-identical to the flat fold (proven in test_join_fold), while
        level-2 rows hold 4-byte floats instead of struct rows."""
        if bound is not None and bound <= self.JOIN_FLAT_FOLD_MAX:
            folded = fromv.groupBy(group_col).agg(
                F.sort_array(F.collect_list(F.struct("docid", "score"))).alias("fh")
            )
            total = F.aggregate(
                F.col("fh"),
                F.lit(0.0).cast("float"),
                lambda acc, x: (acc + x["score"]).cast("float"),
            )
            n = F.size("fh")
        else:
            lvl1 = fromv.groupBy(
                group_col,
                F.floor(F.col("docid") / self.JOIN_FOLD_RANGE).alias("rng"),
            ).agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("docid", "score"))),
                    lambda x: x["score"],
                ).alias("scores")
            )
            folded = lvl1.groupBy(group_col).agg(
                F.sort_array(F.collect_list(F.struct("rng", "scores"))).alias("rs")
            )
            total = F.aggregate(
                F.col("rs"),
                F.lit(0.0).cast("float"),
                lambda acc, r: F.aggregate(
                    r["scores"], acc, lambda a, x: (a + x).cast("float")
                ),
            )
            n = F.aggregate(
                F.col("rs"), F.lit(0), lambda a, r: a + F.size(r["scores"])
            )
        score = (
            total
            if score_mode == "total"
            else (total / n.cast("float")).cast("float")
        )
        return folded.select(group_col, score.alias("jscore"))

    def function_score(
        self, value_expr: str, k: int = 10, boost: float = 1.0
    ) -> DataFrame:
        """FunctionQuery (Lucene.Net.Queries/Function/FunctionQuery.cs):
        matches every live doc; score = qWeight * valueSource(doc).
        qWeight follows CreateNormalizedWeight: queryNorm =
        f32(1/sqrt(f32(boost^2))), qWeight = f32(boost * queryNorm) — a
        standalone query's boost cancels through the norm, float32-exactly.
        value_expr is a SQL expression over the docs view's columns (the
        ValueSource: IntFieldSource & friends are just typed columns
        here); it is cast to float like Single-valued field sources."""
        b = np.float32(boost)
        ssq = np.float32(b * b)
        qn = (
            np.float32(np.float64(1.0) / np.sqrt(np.float64(ssq)))
            if ssq > 0
            else np.float32(1.0)
        )
        qw = np.float32(b * qn)
        val = F.expr(value_expr).cast("float")
        out = self.docs().select(
            "docid",
            (F.lit(float(qw)).cast("float") * val).cast("float").alias("score"),
        )
        out = self._apply_live_docs(out)
        return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def custom_score(
        self, sub_query: Query, value_expr: str, k: int = 10
    ) -> DataFrame:
        """CustomScoreQuery (Queries/CustomScoreQuery.cs, default provider
        CustomScoreProvider.CustomScore): score = f32(subQueryScore *
        f32(valueSource(doc))) — single value source, multiplication in
        float32. Docs the sub-query does not match are not matched."""
        sub = self.scores(sub_query)
        vals = self.docs().select(
            "docid", F.expr(value_expr).cast("float").alias("v")
        )
        out = sub.join(vals, "docid").select(
            "docid", (F.col("score") * F.col("v")).cast("float").alias("score")
        )
        return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def boosting(
        self, match_q: Query, context_q: Query, demote: float = 0.5,
        k: int = 10,
    ) -> DataFrame:
        """BoostingQuery (Queries/BoostingQuery.cs) contract: docs matching
        the context query have their match score multiplied by `demote`
        (typically < 1); others score unchanged. The reference implements
        this with a zero-boost SHOULD clause plus a coord override — here
        the equivalent direct multiply (our boolean scorer has coord = 1),
        float32 multiplication."""
        m = self.scores(match_q)
        c = self.scores(context_q).select("docid", F.lit(True).alias("ctx"))
        d32 = F.lit(float(np.float32(demote))).cast("float")
        # no forced broadcast: the context side can match the whole corpus;
        # AQE picks the strategy from runtime sizes
        out = m.join(c, "docid", "left").select(
            "docid",
            F.when(
                F.col("ctx").isNotNull(),
                (F.col("score") * d32).cast("float"),
            )
            .otherwise(F.col("score"))
            .alias("score"),
        )
        return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def rescore(self, q: Query, rescore_q: Query, n: int = 100, k: int = 10) -> DataFrame:
        """QueryRescorer: re-rank top-n of q by q's score + rescore_q's score."""
        first = self.search(q, n).select("docid", F.col("score").alias("first_score"))
        second = self.scores(rescore_q).select("docid", F.col("score").alias("second_score"))
        return (
            first.join(second, "docid", "left")
            .fillna(0.0, subset=["second_score"])
            .select("docid", (F.col("first_score") + F.col("second_score")).alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )


def dl_distance(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (transpositions count 1,
    and a transposed pair may be edited again) — the metric of Lucene's
    FuzzyQuery automata (FuzzyQuery.cs transpositions=true default,
    Util/Automaton/LevenshteinAutomata.cs) and of DuckDB's
    damerau_levenshtein (verified 'ca'->'abc' == 2), so the gate oracle
    matches exactly."""
    la, lb = len(a), len(b)
    maxd = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxd
    for i in range(la + 1):
        d[i + 1][0] = maxd
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxd
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            prev_db = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[k][prev_db] + (i - k - 1) + 1 + (j - prev_db - 1),  # transpose
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _with_dl_edits(terms_df: DataFrame, query: str) -> DataFrame:
    """terms_df(term) -> + edits column: DL distance to `query`, computed in
    an Arrow-batched pandas UDF over the (length-banded) vocab slice — the
    distributed analogue of Lucene's terms-enum automaton intersection."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def edits(s: pd.Series) -> pd.Series:
        return s.map(lambda t: dl_distance(t, query)).astype("int32")

    return terms_df.withColumn("edits", edits(F.col("term")))


def _collect_terms(q: Query) -> list:
    if isinstance(q, (TermQuery, PayloadTermQuery)):
        return [(q.field, q.term)]
    if isinstance(q, PhraseQuery):
        return [(q.field, t) for t in q.terms]
    if isinstance(q, MultiPhraseQuery):
        return [(q.field, t) for arr in q.term_arrays for t in arr]
    if isinstance(q, BooleanQuery):
        out = []
        for c in q.must + q.should:
            out.extend(_collect_terms(c))
        return out
    if isinstance(q, (DisMaxQuery,)):
        out = []
        for c in q.queries:
            out.extend(_collect_terms(c))
        return out
    if isinstance(q, ConstantScoreQuery):
        return _collect_terms(q.query)
    return []
