"""lucenenet_spark — a PySpark-native full-text index + BM25 top-k engine.

A brand-new engine with the query/data-processing capabilities of Lucene.NET 4.8
(reference at /root/reference), re-expressed Spark-first:

- ingestion/tokenization: vectorized Arrow (pandas) UDFs, no per-row Python
- inverted index: parquet-backed tables of delta+varint-encoded 128-doc posting
  blocks with per-block skip/block-max metadata, bucketed by hash(term) with
  explicit salting of skewed hot terms
- query: term/boolean BM25 top-k (k1=1.2, b=0.75), rank- and score-identical to
  Lucene's BM25Similarity float32 semantics; DAAT scoring with block-max pruning
- lifecycle: per-partition checkpointed builds, atomic manifest commit
  (two-phase-commit analogue of IndexWriter.PrepareCommit/Commit), segment merge

Subpackages mirror the build plan in SURVEY.md §7:
  functions/  -- scalar/vectorized kernels (smallfloat, analysis, bm25, text, similarity)
  operators/  -- index build, codec, merge, scoring, top-k, dedup, ANN
  sources/    -- transcripts input, index table store, multimodal binary columns
  plans/      -- query dataclasses + classic query parser + planner
  streaming/  -- NRT incremental indexing (Structured Streaming foreachBatch)
"""

__version__ = "0.1.0"

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
