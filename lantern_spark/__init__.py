"""lantern_spark — a PySpark-native vector analytics engine.

A from-scratch re-expression of the capabilities of lanterndata/lantern
(a PostgreSQL HNSW vector extension + Rust CLI toolkit) on Apache Spark:

- vector distance functions as pure Catalyst column expressions
  (reference: lantern_hnsw/src/hnsw.c:296-405)
- exact and approximate top-k nearest-neighbor search and KNN joins
  (reference: lantern_hnsw/src/hnsw/scan.c)
- batch ANN index construction — IVF partition pruning + per-shard
  search replacing the external-index socket protocol
  (reference: lantern_cli/src/external_index/server.rs)
- product / scalar quantization with broadcast codebooks
  (reference: lantern_hnsw/src/hnsw/pqtable.c, lantern_cli/src/pq/)
- BM25 full-text scoring + stemming/tokenization
  (reference: lantern_extras/src/bm25_agg.rs, stemmers.rs)
- weighted multi-vector search (reference: lantern_hnsw/sql/lantern.sql:673-819)
- embedding pipelines, batch + structured-streaming incremental
  (reference: lantern_cli/src/embeddings/)
- index autotune harness (reference: lantern_cli/src/index_autotune/)
- cost-based access-path routing over a persistent index catalog
  (reference: lantern_hnsw/src/hnsw.c:97-209 amcostestimate)
- continuous-job management: submit/status/cancel/resume over
  Structured Streaming (reference: lantern_extras/src/daemon.rs:225-400)
- storage layout: time-partitioned pruned reads, bucketed no-shuffle
  joins, partition-preserving compaction (sources/layout.py)
- LLM-data-pipeline extensions: dedup (exact/minhash-LSH/simhash/
  ngram-jaccard/embedding), similarity search, text analysis,
  multimodal column plumbing with pure-python BMP/WAV codecs
- hamming (packed-bit) indexes in both index families
  (reference: dist_hamming_ops op class, lantern.sql:63-104)
- IVF×graph hybrid: per-cell HNSW graphs over IVF list partitions
  (the SPANN-style 100 TB layout), routed by the cost-based planner
- a SQL surface: the reference's SQL function names registered as
  Catalyst-inlined SQL UDFs (``sqlapi.install_sql_functions``) so
  ``SELECT … ORDER BY l2sq_dist(v, q) LIMIT k`` runs verbatim
  (reference: lantern.sql:12-45)
- training-pipeline completions: exact distributed BPE training +
  encoding (operators/bpe), stupid-backoff n-gram LM perplexity
  filtering (operators/ngram_lm), GPT-3-style 13-gram test-set
  decontamination and Gopher repetition rules (operators/curate,
  operators/textstats), exact-substring span dedup (Lee et al. 2022,
  operators/dedup.exact_substring_dedup), Dolma-style Bloom
  membership sketches for dedup-against-history in constant memory
  (operators/bloomset + the bounded-state streaming twin), OPQ
  learned-rotation product quantization (Ge et al. 2013,
  operators/opq; IVFIndex.build(opq=True)), anisotropic PQ for
  inner-product retrieval (ScaNN, Guo et al. 2020,
  operators/anisotropic), overlapping-token-window document chunking
  with provenance (operators/chunk), one-scan curation drop audits and
  resumable per-stage checkpointed curation (operators/curate), and
  skew-bounded salted first-occurrence dedup (operators/dedup salt=N)
- the crawl front door, complete both directions (sources/warc, r10-r11):
  WET fast path + strict raw-WARC parser (streaming decompression,
  batch + landing-dir streaming twins), HTTP envelope for response
  records (chunked/gzip/deflate/brotli codings, charset sniffing),
  one-scan demux into documents (functions/html C4-tier extraction;
  byte-identical Python-re Arrow fast path, regex_text_extractor)
  and the multimodal media table, CDX capture-index planning
  (read_cdx + IA-canonical SURT keys + range fetch with a pluggable
  object-store opener), streaming distributed WET export with shard
  rolling (write_wet), and link-graph curation priors
  (operators/weburl: html_links → domain_link_graph (host-pair
  aggregated, full-PSL option) → domain_pagerank / seed expansion)

Everything is DataFrame-in / DataFrame-out and designed for 100 TB scale:
no driver-side collection except tiny codebooks/centroids/manifests.
"""

__version__ = "0.1.0"

from lantern_spark.types import Metric, VectorColumnSpec  # noqa: F401
