"""lsearch_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch reimplementation of the *semantics* of
``jacksoncodispoti/lsearch`` (reference at /root/reference, Rust CLI:
scan -> extract content -> boolean term filters -> term-frequency
ranking -> score-sorted output), re-architected Spark-first:

- DataFrames + Catalyst everywhere; vectorized Arrow (pandas) UDFs for
  HTML-strip; JVM-side built-ins for tokenization/normalization/scoring.
- An explicit, persistent inverted index (the reference re-reads content
  per query, reference cli.rs:484-485): term-hash-partitioned posting
  blocks with delta-gap + varint compression, per-term df/cf stats.
- BM25 (k1=1.2, b=0.75) top-k with block-max pruning; deterministic
  tie-break (score DESC, doc_id ASC).

See SURVEY.md for the full blueprint and reference file:line citations.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
