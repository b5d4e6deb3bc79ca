"""Generalized deduplication + near-duplicate clustering.

The Spark re-expression of the reference's segment-encoding framework
(reference: src/lib/storage/chunk_encoder.hpp:29-62 — encode a value
vector into a deduplicated segment;
src/lib/storage/dictionary_segment/dictionary_encoder.hpp:61-88 — the
dictionary archetype: dedupe values, store dictionary + per-row ids).
Generalized dedup replaces "exact value equality" with "equal base after
a base/deviation split": the base table is the dictionary, per-segment
base fingerprints are the attribute vector, deviations are the payload.

Modules:
- gd:       chunk -> base/deviation transform (pandas UDF + pure oracle)
- exact:    exact content dedup (hash groupBy)
- minhash:  k-shingle MinHash signatures + LSH band keys
- simhash:  64-bit SimHash + hamming-block candidate keys
- cluster:  connected components over candidate edges (DataFrame-iterative)
- suffix:   partition-local suffix-automaton substring pass within clusters
- pipeline: checkpointed stage DAG (resumable)
- metrics:  per-stage, per-partition lineage counters
"""
