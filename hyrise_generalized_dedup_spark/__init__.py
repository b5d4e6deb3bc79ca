"""hyrise_generalized_dedup_spark — a PySpark-native analytics + generalized-dedup engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference `AgileCloudLab/hyrise-generalized-dedup` (Hyrise fork; see
/root/repo/SURVEY.md), re-expressed Spark-first:

- relational surface (scans, filters, joins, aggregates, sorts, set ops,
  expressions) = declarative DataFrame / SQL plans optimized by Catalyst
  (`plans/`, `operators/`);
- the generalized-deduplication transform (chunk -> base/deviation split,
  the Spark analog of the reference's segment-encoding framework,
  reference: src/lib/storage/chunk_encoder.hpp:29-62,
  src/lib/storage/dictionary_segment/dictionary_encoder.hpp:61-88) plus
  near-duplicate clustering (MinHash+LSH, SimHash, suffix-array) live in
  `dedup/` as vectorized pandas/Arrow UDFs;
- text analysis / ANN / multimodal plumbing for training-data pipelines in
  `functions/` and `ann/`.

Everything is built for a multi-executor cluster at 100 TB scale (explicit
partitioning, broadcast joins, AQE + salting for skew, no driver-side
loops), tested on local mode.
"""

__version__ = "0.1.0"

from .config import GDConfig  # noqa: F401
from .session import get_spark  # noqa: F401
