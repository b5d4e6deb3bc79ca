"""Line-level boilerplate dedup: census + strip-and-reconstruct.

The CCNet / RefinedWeb line-dedup stage for code corpora: a line whose
trimmed form appears in >= `min_docs` distinct documents is corpus
boilerplate (license headers, copyright banners, auto-generated markers,
`} // namespace` noise) and is removed from every document, which is then
reconstructed in original line order. Complements `dedup_paragraphs`
(a census only) with an actual content transform whose output is
value-checkable via the cleaned-content sha256.

Scale shape (the 10^12-file lens):
- the census is one groupBy on the trimmed line key — map-side partial
  aggregation absorbs the hot keys (empty lines are pre-filtered);
- the boilerplate set is census-bounded: at most total_lines/min_docs
  distinct keys can appear in >= min_docs documents, so it shrinks as the
  threshold grows; the strip join is a plain equi-join that AQE converts
  to broadcast when that set is small and skew-splits the hot build-side
  keys when it is not — no collect, no driver loop;
- content crosses exactly two shuffles (key join + per-doc regroup),
  the same bound as the published line-dedup pipelines.

Reference parity: the reference deduplicates fixed-size segments
(src/lib/storage/chunk_encoder analog, see dedup/gd.py); this operator is
the variable-length "natural segment" counterpart the training-data
pipeline needs on top of it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_MIN_DOCS = 5


def split_lines(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode documents into (id, pos, line, key) rows; `key` is the
    trimmed line (the dedup unit), `line` the original text (what gets
    reconstructed). Pure JVM split/posexplode — no Python."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("key", F.trim("line"))


def line_census(
    docs: DataFrame,
    min_docs: int = DEFAULT_MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide census of boilerplate lines: trimmed non-empty lines
    appearing in >= min_docs distinct documents, with document and
    occurrence counts. Output is census-bounded (<= total_lines/min_docs
    rows), so it is safely collectable/joinable at any corpus size."""
    lines = split_lines(docs, id_col, text_col)
    return (
        lines.filter(F.length("key") > 0)
        .groupBy("key")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_common_lines(
    docs: DataFrame,
    min_docs: int = DEFAULT_MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove boilerplate lines (census >= min_docs) from every document
    and reconstruct the remainder in original order. Returns one row per
    input document: line counts plus sha256 of the cleaned content — the
    value-check handle for the whole transform (blank lines are never
    boilerplate, so intra-document structure survives)."""
    lines = split_lines(docs, id_col, text_col)
    common = line_census(docs, min_docs, id_col, text_col).select(
        "key", F.lit(1).alias("_boiler")
    )
    marked = lines.join(common, "key", "left")
    kept = F.col("_boiler").isNull()
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.col("_boiler").isNotNull().cast("long")).alias("n_dropped"),
        F.sha2(
            F.array_join(
                F.transform(
                    # collect_list drops the nulls that non-kept rows
                    # produce; array_sort on (pos, line) restores original
                    # document order before the join shuffled it
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("pos", "line")))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ),
            256,
        ).alias("clean_sha"),
    )
