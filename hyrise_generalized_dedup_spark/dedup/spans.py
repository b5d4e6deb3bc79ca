"""Corpus-level duplicated-span removal — the ExactSubstr transform.

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") remove every span that occurs verbatim more than once in the
training corpus; their released tool builds one giant suffix array. The
reference repo's suffix stage (dedup/suffix.py, after
`/root/reference/src/lib/operators/` scan+join composition patterns)
stops at *reporting* shared-substring edges within near-dup clusters —
this module adds the corpus-wide *rewrite*: find every fixed-length
character window that occurs more than once anywhere in the corpus,
merge overlapping removable windows into maximal spans per document, and
delete those character ranges.

Two surfaces:

- :func:`duplicated_span_stats` — pure-SQL per-document census (window
  counts, merged dup spans, covered chars). Every expression has an
  exact DuckDB twin, so this is the hash-exact driver gate.
- :func:`remove_duplicated_spans` — the scale path: windows are 64-bit
  polynomial rolling hashes over utf-32 code points (8 bytes/window
  through the shuffle instead of an L-char string), census + canonical
  pick via one window function, islands merged per doc, then a single
  Arrow-batched rewrite. Verified against a brute-force substring
  oracle in tests/test_spans.py.

Scale shape at 10^12 files: the gram census is the unavoidable heavy
exchange of any ExactSubstr pass (the single-node tool pays the same in
suffix-array construction); everything after the census is sparse (hits
only). Content crosses a shuffle once — at the final spans-to-docs
join — and the hash stream is 24 bytes/row. Window choice L trades
recall for cost exactly as the paper's 50-token threshold does.

Keep-one policy: with ``keep_one=True`` (default) the globally first
occurrence of each window — min (doc_id, position) — is not *itself*
removable, so one copy of duplicated content survives wherever it is
not also covered by overlapping removable windows; ``keep_one=False``
is the released tool's remove-every-copy behavior.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

_BASE = np.uint64(1000003)  # same polynomial as functions/fingerprint.py

DEFAULT_WINDOW = 40  # chars; the char-domain analog of the 50-token rule


# ---------------------------------------------------------------------------
# SQL census surface (hash-exact vs DuckDB)


def duplicated_span_stats(
    docs: DataFrame,
    window: int = DEFAULT_WINDOW,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document ExactSubstr census: one row per input doc with

    - ``n_windows``     — L-char windows in the doc (0 if len < L),
    - ``n_dup_windows`` — windows whose text occurs >1 time corpus-wide,
    - ``n_dup_spans``   — maximal merged spans of dup-window coverage,
    - ``dup_chars``     — characters covered by those spans,
    - ``max_span_chars``— longest single merged span.

    Pure Column expressions; 1-based ``substring`` positions so the
    DuckDB oracle is the same text. Two windows merge into one span iff
    their [pos, pos+L-1] char ranges touch or overlap."""
    L = int(window)
    base = docs.select(F.col(key_col).alias("doc_id"), F.col(text_col).alias("_t"))
    wins = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.length("_t") >= L,
                F.expr(f"sequence(1, length(_t) - {L - 1})"),
            ).otherwise(F.expr("array()"))
        ).alias("pos"),
        "_t",
    ).select("doc_id", "pos", F.expr(f"substring(_t, pos, {L})").alias("gram"))
    # corpus-wide occurrence count: one exchange on the gram
    flagged = wins.withColumn(
        "dup", F.count("*").over(Window.partitionBy("gram")) > 1
    ).select("doc_id", "pos", "dup")
    counts = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum(F.col("dup").cast("long")).cast("long").alias("n_dup_windows"),
    )
    bypos = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        flagged.where("dup")
        .withColumn("prev", F.lag("pos").over(bypos))
        .withColumn(
            "flag",
            (F.col("prev").isNull() | (F.col("pos") > F.col("prev") + L))
            .cast("long"),
        )
        .withColumn("island", F.sum("flag").over(bypos))
        .groupBy("doc_id", "island")
        .agg((F.max("pos") - F.min("pos") + L).alias("span_chars"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_dup_spans"),
            F.sum("span_chars").cast("long").alias("dup_chars"),
            F.max("span_chars").cast("long").alias("max_span_chars"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        base.select("doc_id")
        .join(counts, "doc_id", "left")
        .join(islands, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", zero).alias("n_windows"),
            F.coalesce("n_dup_windows", zero).alias("n_dup_windows"),
            F.coalesce("n_dup_spans", zero).alias("n_dup_spans"),
            F.coalesce("dup_chars", zero).alias("dup_chars"),
            F.coalesce("max_span_chars", zero).alias("max_span_chars"),
        )
    )


def span_stats_oracle_sql(window: int = DEFAULT_WINDOW) -> str:
    """DuckDB twin of :func:`duplicated_span_stats` over ``documents``."""
    L = int(window)
    return f"""
    WITH wins AS (
      SELECT doc_id, w.pos AS pos, substring(text, w.pos, {L}) AS gram
      FROM (SELECT doc_id, text,
                   unnest(list_transform(
                       generate_series(1, greatest(length(text) - {L - 1}, 0)),
                       i -> struct_pack(pos := i))) AS w
            FROM documents)
    ),
    fl AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY gram) > 1 AS dup
      FROM wins
    ),
    counts AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_windows
      FROM fl GROUP BY doc_id
    ),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                    OR pos > lag(pos) OVER w + {L} THEN 1 ELSE 0 END AS flag
      FROM fl WHERE dup
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    grp AS (
      SELECT doc_id, pos,
             SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, island, MAX(pos) - MIN(pos) + {L} AS span_chars
      FROM grp GROUP BY doc_id, island
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
             CAST(SUM(span_chars) AS BIGINT) AS dup_chars,
             CAST(MAX(span_chars) AS BIGINT) AS max_span_chars
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(c.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(a.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(a.dup_chars, 0) AS BIGINT) AS dup_chars,
           CAST(COALESCE(a.max_span_chars, 0) AS BIGINT) AS max_span_chars
    FROM documents d
    LEFT JOIN counts c ON c.doc_id = d.doc_id
    LEFT JOIN agg a ON a.doc_id = d.doc_id
    """


# ---------------------------------------------------------------------------
# rewrite surface (rolling-hash scale path)


def _window_hashes(text: str, L: int) -> np.ndarray:
    """64-bit polynomial hashes of every L-char window, char domain
    (utf-32 code points, so positions index characters, never split a
    multibyte sequence the way a byte-domain kernel would)."""
    codes = np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(np.uint64)
    n = codes.size - L + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(n, np.uint64)
        for j in range(L):
            h = h * _BASE + codes[j : j + n]
    return h


def window_hash_table(
    docs: DataFrame,
    window: int = DEFAULT_WINDOW,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, pos, h): one int64 hash per L-char window, 0-based
    char positions. 24 bytes/row through the census shuffle — the whole
    point of hashing before exchanging."""
    out_schema = StructType(
        [
            StructField("doc_id", docs.schema[key_col].dataType, False),
            StructField("pos", LongType(), False),
            StructField("h", LongType(), False),
        ]
    )
    L = int(window)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, hs = [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                hh = _window_hashes(text or "", L)
                if hh.size:
                    ids.append(np.full(hh.size, key, dtype=np.int64))
                    poss.append(np.arange(hh.size, dtype=np.int64))
                    hs.append(hh.astype(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "h": np.concatenate(hs),
                    }
                )

    return docs.select(key_col, text_col).mapInPandas(compute, out_schema)


def remove_duplicated_spans(
    docs: DataFrame,
    window: int = DEFAULT_WINDOW,
    keep_one: bool = True,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, clean_text, n_removed_chars, n_dup_spans): every char
    covered by a removable window deleted, remainder concatenated in
    order. Removable = the window's hash occurs >1 time corpus-wide,
    minus (with ``keep_one``) the globally first occurrence per hash.

    Hash collisions (two distinct L-grams with equal 64-bit hash) would
    over-delete; at the paper's scale the expected collision count for
    n windows is n^2/2^65 — negligible, and the brute-force substring
    oracle in tests/test_spans.py would catch a systematic flaw."""
    L = int(window)
    wt = window_hash_table(docs, L, text_col, key_col)
    byh = Window.partitionBy("h")
    flagged = wt.select(
        "doc_id",
        "pos",
        (F.count("*").over(byh) > 1).alias("dup"),
        (F.struct("doc_id", "pos") == F.min(F.struct("doc_id", "pos")).over(byh))
        .alias("is_canon"),
    )
    removable = flagged.where(
        F.col("dup") & (~F.col("is_canon") if keep_one else F.lit(True))
    ).select("doc_id", "pos")
    # a position can be removable through several hashes only on true
    # collisions; dedup anyway so islands see each position once
    removable = removable.distinct()
    bypos = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        removable.withColumn("prev", F.lag("pos").over(bypos))
        .withColumn(
            "flag",
            (F.col("prev").isNull() | (F.col("pos") > F.col("prev") + L))
            .cast("long"),
        )
        .withColumn("island", F.sum("flag").over(bypos))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("start"), (F.max("pos") + L).alias("end"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("start", "end"))).alias("spans")
        )
    )
    joined = docs.select(key_col, text_col).join(
        spans.withColumnRenamed("doc_id", key_col), key_col, "left"
    )
    out_schema = StructType(
        [
            StructField("doc_id", docs.schema[key_col].dataType, False),
            StructField("clean_text", StringType(), True),
            StructField("n_removed_chars", LongType(), False),
            StructField("n_dup_spans", LongType(), False),
        ]
    )

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cleans, removed, nspans = [], [], [], []
            for key, text, sp in zip(pdf[key_col], pdf[text_col], pdf["spans"]):
                text = text or ""
                ids.append(key)
                if sp is None or len(sp) == 0:
                    cleans.append(text)
                    removed.append(0)
                    nspans.append(0)
                    continue
                parts, cursor, cut = [], 0, 0
                for item in sp:
                    s, e = int(item["start"]), int(item["end"])
                    parts.append(text[cursor:s])
                    cut += e - s
                    cursor = e
                parts.append(text[cursor:])
                cleans.append("".join(parts))
                removed.append(cut)
                nspans.append(len(sp))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "clean_text": cleans,
                    "n_removed_chars": removed,
                    "n_dup_spans": nspans,
                }
            )

    return joined.mapInPandas(rewrite, out_schema)
