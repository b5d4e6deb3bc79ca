"""Exact all-pairs similarity join via prefix filtering.

The EXACT complement to the MinHash-LSH candidate path (dedup/lsh.py):
every document pair whose distinct-token Jaccard clears a threshold, no
probabilistic recall — the AllPairs/PPJoin family (Bayardo, Ma &
Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007; Xiao et
al., PPJoin, WWW 2008). Use it when the contract is "no missed
near-dup" (decontamination audits, licensing sweeps) and the LSH path
when approximate recall at lower cost is acceptable.

Algorithm (everything pure JVM Column expressions — no Python stage):

1. token sets: distinct whitespace word tokens per doc (the exact-set
   analog of the pipeline's hashed shingles).
2. global rare-first order: tokens sorted by (document frequency, token)
   — prefixes then hold a doc's RAREST tokens, which is what keeps
   candidate buckets small.
3. prefix: the first ``|x| - ceil(t*|x|) + 1`` tokens of each doc under
   that order. Completeness: J(x, y) >= t implies the overlap is at
   least ``ceil(t*|x|)``, and two sets whose overlap is at least a
   cannot have disjoint ``(size - a + 1)``-prefixes under ANY shared
   total order (pigeonhole), so every qualifying pair shares a prefix
   token — the filter has NO false negatives, for any order.
4. candidates: self-join of prefix rows on the token (equi-join under
   AQE; per-token fan-out is df^2 over PREFIX occurrences only, which
   the rare-first order suppresses), plus the size filter
   ``1000*min(sz) >= t*max(sz)``.
5. exact verify: sorted distinct-token arrays per doc, intersection via
   ``array_intersect`` — integer counts, so the surface is engine-exact
   and the driver slot is LIVE-oracled by a DuckDB brute-force twin
   (token equi-join count) that never saw the prefix filter.

Surface (xcorpus conventions): ``(doc_a, doc_b, inter_tokens,
union_tokens, jaccard_pm)`` with the threshold applied by
cross-multiplication — no floats anywhere.

Scale: the token census, prefix window, and joins shuffle on token /
doc id; nothing is all-pairs. The verify join carries each doc's token
array only to the pairs that survived filtering. Skew lives in hot
prefix tokens; the rare-first order keeps stopwords out of prefixes
except for docs that consist of little else, and AQE's skew-join
handles the residue — no silent caps anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def token_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tk): the distinct whitespace-token set per document."""
    return (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), r"\s+")).alias("tk"))
        .filter(F.col("tk") != "")
        .distinct()
    )


def all_pairs_jaccard(
    docs: DataFrame, threshold_pm: int = 600, text_col: str = "text"
) -> DataFrame:
    """Every unordered doc pair with distinct-token Jaccard >=
    ``threshold_pm``/1000, exactly."""
    tok = token_sets(docs, text_col)
    freq = tok.groupBy("tk").agg(F.count("*").alias("df"))
    ranked = tok.join(freq, "tk")
    w = Window.partitionBy("doc_id").orderBy("df", "tk")
    pos = ranked.select(
        "doc_id",
        "tk",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("sz"),
    )
    # prefix length |x| - ceil(t|x|) + 1 with integer ceil (integer div —
    # no float on the path, matching the oracle's // exactly)
    prefix = pos.filter(
        F.col("pos")
        <= F.col("sz") - F.expr(f"({threshold_pm} * sz + 999) div 1000") + 1
    )
    a = prefix.selectExpr("doc_id AS doc_a", "tk", "sz AS sz_a")
    b = prefix.selectExpr("doc_id AS doc_b", "tk", "sz AS sz_b")
    candidates = (
        a.join(b, "tk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.lit(1000) * F.least("sz_a", "sz_b")
            >= F.lit(threshold_pm) * F.greatest("sz_a", "sz_b")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrays = tok.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("tk")).alias("toks"),
        F.count("*").alias("sz"),
    )
    return (
        candidates.join(
            arrays.selectExpr("doc_id AS doc_a", "toks AS ta", "sz AS sa"), "doc_a"
        )
        .join(arrays.selectExpr("doc_id AS doc_b", "toks AS tb", "sz AS sb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).cast("bigint").alias("inter_tokens"),
            (F.col("sa") + F.col("sb")).alias("_szsum"),
        )
        .withColumn("union_tokens", (F.col("_szsum") - F.col("inter_tokens")))
        .filter(F.lit(1000) * F.col("inter_tokens") >= F.lit(threshold_pm) * F.col("union_tokens"))
        .select(
            "doc_a",
            "doc_b",
            "inter_tokens",
            F.col("union_tokens").cast("bigint").alias("union_tokens"),
            F.expr("(1000 * inter_tokens) div union_tokens").alias("jaccard_pm"),
        )
    )


def all_pairs_oracle_sql(threshold_pm: int = 600) -> str:
    """DuckDB brute-force twin over `documents` — token equi-join counts,
    no prefix filter anywhere, so a hash-exact match proves the filter
    lost no pair and invented none."""
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, tk FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tk
    FROM documents
  ) WHERE tk <> ''
), sz AS (
  SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM tok a JOIN tok b ON a.tk = b.tk AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(i AS BIGINT) AS inter_tokens,
       CAST(sa.sz + sb.sz - i AS BIGINT) AS union_tokens,
       CAST((1000 * i) // (sa.sz + sb.sz - i) AS BIGINT) AS jaccard_pm
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE 1000 * i >= {threshold_pm} * (sa.sz + sb.sz - i)
ORDER BY doc_a, doc_b
"""
