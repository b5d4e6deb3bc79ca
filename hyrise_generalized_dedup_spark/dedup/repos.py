"""Repo-level fork detection over file-content keys.

File-level dedup (exact sha, normalized sha, MinHash clusters) answers
"which FILES repeat"; a code corpus also needs "which REPOS are copies of
each other" — forks, vendored mirrors, template clones — because public
code pipelines (The Stack, arXiv:2211.15533) deduplicate at repository
granularity before file granularity. This module computes repo-pair
file-set similarity from any per-file key column (raw `content` sha for
byte-level forks, functions/code.normalized_sha for reformatted forks,
or the dedup pipeline's cluster label for near-dup-aware forks).

Scale design (the 10^12-file lens):
- Pair generation keys on the file-content key, NEVER repo x repo: the
  self-join output per key is C(n_repos_with_key, 2), and keys present
  in more than ``max_repos_per_key`` repos (vendored libraries, license
  boilerplate, empty __init__.py) are EXCLUDED by a census pre-filter —
  the same bounded-join rule as the LSH hot-bucket star path
  (dedup/lsh.py), so no key can produce quadratic output. Excluding
  ubiquitous keys is also the semantically right call: sharing jquery
  does not make two repos forks.
- Everything is distinct/groupBy/join on short keys (repo string,
  64-hex sha); file content never enters this stage.
- Repo sizes are counted over the SAME filtered key set as the
  intersections, so the reported Jaccard is exact for the filtered
  universe (a brute-force oracle over the identical rule is byte-equal
  — tests/test_code.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_MAX_REPOS_PER_KEY = 64


def repo_similarity(
    files: DataFrame,
    repo_col: str = "repo",
    key_col: str = "file_key",
    max_repos_per_key: int = DEFAULT_MAX_REPOS_PER_KEY,
) -> DataFrame:
    """Pairwise repo similarity over distinct per-repo file keys.

    Returns (repo_a, repo_b, n_shared, n_a, n_b, jaccard, containment)
    with repo_a < repo_b; only pairs sharing at least one non-ubiquitous
    key appear. ``containment`` = shared / min(|A|, |B|) — the fork
    signal proper (a small fork of a huge monorepo has low Jaccard but
    containment ~1).
    """
    rk = files.select(
        F.col(repo_col).alias("repo"), F.col(key_col).alias("file_key")
    ).distinct()
    census = rk.groupBy("file_key").agg(F.count(F.lit(1)).alias("n_repos"))
    kept = rk.join(
        census.filter(F.col("n_repos") <= max_repos_per_key).select("file_key"),
        "file_key",
    )
    sizes = kept.groupBy("repo").agg(F.count(F.lit(1)).alias("n_keys"))
    a = kept.select(F.col("repo").alias("repo_a"), "file_key")
    b = kept.select(F.col("repo").alias("repo_b"), "file_key")
    shared = (
        a.join(b, "file_key")
        .filter(F.col("repo_a") < F.col("repo_b"))
        .groupBy("repo_a", "repo_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sizes.select(F.col("repo").alias("repo_a"), F.col("n_keys").alias("n_a"))
    zb = sizes.select(F.col("repo").alias("repo_b"), F.col("n_keys").alias("n_b"))
    return (
        shared.join(za, "repo_a")
        .join(zb, "repo_b")
        .select(
            "repo_a",
            "repo_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
            (
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
    )


def fork_candidates(
    similarity: DataFrame,
    min_containment: float = 0.8,
    min_shared: int = 3,
) -> DataFrame:
    """Repo pairs whose file-set containment marks one as a (near-)copy
    of the other. ``min_shared`` suppresses trivial matches between
    tiny repos (2 repos sharing their single file are not a fork
    signal)."""
    return similarity.filter(
        (F.col("containment") >= min_containment)
        & (F.col("n_shared") >= min_shared)
    )


def repo_dedup_manifest(
    files: DataFrame,
    repo_col: str = "repo",
    key_col: str = "file_key",
    max_repos_per_key: int = DEFAULT_MAX_REPOS_PER_KEY,
    min_containment: float = 0.8,
    min_shared: int = 3,
) -> DataFrame:
    """Repository-level dedup decision (The Stack deduplicates at repo
    granularity before file granularity, arXiv:2211.15533 §III): build
    the fork graph from ``fork_candidates``, connect it into repo
    clusters, and elect one keeper per cluster — the repo with the most
    distinct file keys (ties broken by repo name) — so a fork family
    contributes exactly one repository downstream.

    Returns (repo, repo_cluster_id, n_keys, keep) for EVERY repo in
    ``files`` (non-forked repos are singleton keepers). Scale shape:
    the fork graph is orders smaller than the repo table (only fork
    pairs have edges), so connected_components takes its driver
    union-find fast path below the edge budget and the distributed
    min-label path above it; keeper election is one max-struct
    aggregation per cluster, no window over the repo table."""
    from .cluster import connected_components

    sim = repo_similarity(
        files, repo_col=repo_col, key_col=key_col,
        max_repos_per_key=max_repos_per_key,
    )
    forks = fork_candidates(
        sim, min_containment=min_containment, min_shared=min_shared
    )
    rk = files.select(
        F.col(repo_col).alias("repo"), F.col(key_col).alias("file_key")
    ).distinct()
    sizes = rk.groupBy("repo").agg(F.count(F.lit(1)).alias("n_keys"))
    edges = forks.select(
        F.col("repo_a").alias("key_a"), F.col("repo_b").alias("key_b")
    )
    cc = connected_components(edges, nodes=sizes.select("repo"), key_col="repo")
    labeled = sizes.join(cc, "repo").withColumnRenamed(
        "cluster_id", "repo_cluster_id"
    )
    # keeper = max n_keys, tie-break lexicographically-smallest repo name:
    # max_by over a struct(n_keys, negated-name) would need reversible
    # strings, so elect via (max n_keys) then (min repo among maxima)
    best_n = labeled.groupBy("repo_cluster_id").agg(
        F.max("n_keys").alias("best_n")
    )
    keeper = (
        labeled.join(best_n, "repo_cluster_id")
        .filter(F.col("n_keys") == F.col("best_n"))
        .groupBy("repo_cluster_id")
        .agg(F.min("repo").alias("keeper_repo"))
    )
    return labeled.join(keeper, "repo_cluster_id").select(
        "repo",
        "repo_cluster_id",
        F.col("n_keys").cast("long").alias("n_keys"),
        (F.col("repo") == F.col("keeper_repo")).cast("int").alias("keep"),
    )


def repo_content_census(
    files: DataFrame,
    repo_col: str = "repo",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-repository content rollup — the repo-level curation artifact
    a (repo, path, content) corpus serves downstream: how big each repo
    is, how much of it is corpus-wide duplicate content, and whether it
    survives the duplication keep rule.

    Returns one row per repo: ``(repo, n_files, n_dup_files,
    n_canonical, total_chars, total_tokens, census_keep)`` where
    ``n_dup_files`` counts files whose exact content sha appears more
    than once ANYWHERE in the corpus, ``n_canonical`` counts files that
    are the min-doc_id representative of their sha group, and
    ``census_keep`` = 1 when 2*n_dup_files <= n_files (a repo that is
    mostly copies of other content is dropped whole, The-Stack-style
    repo pruning).

    Scale shape: one sha-keyed census groupBy (map-side partial agg, the
    same exchange dedup_exact pays), one corpus-sized join back on sha
    (AQE-planned; the census is distinct-sha-sized), one repo-keyed
    rollup. Content never shuffles — only (sha, ints)."""
    from ..functions.text import token_count

    f = files.select(
        F.col(repo_col).alias("repo"),
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("sha"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    census = f.groupBy("sha").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )
    j = f.join(census, "sha")
    out = j.groupBy("repo").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_files"),
        F.sum(F.when(F.col("doc_id") == F.col("canonical_doc_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_canonical"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    return out.withColumn(
        "census_keep",
        (F.col("n_dup_files") * 2 <= F.col("n_files")).cast("int"),
    )
