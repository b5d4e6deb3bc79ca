"""Leakage-safe train/validation/test split assignment.

The standard pre-training hygiene step AFTER deduplication: when a corpus
is split into train/val/test, near-duplicate documents must not straddle
the boundary, or the held-out split leaks into training and eval numbers
inflate. The guard is structural: the split is assigned to the GROUP (a
dedup cluster id, an exact-dup sha, a repo fork family — any key that
ties duplicates together), never to the row, so every member of a group
lands in the same split by construction.

Scale shape: the group key is already present on each row, so assignment
is a map-only column expression — no shuffle, no state, no Python — and
the decision is a pure function of (key, salt), so it is stable across
runs, cluster sizes, and partitionings. Under incremental corpus growth
the label is exactly as stable as the group key itself: a new member of
an old cluster joins its cluster's split, but if growth RE-KEYS a group
(the pipeline's cluster_id is the min member key, so a cluster that
gains a new minimum, or two clusters that merge, get a new id) that
group re-draws its split — callers who refresh a served corpus should
diff the manifest's split column across increments and quarantine flips
rather than assume immutability.

The bucket hash is md5-based rather than xxhash64 so the exact assignment
is reproducible OUTSIDE Spark bit-for-bit (the driver's DuckDB oracle and
any downstream auditor recompute it from the same two lines of SQL).

Reference scope note: the reference engine (C++ Hyrise fork) has no
corpus-split stage — this module is part of the training-data-pipeline
surface layered on the dedup outputs (SURVEY.md LLM-ops section), the
consumer of `dedup/pipeline.py`'s cluster ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bucket space for split thresholds. 1e6 buckets over a 48-bit hash keeps
# the modulo bias < 2^-28 and lets fractions be specified to 1e-6.
N_BUCKETS = 1_000_000

# Hex digits of the md5 consumed for the bucket: 12 -> 48 bits, exact in
# BIGINT for Spark's conv() and DuckDB's ('0x'||h)::BIGINT alike.
_HEX_DIGITS = 12

# Key/salt separator: a byte that cannot appear in hex or sane salts, so
# (key, salt) -> md5 input is injective.
_SEP = "\x1f"

DEFAULT_SALT = "gd-split-v1"

DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.98),
    ("val", 0.01),
    ("test", 0.01),
)


def split_bucket(key: Column, salt: str = DEFAULT_SALT) -> Column:
    """Deterministic uniform bucket in [0, N_BUCKETS) from a group key."""
    h = F.md5(F.concat(key.cast("string"), F.lit(_SEP + salt)))
    return (
        F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("long") % N_BUCKETS
    )


def split_bucket_oracle_sql(key_sql: str, salt: str = DEFAULT_SALT) -> str:
    """The DuckDB expression computing the identical bucket value —
    committed next to the Spark expression so the pair can't drift."""
    return (
        f"('0x' || substr(md5(CAST({key_sql} AS STRING) || chr(31) || "
        f"'{salt}'), 1, {_HEX_DIGITS}))::BIGINT % {N_BUCKETS}"
    )


def _thresholds(splits: tuple[tuple[str, float], ...]) -> list[tuple[str, int]]:
    """Cumulative integer bucket thresholds; validates the fractions."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    out, cum = [], 0.0
    for name, frac in splits:
        if frac <= 0:
            raise ValueError(f"split {name!r} has non-positive fraction {frac}")
        cum += frac
        out.append((name, round(cum * N_BUCKETS)))
    out[-1] = (out[-1][0], N_BUCKETS)  # absorb float residue exactly
    return out


def split_label(key: Column, splits=DEFAULT_SPLITS, salt: str = DEFAULT_SALT) -> Column:
    """Split name column for a group key: CASE over cumulative thresholds."""
    bucket = split_bucket(key, salt)
    thresholds = _thresholds(tuple(splits))
    if len(thresholds) == 1:
        return F.lit(thresholds[0][0])
    result = None
    for name, upper in thresholds[:-1]:
        cond = bucket < upper
        result = F.when(cond, F.lit(name)) if result is None else result.when(cond, F.lit(name))
    return result.otherwise(F.lit(thresholds[-1][0]))


def split_label_oracle_sql(key_sql: str, splits=DEFAULT_SPLITS, salt: str = DEFAULT_SALT) -> str:
    """DuckDB CASE expression mirroring :func:`split_label` bit-for-bit."""
    bucket = split_bucket_oracle_sql(key_sql, salt)
    thresholds = _thresholds(tuple(splits))
    if len(thresholds) == 1:
        return f"'{thresholds[0][0]}'"
    whens = " ".join(
        f"WHEN {bucket} < {upper} THEN '{name}'"
        for name, upper in thresholds[:-1]
    )
    return f"CASE {whens} ELSE '{thresholds[-1][0]}' END"


def assign_split(
    df: DataFrame,
    group_col: str,
    splits=DEFAULT_SPLITS,
    salt: str = DEFAULT_SALT,
    out_col: str = "split",
) -> DataFrame:
    """Add a group-consistent split column: every row sharing
    ``group_col`` gets the same label, so dup groups never straddle a
    split boundary. Map-only (the key is on the row); deterministic in
    (key, salt) only — stable under repartitioning and parallelism, and
    exactly as stable under incremental growth as the group key is (see
    the module docstring; diff generations with split_flip_census)."""
    return df.withColumn(out_col, split_label(F.col(group_col), splits, salt))


def split_flip_census(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_key",
    split_col: str = "split",
) -> DataFrame:
    """The post-refresh diff from the module docstring: join two manifest
    generations on the doc key and census (old_split, new_split, n).
    Rows with old_split NULL are additions, new_split NULL removals, and
    any off-diagonal non-NULL pair is a re-drawn group to quarantine.
    Census-bounded output (<= (n_splits+1)^2 rows)."""
    o = old.select(F.col(key_col), F.col(split_col).alias("old_split"))
    n = new.select(F.col(key_col), F.col(split_col).alias("new_split"))
    return (
        o.join(n, key_col, "full")
        .groupBy("old_split", "new_split")
        .agg(F.count(F.lit(1)).alias("n"))
    )
