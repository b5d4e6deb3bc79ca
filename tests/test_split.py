"""Leakage-safe split assignment (functions/split.py).

Oracle strategy: the bucket/label math is recomputed independently in
pure Python (hashlib md5) and in DuckDB (the committed oracle SQL), and
the structural guarantee — no dup group straddles a split — is asserted
directly on planted duplicate groups and on real pipeline cluster output.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hyrise_generalized_dedup_spark.functions.split import (
    DEFAULT_SALT,
    N_BUCKETS,
    _thresholds,
    assign_split,
    split_bucket,
    split_bucket_oracle_sql,
    split_label_oracle_sql,
)


def _py_bucket(key: str, salt: str = DEFAULT_SALT) -> int:
    h = hashlib.md5((key + "\x1f" + salt).encode()).hexdigest()
    return int(h[:12], 16) % N_BUCKETS


# ---------------------------------------------------------------- thresholds


def test_thresholds_cumulative_and_exact_top():
    t = _thresholds((("train", 0.98), ("val", 0.01), ("test", 0.01)))
    assert t == [("train", 980000), ("val", 990000), ("test", N_BUCKETS)]


@pytest.mark.parametrize(
    "bad",
    [
        (),
        (("train", 0.5),),  # sums to 0.5
        (("a", 0.5), ("a", 0.5)),  # duplicate name
        (("a", 1.5), ("b", -0.5)),  # non-positive fraction
    ],
)
def test_thresholds_rejects_bad_specs(bad):
    with pytest.raises(ValueError):
        _thresholds(bad)


# ------------------------------------------------------------ bucket parity


def test_bucket_matches_pure_python_md5(spark):
    keys = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", split_bucket(F.col("k")).alias("b")).collect()
    }
    for k in keys:
        assert got[k] == _py_bucket(k), k


def test_bucket_oracle_sql_matches_python():
    import duckdb

    sql = split_bucket_oracle_sql("'key-7'")
    assert duckdb.connect().execute(f"SELECT {sql}").fetchone()[0] == _py_bucket(
        "key-7"
    )


def test_label_oracle_sql_matches_spark(spark):
    import duckdb

    con = duckdb.connect()
    splits = (("train", 0.9), ("heldout", 0.1))
    sql = split_label_oracle_sql("k", splits)
    con.execute(
        "CREATE TABLE t AS SELECT 'key-' || CAST(g AS STRING) AS k "
        "FROM generate_series(0, 99) s(g)"
    )
    duck = dict(con.execute(f"SELECT k, {sql} AS split FROM t").fetchall())
    df = spark.createDataFrame([(f"key-{i}",) for i in range(100)], "k string")
    got = {
        r["k"]: r["split"]
        for r in assign_split(df, "k", splits=splits).collect()
    }
    assert got == duck
    assert set(got.values()) == {"train", "heldout"}


# ------------------------------------------------------- structural guards


def test_no_group_straddles_split(spark):
    # 300 groups x 4 members; every member must share its group's label.
    rows = [(g, m) for g in range(300) for m in range(4)]
    df = spark.createDataFrame(rows, "grp int, member int")
    out = assign_split(df, "grp").groupBy("grp").agg(
        F.countDistinct("split").alias("n_labels")
    )
    assert out.agg(F.max("n_labels")).first()[0] == 1


def test_fractions_approximately_honored(spark):
    n = 20000
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    counts = dict(
        assign_split(df, "k", splits=(("train", 0.8), ("val", 0.2)))
        .groupBy("split")
        .count()
        .collect()
    )
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.2) < 0.02


def test_assignment_stable_under_repartitioning(spark):
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    a = dict(assign_split(df.repartition(1), "k").collect())
    b = dict(assign_split(df.repartition(17), "k").collect())
    assert a == b


def test_salt_changes_assignment(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    a = assign_split(df, "k", salt="s1").withColumnRenamed("split", "s_a")
    b = assign_split(df, "k", salt="s2").withColumnRenamed("split", "s_b")
    diff = a.join(b, "k").filter(F.col("s_a") != F.col("s_b")).count()
    assert diff > 0  # different salts re-draw the assignment


def test_cluster_level_split_on_pipeline_schema(spark):
    # The production path: clusters output (doc_key, cluster_id) -> every
    # doc in a near-dup cluster shares the split with its cluster.
    rows = [(f"doc-{i}", i % 40) for i in range(400)]
    clusters = spark.createDataFrame(rows, "doc_key string, cluster_id long")
    out = assign_split(clusters, "cluster_id")
    per_cluster = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n")
    )
    assert per_cluster.agg(F.max("n")).first()[0] == 1
    # and the label is a pure function of cluster_id, auditable offline
    got = {r["cluster_id"]: r["split"] for r in out.collect()}
    thresholds = _thresholds(
        (("train", 0.98), ("val", 0.01), ("test", 0.01))
    )
    for cid, label in got.items():
        b = _py_bucket(str(cid))
        expect = next(name for name, upper in thresholds if b < upper)
        assert label == expect


def test_split_flip_census(spark):
    from hyrise_generalized_dedup_spark.functions.split import split_flip_census

    old = spark.createDataFrame(
        [("a", "train"), ("b", "train"), ("c", "val"), ("gone", "train")],
        "doc_key string, split string",
    )
    new = spark.createDataFrame(
        [("a", "train"), ("b", "val"), ("c", "val"), ("added", "train")],
        "doc_key string, split string",
    )
    got = {
        (r.old_split, r.new_split): r.n
        for r in split_flip_census(old, new).collect()
    }
    assert got == {
        ("train", "train"): 1,   # a stayed
        ("train", "val"): 1,     # b flipped — quarantine
        ("val", "val"): 1,       # c stayed
        ("train", None): 1,      # gone removed
        (None, "train"): 1,      # added
    }


def test_thresholds_property_random_specs():
    """Any valid fraction spec yields strictly increasing thresholds
    ending exactly at N_BUCKETS, with each band within 1 bucket of its
    requested fraction (rounding)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=10_000), min_size=1, max_size=8
        )
    )
    def check(parts):
        total = sum(parts)
        splits = tuple(
            (f"s{i}", p / total) for i, p in enumerate(parts)
        )
        # float residue can make the sum differ from 1 by > 1e-9 only in
        # pathological cases; renormalize the last entry exactly
        residue = 1.0 - sum(f for _, f in splits[:-1])
        if residue <= 0:
            return
        splits = splits[:-1] + ((splits[-1][0], residue),)
        t = _thresholds(splits)
        uppers = [u for _, u in t]
        assert uppers == sorted(set(uppers))  # strictly increasing
        assert uppers[-1] == N_BUCKETS
        lowers = [0] + uppers[:-1]
        for (name, frac), lo, up in zip(splits, lowers, uppers):
            assert abs((up - lo) - frac * N_BUCKETS) <= 1.0 + 1e-6 * N_BUCKETS

    check()
