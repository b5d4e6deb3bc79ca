"""ExactSubstr duplicated-span removal (dedup/spans.py) vs brute-force
substring oracles — the corpus-wide rewrite of Lee et al. 2021 that the
suffix stage's edge reports stop short of."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest

from hyrise_generalized_dedup_spark.dedup.spans import (
    DEFAULT_WINDOW,
    duplicated_span_stats,
    remove_duplicated_spans,
    span_stats_oracle_sql,
    window_hash_table,
)

# ---------------------------------------------------------------- oracle ---


def brute_removable(texts: dict[int, str], L: int, keep_one: bool):
    """Positions (0-based) whose L-gram occurs >1 time corpus-wide,
    minus the global-min occurrence per gram when keep_one."""
    occ: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d in sorted(texts):
        t = texts[d]
        for p in range(len(t) - L + 1):
            occ[t[p : p + L]].append((d, p))
    rem: dict[int, set[int]] = defaultdict(set)
    for g, lst in occ.items():
        if len(lst) <= 1:
            continue
        canon = min(lst)
        for d, p in lst:
            if keep_one and (d, p) == canon:
                continue
            rem[d].add(p)
    return rem


def brute_rewrite(texts: dict[int, str], L: int, keep_one: bool):
    rem = brute_removable(texts, L, keep_one)
    out = {}
    for d, t in texts.items():
        cov = np.zeros(len(t), bool)
        for p in rem.get(d, ()):
            cov[p : p + L] = True
        out[d] = "".join(c for c, m in zip(t, cov) if not m)
    return out


def brute_stats(texts: dict[int, str], L: int):
    occ = defaultdict(list)
    for d, t in texts.items():
        for p in range(len(t) - L + 1):
            occ[t[p : p + L]].append((d, p))
    dup_pos = defaultdict(list)
    for g, lst in occ.items():
        if len(lst) > 1:
            for d, p in lst:
                dup_pos[d].append(p)
    stats = {}
    for d, t in texts.items():
        nw = max(len(t) - L + 1, 0)
        ps = sorted(dup_pos.get(d, []))
        spans = []
        for p in ps:
            if spans and p <= spans[-1][1]:  # touch/overlap: [s, e) with e=p+L
                spans[-1][1] = p + L
            else:
                spans.append([p, p + L])
        stats[d] = (
            nw,
            len(ps),
            len(spans),
            sum(e - s for s, e in spans),
            max((e - s for s, e in spans), default=0),
        )
    return stats


def _df(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )


SHARED = "the quick brown fox jumps over the lazy dog again and again!"


def _corpus():
    """Planted: docs 0/1/2 share SHARED verbatim, 3 repeats a block
    internally, 4/5 unique, 6 shorter than the window, 7 empty."""
    rng = np.random.default_rng(7)

    def noise(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    return {
        0: noise(50) + SHARED + noise(40),
        1: noise(30) + SHARED + noise(60),
        2: SHARED + noise(45),
        3: noise(20) + SHARED[:45] + noise(10) + SHARED[:45] + noise(20),
        4: noise(120),
        5: noise(90),
        6: noise(10),
        7: "",
    }


L = 30


# ----------------------------------------------------------------- tests ---


def test_stats_match_brute_force(spark):
    texts = _corpus()
    got = {
        r.doc_id: (
            r.n_windows, r.n_dup_windows, r.n_dup_spans,
            r.dup_chars, r.max_span_chars,
        )
        for r in duplicated_span_stats(_df(spark, texts), window=L).collect()
    }
    assert got == brute_stats(texts, L)


@pytest.mark.parametrize("keep_one", [True, False])
def test_rewrite_matches_brute_force(spark, keep_one):
    texts = _corpus()
    out = remove_duplicated_spans(
        _df(spark, texts), window=L, keep_one=keep_one
    ).collect()
    expected = brute_rewrite(texts, L, keep_one)
    got = {r.doc_id: r.clean_text for r in out}
    assert got == expected
    # bookkeeping columns agree with the text delta
    for r in out:
        assert r.n_removed_chars == len(texts[r.doc_id]) - len(r.clean_text)
    # keep-one retains the canonical copy: global min (doc_id, pos) per
    # gram is doc 0 (lowest id), so doc 0's copy survives; 1/2 lose theirs
    if keep_one:
        assert SHARED in got[0]
        assert SHARED not in got[1] and SHARED not in got[2]
    else:
        assert all(SHARED not in got[d] for d in (0, 1, 2))
    # untouched docs come back verbatim (short, empty, unique)
    for d in (4, 5, 6, 7):
        assert got[d] == texts[d]


def test_rewrite_random_corpus_property(spark):
    """Seeded random corpus built from a tiny alphabet so collisions of
    REAL substrings abound (hash collisions would also surface here)."""
    rng = np.random.default_rng(42)
    texts = {
        d: "".join(chr(97 + c) for c in rng.integers(0, 4, rng.integers(0, 120)))
        for d in range(40)
    }
    Lr = 12
    for keep_one in (True, False):
        got = {
            r.doc_id: r.clean_text
            for r in remove_duplicated_spans(
                _df(spark, texts), window=Lr, keep_one=keep_one
            ).collect()
        }
        assert got == brute_rewrite(texts, Lr, keep_one)


def test_intra_doc_repetition_keep_one(spark):
    """A block repeated within ONE doc: keep_one retains the first
    occurrence's uncovered prefix (overlapping non-canonical windows
    still cover the tail — coverage-based policy, documented)."""
    block = "x" * 10 + "abcdefghijklmnopqrstuvwxyz0123456789" + "y" * 10
    texts = {0: block + "-----" + block}
    got = remove_duplicated_spans(_df(spark, texts), window=20).collect()[0]
    assert got.clean_text == brute_rewrite(texts, 20, True)[0]
    assert got.n_removed_chars > 0


def test_window_hash_table_shape(spark):
    texts = {0: "a" * 45, 1: "b" * 10}
    rows = window_hash_table(_df(spark, texts), window=40).collect()
    # doc 0: 6 windows at pos 0..5, all identical hashes; doc 1: none
    assert sorted((r.doc_id, r.pos) for r in rows) == [(0, p) for p in range(6)]
    assert len({r.h for r in rows}) == 1


def test_stats_oracle_sql_matches_duckdb(spark):
    """The gate pair at driver scale: Spark census vs the DuckDB twin."""
    import duckdb

    from hyrise_generalized_dedup_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    got = (
        duplicated_span_stats(docs, DEFAULT_WINDOW)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(
        "SELECT * FROM (" + span_stats_oracle_sql(DEFAULT_WINDOW) + ") "
        "ORDER BY doc_id"
    ).df()
    assert (got.n_dup_windows > 0).any()  # non-degenerate at driver scale
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
