"""BM25 retrieval (functions/bm25.py) vs plain-Python oracles.

The driver gate (text_bm25_matches, folded into g_ann_dedup) hash-checks
the exact-integer match surface against DuckDB; here the float score and
ranking are checked two ways: (a) BIT-exact against a Python refold that
consumes the JVM's own ln values (every other op is IEEE double in both
runtimes, folded in the same sorted-term order), and (b) within 1e-12
relative of a fully independent math.log recomputation — (a) proves the
pipeline computes exactly the declared formula, (b) proves the formula
itself. Plus ranking, pruning, determinism, and edge-case properties.
"""

from __future__ import annotations

import math
import struct

import pyspark.sql.functions as F
import pytest

from hyrise_generalized_dedup_spark.functions.bm25 import (
    bm25_match_stats,
    bm25_topk,
    doc_tokens,
    probe_queries,
)

_DOCS = [
    (0, "quantum flux capacitor aligns the temporal manifold today"),
    (1, "the cat sat on the mat and the cat ran away"),
    (2, "the dog sat on the rug and the dog ran home"),
    (3, "quantum annealing solves the flux problem in practice"),
    (4, "a plain sentence about nothing in particular at all"),
    (5, "capacitor banks store charge the flux never aligns"),
    (6, ""),  # empty: no postings, dl = 0
    (7, "single"),  # one token
    (8, "the the the the the the the the"),  # tf saturation probe
    (9, "temporal manifold quantum flux capacitor aligns the grid during winter storms maybe"),
]

K1, B = 1.2, 0.75


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id LONG, text STRING")


def _py_tokens():
    return {i: t.strip().lower().split() if t.strip() else [] for i, t in _DOCS}


def _py_model():
    toks = _py_tokens()
    dl = {i: len(w) for i, w in toks.items()}
    tf: dict[tuple[int, str], int] = {}
    for i, w in toks.items():
        for t in w:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len(_DOCS)
    sum_dl = sum(dl.values())
    return toks, dl, tf, df, n, sum_dl


def _py_queries(n_queries=3, n_terms=4):
    toks = _py_tokens()
    return {
        (qid, t)
        for qid, w in toks.items()
        if qid < n_queries
        for t in w[:n_terms]
    }


def test_match_stats_vs_python(spark):
    docs = _docs_df(spark)
    got = {
        (r.query_id, r.doc_id): (r.n_match_terms, r.sum_tf, r.sum_df, r.dl)
        for r in bm25_match_stats(docs, probe_queries(docs, 3, 4)).collect()
    }
    toks, dl, tf, df, _, _ = _py_model()
    want: dict[tuple[int, int], tuple[int, int, int, int]] = {}
    qterms: dict[int, set[str]] = {}
    for qid, t in _py_queries():
        qterms.setdefault(qid, set()).add(t)
    for qid, terms in qterms.items():
        for i, w in toks.items():
            matched = sorted(t for t in terms if (i, t) in tf)
            if matched:
                want[(qid, i)] = (
                    len(matched),
                    sum(tf[(i, t)] for t in matched),
                    sum(df[t] for t in matched),
                    dl[i],
                )
    assert got == want


def _jvm_idf(spark, dfs: set[int], n_docs: int) -> dict[int, float]:
    """The JVM's own ln-based idf for each document frequency — the one
    sub-expression that is not bit-portable recomputed where bm25_topk
    computes it."""
    rows = spark.createDataFrame([(d,) for d in sorted(dfs)], "df LONG").select(
        "df",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        ).alias("idf"),
    ).collect()
    return {r.df: r.idf for r in rows}


def _py_scores(idf_of_df: dict[int, float] | None = None):
    """Refold BM25 in Python floats, contributions in sorted term order.
    With idf_of_df given, every op matches the Spark plan bit-for-bit;
    without it, math.log makes it an independent oracle."""
    toks, dl, tf, df, n, sum_dl = _py_model()
    avgdl = float(sum_dl) / float(n)
    scores: dict[tuple[int, int], float] = {}
    qterms: dict[int, set[str]] = {}
    for qid, t in _py_queries():
        qterms.setdefault(qid, set()).add(t)
    for qid, terms in qterms.items():
        for i in toks:
            matched = sorted(t for t in terms if (i, t) in tf)
            if not matched:
                continue
            acc = 0.0
            for t in matched:
                if idf_of_df is not None:
                    idf = idf_of_df[df[t]]
                else:
                    idf = math.log(1.0 + (float(n) - float(df[t]) + 0.5) / (float(df[t]) + 0.5))
                tf_d = float(tf[(i, t)])
                norm = tf_d + K1 * ((1.0 - B) + B * (float(dl[i]) / avgdl))
                acc = acc + idf * ((tf_d * (K1 + 1.0)) / norm)
            scores[(qid, i)] = acc
    return scores


def _ranked(scores: dict[tuple[int, int], float], k: int = 5):
    out = {}
    byq: dict[int, list[tuple[float, int]]] = {}
    for (qid, i), s in scores.items():
        byq.setdefault(qid, []).append((s, i))
    for qid, lst in byq.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, i) in enumerate(lst[:k], start=1):
            out[(qid, i)] = (rank, s)
    return out


def test_topk_bit_exact_vs_jvm_ln_refold(spark):
    docs = _docs_df(spark)
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in bm25_topk(docs, probe_queries(docs, 3, 4), k=5, k1=K1, b=B).collect()
    }
    _, _, _, df, n, _ = _py_model()
    idf = _jvm_idf(spark, set(df.values()), n)
    want = _ranked(_py_scores({d: idf[d] for d in set(df.values())}), k=5)
    assert set(got) == set(want)
    for key, (rank, score) in want.items():
        g_rank, g_score = got[key]
        assert g_rank == rank, (key, g_rank, rank)
        assert struct.pack("<d", g_score) == struct.pack("<d", score), (
            key, g_score.hex(), score.hex(),
        )


def test_topk_close_to_independent_libm_oracle(spark):
    docs = _docs_df(spark)
    got = {(r.query_id, r.doc_id): r.score for r in
           bm25_topk(docs, probe_queries(docs, 3, 4), k=100, k1=K1, b=B).collect()}
    want = _py_scores(None)
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == pytest.approx(s, rel=1e-12), key


def test_distinctive_query_retrieves_itself_first(spark):
    """Doc 0's probe terms are rare (quantum/flux/capacitor family), so
    BM25 must rank doc 0 itself highest for query 0."""
    docs = _docs_df(spark)
    top = {
        r.query_id: r.doc_id
        for r in bm25_topk(docs, probe_queries(docs, 1, 6), k=1).collect()
    }
    assert top[0] == 0


def test_max_df_frac_prunes_stopword_terms(spark):
    """'the' appears in 7/10 docs; max_df_frac=0.5 must remove it from
    the match surface (and with it every doc whose only overlap with the
    query is 'the')."""
    docs = _docs_df(spark)
    q = probe_queries(docs, 2, 6)  # query 1 starts "the cat sat on the mat"
    full = bm25_match_stats(docs, q).collect()
    pruned = bm25_match_stats(docs, q, max_df_frac=0.5).collect()
    _, _, tf, df, _, _ = _py_model()
    assert any(r.doc_id == 8 and r.query_id == 1 for r in full)  # matches via 'the'
    assert not any(r.doc_id == 8 for r in pruned)  # only-'the' doc drops
    # every surviving (query, doc) sum_df must exclude the pruned term
    cutoff = 0.5 * len(_DOCS)
    kept_terms = {t for t, d in df.items() if d <= cutoff}
    assert all(
        r.sum_df <= sum(df[t] for t in kept_terms) for r in pruned
    )


def test_empty_and_short_docs_are_safe(spark):
    docs = _docs_df(spark)
    toks = {r.doc_id: (r.w, r.dl) for r in doc_tokens(docs).collect()}
    assert toks[6] == ([], 0)
    assert toks[7] == (["single"], 1)
    # the empty doc never appears as a retrieval result
    res = bm25_topk(docs, probe_queries(docs, 3, 4), k=100).collect()
    assert all(r.doc_id != 6 for r in res)


def test_topk_bit_deterministic_across_parallelism(spark):
    docs = _docs_df(spark)
    q = probe_queries(docs, 3, 4)
    a = bm25_topk(docs.repartition(1), q, k=5).collect()
    bres = bm25_topk(docs.repartition(7), q, k=5).collect()
    pack = lambda rows: sorted(
        (r.query_id, r.doc_id, r.rank, struct.pack("<d", r.score)) for r in rows
    )
    assert pack(a) == pack(bres)


def test_driver_slot_vs_duckdb(spark, sf_tiny):
    from hyrise_generalized_dedup_spark.functions.queries import (
        TEXT_ORACLES,
        TEXT_QUERIES,
    )
    from hyrise_generalized_dedup_spark.testing import compare_to_duckdb

    df = TEXT_QUERIES["text_bm25_matches"](spark, sf_tiny)
    ok, msg = compare_to_duckdb(df, TEXT_ORACLES["text_bm25_matches"], sf_tiny)
    assert ok, msg
