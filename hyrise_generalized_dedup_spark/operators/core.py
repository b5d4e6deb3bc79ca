"""Programmatic operator layer — the reference's physical-operator
inventory (SURVEY.md §2) exposed as composable DataFrame functions.

The reference builds PQPs by instantiating operators directly
(`std::make_shared<JoinHash>(...)` -> `op->execute()`; see any test in
/root/reference/src/test/lib/operators/). The Spark-native equivalent is
this module: each function is a thin, documented wrapper that emits the
declarative plan Catalyst compiles — no imperative execution here, by
design. Physical strategy (broadcast vs shuffled hash vs sort-merge,
partial aggregation, TakeOrderedAndProject) is Catalyst + AQE's call,
which supersedes the reference's static preference order
(lqp_translator.cpp:356-372: JoinHash > JoinSortMerge > JoinNestedLoop).

OPERATOR_PARITY is the machine-readable §2 inventory map used by
tests/test_operators.py to assert every reference operator has a live,
exercised Spark counterpart.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

# reference JoinMode (src/lib/types.hpp:207-212) -> Spark join strings
JOIN_MODE = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full_outer": "full_outer",
    "cross": "cross",
    "semi": "left_semi",
    "anti_null_as_false": "left_anti",  # NOT EXISTS
    # anti_null_as_true (NOT IN) needs null-aware semantics: express via
    # SQL `NOT IN (subquery)` so Catalyst plans a null-aware anti join —
    # see plans/relational.py::q_not_in_null_aware
}


def get_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """GetTable (get_table.hpp:13-29): catalog fetch; chunk/column pruning
    = Catalyst partition pruning + column pruning on the lazy scan."""
    from ..sources.tables import load_table

    return load_table(spark, sf_dir, name)


def table_wrapper(spark: SparkSession, rows: Sequence, schema: str) -> DataFrame:
    """TableWrapper (table_wrapper.hpp): literal in-memory table."""
    return spark.createDataFrame(rows, schema)


def table_scan(df: DataFrame, predicate: Column) -> DataFrame:
    """TableScan (table_scan.cpp:374-455). All specialized scan impls
    (ColumnVsValue, ColumnVsColumn, Between, Like, IsNull, expression
    fallback) are one Column predicate here; Catalyst picks pushdown."""
    return df.filter(predicate)


def projection(df: DataFrame, *exprs: Column) -> DataFrame:
    """Projection (projection.cpp): compute expression list."""
    return df.select(*exprs)


def alias(df: DataFrame, *names: str) -> DataFrame:
    """AliasOperator (alias_operator.cpp): rename/reorder output columns."""
    return df.toDF(*names)


def join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list,
    mode: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """JoinHash / JoinSortMerge / JoinNestedLoop (join_hash.cpp,
    join_sort_merge.cpp, join_nested_loop.cpp) — one declarative join;
    equi keys -> hash/SMJ, non-equi residuals -> filtered join or BNLJ,
    exactly the reference's capability matrix without the manual
    operator choice. `broadcast_right` is the explicit small-dim hint."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, JOIN_MODE[mode])


def product(left: DataFrame, right: DataFrame) -> DataFrame:
    """Product (product.hpp:13-18): cartesian product."""
    return left.crossJoin(right)


def aggregate(
    df: DataFrame, group_cols: Sequence[str], *aggs: Column
) -> DataFrame:
    """AggregateHash (aggregate_hash.cpp): hash aggregation; Spark adds
    the partial/final split the single-node reference lacks. Sort-based
    fallback (AggregateSort) is Catalyst's SortAggregate, chosen
    automatically."""
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def sort(df: DataFrame, *order: Column) -> DataFrame:
    """Sort (sort.cpp): stable multi-column sort. Reference semantics put
    NULLs first in BOTH directions (types.hpp:219-221) — callers should
    use asc_nulls_first/desc_nulls_first to match."""
    return df.orderBy(*order)


def limit(df: DataFrame, n: int) -> DataFrame:
    """Limit (limit.hpp:11-15). Sort+Limit fuses to TakeOrderedAndProject."""
    return df.limit(n)


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UnionAll (union_all.cpp): bag union by position."""
    return a.unionAll(b)


def difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """Difference/EXCEPT (difference.hpp:14-16) — unreachable from the
    reference's SQL (lqp_translator.cpp:467-476); first-class here."""
    return a.subtract(b)


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT — planned but unimplemented in the reference
    (lqp_translator.cpp:467-476); built-in here."""
    return a.intersect(b)


def print_table(df: DataFrame, n: int = 20, truncate: bool = True) -> str:
    """Render a table preview as the string df.show() would print
    (reference: Print operator, src/lib/operators/print.cpp — pretty-
    prints a table to a stream). Returned instead of printed so callers
    (and tests) control the stream; drives only the first n rows."""
    return df._show_string(n, 20 if truncate else 0, False)


# Machine-readable §2 parity inventory: reference operator -> (status, where)
OPERATOR_PARITY: dict[str, tuple[str, str]] = {
    "GetTable": ("covered", "operators.get_table / sources.tables.load_table"),
    "TableWrapper": ("covered", "operators.table_wrapper"),
    "Import(csv/tbl/binary)": ("covered", "sources (parquet/csv; binary->parquet)"),
    "Export": ("covered", "DataFrame.write parquet/csv; dedup.pipeline checkpoints"),
    "Print": ("covered", "operators.print_table (df.show renderer, stream-agnostic)"),
    "Projection": ("covered", "operators.projection"),
    "AliasOperator": ("covered", "operators.alias"),
    "TableScan(all impls)": ("covered", "operators.table_scan + plans.relational q6/q_like/q_null_or/q_in_list"),
    "IndexScan": ("superseded", "parquet min-max + partition pruning (no user-visible semantics)"),
    "Validate(MVCC)": ("out-of-scope", "no MVCC in immutable-batch Spark model"),
    "JoinHash": ("covered", "operators.join inner/semi/anti + plans q3/q5/q_join_semi/q_join_anti"),
    "JoinSortMerge": ("covered", "operators.join theta residuals + plans q_theta_join/q_join_full_outer"),
    "JoinNestedLoop": ("covered", "BroadcastNestedLoopJoin via non-equi join"),
    "JoinIndex": ("superseded", "no index structures; hash/SMJ cover semantics"),
    "Product": ("covered", "operators.product + plans q_cross_product"),
    "AggregateHash": ("covered", "operators.aggregate + plans q1/q_agg_*"),
    "AggregateSort": ("covered", "Catalyst SortAggregate (automatic)"),
    "Sort": ("covered", "operators.sort + plans q_sort_multi_nulls_first"),
    "Limit": ("covered", "operators.limit + plans q_topk"),
    "UnionAll": ("covered", "operators.union_all + plans q_union_all"),
    "UnionPositions(OR)": ("superseded", "single Column disjunction, plans q_null_or_scan"),
    "Difference": ("covered", "operators.difference + plans q_except"),
    "Insert/Delete/Update": ("out-of-scope", "append-only result/checkpoint writes per north rule"),
    "CreateTable/View/Drop": ("covered", "spark.catalog temp views (sources.register_views)"),
    "ChunkEncoder/GD": ("covered", "dedup.gd (generalized base/deviation dedup)"),
}
