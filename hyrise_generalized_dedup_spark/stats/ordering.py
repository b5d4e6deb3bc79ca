"""Cost-based join ordering over the statistics subsystem.

Reference:
- `src/lib/optimizer/join_ordering/greedy_operator_ordering.cpp`
  (GOO: repeatedly join the pair of vertex clusters connected by the
  edge with the lowest estimated output cardinality),
- `src/lib/optimizer/join_ordering/dp_ccp.{hpp,cpp}` (optimal bushy
  join trees without cross products, DP over connected subgraphs —
  Moerkotte & Neumann's DpCcp; re-expressed here as bitmask DP over
  connected/disjoint subset pairs, which enumerates the same csg-cmp
  pairs for the graph sizes we admit),
- `src/lib/cost_estimation/cost_estimator_logical.cpp:18-30`
  (join node cost = left input rows + right input rows + output rows;
  plan cost = sum over nodes),
- `src/lib/statistics/cardinality_estimator.cpp:778-855` (intermediate
  TableStatistics propagation: join-column histogram from the inclusion
  estimate, every other column scaled by its side's selectivity).

The optimizer itself is driver-side search over bounded statistics; the
chosen order is then EXECUTED by Spark (`execute_plan`), where Catalyst
still picks physical strategies (broadcast vs shuffle) — we only decide
the join tree, exactly the part Catalyst's own CBO would need column
histograms for.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

from pyspark.sql import DataFrame

from .estimator import (
    estimate_inner_equi_join_with_histograms,
    scaled,
)
from .table import AttributeStatistics, TableStatistics


@dataclass(frozen=True)
class JoinEdge:
    """Equi-join edge between two named vertices."""

    left_vertex: str
    right_vertex: str
    left_column: str
    right_column: str


# A plan is a nested tuple: ("scan", vertex) |
# ("join", left, right, edge[, residual_edges]) — residual_edges (r6) are
# the OTHER edges connecting the two sides of a cyclic graph, applied as
# post-join filters by execute_plan (4-tuples remain accepted).
Plan = tuple


def join_table_statistics(
    left: TableStatistics,
    right: TableStatistics,
    left_column: str,
    right_column: str,
) -> TableStatistics:
    """`cardinality_estimator.cpp:778-855`: output stats of an inner equi
    join — the joined histogram on the join columns, all other columns
    scaled by their side's selectivity."""
    lh = left.column_statistics.get(left_column, AttributeStatistics(None, 0.0))
    rh = right.column_statistics.get(right_column, AttributeStatistics(None, 0.0))
    joined_hist = None
    if (
        lh.histogram is not None
        and rh.histogram is not None
        and lh.histogram.kind == rh.histogram.kind
        and lh.histogram.kind != "str"
    ):
        joined_hist = estimate_inner_equi_join_with_histograms(
            lh.histogram, rh.histogram
        )
        cardinality = joined_hist.total_count() if joined_hist is not None else 0.0
    else:
        cardinality = left.row_count * right.row_count  # reference fallback

    left_sel = 0.0 if left.row_count == 0 else cardinality / left.row_count
    right_sel = 0.0 if right.row_count == 0 else cardinality / right.row_count

    out: dict[str, AttributeStatistics] = {}
    join_attr = AttributeStatistics(joined_hist, 0.0)
    for name, stats in left.column_statistics.items():
        if name == left_column:
            out[name] = join_attr
        else:
            hist = scaled(stats.histogram, left_sel) if stats.histogram else None
            out[name] = AttributeStatistics(hist, stats.null_value_ratio)
    for name, stats in right.column_statistics.items():
        if name == right_column:
            out.setdefault(name, join_attr)
        elif name not in out:
            hist = scaled(stats.histogram, right_sel) if stats.histogram else None
            out[name] = AttributeStatistics(hist, stats.null_value_ratio)
    return TableStatistics(cardinality, out)


def _join_cost(left_rows: float, right_rows: float, out_rows: float) -> float:
    """`cost_estimator_logical.cpp:26-30`."""
    return left_rows + right_rows + out_rows


class _Search:
    """Shared machinery: vertex bitmasks, per-subset plan + stats."""

    def __init__(self, tables: dict[str, TableStatistics], edges: list[JoinEdge]):
        self.names = sorted(tables)
        self.index = {n: i for i, n in enumerate(self.names)}
        for e in edges:
            if e.left_vertex not in self.index or e.right_vertex not in self.index:
                raise ValueError(f"edge references unknown vertex: {e}")
            if e.left_vertex == e.right_vertex:
                raise ValueError(f"self-edge not supported: {e}")
        self.tables = tables
        self.edges = edges

    def edge_mask(self, e: JoinEdge) -> int:
        return (1 << self.index[e.left_vertex]) | (1 << self.index[e.right_vertex])

    def connecting_edges(self, mask_a: int, mask_b: int) -> list[JoinEdge]:
        out = []
        for e in self.edges:
            la = 1 << self.index[e.left_vertex]
            rb = 1 << self.index[e.right_vertex]
            if (la & mask_a and rb & mask_b) or (la & mask_b and rb & mask_a):
                out.append(e)
        return out

    def joined(
        self, stats_a: TableStatistics, stats_b: TableStatistics, e: JoinEdge,
        mask_a: int,
    ) -> TableStatistics:
        # Orient the edge: its left vertex may live in either cluster.
        if (1 << self.index[e.left_vertex]) & mask_a:
            return join_table_statistics(
                stats_a, stats_b, e.left_column, e.right_column
            )
        return join_table_statistics(stats_a, stats_b, e.right_column, e.left_column)


def greedy_operator_ordering(
    tables: dict[str, TableStatistics], edges: list[JoinEdge]
) -> tuple[Plan, TableStatistics, float]:
    """GOO (`greedy_operator_ordering.cpp`): repeatedly materialize the
    remaining edge whose joined cluster has the LOWEST estimated
    cardinality. Returns (plan, final stats, total logical cost). The
    graph must be connected (the reference's JoinGraph guarantees this
    via cross-join edges; we reject instead of silently crossing)."""
    s = _Search(tables, edges)
    clusters: dict[int, tuple[Plan, TableStatistics]] = {
        1 << i: (("scan", n), tables[n]) for n, i in s.index.items()
    }
    remaining = list(edges)
    total_cost = 0.0
    while len(clusters) > 1:
        best = None
        for e in remaining:
            masks = [m for m in clusters if s.edge_mask(e) & m]
            if len(masks) == 1:
                continue  # both endpoints already in one cluster
            ma, mb = masks[0], masks[1]
            est = s.joined(clusters[ma][1], clusters[mb][1], e, ma)
            if best is None or est.row_count < best[0]:
                best = (est.row_count, e, ma, mb, est)
        if best is None:
            raise ValueError("join graph is disconnected; add connecting edges")
        _, e, ma, mb, est = best
        (plan_a, st_a), (plan_b, st_b) = clusters.pop(ma), clusters.pop(mb)
        total_cost += _join_cost(st_a.row_count, st_b.row_count, est.row_count)
        merged = ma | mb
        # Cyclic graphs: every OTHER remaining edge that connects the two
        # merged clusters becomes internal here — the reference applies
        # ALL predicates between the two sets (greedy_operator_ordering
        # .cpp:144-156 _add_predicates_to_plan); carry them on the plan
        # node as post-join filters instead of silently dropping them
        # (ADVICE r5: a dropped triangle edge returned violating rows).
        residual = [
            x
            for x in remaining
            if x is not e and not (s.edge_mask(x) & ~merged)
        ]
        clusters[merged] = (("join", plan_a, plan_b, e, residual), est)
        # drop edges now internal to the merged cluster
        remaining = [x for x in remaining if s.edge_mask(x) & ~merged]
    (plan, stats), = clusters.values()
    return plan, stats, total_cost


def dp_ccp(
    tables: dict[str, TableStatistics], edges: list[JoinEdge]
) -> tuple[Plan, TableStatistics, float]:
    """Optimal bushy join ordering without cross products (`dp_ccp.cpp`):
    bitmask DP — for every connected subset, the cheapest plan is the
    best combination of two connected, disjoint, edge-connected halves.
    Cost = sum of per-join logical costs (`cost_estimator_logical.cpp`).
    Exponential in vertex count; capped at 12 vertices (the reference
    runs DpCcp for all graphs but its LQPs are similarly small)."""
    s = _Search(tables, edges)
    n = len(s.names)
    if n > 12:
        raise ValueError("dp_ccp capped at 12 vertices; use greedy_operator_ordering")
    best: dict[int, tuple[float, Plan, TableStatistics]] = {}
    for name, i in s.index.items():
        best[1 << i] = (0.0, ("scan", name), tables[name])
    for size in range(2, n + 1):
        for combo in combinations(range(n), size):
            mask = 0
            for i in combo:
                mask |= 1 << i
            # enumerate csg-cmp pairs: proper submasks and their complements
            sub = (mask - 1) & mask
            while sub:
                rest = mask ^ sub
                if sub < rest:  # each unordered pair once
                    pair = (sub, rest)
                else:
                    pair = None
                if pair and pair[0] in best and pair[1] in best:
                    conn = s.connecting_edges(*pair)
                    for e in conn:
                        ca, pa, sta = best[pair[0]]
                        cb, pb, stb = best[pair[1]]
                        est = s.joined(sta, stb, e, pair[0])
                        cost = (
                            ca + cb
                            + _join_cost(sta.row_count, stb.row_count, est.row_count)
                        )
                        if mask not in best or cost < best[mask][0]:
                            # join on e, apply every other edge between the
                            # two halves as a post-join predicate (the
                            # reference's find_join_predicates applies ALL
                            # of them — dp_ccp.cpp:111-114)
                            residual = [x for x in conn if x is not e]
                            best[mask] = (cost, ("join", pa, pb, e, residual), est)
                sub = (sub - 1) & mask
    full = (1 << n) - 1
    if full not in best:
        raise ValueError("join graph is disconnected; add connecting edges")
    cost, plan, stats = best[full]
    return plan, stats, cost


def execute_plan(plan: Plan, frames: dict[str, DataFrame]) -> DataFrame:
    """Materialize the chosen join tree in Spark — the tree fixes the
    logical order; Catalyst still picks broadcast vs shuffle per join.

    Every scan is aliased with its vertex name and every edge column is
    resolved as ``vertex.column`` against its DECLARED vertex (ADVICE r5:
    name-membership lookup picked the wrong side when both subtrees
    carried a same-named column). Join nodes may carry residual edges
    (cycle predicates) applied as post-join filters."""
    import pyspark.sql.functions as F

    def build(p: Plan) -> DataFrame:
        if p[0] == "scan":
            return frames[p[1]].alias(p[1])
        left, right, e = p[1], p[2], p[3]
        residual = p[4] if len(p) > 4 else []
        ldf = build(left)
        rdf = build(right)

        def cond(edge: JoinEdge):
            return F.col(f"{edge.left_vertex}.{edge.left_column}") == F.col(
                f"{edge.right_vertex}.{edge.right_column}"
            )

        out = ldf.join(rdf, cond(e), "inner")
        for x in residual:
            out = out.filter(cond(x))
        return out

    return build(plan)


def plan_order(plan: Plan) -> list[str]:
    """Flatten a plan to its vertex sequence (left-deep reading order)."""
    if plan[0] == "scan":
        return [plan[1]]
    return plan_order(plan[1]) + plan_order(plan[2])
