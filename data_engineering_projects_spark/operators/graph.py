"""Iterative graph algorithms over edge-list DataFrames.

Extends the CC family (operators/clustering.py) with fixed-point float
iteration — PageRank as the canonical member. The engineering problem
these share is NOT the math, it's (a) keeping every iteration a bounded
set of joins/aggregations on the edge relation (never a driver loop over
rows) and (b) making distributed float accumulation deterministic so the
result is a pure function of the input — the property the DuckDB oracle
replay and any incremental re-run depend on. Determinism comes from
``fold_sum`` (functions/determinism.py): per-destination incoming mass is
summed as a sequential fold over ascending-sorted terms, which both
Spark (``aggregate(array_sort(collect_list(...)))``) and DuckDB
(``SUM(x ORDER BY x)``) evaluate identically.

Scale: each iteration is one equi-join (ranks to edge sources) + one
grouped fold (incoming mass per destination) + one left join back to the
node set — all shuffles keyed on node id, so a large graph partitions by
node and no step is driver-side. For deep iteration counts, truncate
lineage per round (``localCheckpoint``) exactly as the CC operators do;
the contract query's fixed 5 rounds on a schema-bounded node set skips
that. ``fold_sum`` buffers one destination's in-neighbor terms per group
— bounded by in-degree; for social-scale hubs swap the two-level fold
documented in functions/determinism.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import fold_sum
from ..session import free_local_checkpoint

#: Iteration count and damping shared with the contract oracle — the
#: oracle unrolls exactly this many CTE rounds with the same constant.
DEFAULT_PR_ITERS = 5
DAMPING = 0.85

#: Driver bypass bound (the clustering.CC_LOCAL_FINISH_EDGES discipline):
#: when BOTH the node and edge relations fit under this many rows, the
#: fixed-point float iteration runs locally — the graph here is an
#: AGGREGATE (type-transition counts, cluster summaries), bounded by key
#: cardinality², so at 100 TB the distributed work is building it, never
#: iterating over a few-KB relation with per-round scheduler overhead.
LOCAL_ITER_EDGES = 100_000


def _local_pagerank(nodes: DataFrame, node_vals: list, edges: DataFrame,
                    iters: int, damping: float) -> DataFrame:
    """Driver-side replica of :func:`pagerank`'s iteration over COLLECTED
    (already aggregated, driver-bounded) node/edge relations. Bit-identical
    by construction: Python floats are IEEE doubles, each term w·r is the
    same multiply of the same operands, per-destination mass folds from
    0.0 over ascending-sorted terms exactly like ``fold_sum``/the oracle's
    ``SUM(x ORDER BY x)``, and dangling mass is dropped the same way
    (an edge src outside the rank table contributes nothing; m-rows for
    a dst outside the node set are discarded by iterating nodes only).
    ``node_vals`` is the already-collected node column (the caller's
    take() probe doubles as the collection — no second pass over the
    node derivation)."""
    spark = nodes.sparkSession
    edge_rows = [(row["src"], row["dst"], row["w"])
                 for row in edges.collect()]
    n = float(len(node_vals))
    r = {x: 1.0 / n for x in node_vals}
    for _ in range(iters):
        terms: dict = {}
        for s, d, w in edge_rows:
            if s in r:
                terms.setdefault(d, []).append(w * r[s])
        m = {}
        for d, ts in terms.items():
            acc = 0.0
            for t in sorted(ts):
                acc = acc + t
            m[d] = acc
        r = {x: (1.0 - damping) / n + damping * m.get(x, 0.0)
             for x in node_vals}
    t = nodes.schema["node"].dataType.simpleString()
    return spark.createDataFrame(sorted(r.items()),
                                 schema=f"node {t}, r double")


def pagerank(nodes: DataFrame | None, edges: DataFrame,
             iters: int = DEFAULT_PR_ITERS,
             damping: float = DAMPING,
             local_finish_edges: int = LOCAL_ITER_EDGES) -> DataFrame:
    """Fixed-iteration PageRank. ``nodes``: (node); ``edges``:
    (src, dst, w) with w = out-edge weight (rows of a src should sum to
    1; a src absent from ``edges`` is dangling and its mass is dropped,
    not redistributed — documented simplification shared with the
    oracle). Returns (node, r) after exactly ``iters`` rounds from the
    uniform start r0 = 1/N — a deterministic function of the inputs:
    every term ``w·r`` is one IEEE multiply of identical operands on any
    engine, and per-destination sums fold in sorted order.

    ``nodes=None`` (round 17): derive the node set from the
    MATERIALIZED edge checkpoint (distinct src ∪ dst). For a caller
    whose node universe is exactly the edge endpoints — the transition-
    graph shape, where every sequence row contributes both of its
    endpoints to the edge aggregate — this is set-identical to deriving
    nodes from the raw sequence, but reads the few-row checkpoint
    instead of re-running the full upstream derivation (the
    events_pagerank_types node pass re-ran the events window + union +
    distinct per run). Pass an explicit ``nodes`` when the universe
    includes isolated nodes.

    ``local_finish_edges``: when both relations fit this driver bound
    (checked on the materialized edge checkpoint — graphs here are
    aggregates bounded by key cardinality²), the identical iteration
    runs locally via :func:`_local_pagerank`. 0 disables."""
    # truncate lineage ONCE on the loop-invariant relations (the
    # clustering.py discipline): without this every iteration replants
    # the full node/edge derivation subtree into both sides of its join
    # — observed as a 400-node plan re-scanning the source 10× for 5
    # rounds. After truncation each round adds one join + one fold to a
    # linear plan. On a real cluster swap localCheckpoint for
    # fault-tolerant checkpoint(), as documented in clustering.py.
    edges = edges.localCheckpoint()
    if nodes is None:
        nodes = (edges.select(F.col("src").alias("node"))
                 .union(edges.select(F.col("dst").alias("node")))
                 .distinct())
    if local_finish_edges and edges.count() <= local_finish_edges:
        # probe-and-collect in one pass: take(cap+1) either proves the
        # node set exceeds the bound (fall through to the distributed
        # loop) or IS the complete collected node column
        probe = nodes.take(local_finish_edges + 1)
        if len(probe) <= local_finish_edges:
            out = _local_pagerank(nodes, [row["node"] for row in probe],
                                  edges, iters, damping)
            free_local_checkpoint(edges)
            return out
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    base = nodes.crossJoin(F.broadcast(n)).localCheckpoint()
    r = base.select("node", (F.lit(1.0) / F.col("n")).alias("r"))
    for _ in range(iters):
        m = (edges.join(r.select(F.col("node").alias("src"), "r"), "src")
             .select("dst", (F.col("w") * F.col("r")).alias("t"))
             .groupBy("dst").agg(fold_sum(F.col("t")).alias("m")))
        r = (base.join(m, base.node == m.dst, "left")
             .select("node",
                     (F.lit(1.0 - damping) / F.col("n")
                      + F.lit(damping)
                      * F.coalesce(F.col("m"), F.lit(0.0))).alias("r")))
    return r


def pagerank_sql(ev_cte: str, seq_cte: str, iters: int = DEFAULT_PR_ITERS,
                 damping: float = DAMPING) -> str:
    """DuckDB oracle rendering: the identical computation as ``iters``
    unrolled CTE rounds. ``seq_cte`` must yield (src, dst) transition
    rows; weights/ranks derive exactly as in :func:`pagerank`, with the
    per-destination fold as the ordered aggregate ``SUM(x ORDER BY x)``."""
    rounds = []
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        rounds.append(f"""
m{k} AS (SELECT e.dst, SUM(e.w * p.r ORDER BY e.w * p.r) AS m
         FROM w e JOIN {prev} p ON e.src = p.node GROUP BY e.dst),
r{k} AS (SELECT b.node, {1.0 - damping} / b.n + {damping} * COALESCE(m{k}.m, 0.0) AS r
         FROM base b LEFT JOIN m{k} ON m{k}.dst = b.node)""")
    return f"""
WITH ev AS ({ev_cte}),
seq AS ({seq_cte}),
edges AS (SELECT src, dst, COUNT(*) AS cnt FROM seq GROUP BY src, dst),
outdeg AS (SELECT src, SUM(cnt) AS outc FROM edges GROUP BY src),
w AS (SELECT e.src, e.dst, CAST(e.cnt AS DOUBLE) / CAST(o.outc AS DOUBLE) AS w
      FROM edges e JOIN outdeg o ON e.src = o.src),
nodes AS (SELECT DISTINCT src AS node FROM seq
          UNION SELECT DISTINCT dst FROM seq),
base AS (SELECT node, (SELECT CAST(COUNT(*) AS DOUBLE) FROM nodes) AS n
         FROM nodes),
r0 AS (SELECT node, 1.0 / n AS r FROM base),{",".join(rounds)}
"""
