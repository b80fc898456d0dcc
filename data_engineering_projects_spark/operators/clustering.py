"""Transitive duplicate-group assignment: candidate pairs -> connected
components -> canonical id (the round-1 verdict's top extension gap: MinHash/
Jaccard emit pair lists, but a dedup pipeline must answer "which doc do I
keep" for transitive groups A~B, B~C).

Algorithm: bounded-iteration minimum-label propagation. Every node starts
labeled with its own id; each iteration every node takes the minimum label
among itself and its neighbors. After k iterations a node holds the minimum
id within graph distance k, so any component of diameter <= k is fully
labeled with its global minimum id — the canonical document.

Scale design (100 TB):
- Near-duplicate components are near-cliques (every member pairs with most
  others), so diameters are tiny; a fixed small k converges in practice and
  keeps the operator a *deterministic* function of the pair set — which is
  what lets DuckDB replay it exactly (same k, same joins) for the oracle.
- Each iteration is one equi-join + one min-aggregate on the (small,
  LSH-pruned) pair graph — never on the corpus. Lineage is truncated per
  iteration (localCheckpoint) so the plan stays linear in k instead of
  doubling; on a real cluster swap in ``spark.sparkContext.setCheckpointDir``
  + ``checkpoint()`` for fault-tolerant truncation.
- For adversarial graphs with long chains, the log-diameter alternating
  large-star/small-star contraction (Kiveris et al., "Connected Components
  in MapReduce") is the drop-in upgrade; the fixed-k form is chosen here
  because oracle replay requires a deterministic iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import free_local_checkpoint

#: Iterations used by the contract query and its DuckDB oracle — must match.
DEFAULT_CC_ITERS = 8

#: Small-graph driver finish for star contraction: once the contracted,
#: canonical edge list is at or under this many rows, every remaining
#: O(log d) round is pure scheduler overhead (two tiny shuffles + a count
#: job on a relation of a few thousand rows), so the component labels are
#: finished with a driver-side union-find instead. 100k edges = two longs
#: per row ≈ 1.6 MB collected — a deliberate, conservative bound (the
#: broadcast-threshold discipline: SCALING.md "hot-list" entry). At 100 TB
#: the contraction still runs distributed while the active edge set is
#: large; the finish only replaces the geometric tail, where round count —
#: not data volume — is the cost. Set ``local_finish_edges=0`` to force
#: the fully-distributed loop (stress tooling does, to measure round
#: scaling).
CC_LOCAL_FINISH_EDGES = 100_000


def _local_bounded_min_labels(edges: DataFrame, iters: int) -> DataFrame:
    """Driver-side bypass for :func:`propagate_min_labels`: the SAME
    bounded synchronous relaxation (each round every node takes the min
    of itself and its neighbors' PREVIOUS-round labels, early exit at the
    fixed point), run over the collected directed edge list. Bit-identical
    to the distributed loop by construction — including the bounded-hop
    semantics on graphs whose diameter exceeds ``iters`` (this is NOT a
    full-CC shortcut; the registry oracle replays exactly k joins).
    Output dtype mirrors the input id column so the bypass is invisible
    to callers."""
    return _local_bounded_min_labels_from_pdf(
        edges.sparkSession, edges.toPandas(), iters,
        edges.schema["u"].dataType.simpleString())


def _local_bounded_min_labels_from_pdf(spark, pdf, iters: int,
                                       id_type: str) -> DataFrame:
    """Core of :func:`_local_bounded_min_labels` over an
    already-collected directed edge list (round 12: lets the caller
    probe-collect with one job instead of checkpoint + count +
    toPandas)."""
    nbrs: dict = {}
    for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
        nbrs.setdefault(u, []).append(v)
    labels = {x: x for x in nbrs}
    for _ in range(iters):
        cur = labels
        improved = False
        nxt = {}
        for node, ns in nbrs.items():
            nb_min = min(cur[n] for n in ns)
            lab = nb_min if nb_min < cur[node] else cur[node]
            improved = improved or lab < cur[node]
            nxt[node] = lab
        labels = nxt
        if not improved:
            break
    import pandas as pd
    ids = sorted(labels)
    out = pd.DataFrame({"id": ids, "label": [labels[x] for x in ids]},
                       dtype="int64")
    return spark.createDataFrame(out, schema=f"id {id_type}, label {id_type}")


def propagate_min_labels(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         iters: int = DEFAULT_CC_ITERS,
                         local_finish_edges: int = CC_LOCAL_FINISH_EDGES
                         ) -> DataFrame:
    """(src, dst) undirected pair list -> (id, label) with label = min id
    within ``iters`` hops (= component minimum for diameter <= iters).

    Convergence early-exit: propagation is monotone (labels only ever
    decrease), so an iteration in which no node improves is a fixed point
    — every later iteration is the identity. Stopping there returns
    exactly what ``iters`` full rounds would, which is why the DuckDB
    oracle's fixed-k CTE chain (``min_label_sql``) still replays this
    bit-for-bit: parity holds whenever k >= iterations-to-convergence.
    Near-dup components are near-cliques, so convergence lands in 2-3
    rounds and the exit saves most of the fixed-k join work.

    Each iteration is localCheckpoint'd (eager): that both truncates
    lineage (an un-truncated iteration references the previous labels
    twice, doubling the plan) and materializes the ``__improved`` flag so
    the convergence probe is a scan of the small cached label table, not
    a recompute of the join.

    ``local_finish_edges``: when the directed edge list fits this driver
    bound, the identical bounded relaxation runs locally
    (:func:`_local_bounded_min_labels`) — same labels, same bounded-hop
    semantics, none of the per-round scheduler overhead. 0 disables."""
    half = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = half.union(pairs.select(F.col(dst).alias("u"),
                                    F.col(src).alias("v")))
    if local_finish_edges:
        # small-graph bypass (the connected_components_star discipline):
        # the relaxation rounds on a driver-bounded edge list are fixed
        # scheduler overhead, not data-parallel work — run the identical
        # bounded iteration locally. Probe with ONE capped collect
        # (round 12; previously checkpoint + count + toPandas = three
        # sequential jobs): limit bounds driver memory exactly like the
        # cap itself, and an overflow (big graph) falls through to the
        # distributed loop, whose one extra candidate-generation pass is
        # small next to the loop it runs.
        # Probe the ONE-DIRECTIONAL pair list and mirror in pandas
        # (round 13, twin-stage audit): probing the union materialized
        # the (possibly expensive) pair-generation subtree once per
        # union side — inside the corpus pipeline that was FOUR
        # concurrent 246 KB set exchanges (2 union sides × 2 verify
        # sides) for one probe. Same bound: edges ≤ cap ⇔ pairs ≤ cap/2;
        # the mirrored pandas frame is exactly the edge list the old
        # probe collected.
        probe = half.limit(local_finish_edges // 2 + 1).toPandas()
        if 2 * len(probe) <= local_finish_edges:
            import pandas as pd
            mirrored = pd.concat(
                [probe, probe.rename(columns={"u": "v", "v": "u"})],
                ignore_index=True)[["u", "v"]]
            return _local_bounded_min_labels_from_pdf(
                pairs.sparkSession, mirrored, iters,
                half.schema["u"].dataType.simpleString())
    # materialize once: the loop would otherwise replant the (possibly
    # expensive) candidate-generation subtree into every iteration.
    # Deliberately NOT wrapped in session.sized_shuffle_partitions: an
    # A/B at sf0.1 showed AQE's runtime coalescing already absorbs the
    # small-relation shuffle overhead in batch loops (sizing measured
    # neutral-to-slower); the explicit rule only pays off for streaming
    # state stores, whose partition count AQE cannot touch.
    edges = edges.localCheckpoint()
    labels = (edges.select(F.col("u").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    prev_ck = None
    for _ in range(iters):
        nb = (edges.join(labels.withColumnRenamed("id", "vid"),
                         F.col("v") == F.col("vid"))
              .groupBy(F.col("u").alias("id"))
              .agg(F.min("label").alias("nb_min")))
        upd = (labels.join(nb, "id")
               .select("id",
                       F.least(F.col("label"), F.col("nb_min")).alias("label"),
                       (F.col("nb_min") < F.col("label")).alias("__improved"))
               .localCheckpoint())
        # upd is materialized (eager), so the previous round's checkpoint
        # blocks are now unreachable by any future computation — free them
        # instead of letting them pile up until JVM GC (caps loop storage
        # at ~2 rounds of labels instead of `iters` rounds).
        if prev_ck is not None:
            free_local_checkpoint(prev_ck)
        prev_ck = upd
        labels = upd.drop("__improved")
        if upd.filter(F.col("__improved")).isEmpty():
            break
    if prev_ck is not None:
        # at least one round ran, so the returned labels derive from the
        # last round's checkpoint alone — the edge checkpoint is dead too
        free_local_checkpoint(edges)
    return labels


def _local_min_labels(e: DataFrame) -> DataFrame:
    """Driver-side finish for :func:`connected_components_star`: exact
    union-find over a COLLECTED edge list -> (id, label=component min) for
    every endpoint. Only called on a relation already proven to be at or
    under ``CC_LOCAL_FINISH_EDGES`` rows (caller counts first); the output
    is bit-identical to running the distributed contraction to convergence
    — the same node set (the edge list's endpoints; star rounds preserve
    it) with the same min-id labels (union always roots at the smaller
    id). Returned as an Arrow-built local relation, small enough that
    downstream joins broadcast it."""
    spark = e.sparkSession
    pdf = e.toPandas()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)  # root = component min
    import pandas as pd
    ids = sorted(parent)
    out = pd.DataFrame({"id": ids, "label": [find(x) for x in ids]},
                       dtype="int64")
    return spark.createDataFrame(out)


def connected_components_star(pairs: DataFrame, src: str = "doc_a",
                              dst: str = "doc_b",
                              max_iters: int = 30,
                              stats: dict | None = None,
                              local_finish_edges: int = CC_LOCAL_FINISH_EDGES
                              ) -> DataFrame:
    """Exact connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the log-diameter upgrade over
    :func:`propagate_min_labels` for adversarial long-chain graphs.

    Same interface: (src, dst) pair list -> (id, label) with label = the
    component's minimum id. Unlike the fixed-k propagation (whose oracle
    replays k joins), this converges in O(log d) rounds for diameter d,
    so a 10^6-long chain needs ~20 rounds instead of 10^6. Use it when
    the pair graph's shape is unknown; keep ``propagate_min_labels`` for
    contract queries that need DuckDB-replayable iteration counts.

    Each round:
      large-star: every node u connects its strictly-larger neighbors to
        m(u) = min(neighborhood(u) + {u});
      small-star: keyed by the larger endpoint, every node connects its
        smaller-or-equal neighbors (and itself) to that minimum.
    Both are one groupBy + one equi-join on the (shrinking) edge list;
    localCheckpoint truncates lineage per round. Convergence = the edge
    multiset stopped changing (count + exact anti-join emptiness, checked
    on the materialized round output — no recompute).

    ``stats`` (optional dict) receives ``{"rounds": n, "local_finish":
    bool}`` — the number of DISTRIBUTED contraction rounds executed, and
    whether the bounded driver finish completed the labeling. Used by
    ``tools/stress_scale.py`` (which forces ``local_finish_edges=0``) to
    demonstrate that data growth scales per-round cost, not round count
    (rounds track log(diameter), which replicated data does not change).

    ``local_finish_edges``: once the canonical edge list has at most this
    many rows (checked before every round, including the first), the
    labeling is finished by :func:`_local_min_labels` — an exact,
    bit-identical union-find on the driver — instead of spending O(log d)
    more rounds of fixed scheduler overhead on a few-MB relation. 0
    disables (fully-distributed loop)."""
    e = (pairs.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
         .distinct()
         .localCheckpoint())
    if not e.take(1):
        return e.selectExpr("u AS id", "v AS label")

    def large_star(edges):
        nb = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (nb.groupBy("u")
                .agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", F.col("u")).alias("m")))
        return (nb.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    def small_star(edges):
        # canonical (u > v) orientation: key = larger endpoint
        d = edges.select(F.greatest("u", "v").alias("u"),
                         F.least("u", "v").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        nb_part = (d.join(mins, "u")
                   .select(F.col("v").alias("u"), F.col("m").alias("v")))
        self_part = mins.select("u", F.col("m").alias("v"))
        return (nb_part.union(self_part)
                .filter(F.col("u") != F.col("v"))
                .distinct())

    # carry the previous round's count forward: each round's edge set is
    # already materialized (localCheckpoint), so re-counting the OLD set
    # for the convergence test would spend one whole Spark job per round
    # on a number we computed last round
    prev_n = e.count()
    rounds = 0
    if stats is not None:
        stats["rounds"] = 0
        stats["local_finish"] = False
    while rounds < max_iters:
        if local_finish_edges and prev_n <= local_finish_edges:
            # the contracted graph fits the driver bound: every further
            # round is fixed overhead, not data-parallel work — finish
            # exactly with union-find (bit-identical labels, see
            # _local_min_labels) and free the now-dead edge checkpoint
            labels = _local_min_labels(e)
            free_local_checkpoint(e)
            if stats is not None:
                stats["local_finish"] = True
            return labels
        rounds += 1
        # LAZY checkpoint + full-scan count: the count's job computes the
        # round AND materializes the checkpoint blocks in one pass (a
        # full scan touches every partition, so nothing is left for a
        # second materialization job) — one Spark job per round instead
        # of eager-materialize + count. Only safe with a FULL action:
        # a limit-style probe would checkpoint partial partitions and
        # pay a second job anyway.
        new_e = small_star(large_star(e)).localCheckpoint(eager=False)
        n = new_e.count()
        if stats is not None:
            stats["rounds"] = rounds
        converged = n == prev_n and new_e.exceptAll(e).take(1) == []
        # the convergence probe above was the last reader of the OLD
        # edge set — free its checkpoint blocks before advancing (the
        # propagate_min_labels discipline: storage stays ~2 rounds deep)
        free_local_checkpoint(e)
        e, prev_n = new_e, n
        if converged:
            break
    # converged: every edge is (node, component_min); roots self-label
    return (e.select(F.col("u").alias("id"), F.col("v").alias("label"))
            .union(e.select(F.col("v").alias("id"), F.col("v").alias("label")))
            .distinct())


def min_label_sql(pairs_cte: str, iters: int = DEFAULT_CC_ITERS) -> str:
    """DuckDB rendering of :func:`propagate_min_labels`: expects a CTE named
    ``pairs(doc_a, doc_b)`` to exist; returns the CTE chain ending in
    ``l{iters}(id, label)``."""
    # AS MATERIALIZED: DuckDB inlines CTEs per reference — each l{i} reads
    # l{i-1} twice, so without materialization the plan doubles per
    # iteration (2^iters copies of the candidate-generation subtree).
    parts = [
        """edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs)""",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS label FROM edges)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""l{i} AS MATERIALIZED (
  SELECT n.id, LEAST(n.label, MIN(m.label)) AS label
  FROM l{i - 1} n JOIN edges e ON n.id = e.u JOIN l{i - 1} m ON e.v = m.id
  GROUP BY n.id, n.label)""")
    return pairs_cte + ",\n" + ",\n".join(parts)
