"""FK-consistent star-schema subsetting: carve a referentially-intact
fraction of a warehouse for dev/test environments.

Sampling each table independently breaks every join (a 1% orders sample
× 1% lineitem sample keeps ~0.01% of joinable pairs and orphans the
rest). The correct operation is anchored closure: deterministically
sample ONE anchor table's keys, then

1. **downward** (anchor → its descendants via FK edges where the
   restricted table is the parent): children restrict by semi-join on
   the FK — a lineitem row without its sampled order disappears;
2. **upward** (dimensions): every parent keeps the UNION of keys still
   referenced by ALL of its children, computed children-first in
   topological order — so diamonds (nation referenced by both customer
   and supplier) keep every referenced row, and a child NOT reachable
   from the anchor contributes its full reference set (its rows pass
   through unchanged, so its parents must still satisfy them). When
   children reference DIFFERENT parent columns (alternate keys) the
   parent keeps a row if ANY referenced column needs it — row-level OR,
   the only semantics that orphans no child.

The result joins exactly like production data at a fraction of the
size, and ``quality.relationships`` checks pass on it by construction
(pinned in tests).

Scale shape: one deterministic hash filter on the anchor + one
semi-join per FK edge, each an equi-join whose small side is the
restricted/union key set — broadcastable at dev fractions. No collects,
no driver-side key lists.

Reference note: the reference repo ships no sampling/subsetting anywhere
(SURVEY.md §2 — absence); dev environments there re-run full extracts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["FK", "subset_star"]


@dataclass(frozen=True)
class FK:
    """child.child_col references parent.parent_col.

    Single-column edges only. A COMPOSITE key modeled as two edges gets
    per-COLUMN closure — every edge is individually orphan-free in the
    subset (what ``quality.relationships`` checks), but the (c1, c2)
    tuple-level pairing is not modeled: downward, a child row whose
    columns each match some parent row but no single parent row jointly
    is kept anyway. True composite-FK closure needs a tuple-keyed edge
    type; raise here, don't guess, if that is ever the real contract."""
    child: str
    child_col: str
    parent: str
    parent_col: str


def subset_star(tables: dict[str, DataFrame], anchor: str,
                anchor_key: str, fks: list[FK], fraction: float,
                seed: int = 42) -> dict[str, DataFrame]:
    """Return FK-closed subsets of ``tables`` anchored on a
    deterministic ``fraction`` of ``anchor``'s keys (md5_hash64 bucket —
    same seed, same subset, any cluster AND any engine: round 13
    switched the bucket hash from Spark-private xxhash64 to the repo's
    shared cross-engine hash so the whole closure replays in the DuckDB
    oracle, graduating this operator to a driver row). Tables not named
    in any FK edge pass through unchanged. Raises on a cycle among
    parent tables (a snowflake schema is a DAG; cycles need manual
    cuts)."""
    from ..functions.text import md5_hash64

    out = dict(tables)
    out[anchor] = tables[anchor].filter(
        F.pmod(md5_hash64(F.col(anchor_key).cast("string"), seed=seed),
               F.lit(10_000))
        < F.lit(int(round(fraction * 10_000))))

    # 1. downward: restrict the anchor's descendants. Two subtleties a
    # naive BFS gets wrong (both found in review):
    # - a child with TWO restricted parents (lineitem under both orders
    #   and supplier when the anchor sits above a diamond) must
    #   semi-join against BOTH — the subset is the intersection;
    # - a child must restrict against its parents' FINAL subsets, so
    #   edges apply in topological order (a parent that would tighten
    #   later must tighten first, or the child captures the stale frame).
    down = {anchor}
    changed = True
    while changed:  # graph-only reachability, no DataFrame work
        changed = False
        for fk in fks:
            if fk.parent in down and fk.child not in down:
                down.add(fk.child)
                changed = True
    pending = set(down)
    while pending:
        ready = [t for t in sorted(pending)
                 if not any(fk.child == t and fk.parent in pending
                            for fk in fks)]
        if not ready:
            raise ValueError(
                f"cycle among descendant tables: {sorted(pending)}")
        for t in ready:
            for fk in fks:
                if fk.child == t and fk.parent in down:
                    keys = (out[fk.parent]
                            .select(F.col(fk.parent_col)
                                     .alias(fk.child_col))
                            .distinct())
                    out[t] = out[t].join(keys, fk.child_col, "left_semi")
        pending -= set(ready)

    # 2. upward: parents keep the union of ALL children's referenced
    # keys, children-first (a parent whose child is itself a pending
    # parent waits for that child's restriction)
    remaining = {fk.parent for fk in fks if fk.parent not in down}
    while remaining:
        progressed = False
        for p in sorted(remaining):
            kids = [fk for fk in fks if fk.parent == p]
            if any(fk.child in remaining for fk in kids):
                continue  # not ready: a referencing child is pending
            # group edges by the parent column they reference: children
            # pointing at the SAME column union their key sets
            # (review-found: unioning across different parent columns
            # raised an opaque unionByName AnalysisException). A parent
            # referenced via several columns (alternate keys) keeps a
            # row if ANY referenced column needs it — row-level OR, the
            # only semantics that leaves no child orphaned (a row needed
            # only through `alt` must survive even when its `pk` is
            # unreferenced); intersection would orphan the alt-key
            # child. Single-column parents (the common case) keep the
            # plain left_semi plan.
            by_col: dict[str, list[FK]] = {}
            for fk in kids:
                by_col.setdefault(fk.parent_col, []).append(fk)
            key_sets = {}
            for pcol in sorted(by_col):
                keys = None
                for fk in by_col[pcol]:
                    kk = out[fk.child].select(
                        F.col(fk.child_col).alias(pcol))
                    keys = kk if keys is None else keys.unionByName(kk)
                key_sets[pcol] = keys.distinct()
            if len(key_sets) == 1:
                (pcol, keys), = key_sets.items()
                out[p] = out[p].join(keys, pcol, "left_semi")
            else:
                # one left join per distinct-key set (no row
                # multiplication), keep rows matched by ANY column
                df, cond = out[p], F.lit(False)
                for i, (pcol, keys) in enumerate(sorted(key_sets.items())):
                    kc = f"__subset_k{i}"
                    df = df.join(
                        keys.select(F.col(pcol).alias(kc)),
                        df[pcol] == F.col(kc), "left")
                    cond = cond | F.col(kc).isNotNull()
                out[p] = df.filter(cond).drop(
                    *[f"__subset_k{i}" for i in range(len(key_sets))])
            remaining.discard(p)
            progressed = True
        if not progressed:
            raise ValueError(
                f"cycle among parent tables: {sorted(remaining)}")
    return out
