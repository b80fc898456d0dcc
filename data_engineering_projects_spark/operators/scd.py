"""SCD Type-2 dimension maintenance: batch-functional merge of attribute
updates into a versioned dimension.

The reference's warehouse loads overwrite dimension rows in place
(2_Azure/READ.md, 4_Snowflake/READ.md — plain to_sql replace/append),
losing history; ``events_scd2_intervals`` (contract) already *derives*
validity intervals from a full event history. This operator is the
third leg: maintain the versioned dimension INCREMENTALLY — each batch
of updates closes superseded rows and opens new ones — without ever
rescanning the full history.

Semantics (all pure DataFrame ops, one state in → new state out):

- state columns: key, attrs..., ``valid_from``, ``valid_to`` (NULL =
  open), ``is_current``;
- a batch may carry SEVERAL changes per key — rows are sequenced by
  ``eff_col`` and spliced as a mini-history;
- **change suppression**: a batch row whose attrs equal the attrs in
  effect immediately before it (previous batch row, or the dim's open
  row for the first) is dropped — so replaying a batch (at-least-once
  delivery) is a NO-OP, pinned in tests;
- **late updates** (``eff_ts`` ≤ the open row's ``valid_from``) are
  discarded, by policy: splicing into closed history is a rewrite
  migration, not a merge (same policy tier as the dedup caps — the
  semantics are the documented contract, not an accident).

Scale shape: one shuffle each for the batch window, the open-row join
(equi-join on key — broadcastable when the batch is small), and the
union write. Untouched keys' rows pass through unmodified, so with a
partitioned/bucketed dim store only touched partitions rewrite.

MATERIALIZE the returned state between batches (write it to the dim
store, or ``localCheckpoint(eager=True)`` in memory-only flows): the
result plan references the input state several times, so chaining
``scd2_apply`` calls lazily doubles the plan per batch — the iterative-
loop lineage rule (README "checkpoint hygiene") applies to state tables
exactly as it does to loop bodies.

Oracle discipline: the incremental result is property-tested equal to
deriving intervals from the full concatenated history in one shot
(tests/test_scd2.py) — merge-by-batches is algebraically a full
refresh, the ``dbt_model_dag_incremental`` argument applied to SCD2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "scd2_init"]


def scd2_init(updates: DataFrame, key: str, attrs: list[str],
              eff_col: str = "eff_ts") -> DataFrame:
    """Bootstrap a versioned dimension from the first batch."""
    empty = updates.filter(F.lit(False)).select(
        key, *attrs,
        F.col(eff_col).alias("valid_from"),
        F.col(eff_col).alias("valid_to"),
        F.lit(True).alias("is_current"))
    return scd2_apply(empty, updates, key, attrs, eff_col=eff_col)


def scd2_apply(dim: DataFrame, updates: DataFrame, key: str,
               attrs: list[str], eff_col: str = "eff_ts") -> DataFrame:
    """Merge one batch of (key, attrs..., eff_ts) updates into the
    versioned dimension; returns the NEW full state (functional — write
    it wherever the store lives)."""
    open_rows = dim.filter("is_current")
    closed_rows = dim.filter(~F.col("is_current"))

    cur = open_rows.select(
        F.col(key),
        *[F.col(a).alias(f"__cur_{a}") for a in attrs],
        F.col("valid_from").alias("__cur_from"))

    # sequence the batch per key; drop late rows (<= open valid_from)
    up = (updates.select(key, *attrs, F.col(eff_col).alias("__eff"))
          .join(cur, key, "left")
          .filter(F.col("__cur_from").isNull()
                  | (F.col("__eff") > F.col("__cur_from"))))

    w = Window.partitionBy(key).orderBy("__eff")
    # ``__eff`` is non-null by contract, so a NULL lag identifies "first
    # row of the key" unambiguously — a previous row whose ATTR is NULL
    # must not fall back to the dim's open row (null-safe compares
    # treat NULL as a value throughout).
    is_first = F.lag("__eff").over(w).isNull()
    same_as_prev = F.lit(True)
    for a in attrs:
        prev = F.when(is_first, F.col(f"__cur_{a}")) \
                .otherwise(F.lag(a).over(w))
        same_as_prev = same_as_prev & F.col(a).eqNullSafe(prev)
    # first row per key with no current dim row: always a real change
    first_no_cur = is_first & F.col("__cur_from").isNull()
    changes = (up.withColumn("__keep", first_no_cur | ~same_as_prev)
               .filter("__keep"))

    # re-sequence the surviving changes into intervals
    w2 = Window.partitionBy(key).orderBy("__eff")
    seq = (changes
           .withColumn("valid_from", F.col("__eff"))
           .withColumn("valid_to", F.lead("__eff").over(w2))
           .withColumn("is_current", F.col("valid_to").isNull())
           .select(key, *attrs, "valid_from", "valid_to", "is_current"))

    touched = seq.select(key).distinct()
    closing = (open_rows.join(touched, key, "left_semi")
               .alias("o")
               .join(seq.filter(F.col("valid_from").isNotNull())
                     .groupBy(key)
                     .agg(F.min("valid_from").alias("__first")), key)
               .select(key, *attrs, "valid_from",
                       F.col("__first").alias("valid_to"),
                       F.lit(False).alias("is_current")))
    untouched_open = open_rows.join(touched, key, "left_anti")

    return (closed_rows
            .unionByName(untouched_open)
            .unionByName(closing)
            .unionByName(seq))
