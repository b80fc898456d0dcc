"""Classic warehouse-analytics shapes (round-5 widening): gaps-and-islands
streaks, the TPC-H Q13/Q15/Q21/Q22 shapes, deterministic per-group mode,
contingency-table residuals, the robust-stats family (winsorized mean,
IQR fences), equi-width histograms, market-basket lift, rolling WAU,
sessionized bounce rate, LTV concentration with exact Gini,
length-weighted sampling, corpus dup-rate/contamination reports, and a
matrix-free power-iteration top eigenvector.

None of these appear verbatim in the reference (its five writeups stop at
grouped rollups + window ranks, e.g. 5_dbt/READ.md:123-133), but every one
is a standard ask of the warehouse the reference feeds — they widen the
engine the same way the dedup/ANN families do (SURVEY.md §6 extensions).

Determinism (contract/__init__ conventions):
- streak/histogram/Q21 queries are pure integer+date arithmetic — exact;
- mode uses a struct-max with an explicit (count, key) tiebreak, mirrored
  in SQL as ROW_NUMBER ordered by the same pair — never bare ``max_by``,
  whose tie choice is engine-private;
- chi-square cells emit PER-CELL expected counts and Pearson residuals
  ((O-E)/sqrt(E): multiply/divide/sqrt are correctly-rounded IEEE ops, so
  bit-exact given identical integer inputs) and deliberately do NOT sum
  the statistic — a float sum over cells would be merge-order-dependent;
- winsorized bounds are rank-based order statistics (actual 2dp data
  values, never interpolated), so the clamped column stays in the exact
  DECIMAL(18,2) domain and the mean is dec_avg's raw quotient.

Scale notes (100 TB):
- every query is keyed-shuffle only: the streak windows and aggregations
  all share the user_id partitioning; Q13 pre-aggregates orders per
  custkey BEFORE the customer join (the shuffle carries one row per
  customer, not one per order); Q21 decomposes the correlated EXISTS /
  NOT EXISTS into one grouped pass over (orderkey, suppkey) — no
  per-row subquery, no re-scan;
- mode-per-group is two partial-agg-friendly groupBys (struct-max), not
  a row_number window — no per-group sort state;
- the winsorize bounds relation is one row per event_type and joins back
  by broadcast; the heavy relation is scanned twice (rank pass + clamp
  pass) which at scale is the right trade against caching a 100 TB sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.determinism import (DEC_AVG_SQL, DEC_SUM_SQL, dec_avg,
                                     fold_sum)
from ..functions.temporal import wday_pandas
from ..functions.text import (FINGERPRINT_SQL, NORMALIZE_TEXT_SQL,
                              fingerprint, md5_hash64, md5_hash64_sql,
                              normalize_text)
from ..sources import load_table
from . import query
from .parity import EV, _disc_price_dec


@query("events_streaks", f"""
WITH ev AS ({EV}),
d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
r AS (SELECT user_id, day,
             (day - DATE '1970-01-01')
             - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM d),
s AS (SELECT user_id, island, COUNT(*) AS len,
             MIN(day) AS start_day, MAX(day) AS end_day
      FROM r GROUP BY user_id, island)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS active_days,
       MIN(start_day) AS first_active,
       MAX(end_day) AS last_active
FROM s GROUP BY user_id
""")
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via the
    classic ``day_number - row_number`` island key (consecutive days share
    a constant difference; any gap shifts it), then per-user streak stats.

    Pure integer/date arithmetic — exact cross-engine. One shuffle for the
    (user, day) distinct; the row_number window and both aggregations all
    reuse the user_id partitioning, so the whole query is a single
    exchange at scale. The island key is
    ``operators.windows.islands`` (property-tested against a brute-force
    consecutive-run grouper in tests/test_properties.py) over the
    day-number sequence."""
    from ..operators.windows import islands

    ev = load_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    r = islands(
        d.withColumn("day_no",
                     F.datediff("day", F.lit("1970-01-01").cast("date"))),
        "user_id", "day_no").select("user_id", "day", "island")
    s = (r.groupBy("user_id", "island")
         .agg(F.count(F.lit(1)).alias("len"),
              F.min("day").alias("start_day"),
              F.max("day").alias("end_day")))
    return (s.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
                 F.max("len").cast("bigint").alias("longest_streak"),
                 F.sum("len").cast("bigint").alias("active_days"),
                 F.min("start_day").alias("first_active"),
                 F.max("end_day").alias("last_active")))


@query("star_order_count_distribution", """
WITH oc AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
pc AS (
  SELECT c.c_custkey, COALESCE(oc.n, 0) AS c_count
  FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM pc GROUP BY c_count
""")
def star_order_count_distribution(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q13's shape: the distribution of customers by order count,
    INCLUDING the zero-order bucket (the left join the naive GROUP BY
    silently drops). All integers — exact.

    Orders are pre-aggregated to one row per custkey BEFORE the customer
    join, so the join shuffle carries |customers| rows, not |orders| —
    the agg-below-join rewrite that matters when orders is the 100 TB
    side. The final histogram groupBy is over a relation already reduced
    to one row per customer."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    pc = (customer.join(oc, customer.c_custkey == oc.o_custkey, "left")
          .select(F.coalesce("n", F.lit(0)).alias("c_count")))
    return (pc.groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
            .select(F.col("c_count").cast("bigint").alias("c_count"),
                    "custdist"))


@query("events_mode_daily", f"""
WITH ev AS ({EV}),
c AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM ev GROUP BY 1, 2),
r AS (SELECT day, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY n DESC, event_type DESC) AS rn
      FROM c)
SELECT day, event_type AS mode_type, CAST(n AS BIGINT) AS n_mode
FROM r WHERE rn = 1
""")
def events_mode_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent event type per day,
    ties broken toward the lexicographically larger type — encoded as a
    struct-max over (count, type), whose ordering is exactly the oracle's
    ``ORDER BY n DESC, event_type DESC`` rn=1 row. Never ``max_by``: its
    tie choice is engine-private and would flake the hash.

    Two partial-agg-friendly groupBys (map-side combine on both), no
    window state — cheaper than the oracle's own row_number rendering,
    which is the point of expressing arg-max as an aggregate."""
    ev = load_table(spark, sf_dir, "events")
    c = (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
         .agg(F.count(F.lit(1)).alias("n")))
    m = (c.groupBy("day")
         .agg(F.max(F.struct(F.col("n"), F.col("event_type"))).alias("m")))
    return m.select("day",
                    F.col("m.event_type").alias("mode_type"),
                    F.col("m.n").cast("bigint").alias("n_mode"))


@query("events_chi2_residuals", f"""
WITH ev AS ({EV}),
cell AS (SELECT event_type, CAST(date_part('isodow', ts) AS INT) AS dow,
                COUNT(*) AS o
         FROM ev GROUP BY 1, 2),
rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_n
       FROM cell GROUP BY 1),
ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS col_n FROM cell GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cell)
SELECT cell.event_type, cell.dow, CAST(cell.o AS BIGINT) AS observed,
       CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
         / CAST(tot.n AS DOUBLE) AS expected,
       (CAST(cell.o AS DOUBLE)
        - CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
          / CAST(tot.n AS DOUBLE))
       / SQRT(CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
              / CAST(tot.n AS DOUBLE)) AS residual
FROM cell JOIN rt ON cell.event_type = rt.event_type
          JOIN ct ON cell.dow = ct.dow
          CROSS JOIN tot
""")
def events_chi2_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table independence diagnostics for event_type × ISO
    weekday: observed counts, expected-under-independence counts
    (row_total × col_total / N), and the Pearson standardized residual
    (O−E)/√E per cell. Deliberately PER-CELL — summing the χ² statistic
    would be a merge-order-dependent float reduction; the residual matrix
    is also the more useful artifact (it localizes the dependence).

    Every input is an exact integer; expected/residual use only IEEE
    multiply/divide/sqrt in an identical expression tree on both engines
    — bit-exact. The margins (rt, ct, tot) are tiny aggregates of the
    cell relation joined back by broadcast; the cell groupBy is the only
    data-proportional shuffle."""
    ev = load_table(spark, sf_dir, "events")
    cell = (ev.groupBy("event_type",
                       wday_pandas("ts").cast("int").alias("dow"))
            .agg(F.count(F.lit(1)).alias("o")))
    rt = (cell.groupBy("event_type")
          .agg(F.sum("o").cast("bigint").alias("row_n")))
    ct = cell.groupBy("dow").agg(F.sum("o").cast("bigint").alias("col_n"))
    tot = cell.agg(F.sum("o").cast("bigint").alias("n"))
    expected = (F.col("row_n").cast("double")
                * F.col("col_n").cast("double") / F.col("n").cast("double"))
    return (cell.join(F.broadcast(rt), "event_type")
            .join(F.broadcast(ct), "dow")
            .crossJoin(F.broadcast(tot))
            .select("event_type", "dow",
                    F.col("o").cast("bigint").alias("observed"),
                    expected.alias("expected"),
                    ((F.col("o").cast("double") - expected)
                     / F.sqrt(expected)).alias("residual")))


@query("events_winsorized_mean", f"""
WITH ev AS ({EV}),
v AS (SELECT event_type, event_id, value FROM ev WHERE value IS NOT NULL),
r AS (SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v),
b AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.05 * n) AS BIGINT))
                      THEN value END) AS lo,
             MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
                      THEN value END) AS hi
      FROM r GROUP BY event_type)
SELECT v.event_type, b.n, b.lo, b.hi,
       {DEC_AVG_SQL.format(c='LEAST(GREATEST(v.value, b.lo), b.hi)', s=2)}
         AS winsorized_mean,
       {DEC_AVG_SQL.format(c='v.value', s=2)} AS raw_mean
FROM v JOIN b ON v.event_type = b.event_type
GROUP BY v.event_type, b.n, b.lo, b.hi
""")
def events_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based winsorized mean per event type: clamp values to the
    [p05, p95] ORDER-STATISTIC bounds (actual data values at ranks
    ceil(0.05·n) / ceil(0.95·n) under a deterministic (value, event_id)
    order — never interpolated percentiles, so the clamped column stays
    in the source's exact 2dp domain) and compare against the raw mean.
    The robust-location complement to `events_value_mad`'s robust spread.

    Both means route through dec_avg's exact DECIMAL(18,2) sum — safe
    precisely because winsorizing substitutes existing 2dp values;
    an interpolated bound (e.g. 1.015) would re-enter the
    derived-quotient ROUND divergence class. The rank index uses
    CEIL(0.05·n) as the same IEEE double expression on both engines.
    Bounds are one row per type, broadcast back; the rank pass and the
    clamp pass each scan the fact table once."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    v = ev.select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = (Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    r = v.select("event_type", "value",
                 F.row_number().over(w).alias("rn"),
                 F.count(F.lit(1)).over(wn).alias("n"))
    lo_k = F.greatest(F.lit(1).cast("bigint"),
                      F.ceil(F.lit(0.05) * F.col("n")).cast("bigint"))
    hi_k = F.ceil(F.lit(0.95) * F.col("n")).cast("bigint")
    b = (r.groupBy("event_type")
         .agg(F.max("n").cast("bigint").alias("n"),
              F.max(F.when(F.col("rn") == lo_k, F.col("value"))).alias("lo"),
              F.max(F.when(F.col("rn") == hi_k, F.col("value"))).alias("hi")))
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (v.join(F.broadcast(b), "event_type")
            .groupBy("event_type", "n", "lo", "hi")
            .agg(dec_avg(clamped, scale=2).alias("winsorized_mean"),
                 dec_avg(F.col("value"), scale=2).alias("raw_mean"))
            .select("event_type", "n", "lo", "hi",
                    "winsorized_mean", "raw_mean"))


@query("star_exclusive_late_supplier", """
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60
           AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
per AS (
  SELECT l_orderkey, l_suppkey, BOOL_OR(late) AS supp_late
  FROM li GROUP BY 1, 2),
ag AS (
  SELECT l_orderkey, COUNT(*) AS n_supp,
         SUM(CASE WHEN supp_late THEN 1 ELSE 0 END) AS n_late
  FROM per GROUP BY 1)
SELECT p.l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per p JOIN ag a ON p.l_orderkey = a.l_orderkey
WHERE a.n_supp >= 2 AND a.n_late = 1 AND p.supp_late
GROUP BY p.l_suppkey
""")
def star_exclusive_late_supplier(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on the available columns: per supplier, the
    number of multi-supplier orders where THAT supplier was the only one
    to ship late (> 60 days after the order date). Q21's correlated
    EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    supplier) pair is decomposed into one grouped pass over
    (orderkey, suppkey) with per-order counts joined back — no per-row
    subquery, no repeated scans.

    All date/integer/boolean logic — exact. The per-order counts the
    oracle writes as a groupBy + back-join are a WINDOW over the
    already-reduced (orderkey, suppkey) relation here: the naive
    join-back rendering made Spark recompute the whole lineitem⋈orders
    subtree on both sides of a sort-merge self-join (4 scans,
    5 exchanges in the audited plan); the window form scans lineitem
    once and needs only the (orderkey, suppkey) agg exchange, a small
    orderkey re-exchange of the reduced relation, and the final
    per-supplier shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .select("l_orderkey", "l_suppkey",
                 (F.to_date("l_shipdate")
                  > F.date_add(F.to_date("o_orderdate"), 60)).alias("late")))
    per = (j.groupBy("l_orderkey", "l_suppkey")
           .agg(F.max("late").alias("supp_late")))
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "l_suppkey", "supp_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum(F.col("supp_late").cast("int")).over(w).alias("n_late"))
    return (flagged
            .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)
                    & F.col("supp_late"))
            .groupBy(F.col("l_suppkey").alias("suppkey"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("numwait")))


@query("events_type_lift", f"""
WITH ev AS ({EV}),
ut AS (SELECT DISTINCT user_id, event_type FROM ev),
tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_total FROM ut),
tx AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_x
       FROM ut GROUP BY event_type),
pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              CAST(COUNT(*) AS BIGINT) AS n_ab
       FROM ut a JOIN ut b
         ON a.user_id = b.user_id AND a.event_type < b.event_type
       GROUP BY a.event_type, b.event_type)
SELECT pr.type_a, pr.type_b, ta.n_x AS n_a, tb.n_x AS n_b, pr.n_ab,
       CAST(pr.n_ab AS DOUBLE) / tot.n_total AS support,
       CAST(pr.n_ab AS DOUBLE) * tot.n_total
         / (CAST(ta.n_x AS DOUBLE) * tb.n_x) AS lift
FROM pr JOIN tx ta ON pr.type_a = ta.event_type
        JOIN tx tb ON pr.type_b = tb.event_type
        CROSS JOIN tot
""")
def events_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence lift between event-type pairs at the
    user level: support = P(a,b) and lift = P(a,b)/(P(a)P(b)) over the
    distinct (user, type) relation — the association-rule screen, kept
    log-free (PMI's ln is a non-correctly-rounded transcendental that
    could diverge cross-engine; lift is pure int-ratio IEEE arithmetic,
    bit-exact).

    The pair generation is a user-keyed self-join of the ALREADY-distinct
    (user, type) relation — per-user fan-out is bounded by the squared
    type-alphabet size (schema-bounded, single digits), never |events|²;
    the distinct is the only data-proportional shuffle. Margins (per-type
    user counts, total users) are tiny aggregates broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    tot = ut.agg(F.count_distinct("user_id").cast("bigint")
                 .alias("n_total"))
    tx = (ut.groupBy("event_type")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_x")))
    a = ut.select(F.col("user_id").alias("u"),
                  F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("u"),
                  F.col("event_type").alias("type_b"))
    pr = (a.join(b, (a.u == b.u) & (F.col("type_a") < F.col("type_b")))
          .groupBy("type_a", "type_b")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab")))
    ta = tx.select(F.col("event_type").alias("type_a"),
                   F.col("n_x").alias("n_a"))
    tb = tx.select(F.col("event_type").alias("type_b"),
                   F.col("n_x").alias("n_b"))
    return (pr.join(F.broadcast(ta), "type_a")
            .join(F.broadcast(tb), "type_b")
            .crossJoin(F.broadcast(tot))
            .select("type_a", "type_b", "n_a", "n_b", "n_ab",
                    (F.col("n_ab").cast("double") / F.col("n_total"))
                    .alias("support"),
                    (F.col("n_ab").cast("double") * F.col("n_total")
                     / (F.col("n_a").cast("double") * F.col("n_b")))
                    .alias("lift")))


@query("events_rolling_wau", f"""
WITH ev AS ({EV}),
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau7
FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
""")
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (trailing WAU) — the windowed
    COUNT DISTINCT neither engine's window frames can express (DISTINCT
    is not allowed in a window aggregate): rendered as the day-spine
    range join against the distinct (user, day) relation, then an exact
    distinct count per anchor day. Integer/date logic — exact.

    The BETWEEN is not executed as an inequality join (that compiles to
    a nested loop): each user-day EXPLODES to its <= 7 candidate anchor
    days (``sequence(day, day+6)``) and equi-joins the broadcast
    day spine — fan-out 7·|user-days| either way, but the join is a
    hash join, and anchors past the observed span drop in the join.
    At extreme user counts the exact distinct swaps for the HLL sketch
    (`events_user_reach_hll`); this is the exact-tier rendering."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct().select(F.col("day").alias("d"))
    fan = ud.select(
        "user_id",
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("d"))
    return (fan.join(F.broadcast(days), "d")
            .groupBy(F.col("d").alias("day"))
            .agg(F.count_distinct("user_id").cast("bigint").alias("wau7")))


@query("docs_dedup_rate_by_source", f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT {FINGERPRINT_SQL.format(c='text')}) AS BIGINT)
         AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT {FINGERPRINT_SQL.format(c='text')})
            AS BIGINT) AS n_dups,
       CAST(COUNT(*) - COUNT(DISTINCT {FINGERPRINT_SQL.format(c='text')})
            AS DOUBLE) / COUNT(*) AS dup_rate
FROM documents GROUP BY source
""")
def docs_dedup_rate_by_source(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the dedup-pipeline health report
    a corpus dashboard leads with: docs, distinct content fingerprints,
    and the duplicate share per source. The rate is the raw quotient of
    exact integers (bit-exact).

    COUNT(DISTINCT fp) per group is the two-phase distinct aggregate
    (partial dedup map-side, exact merge) — one shuffle keyed by source;
    the fingerprint is computed in the scan projection, no second pass."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("source", fingerprint(F.col("text")).alias("fp"))
    n = F.count(F.lit(1))
    u = F.count_distinct("fp")
    return (d.groupBy("source")
            .agg(n.cast("bigint").alias("n_docs"),
                 u.cast("bigint").alias("n_unique"),
                 (n - u).cast("bigint").alias("n_dups"),
                 ((n - u).cast("double") / n).alias("dup_rate")))


@query("docs_crosslang_dups", f"""
WITH fp AS (
  SELECT md5(substr({NORMALIZE_TEXT_SQL.format(c='text')}, 1, 60)) AS fp,
         lang, doc_id
  FROM documents)
SELECT fp,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc
FROM fp GROUP BY fp
HAVING COUNT(DISTINCT lang) >= 2
""")
def docs_crosslang_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language near-duplicate contamination: BLOCKED content keys
    (md5 of the first 60 normalized chars — the blocking-key trick, since
    the corpus's planted near-dups differ by suffix edits and an
    exact-content fingerprint finds nothing) that appear under two or
    more language labels. A dup group with conflicting lang labels means
    at least one label is wrong, and a lang-stratified split would leak
    it across partitions — the label-noise screen a language-filtered
    training corpus needs before `docs_split_assign`.

    One blocked-key shuffle; COUNT(DISTINCT lang) rides the same grouped
    aggregate (the lang alphabet is schema-bounded, distinct state per
    key is bytes). Exact integers throughout. Fingerprint parity rests
    on CODE-POINT semantics, not an ASCII assumption (round-5 ADVICE):
    Spark `substring` and DuckDB `substr` both count code points, both
    md5 the UTF-8 encoding, and lower/regexp/trim agree on the simple
    one-to-one case mappings — so the prefix key matches cross-engine
    for any text whose lowercase mapping is unconditional (all of Latin;
    the shipped corpus is additionally pure ASCII at every SF, verified
    sf0.001/0.01/0.1). Locale-conditional case chars (e.g. Turkish İ)
    would need the byte-hash variant: md5 of the UTF-8 prefix bytes."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.md5(F.substring(normalize_text(F.col("text")), 1, 60))
         .alias("fp"),
        "lang", "doc_id")
    return (d.groupBy("fp")
            .agg(F.count_distinct("lang").cast("bigint").alias("n_langs"),
                 F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.min("doc_id").alias("first_doc"))
            .filter(F.col("n_langs") >= 2))


@query("star_top_revenue_suppliers", """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
           AS rev_dec
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey),
rk AS (SELECT l_suppkey, rev_dec,
              RANK() OVER (ORDER BY rev_dec DESC) AS r FROM rev)
SELECT l_suppkey AS suppkey,
       ROUND(CAST(rev_dec AS DOUBLE), 2) AS total_revenue
FROM rk WHERE r = 1
""")
def star_top_revenue_suppliers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q15's shape: the supplier(s) achieving MAXIMUM quarterly
    revenue — the revenue-equals-global-max selection, rendered as
    RANK()=1 so ties are kept exactly like the spec's ``= max(...)``
    subquery. Revenue accumulates in the exact DECIMAL domain, so the
    max/rank comparison can never flip on summation order.

    The shipdate predicate is pushed to the parquet scan; the global
    rank runs over the PER-SUPPLIER aggregate (one row per supplier with
    quarter activity — bounded far below the fact table; the same
    single-partition window trade documented at
    `star_nation_rank_global`, with the scalar-max broadcast join as the
    swap-in when even the supplier relation is too wide)."""
    li = load_table(spark, sf_dir, "lineitem")
    sd = F.to_date("l_shipdate")
    rev = (li.filter((sd >= F.lit("1996-01-01").cast("date"))
                     & (sd < F.lit("1996-04-01").cast("date")))
           .groupBy("l_suppkey")
           .agg(F.sum(_disc_price_dec()).alias("rev_dec")))
    rk = F.rank().over(Window.orderBy(F.col("rev_dec").desc()))
    return (rev.withColumn("r", rk).filter(F.col("r") == 1)
            .select(F.col("l_suppkey").alias("suppkey"),
                    F.round(F.col("rev_dec").cast("double"), 2)
                     .alias("total_revenue")))


@query("docs_weighted_sample", f"""
WITH m AS (SELECT MAX(n_chars) AS max_chars FROM documents),
g AS (
  SELECT d.source, d.n_chars,
         CAST({md5_hash64_sql("CAST(doc_id AS VARCHAR)", seed=17)}
              % m.max_chars < d.n_chars AS INT) AS kept
  FROM documents d CROSS JOIN m)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS achieved_rate,
       CAST(SUM(n_chars) AS DOUBLE)
         / (COUNT(*) * MAX((SELECT max_chars FROM m))) AS expected_rate
FROM g GROUP BY source
""")
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-weighted (importance) sampling:
    P(keep doc) = n_chars / max(n_chars), gated by a seeded md5 hash of
    the doc id modulo max_chars — longer documents proportionally more
    likely to survive, the char-budget-friendly complement to
    `docs_mixture_sample`'s per-source rates. Reproducible across runs,
    engines, and partitionings (hash gate, no RNG); the keep decision is
    pure integer arithmetic, bit-exact.

    The max-weight scalar is a 1-row broadcast into the scan projection
    (the `dbt_outlier_3sigma` shape); the gate itself rides the scan —
    the per-source report is the only shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.agg(F.max("n_chars").alias("max_chars"))
    g = (docs.crossJoin(F.broadcast(m))
         .select("source", "n_chars", "max_chars",
                 (md5_hash64(F.col("doc_id").cast("string"), seed=17)
                  % F.col("max_chars") < F.col("n_chars"))
                 .cast("int").alias("kept")))
    return (g.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_total"),
                 F.sum("kept").cast("bigint").alias("n_kept"),
                 (F.sum("kept").cast("double") / F.count(F.lit(1)))
                 .alias("achieved_rate"),
                 (F.sum("n_chars").cast("double")
                  / (F.count(F.lit(1)) * F.max("max_chars")))
                 .alias("expected_rate")))


@query("events_value_histogram", f"""
WITH ev AS ({EV}),
v AS (SELECT event_type, value FROM ev WHERE value IS NOT NULL),
g AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM v),
b AS (
  SELECT event_type,
         CAST(LEAST(19, CAST(FLOOR((value - g.lo) * 20.0 / (g.hi - g.lo))
                             AS BIGINT)) AS BIGINT) AS bucket,
         g.lo AS lo, g.hi AS hi
  FROM v CROSS JOIN g)
SELECT event_type, bucket,
       lo + bucket * ((hi - lo) / 20.0) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY event_type, bucket, lo, hi
""")
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-WIDTH value histogram per event type over a GLOBAL 20-bin
    [min, max] grid — the fixed-grid complement to
    `events_value_ntiles`' equi-depth tiles: because every type shares
    one grid, the per-type distributions are directly comparable
    (the overlay-plot shape).

    Bucketing arithmetic is subtract/multiply/divide/floor on identical
    operands — each correctly-rounded IEEE, so the bucket index and the
    emitted bin_lo are bit-exact cross-engine (2dp source values; the
    hi endpoint clamps into the last bucket via LEAST). The [lo, hi]
    scalar is a 1-row broadcast into the scan projection; one grouped
    shuffle, partial-agg friendly."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select("event_type", "value")
    g = v.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.least(
        F.lit(19).cast("bigint"),
        F.floor((F.col("value") - F.col("lo")) * F.lit(20.0)
                / (F.col("hi") - F.col("lo"))).cast("bigint"))
    b = (v.crossJoin(F.broadcast(g))
         .select("event_type", bucket.alias("bucket"), "lo", "hi"))
    return (b.groupBy("event_type", "bucket", "lo", "hi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select("event_type", "bucket",
                    (F.col("lo") + F.col("bucket")
                     * ((F.col("hi") - F.col("lo")) / F.lit(20.0)))
                    .alias("bin_lo"),
                    "n"))


@query("star_prospect_customers", f"""
WITH pos AS (SELECT c_acctbal FROM customer WHERE c_acctbal > 0),
thresh AS (SELECT {DEC_AVG_SQL.format(c='c_acctbal', s=2)} AS avg_bal
           FROM pos),
recent AS (SELECT DISTINCT o_custkey FROM orders
           WHERE CAST(o_orderdate AS DATE) >= DATE '1999-01-01')
SELECT c.c_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_prospects,
       ROUND({DEC_SUM_SQL.format(c='c.c_acctbal', s=2)}, 2) AS total_bal
FROM customer c CROSS JOIN thresh
WHERE c.c_acctbal > thresh.avg_bal
  AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
""")
def star_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape on the available columns: customers whose
    balance exceeds the positive-balance average but who placed NO
    recent orders (none since 1999 — the reference Q22's 7-year dormancy
    window; an unconditional no-orders test is vacuous on this data),
    rolled up per nation. Combines the scalar-subquery threshold
    (1-row broadcast) with the NOT EXISTS anti-join in one query — the
    two halves the registry previously pinned only separately.

    The threshold mean is dec_avg's raw quotient (bit-exact gate); the
    anti-join's build side is the DISTINCT recent-order custkey relation
    (pre-reduced, date filter pushed to the orders scan); balances sum
    in the exact DECIMAL domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    thresh = (cust.filter(F.col("c_acctbal") > 0)
              .agg(dec_avg(F.col("c_acctbal"), scale=2).alias("avg_bal")))
    recent = (orders
              .filter(F.to_date("o_orderdate")
                      >= F.lit("1999-01-01").cast("date"))
              .select("o_custkey").distinct())
    return (cust.crossJoin(F.broadcast(thresh))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_prospects"),
                 F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                          .cast("double"), 2).alias("total_bal")))


@query("events_iqr_outliers", f"""
WITH ev AS ({EV}),
v AS (SELECT event_type, event_id, value FROM ev WHERE value IS NOT NULL),
r AS (SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v),
b AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.25 * n) AS BIGINT))
                      THEN value END) AS q1,
             MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT)
                      THEN value END) AS q3
      FROM r GROUP BY event_type)
SELECT v.event_type, b.n, b.q1, b.q3,
       b.q1 - 1.5 * (b.q3 - b.q1) AS fence_lo,
       b.q3 + 1.5 * (b.q3 - b.q1) AS fence_hi,
       CAST(SUM(CASE WHEN v.value < b.q1 - 1.5 * (b.q3 - b.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN v.value > b.q3 + 1.5 * (b.q3 - b.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM v JOIN b ON v.event_type = b.event_type
GROUP BY v.event_type, b.n, b.q1, b.q3
""")
def events_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (1.5·IQR) outlier census per event type — completing
    the robust-stats family (3σ → z-score → MAD → winsorize → IQR):
    rank-based quartiles (actual data values at ceil(0.25n)/ceil(0.75n)
    under the deterministic (value, id) order, same discipline as the
    winsorize bounds), fences from identical-operand IEEE arithmetic, and
    exact counts outside each fence.

    Same two-pass shape as `events_winsorized_mean`: one keyed window
    pass for the quartiles (both windows share the event_type exchange),
    a one-row-per-type bounds relation broadcast back, exact-integer
    census in the clamp pass."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull())
         .select("event_type", "event_id", "value"))
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = (Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    r = v.select("event_type", "value",
                 F.row_number().over(w).alias("rn"),
                 F.count(F.lit(1)).over(wn).alias("n"))
    q1_k = F.greatest(F.lit(1).cast("bigint"),
                      F.ceil(F.lit(0.25) * F.col("n")).cast("bigint"))
    q3_k = F.ceil(F.lit(0.75) * F.col("n")).cast("bigint")
    b = (r.groupBy("event_type")
         .agg(F.max("n").cast("bigint").alias("n"),
              F.max(F.when(F.col("rn") == q1_k, F.col("value"))).alias("q1"),
              F.max(F.when(F.col("rn") == q3_k, F.col("value"))).alias("q3")))
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - F.lit(1.5) * iqr
    hi = F.col("q3") + F.lit(1.5) * iqr
    return (v.join(F.broadcast(b), "event_type")
            .groupBy("event_type", "n", "q1", "q3")
            .agg(F.sum(F.when(F.col("value") < lo, 1).otherwise(0))
                  .cast("bigint").alias("n_low"),
                 F.sum(F.when(F.col("value") > hi, 1).otherwise(0))
                  .cast("bigint").alias("n_high"))
            .select("event_type", "n", "q1", "q3",
                    lo.alias("fence_lo"), hi.alias("fence_hi"),
                    "n_low", "n_high"))


@query("events_bounce_rate", f"""
WITH ev AS ({EV}),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL OR
                   epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_no
  FROM flagged),
sess AS (
  SELECT user_id, session_no, COUNT(*) AS n_events, MIN(ts) AS start_ts
  FROM numbered GROUP BY user_id, session_no)
SELECT CAST(start_ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounce,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS bounce_rate
FROM sess GROUP BY CAST(start_ts AS DATE)
""")
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate — the canonical product-analytics KPI derived
    from sessionization: share of sessions (30-min inactivity gap, same
    definition as `events_sessionize`) containing exactly one event,
    rolled up by session-start day. The rate is a raw integer quotient
    (bit-exact); session numbering ties break on event_id.

    The lag flag, running sum, and per-session rollup all ride ONE
    user_id-keyed shuffle (the sessionize single-exchange shape); only
    the final by-day rollup re-keys, over the already-reduced session
    relation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(prev_us.isNull()
               | ((F.unix_micros("ts") - prev_us) > 1_800_000_000), 1)
         .otherwise(0).alias("new_session"))
    wrun = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    numbered = flagged.withColumn(
        "session_no", F.sum("new_session").over(wrun))
    sess = (numbered.groupBy("user_id", "session_no")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("start_ts")))
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (sess.groupBy(F.to_date("start_ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
                 bounce.cast("bigint").alias("n_bounce"),
                 (bounce.cast("double") / F.count(F.lit(1)))
                 .alias("bounce_rate")))


def _pi_fold_arr(arr) -> F.Column:
    """Row-local ascending-ordered fold of an array column — the same
    reduction as :func:`fold_sum` but over an in-row array, zero
    shuffle."""
    return F.aggregate(F.array_sort(arr), F.lit(0.0), lambda a, x: a + x)


def _pi_matvec_t(base: DataFrame) -> DataFrame:
    """u = Xᵀ·s : per-dim fold whose fan-in is the CORPUS size — the
    documented two-level fold (functions/determinism.py): fold per
    (dim, vec_id%64 bucket) first (per-bucket buffer = N/64), then fold
    the 64 bucket sums. Both levels are pure functions of their input
    multiset, so the result is partition-count-independent AND the
    per-group collect buffer is bounded by the bucket knob at scale."""
    ex = (base.select("vec_id", "s", F.posexplode("xs").alias("pos", "x"))
          .select((F.col("pos") + 1).cast("int").alias("dim"),
                  (F.col("vec_id") % 64).alias("b"),
                  (F.col("x") * F.col("s")).alias("t")))
    lvl1 = ex.groupBy("dim", "b").agg(fold_sum(F.col("t")).alias("ts"))
    return lvl1.groupBy("dim").agg(fold_sum(F.col("ts")).alias("u"))


def _pi_normalize(u: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """v = u/‖u‖, plus v re-shaped as ONE 64-element array row (ordered
    by dim) for the next round's row-local X·v."""
    n = u.agg(F.sqrt(fold_sum(F.col("u") * F.col("u"))).alias("nrm"))
    v = (u.crossJoin(F.broadcast(n))
         .select("dim", (F.col("u") / F.col("nrm")).alias("v"))
         .localCheckpoint(eager=False))
    v_arr = (v.groupBy()
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("dim", "v"))),
                 lambda st: st["v"]).alias("varr")))
    return v, n, v_arr


_PI_SQL_ITER = """
u{t} AS (
  SELECT dim, SUM(ts ORDER BY ts) AS u FROM (
    SELECT lf.dim, lf.vec_id % 64 AS b,
           SUM(lf.x * {sv}.{sc} ORDER BY lf.x * {sv}.{sc}) AS ts
    FROM lf JOIN {sv} USING (vec_id) GROUP BY lf.dim, lf.vec_id % 64)
  GROUP BY dim),
n{t} AS (SELECT SQRT(SUM(u * u ORDER BY u * u)) AS nrm FROM u{t}),
v{t} AS (SELECT dim, u / n{t}.nrm AS v FROM u{t}, n{t})"""


@query("embed_top_eigenvector", f"""
WITH lf AS (
  SELECT vec_id, CAST(dim AS INT) AS dim,
         CAST(embedding[dim] AS DOUBLE) AS x
  FROM embeddings, range(1, 65) t(dim)),
s1 AS (SELECT vec_id, SUM(x ORDER BY x) / 8.0 AS s FROM lf GROUP BY vec_id),
{_PI_SQL_ITER.format(t=1, sv='s1', sc='s')},
s2 AS (SELECT vec_id, SUM(lf.x * v1.v ORDER BY lf.x * v1.v) AS s
       FROM lf JOIN v1 USING (dim) GROUP BY vec_id),
{_PI_SQL_ITER.format(t=2, sv='s2', sc='s')},
s3 AS (SELECT vec_id, SUM(lf.x * v2.v ORDER BY lf.x * v2.v) AS s
       FROM lf JOIN v2 USING (dim) GROUP BY vec_id),
{_PI_SQL_ITER.format(t=3, sv='s3', sc='s')}
SELECT v3.dim, v3.v AS loading, n3.nrm AS eigenvalue
FROM v3, n3
""")
def embed_top_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-free distributed power iteration (3 fixed rounds): the top
    principal direction of the embedding matrix via alternating
    s = X·v (per-vector fold over 64 schema-bounded dims) and
    u = Xᵀ·s (per-dim TWO-LEVEL fold — the determinism.py pattern for
    data-bounded fan-in), normalized each round; the final Gram-iteration
    norm is the eigenvalue estimate of XᵀX. X never materializes as a
    matrix anywhere: only the long-form (vec_id, dim, x) relation and
    two tiny per-round relations (64-row v, one scalar norm) exist.

    Determinism: v₀ = 1/8 (= 1/√64, an exact power of two) and every
    reduction is an ascending-ordered fold mirrored by DuckDB's
    ``SUM(x ORDER BY x)`` — the float fixed point is a pure function of
    the input multiset, independent of partitioning (the
    `events_pagerank_types` discipline applied to linear algebra).
    Eigenvector sign is pinned by the deterministic v₀.

    Scale: X·v is ROW-LOCAL (zip_with product + in-row ordered fold over
    the 64-element array — no join, no shuffle; the oracle's long-form
    join rendering is multiset-identical), so each round costs exactly
    two keyed shuffles (the two fold levels of Xᵀ·s) plus a 1-row
    v-array broadcast. Lineage truncates through the per-round
    ``localCheckpoint`` of the 64-row v (the pagerank loop-invariant
    trick); on a real cluster the embeddings scan would be cached across
    rounds — here each round reads the source once."""
    e = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id",
                 F.transform("embedding",
                             lambda x: x.cast("double")).alias("xs")))
    base = e.select("vec_id", "xs",
                    (_pi_fold_arr(F.col("xs")) / F.lit(8.0)).alias("s"))
    v = n = None
    for _ in range(3):
        u = _pi_matvec_t(base)
        v, n, v_arr = _pi_normalize(u)
        base = (e.crossJoin(F.broadcast(v_arr))
                .select("vec_id", "xs",
                        _pi_fold_arr(
                            F.zip_with("xs", "varr",
                                       lambda x, w: x * w)).alias("s")))
    return (v.crossJoin(F.broadcast(n))
            .select("dim", F.col("v").alias("loading"),
                    F.col("nrm").alias("eigenvalue")))


@query("events_value_concentration", f"""
WITH ev AS ({EV}),
ut AS (SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS tot
       FROM ev WHERE value IS NOT NULL GROUP BY user_id),
rk AS (SELECT user_id, tot,
              ROW_NUMBER() OVER (ORDER BY tot, user_id) AS r,
              NTILE(10) OVER (ORDER BY tot DESC, user_id) AS decile
       FROM ut),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(tot) AS DOUBLE) AS s0,
             CAST(SUM(r * tot) AS DOUBLE) AS s1
      FROM rk)
SELECT rk.decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(rk.tot) AS DOUBLE), 2) AS decile_total,
       CAST(SUM(rk.tot) AS DOUBLE) / g.s0 AS share,
       2.0 * g.s1 / (g.n * g.s0) - CAST(g.n + 1 AS DOUBLE) / g.n AS gini
FROM rk CROSS JOIN g
GROUP BY rk.decile, g.n, g.s0, g.s1
""")
def events_value_concentration(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Value-concentration analysis (the Pareto/LTV report): users ranked
    by lifetime value into deciles (decile 1 = highest), each decile's
    share of total value, plus the exact Gini coefficient
    (2·Σ rᵢxᵢ / (n·Σxᵢ) − (n+1)/n over ascending-ranked totals) repeated
    as a scalar column. Every input to the ratios is an exact DECIMAL or
    BIGINT aggregate — rank·total products stay in the decimal domain —
    so the doubles emitted are identical-operand IEEE, bit-exact.

    Per-user totals reduce the fact table first (the only
    data-proportional shuffle); both ranking windows run over the
    user-bounded totals relation with deterministic (tot, user_id)
    order. The single-partition window carries the
    `star_nation_rank_global` caveat: at extreme user counts the rank
    swaps for a two-pass range-partitioned sort; the Gini moments
    (n, s0, s1) are a 1-row broadcast back into the decile rollup."""
    ev = load_table(spark, sf_dir, "events")
    ut = (ev.filter(F.col("value").isNotNull())
          .groupBy("user_id")
          .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("tot")))
    rk = ut.select(
        "user_id", "tot",
        F.row_number().over(Window.orderBy("tot", "user_id")).alias("r"),
        F.ntile(10).over(Window.orderBy(F.col("tot").desc(), "user_id"))
         .alias("decile"))
    g = rk.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
               F.sum("tot").cast("double").alias("s0"),
               F.sum(F.col("r") * F.col("tot")).cast("double").alias("s1"))
    gini = (F.lit(2.0) * F.col("s1") / (F.col("n") * F.col("s0"))
            - (F.col("n") + F.lit(1)).cast("double") / F.col("n"))
    return (rk.crossJoin(F.broadcast(g))
            .groupBy("decile", "n", "s0", "s1")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.round(F.sum("tot").cast("double"), 2)
                  .alias("decile_total"),
                 (F.sum("tot").cast("double") / F.max("s0")).alias("share"))
            .select("decile", "n_users", "decile_total", "share",
                    gini.alias("gini")))


@query("embed_centroid_confusion", f"""
WITH c AS (
  SELECT label AS c_label, CAST(dim AS INT) AS dim,
         {DEC_AVG_SQL.format(c='CAST(embedding[dim] AS DOUBLE)', s=6)} AS m
  FROM embeddings, range(1, 65) t(dim)
  GROUP BY label, dim),
d AS (
  SELECT e.vec_id, e.label AS true_label, c.c_label,
         SUM((CAST(e.embedding[c.dim] AS DOUBLE) - c.m)
             * (CAST(e.embedding[c.dim] AS DOUBLE) - c.m)
             ORDER BY (CAST(e.embedding[c.dim] AS DOUBLE) - c.m)
                      * (CAST(e.embedding[c.dim] AS DOUBLE) - c.m)) AS d2
  FROM embeddings e, c
  GROUP BY e.vec_id, e.label, c.c_label),
p AS (
  SELECT vec_id, true_label, c_label AS pred_label,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
  FROM d)
SELECT CAST(true_label AS INT) AS true_label,
       CAST(pred_label AS INT) AS pred_label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM p WHERE rn = 1
GROUP BY true_label, pred_label
""")
def embed_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-evaluation confusion matrix: every vector assigned to
    its nearest LABEL CENTROID (squared-L2, deterministic (distance,
    label) tiebreak) and cross-tabulated against its true label — the
    centroid-classifier diagnostic an embedding pipeline runs after
    `embed_label_centroids`.

    Determinism: centroid components are dec_avg raw quotients
    (identical doubles both engines); each squared-difference term is
    identical-operand IEEE; the per-(vector, candidate) distance is an
    ascending-ordered fold (row-local over the 64-dim array here — the
    oracle's long-form ordered SUM is multiset-identical); argmin is a
    struct-min mirrored by the oracle's (d2, label) ROW_NUMBER.

    Scale: centroids are k rows (broadcast, built from one keyed
    pass); assignment is a row-local map over the corpus — k·64 work
    per vector, zero assignment shuffle; the struct-min and the k×k
    confusion rollup are two partial-agg-friendly groupBys."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = (e.select("label", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("label", "pos")
            .agg(dec_avg(F.col("val").cast("double")).alias("m"))
            .groupBy("label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("cvec"))
            .select(F.col("label").alias("c_label"), "cvec"))
    xs = e.select(
        "vec_id", F.col("label").alias("true_label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("xs"))
    d2 = _pi_fold_arr(
        F.zip_with("xs", "cvec", lambda x, m: (x - m) * (x - m)))
    assigned = (xs.crossJoin(F.broadcast(cent))
                .select("vec_id", "true_label", "c_label",
                        d2.alias("d2"))
                .groupBy("vec_id", "true_label")
                .agg(F.min(F.struct(F.col("d2"), F.col("c_label")))
                      .alias("best")))
    return (assigned
            .select(F.col("true_label").cast("int").alias("true_label"),
                    F.col("best.c_label").cast("int").alias("pred_label"))
            .groupBy("true_label", "pred_label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")))


@query("docs_source_overlap", f"""
WITH fp AS (
  SELECT DISTINCT md5(substr({NORMALIZE_TEXT_SQL.format(c='text')}, 1, 60))
           AS fp, source
  FROM documents),
tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM fp GROUP BY source),
pr AS (SELECT a.source AS source_a, b.source AS source_b,
              CAST(COUNT(*) AS BIGINT) AS shared
       FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
       GROUP BY a.source, b.source)
SELECT pr.source_a, pr.source_b, ta.n_blocks AS n_a, tb.n_blocks AS n_b,
       pr.shared,
       CAST(pr.shared AS DOUBLE) / (ta.n_blocks + tb.n_blocks - pr.shared)
         AS jaccard
FROM pr JOIN tot ta ON pr.source_a = ta.source
        JOIN tot tb ON pr.source_b = tb.source
""")
def docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix on blocked content keys: for every
    source pair, how many distinct 60-char-prefix fingerprints they
    share, with the Jaccard overlap of their block sets — the
    inter-source duplication report a corpus curator reads before
    weighting sources (`docs_mixture_sample`) or deduplicating across
    them; complements `docs_crosslang_dups`' label-noise view of the
    same block keys.

    The pair join is keyed on the BLOCK fingerprint (the inverted-index
    shape — work proportional to shared blocks, never |sources|² scans);
    per-source totals are tiny aggregates joined back; Jaccard is a raw
    integer quotient, bit-exact."""
    docs = load_table(spark, sf_dir, "documents")
    fp = (docs.select(
        F.md5(F.substring(normalize_text(F.col("text")), 1, 60))
         .alias("fp"), "source")
        .distinct())
    tot = (fp.groupBy("source")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks")))
    a = fp.select("fp", F.col("source").alias("source_a"))
    b = fp.select("fp", F.col("source").alias("source_b"))
    pr = (a.join(b, "fp")
          .filter(F.col("source_a") < F.col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(F.count(F.lit(1)).cast("bigint").alias("shared")))
    ta = tot.select(F.col("source").alias("source_a"),
                    F.col("n_blocks").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"),
                    F.col("n_blocks").alias("n_b"))
    return (pr.join(F.broadcast(ta), "source_a")
            .join(F.broadcast(tb), "source_b")
            .select("source_a", "source_b", "n_a", "n_b", "shared",
                    (F.col("shared").cast("double")
                     / (F.col("n_a") + F.col("n_b") - F.col("shared")))
                    .alias("jaccard")))
