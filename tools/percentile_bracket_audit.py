"""Audit: no registry raw-percentile group lands a DUPLICATE value on
its interpolation bracket on the driver data.

Round-8 context (tests/test_round7.py pins the engine semantics): Spark
``percentile`` and DuckDB ``quantile_cont`` share the interpolation
arithmetic on distinct brackets — bit-identical — but on a duplicate
bracket ``[x, x]`` Spark short-circuits to the stored ``x`` while
DuckDB's ``(1-f)*x + f*x`` drifts one ulp at non-dyadic fractions.
Every registry oracle whose percentile uses a NON-dyadic fraction now
renders via ``functions.determinism.spark_pct_sql`` (Spark-identical by
construction — ``docs_length_band``, ``star_pricing_p95_approx``, and
all six parity-family CTEs); the only remaining ``quantile_cont`` calls
are p=0.5, exempt by arithmetic. So no CURRENT oracle can drift on a
duplicate bracket. This audit is the data-side monitor behind that
state: ``events.value`` is 2dp-quantized, duplicate brackets DO occur
in the real query groupings (3 at sf0.01 and sf0.1 — none drifting),
and the audit quantifies the exposure a raw ``quantile_cont`` oracle
would reintroduce, per scale factor, for every (grouping, fraction)
the registry uses:

- p=0.5 is exempt by arithmetic, not by data: its frac is dyadic
  ({0, 0.5}) and ``0.5*x + 0.5*x`` is exact even on duplicates.
- p in {0.8, 0.85, 0.95} over the parity groupings IS the exposure:
  a duplicate bracket there would make the raw-emitted ratio (or the
  raw ordering key of a top-k cut) diverge cross-engine.

Usage::

    python tools/percentile_bracket_audit.py [sf_dir ...]

Prints one JSON line per sf_dir; exits 1 if any non-exempt duplicate
bracket DRIFTS (``(1-f)*x + f*x != x``). A duplicate bracket that does
not drift is reported but non-fatal (the engines still agree).
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_projects_spark.functions.temporal import (  # noqa: E402
    PERIOD_BUCKET_SQL)

#: The audit must replicate each query's EXACT grouping and population
#: filter (round-8 review fix: an earlier version grouped COARSER than
#: the queries — e.g. user_id instead of (user_id, period) — and a
#: duplicate bracket in a fine group need not surface as one in the
#: merged coarse group, so coarse auditing under-covers). The period
#: expression is the same PERIOD_BUCKET_SQL the oracles render; ts is
#: cast from TIMESTAMP_NS exactly like the EV CTE.
_TS = "CAST(ts AS TIMESTAMP)"
_PERIOD = PERIOD_BUCKET_SQL.format(ts=_TS)

#: (label, group-by SQL, WHERE SQL or None, fractions) — one row per
#: registry family that emits (or orders by) a RAW percentile of
#: events.value, with the query's own grouping. bq_exceedance shares
#: bq_tti's (user_id, day, period) grouping.
GROUPINGS = [
    ("aws user_period", f"user_id, {_PERIOD}",
     f"({_PERIOD}) IS NOT NULL", [0.85, 0.95]),
    ("azure_severity user", "user_id", None, [0.85, 0.95]),
    ("azure_variability user_week", f"user_id, weekofyear({_TS})",
     None, [0.85, 0.95]),
    # bq_tti/bq_exceedance use p=.85, snowflake_lottr_trend p=.8, over
    # the SAME (user_id, day, period) grouping (lottr_trend's bucket =
    # user_id % 64 is derived from user_id and does not refine it)
    ("bq_tti+lottr_trend user_day_period",
     f"user_id, CAST({_TS} AS DATE), {_PERIOD}",
     f"({_PERIOD}) IS NOT NULL", [0.8, 0.85]),
    ("lottr user_period", f"user_id, {_PERIOD}",
     f"({_PERIOD}) IS NOT NULL", [0.8]),
]


def audit_sf(sf_dir: str) -> dict:
    con = duckdb.connect()
    ev = f"read_parquet('{sf_dir}/events.parquet')"
    out = {"sf_dir": sf_dir, "groupings": [], "dup_brackets": 0,
           "drifting": 0}
    # Whole-table duplicate mass: if NO value duplicates anywhere, no
    # group can hold a duplicate bracket and the per-grouping scan is
    # a formality.
    n, nd = con.execute(
        f"SELECT COUNT(value), COUNT(DISTINCT value) FROM {ev}").fetchone()
    out["n_values"], out["n_distinct"] = n, nd
    for label, keys, where, ps in GROUPINGS:
        conds = ["value IS NOT NULL"] + ([where] if where else [])
        rows = con.execute(
            f"SELECT list_sort(list(value)) FROM {ev} "
            f"WHERE {' AND '.join(conds)} GROUP BY {keys}").fetchall()
        checked = dups = drifts = 0
        for (xs,) in rows:
            m = len(xs)
            for p in ps:
                pos = p * (m - 1)
                li, hi = math.floor(pos), math.ceil(pos)
                if li == hi:
                    continue
                checked += 1
                lo_v, hi_v = xs[li], xs[hi]
                if lo_v == hi_v:
                    dups += 1
                    f = pos - li
                    if (1.0 - f) * lo_v + f * hi_v != lo_v:
                        drifts += 1
        out["groupings"].append({"label": label, "groups": len(rows),
                                 "brackets": checked, "dup": dups,
                                 "drift": drifts})
        out["dup_brackets"] += dups
        out["drifting"] += drifts
    con.close()
    return out


def main(argv: list[str]) -> int:
    sf_dirs = argv or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1"]
    bad = 0
    for sf in sf_dirs:
        res = audit_sf(sf)
        print(json.dumps(res))
        bad += res["drifting"]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
