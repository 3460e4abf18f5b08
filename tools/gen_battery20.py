#!/usr/bin/env python3
"""Generate battery section `generated20` — round-9 feature families.

Covers the features added in round 9 at the dialect tier: UNPIVOT shapes,
WITH RECURSIVE variants, predicate range-compaction semantics (redundant
merges keep their rows; contradictions — range, equality-vs-range, and
equality-vs-equality, across int/date/string types — are exactly empty),
time-range window frames, and ORDER BY ALL. Expected counts are computed
from set semantics over the nation/region keyspace (0..24 / 0..4) or pinned
as -1 (any >= 1) for data-dependent shapes. Dev tool — regenerates the
generated20 block deterministically.
"""

OUT = []


def emit(rows, cols, sql):
    sql = " ".join(sql.split())
    OUT.append(f"{rows}\t{cols}\t{sql}")


NK = list(range(25))

# ------------------------------------------------------------------ UNPIVOT
BASE = ("(SELECT n_nationkey, CAST(n_regionkey AS DOUBLE) AS rk,"
        " CAST(n_nationkey AS DOUBLE) AS nk,"
        " CAST(n_nationkey % 5 AS DOUBLE) AS m5 FROM nation)")
# non-measure columns remain ids: output cols = (4 - |measures|) + (m, v)
for measures in (["rk"], ["rk", "nk"], ["rk", "nk", "m5"]):
    emit(25 * len(measures), (4 - len(measures)) + 2,
         f"SELECT * FROM {BASE} UNPIVOT (v FOR m IN ({', '.join(measures)}))")
emit(50, 4, f"SELECT * FROM {BASE} UNPIVOT INCLUDE NULLS (v FOR m IN (rk, nk))")
emit(2, 2, f"SELECT m, count(*) AS c FROM {BASE} UNPIVOT (v FOR m IN (rk, nk)) "
           "GROUP BY m ORDER BY m")
# unpivot then filter on the long form
emit(5, 4, f"SELECT * FROM {BASE} UNPIVOT (v FOR m IN (rk, nk)) "
           "WHERE m = 'nk' AND v < 5")

# ----------------------------------------------------------- WITH RECURSIVE
for n in (1, 5, 10, 30):
    emit(n, 1, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
               f"SELECT n + 1 FROM t WHERE n < {n}) SELECT * FROM t")
emit(1, 1, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t "
           "WHERE n < 100) SELECT sum(n) AS s FROM t")
# frontier joins a real table; succ(n) = (n+k) % 25 from 0, depth-capped
for k, depth in ((1, 5), (7, 12), (11, 24)):
    emit(depth + 1, 2,
         "WITH RECURSIVE w(nk, d) AS (SELECT CAST(0 AS BIGINT) AS nk, 0 AS d "
         "UNION ALL SELECT CAST(n.n_nationkey AS BIGINT), w.d + 1 FROM w "
         f"JOIN nation n ON n.n_nationkey = (w.nk + {k}) % 25 "
         f"WHERE w.d < {depth}) SELECT * FROM w")
# recursive + post-aggregation
emit(2, 2, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t "
           "WHERE n < 10) SELECT n % 2 AS p, count(*) AS c FROM t "
           "GROUP BY n % 2 ORDER BY p")

# ---------------------------------------------- predicate range compaction
# Redundant conjuncts: exact counts over the 0..24 nation keyspace.
CASES = [
    ("n_nationkey > 3 AND n_nationkey > 5 AND n_nationkey <= 20",
     lambda k: k > 5 and k <= 20),
    ("n_nationkey >= 10 AND n_nationkey > 9 AND n_nationkey < 24 AND n_nationkey <= 22",
     lambda k: 10 <= k <= 22),
    ("n_nationkey = 7 AND n_nationkey > 2 AND n_nationkey <= 7",
     lambda k: k == 7),
    ("n_nationkey > 0 AND n_nationkey > 0",
     lambda k: k > 0),
    ("n_nationkey <= 4 AND n_nationkey < 5 AND n_nationkey <= 24",
     lambda k: k <= 4),
]
for cond, pred in CASES:
    emit(sum(1 for k in NK if pred(k)), 1,
         f"SELECT n_nationkey FROM nation WHERE {cond}")
# Contradictions: exactly empty, across types and operator mixes.
for cond in (
        "n_nationkey > 10 AND n_nationkey < 5",
        "n_nationkey > 10 AND n_nationkey <= 10",
        "n_nationkey >= 11 AND n_nationkey < 11",
        "n_nationkey = 7 AND n_nationkey > 9",
        "n_nationkey = 3 AND n_nationkey = 4",
        "n_name > 'E' AND n_name < 'B'",
        "n_name = 'CANADA' AND n_name = 'BRAZIL'"):
    emit(0, 1, f"SELECT n_nationkey FROM nation WHERE {cond}")
emit(0, 1, "SELECT o_orderkey FROM orders WHERE "
           "o_orderdate > DATE '1995-01-01' AND o_orderdate < DATE '1994-01-01'")
# contradiction under a join and inside a subquery
emit(0, 2, "SELECT n.n_nationkey, r.r_name FROM nation n JOIN region r "
           "ON n.n_regionkey = r.r_regionkey "
           "WHERE n.n_nationkey > 20 AND n.n_nationkey < 3")
emit(1, 1, "SELECT (SELECT count(*) FROM nation "
           "WHERE n_nationkey > 9 AND n_nationkey < 2) AS c")

# ------------------------------------------------- time-range window frames
emit(-1, 2, "SELECT event_id, count(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS c "
            "FROM events")
emit(-1, 2, "SELECT event_id, sum(value) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND INTERVAL 30 MINUTE "
            "FOLLOWING) AS s FROM events")
emit(-1, 3, "SELECT event_id, count(*) OVER w AS c, min(value) OVER w AS m "
            "FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)")

# ------------------------------------------------------------- ORDER BY ALL
emit(5, 2, "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY ALL ORDER BY ALL")
emit(25, 2, "SELECT n_regionkey, n_nationkey FROM nation ORDER BY ALL")

print(f"# generated20 {len(OUT)} — round-9 features: UNPIVOT shapes, WITH "
      "RECURSIVE variants, range-compaction semantics (redundant merges + "
      "typed contradictions), time-range frames, ORDER BY ALL")
for line in OUT:
    print(line)
