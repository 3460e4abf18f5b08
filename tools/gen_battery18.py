#!/usr/bin/env python3
"""Generate battery section `generated18` — second dialect-edge sweep.

Adds: quantifiers with more LHS expressions, array-RHS and VALUES-RHS
quantifiers, join-spelling matrix with exact counts, struct/map family,
interval arithmetic, event-stream windows, generator functions, and ordering
edge cases. Dev tool — regenerates the generated18 block deterministically.
"""

OUT = []


def emit(rows, cols, sql):
    sql = " ".join(sql.split())
    OUT.append(f"{rows}\t{cols}\t{sql}")


NK = list(range(25))
OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}

# quantifiers: two more LHS expressions x full matrix (subquery RHS)
SETS = {
    "SELECT r_regionkey FROM region": list(range(5)),
    "SELECT v FROM (VALUES (0), (2), (4)) t(v)": [0, 2, 4],
}
LHS = {
    "n_nationkey * 2": lambda k: k * 2,
    "n_nationkey + 5": lambda k: k + 5,
    "n_nationkey % 3 + 1": lambda k: k % 3 + 1,
    "n_nationkey % 7": lambda k: k % 7,
}
for sub, values in SETS.items():
    for lhs_sql, lhs_fn in LHS.items():
        for op_sql, op_fn in OPS.items():
            for quant in ("ANY", "ALL"):
                for neg in (False, True):
                    def holds(k):
                        vals = [op_fn(lhs_fn(k), v) for v in values]
                        base = any(vals) if quant == "ANY" else all(vals)
                        return (not base) if neg else base
                    n = sum(1 for k in NK if holds(k))
                    pred = f"{lhs_sql} {op_sql} {quant} ({sub})"
                    if neg:
                        pred = f"NOT ({pred})"
                    emit(n, 1, f"SELECT n_nationkey FROM nation WHERE {pred}")

# quantifiers with ARRAY RHS (exists/forall lambda path)
ARRS = {
    "sequence(0, 2)": [0, 1, 2],
    "array(0, 2, 4)": [0, 2, 4],
    "sequence(0, 4, 2)": [0, 2, 4],
    "array(1, 3)": [1, 3],
}
RVALS = {k: k % 5 for k in NK}  # n_regionkey = n_nationkey % 5
for arr_sql, arr_vals in ARRS.items():
    for op_sql, op_fn in OPS.items():
        for quant in ("ANY", "ALL"):
            def holds(k):
                vals = [op_fn(RVALS[k], v) for v in arr_vals]
                return any(vals) if quant == "ANY" else all(vals)
            n = sum(1 for k in NK if holds(k))
            emit(n, 1, f"SELECT n_nationkey FROM nation WHERE n_regionkey {op_sql} {quant} ({arr_sql})")

# join-spelling matrix over nation x region (exact: every nation has a region)
for rows, cols, sql in [
    (25, 2, "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey"),
    (25, 2, "SELECT n_name, r_name FROM nation INNER JOIN region ON n_regionkey = r_regionkey"),
    (25, 2, "SELECT n_name, r_name FROM nation LEFT JOIN region ON n_regionkey = r_regionkey"),
    (25, 2, "SELECT n_name, r_name FROM nation LEFT OUTER JOIN region ON n_regionkey = r_regionkey"),
    (25, 2, "SELECT n_name, r_name FROM nation RIGHT JOIN region ON n_regionkey = r_regionkey"),
    (25, 2, "SELECT n_name, r_name FROM nation FULL JOIN region ON n_regionkey = r_regionkey"),
    (25, 1, "SELECT n_name FROM nation LEFT SEMI JOIN region ON n_regionkey = r_regionkey"),
    (0, 1, "SELECT n_name FROM nation LEFT ANTI JOIN region ON n_regionkey = r_regionkey"),
    (125, 2, "SELECT n_name, r_name FROM nation CROSS JOIN region"),
    (5, 2, "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey AND n_nationkey < 5"),
    (25, 2, "SELECT n_name, r_name FROM nation, region WHERE n_regionkey = r_regionkey"),
    (1, 1, "SELECT count(*) AS n FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey"),
    (25, 2, "SELECT n.n_name, r.r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"),
    (5, 2, "SELECT a.n_nationkey, b.n_nationkey AS other FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 1 AND a.n_regionkey = 0"),
]:
    emit(rows, cols, sql)

# struct / map family
for rows, cols, sql in [
    (1, 1, "SELECT named_struct('a', 1, 'b', 'x').a AS v"),
    (1, 1, "SELECT struct(1 AS a, 2 AS b).b AS v"),
    (1, 1, "SELECT map('k1', 10, 'k2', 20)['k2'] AS v"),
    (1, 1, "SELECT map_keys(map('a', 1, 'b', 2)) AS v"),
    (1, 1, "SELECT map_values(map('a', 1, 'b', 2)) AS v"),
    (1, 1, "SELECT size(map_entries(map('a', 1, 'b', 2))) AS v"),
    (1, 1, "SELECT element_at(map('x', 7), 'x') AS v"),
    (1, 1, "SELECT element_at(map('x', 7), 'missing') AS v"),
    (1, 1, "SELECT map_contains_key(map('x', 7), 'x') AS v"),
    (1, 1, "SELECT map_concat(map('a', 1), map('b', 2))['b'] AS v"),
    (1, 1, "SELECT map_from_arrays(array('a', 'b'), array(1, 2))['a'] AS v"),
    (1, 1, "SELECT map_filter(map('a', 1, 'b', 2), (k, v) -> v > 1)['b'] AS v"),
    (1, 1, "SELECT transform_values(map('a', 1), (k, v) -> v * 10)['a'] AS v"),
    (1, 1, "SELECT transform_keys(map('a', 1), (k, v) -> upper(k))['A'] AS v"),
    (1, 1, "SELECT map_zip_with(map('a', 1), map('a', 10), (k, x, y) -> x + y)['a'] AS v"),
    (25, 2, "SELECT n_nationkey, struct(n_name, n_regionkey).n_regionkey AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, map('key', n_nationkey)['key'] AS v FROM nation"),
    (1, 1, "SELECT named_struct('outer', named_struct('inner', 42)).outer.inner AS v"),
]:
    emit(rows, cols, sql)

# interval arithmetic
for rows, cols, sql in [
    (1, 1, "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 DAY AS v"),
    (1, 1, "SELECT TIMESTAMP '2024-01-01 00:00:00' - INTERVAL 90 MINUTE AS v"),
    (1, 1, "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS v"),
    (1, 1, "SELECT INTERVAL 2 HOUR + INTERVAL 30 MINUTE AS v"),
    (1, 1, "SELECT INTERVAL '1-6' YEAR TO MONTH AS v"),
    (1, 1, "SELECT INTERVAL '2 12:30:00' DAY TO SECOND AS v"),
    (1, 1, "SELECT CAST(TIMESTAMP '2024-03-01 00:00:00' - TIMESTAMP '2024-02-28 12:00:00' AS STRING) AS v"),
    (1, 1, "SELECT TIMESTAMP '2024-01-01 00:00:00' + 3 * INTERVAL 1 DAY AS v"),
    (1, 1, "SELECT DATE '2024-01-01' + INTERVAL 45 DAY > DATE '2024-02-01' AS v"),
    (50, 2, "SELECT event_id, ts + INTERVAL 15 MINUTE AS v FROM events ORDER BY event_id LIMIT 50"),
    (50, 2, "SELECT event_id, ts - INTERVAL 1 HOUR < ts AS v FROM events ORDER BY event_id LIMIT 50"),
    (1, 1, "SELECT date_trunc('DAY', TIMESTAMP '2024-01-05 13:00:00') + INTERVAL 1 DAY - INTERVAL 1 SECOND AS v"),
]:
    emit(rows, cols, sql)

# event-stream windows (1000 rows @ sf0.001)
for rows, cols, sql in [
    (1000, 2, "SELECT event_id, lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS v FROM events"),
    (1000, 2, "SELECT event_id, lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS v FROM events"),
    (1000, 2, "SELECT event_id, sum(value) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS v FROM events"),
    (1000, 2, "SELECT event_id, avg(value) OVER (PARTITION BY event_type ORDER BY ts RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v FROM events"),
    (1000, 2, "SELECT event_id, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS v FROM events"),
    (1000, 3, "SELECT event_id, value, value - avg(value) OVER (PARTITION BY event_type) AS v FROM events"),
    (15, 2, "SELECT user_id, count(*) AS n FROM events GROUP BY user_id ORDER BY user_id"),
    (-1, 3, "SELECT user_id, ts, value FROM (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rn FROM events) t WHERE rn = 1 ORDER BY user_id"),
]:
    emit(rows, cols, sql)

# generators
for rows, cols, sql in [
    (3, 1, "SELECT explode(array(1, 2, 3)) AS v"),
    (3, 2, "SELECT posexplode(array('a', 'b', 'c')) AS (pos, val)"),
    (1, 1, "SELECT explode_outer(array(7)) AS v"),
    (2, 2, "SELECT explode(map('a', 1, 'b', 2)) AS (k, v)"),
    (10, 2, "SELECT r_regionkey, explode(split(r_name, '')) AS c FROM region WHERE r_regionkey = 2"),
    (125, 2, "SELECT n_nationkey, explode(sequence(1, 5)) AS v FROM nation"),
    (1, 1, "SELECT count(*) AS n FROM (SELECT explode(sequence(1, 100)) AS v) t WHERE v % 10 = 0"),
]:
    emit(rows, cols, sql)
# region 2 is ASIA -> 4 characters, not 10
OUT[-3] = "4\t2\tSELECT r_regionkey, explode(split(r_name, '')) AS c FROM region WHERE r_regionkey = 2"

# ordering edges
for rows, cols, sql in [
    (25, 2, "SELECT n_nationkey, nullif(n_regionkey, 0) AS v FROM nation ORDER BY v NULLS FIRST, n_nationkey"),
    (25, 2, "SELECT n_nationkey, nullif(n_regionkey, 0) AS v FROM nation ORDER BY v NULLS LAST, n_nationkey"),
    (25, 2, "SELECT n_nationkey, nullif(n_regionkey, 4) AS v FROM nation ORDER BY v DESC NULLS FIRST, n_nationkey"),
    (25, 1, "SELECT n_nationkey FROM nation ORDER BY CASE WHEN n_nationkey % 2 = 0 THEN n_nationkey ELSE -n_nationkey END"),
    (25, 1, "SELECT n_nationkey FROM nation ORDER BY n_nationkey % 5, n_nationkey DESC"),
    (10, 1, "SELECT n_nationkey FROM nation ORDER BY abs(n_nationkey - 12), n_nationkey LIMIT 10"),
    (25, 2, "SELECT n_nationkey, n_name FROM nation ORDER BY length(n_name), n_name"),
    (5, 1, "SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey DESC LIMIT 5"),
]:
    emit(rows, cols, sql)

# HAVING variants
for rows, cols, sql in [
    (5, 2, "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey HAVING count(*) = 5 ORDER BY n_regionkey"),
    (0, 2, "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey HAVING count(*) > 5"),
    (5, 2, "SELECT n_regionkey, sum(n_nationkey) AS s FROM nation GROUP BY n_regionkey HAVING sum(n_nationkey) > 0 ORDER BY n_regionkey"),
    (2, 2, "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey HAVING n_regionkey < 2 ORDER BY n_regionkey"),
    (5, 2, "SELECT n_regionkey, max(n_nationkey) AS m FROM nation GROUP BY n_regionkey HAVING max(n_nationkey) >= min(n_nationkey) ORDER BY n_regionkey"),
    (1, 1, "SELECT count(*) AS n FROM nation HAVING count(*) = 25"),
    (0, 1, "SELECT count(*) AS n FROM nation HAVING count(*) > 25"),
    (4, 2, "SELECT n_regionkey, count(*) FILTER (WHERE n_nationkey > 10) AS n FROM nation GROUP BY n_regionkey HAVING count(*) FILTER (WHERE n_nationkey > 10) >= 3 ORDER BY n_regionkey"),
]:
    emit(rows, cols, sql)

# numeric conversions
for rows, cols, sql in [
    (1, 1, "SELECT conv('ff', 16, 10) AS v"),
    (1, 1, "SELECT conv('255', 10, 16) AS v"),
    (1, 1, "SELECT bin(10) AS v"),
    (1, 1, "SELECT hex(255) AS v"),
    (1, 1, "SELECT unhex('4A') AS v"),
    (1, 1, "SELECT bround(2.5, 0) AS v"),
    (1, 1, "SELECT bround(3.5, 0) AS v"),
    (1, 1, "SELECT format_number(1234567.891, 2) AS v"),
    (1, 1, "SELECT signum(-3.2) AS v"),
    (1, 1, "SELECT positive(-7) AS v"),
]:
    emit(rows, cols, sql)

HEADER = ("# generated18 %d — quantifier LHS/array/VALUES sweep, join-spelling"
          " matrix, struct/map family, interval arithmetic, event windows,"
          " generators, ordering/HAVING edges, numeric conversions" % len(OUT))

with open("src/test/resources/battery/shapes.tsv", "a") as f:
    f.write("\n" + HEADER + "\n")
    f.write("\n".join(OUT) + "\n")
print(f"appended {len(OUT)} statements")
