#!/usr/bin/env python3
"""Generate battery section `generated17` — dialect-edge stress families.

Biased at the scanner's hard edges per the round-3 review: the full
quantifier matrix under NOT, chained arrows inside HOF lambdas, temporal FOR
combined with JOINs and path tables in one statement, window-frame sweeps,
and wide function matrices. Expected row counts are computed here (python
mirrors of the set semantics) or pinned from DuckDB-derived sf0.001 facts.
Dev tool — regenerates the generated17 block deterministically.
"""

OUT = []


def emit(rows, cols, sql):
    sql = " ".join(sql.split())
    OUT.append(f"{rows}\t{cols}\t{sql}")


NATION_KEYS = list(range(25))
REGION_KEYS = set(range(5))

# ---------------------------------------------------------------- quantifiers
# Full op x quantifier x NOT x LHS x subquery-set matrix with exact counts.
SETS = {
    "SELECT r_regionkey FROM region": sorted(REGION_KEYS),
    "SELECT r_regionkey FROM region WHERE r_regionkey < 2": [0, 1],
    "SELECT r_regionkey FROM region WHERE 1 = 0": [],
}
LHS = {
    "n_nationkey": lambda k: k,
    "n_nationkey % 5": lambda k: k % 5,
    "n_nationkey - 20": lambda k: k - 20,
}
OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
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
                    n = sum(1 for k in NATION_KEYS if holds(k))
                    pred = f"{lhs_sql} {op_sql} {quant} ({sub})"
                    if neg:
                        pred = f"NOT ({pred})"
                    emit(n, 1, f"SELECT n_nationkey FROM nation WHERE {pred}")

# ------------------------------------------------------------------- HOFs
HOF_ARRAYS = [
    "sequence(1, 5)",
    "sequence(1, n_regionkey + 2)",
    "array(n_nationkey, n_regionkey, 7)",
    "split(n_name, '_')",
]
for arr in HOF_ARRAYS:
    for expr in [
        f"transform({arr}, x -> x)",
        f"filter({arr}, x -> x IS NOT NULL)",
        f"exists({arr}, x -> x IS NULL)",
        f"forall({arr}, x -> x IS NOT NULL)",
        f"size(filter({arr}, x -> x IS NOT NULL))",
        f"array_sort({arr})",
        f"reverse({arr})",
        f"shuffle({arr}) IS NOT NULL",
    ]:
        emit(25, 2, f"SELECT n_nationkey, {expr} AS v FROM nation")
# numeric-only HOFs (sum/zip need numeric arrays)
for arr in ["sequence(1, 5)", "sequence(1, n_regionkey + 2)",
            "array(n_nationkey, n_regionkey, 7)"]:
    for expr in [
        f"aggregate({arr}, 0, (acc, x) -> acc + x)",
        f"aggregate({arr}, 1, (acc, x) -> acc * x, acc -> acc + 100)",
        f"zip_with({arr}, {arr}, (a, b) -> a + b)",
        f"transform({arr}, x -> x * 2 + n_regionkey)",
        f"filter({arr}, x -> x % 2 = 0)",
        f"exists({arr}, x -> x > 3)",
    ]:
        emit(25, 2, f"SELECT n_nationkey, {expr} AS v FROM nation")
# chained / nested lambdas (arrow-disambiguation stress)
for expr in [
    "transform(sequence(1, 3), x -> transform(sequence(1, x), y -> y * 2))",
    "transform(sequence(1, 3), x -> filter(sequence(1, 5), y -> y > x))",
    "filter(transform(sequence(1, 5), x -> x + 1), x -> x % 2 = 0)",
    "aggregate(transform(sequence(1, 4), x -> x * x), 0, (a, x) -> a + x)",
    "transform(sequence(1, 2), x -> aggregate(sequence(1, x), 0, (a, y) -> a + y))",
    "zip_with(sequence(1, 3), transform(sequence(1, 3), x -> x * 10), (a, b) -> b - a)",
    "exists(sequence(1, 5), x -> exists(sequence(1, x), y -> y = 3))",
    "array_sort(array(3, 1, 2), (a, b) -> CASE WHEN a < b THEN -1 WHEN a > b THEN 1 ELSE 0 END)",
]:
    emit(25, 2, f"SELECT n_nationkey, {expr} AS v FROM nation")
# JSON arrows INSIDE lambdas and mixed with lambdas (the scanner edge)
for rows, cols, sql in [
    (20, 2, "SELECT event_id, transform(array(props), p -> p ->> 'k') AS a FROM events ORDER BY event_id LIMIT 20"),
    (20, 2, "SELECT event_id, aggregate(array(props), '', (acc, p) -> concat(acc, p ->> 'k')) AS a FROM events ORDER BY event_id LIMIT 20"),
    (20, 3, "SELECT event_id, props ->> 'k' AS k, filter(sequence(1, 3), x -> x > 1) AS f FROM events ORDER BY event_id LIMIT 20"),
    (20, 2, "SELECT event_id, transform(sequence(1, 2), x -> props ->> 'k') AS a FROM events ORDER BY event_id LIMIT 20"),
    (20, 2, "SELECT event_id, exists(array(props), p -> (p -> 'k') IS NOT NULL) AS e FROM events ORDER BY event_id LIMIT 20"),
    (1, 1, "SELECT aggregate(sequence(1, 3), '', (acc, x) -> concat(acc, '{\"k\": 1}' ->> 'k')) AS v"),
    (20, 2, "SELECT event_id, CASE WHEN exists(sequence(1, 2), x -> x = CAST(props ->> 'k' AS INT) % 2) THEN 'y' ELSE 'n' END AS c FROM events ORDER BY event_id LIMIT 20"),
]:
    emit(rows, cols, sql)

# ----------------------------------------------------------------- windows
RANKERS = ["row_number()", "rank()", "dense_rank()", "percent_rank()",
           "cume_dist()", "ntile(4)", "lag(n_nationkey, 1)",
           "lead(n_nationkey, 1)", "lag(n_nationkey, 2, -1)",
           "lead(n_nationkey, 2, -1)"]
for f in RANKERS:
    for part in ["PARTITION BY n_regionkey ", ""]:
        emit(25, 2, f"SELECT n_nationkey, {f} OVER ({part}ORDER BY n_nationkey) AS w FROM nation")
FRAMES = [
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
]
for agg in ["sum(n_nationkey)", "avg(n_nationkey)", "min(n_nationkey)",
            "max(n_nationkey)", "count(*)"]:
    for frame in FRAMES:
        emit(25, 2, f"SELECT n_nationkey, {agg} OVER (PARTITION BY n_regionkey ORDER BY n_nationkey {frame}) AS w FROM nation")
for f in ["first_value(n_name)", "last_value(n_name)", "nth_value(n_name, 2)"]:
    for frame in FRAMES[:3]:
        emit(25, 2, f"SELECT n_nationkey, {f} OVER (PARTITION BY n_regionkey ORDER BY n_nationkey {frame}) AS w FROM nation")
# named WINDOW clause
emit(25, 3, "SELECT n_nationkey, row_number() OVER w AS r, sum(n_nationkey) OVER w AS s FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey)")
emit(10, 2, "SELECT s_suppkey, rank() OVER (ORDER BY s_acctbal DESC) AS r FROM supplier")
emit(10, 2, "SELECT s_suppkey, sum(s_acctbal) OVER (ORDER BY s_suppkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w FROM supplier")

# ---------------------------------------------------------------- temporal
# events @ sf0.001: 1000 rows, all of Jan 2024; pinned DuckDB-derived counts.
for rows, cols, sql in [
    (1, 1, "SELECT count(*) AS n FROM events FOR '2024-01-10'"),
    (1, 1, "SELECT count(*) AS n FROM events FOR DATES BETWEEN '2024-01-05' AND '2024-01-08'"),
    (1, 1, "SELECT count(*) AS n FROM events FOR DATES SINCE '2024-01-25'"),
    (0, 2, "SELECT event_id, value FROM events FOR LAST 3 DAYS"),
    (0, 2, "SELECT event_id, value FROM events FOR TODAY"),
    (0, 2, "SELECT event_id, value FROM events FOR YESTERDAY"),
    (0, 2, "SELECT event_id, value FROM events FOR DATES IN THIS_MONTH"),
    (0, 2, "SELECT event_id, value FROM events FOR DATES IN LAST_MONTH"),
    (5, 2, "SELECT event_type, count(*) AS n FROM events FOR DATES SINCE '2024-01-25' GROUP BY event_type ORDER BY event_type"),
    # temporal FOR + JOIN + aggregation in one statement (alias before FOR)
    (1, 1, "SELECT count(*) AS n FROM events e FOR DATES SINCE '2024-01-01' JOIN nation ON n_nationkey = e.user_id"),
    (-1, 2, "SELECT n_name, count(*) AS n FROM events e FOR DATES BETWEEN '2024-01-05' AND '2024-01-08' JOIN nation ON n_nationkey = e.user_id GROUP BY n_name ORDER BY n_name"),
    # temporal FOR + path table join (scanner edge: FOR, path, JOIN in one)
    (1, 1, "SELECT count(*) AS n FROM events e FOR DATES SINCE '2024-01-25' JOIN '/root/testdata/sf0.001/region.parquet' r ON r.r_regionkey = e.user_id % 5"),
    (-1, 2, "SELECT r.r_name, count(*) AS n FROM events e FOR '2024-01-10' JOIN '/root/testdata/sf0.001/region.parquet' r ON r.r_regionkey = e.user_id % 5 GROUP BY r.r_name ORDER BY r.r_name"),
    # FOR + subquery + window
    (-1, 2, "SELECT event_id, row_number() OVER (ORDER BY event_id) AS r FROM events FOR DATES SINCE '2024-01-28' ORDER BY event_id LIMIT 50"),
    (1, 1, "SELECT count(*) AS n FROM (SELECT user_id FROM events FOR DATES SINCE '2024-01-25' GROUP BY user_id) t"),
]:
    emit(rows, cols, sql)
# row-level twins with pinned sf0.001 counts
emit(36, 1, "SELECT event_id FROM events FOR '2024-01-10'")
emit(144, 1, "SELECT event_id FROM events FOR DATES BETWEEN '2024-01-05' AND '2024-01-08'")
emit(178, 1, "SELECT event_id FROM events FOR DATES SINCE '2024-01-25'")

# --------------------------------------------------------------- aggregates
AGGS_1COL = [
    "count(*)", "count(n_nationkey)", "count(DISTINCT n_regionkey)",
    "sum(n_nationkey)", "avg(n_nationkey)", "min(n_nationkey)",
    "max(n_nationkey)", "median(n_nationkey)",
    "percentile(n_nationkey, 0.5)", "stddev(n_nationkey)",
    "stddev_pop(n_nationkey)", "variance(n_nationkey)",
    "var_pop(n_nationkey)", "skewness(n_nationkey)",
    "kurtosis(n_nationkey)", "bool_and(n_nationkey >= 0)",
    "bool_or(n_nationkey > 23)", "bit_and(n_nationkey)",
    "bit_or(n_nationkey)", "bit_xor(n_nationkey)",
    "count_if(n_nationkey > 10)", "any_value(n_regionkey) IS NOT NULL",
    "first(n_nationkey)", "last(n_nationkey)",
    "max_by(n_name, n_nationkey)", "min_by(n_name, n_nationkey)",
    "approx_count_distinct(n_nationkey)", "size(collect_list(n_nationkey))",
    "size(collect_set(n_regionkey))", "corr(n_nationkey, n_regionkey)",
    "covar_pop(n_nationkey, n_regionkey)", "covar_samp(n_nationkey, n_regionkey)",
    "sum(n_nationkey) FILTER (WHERE n_regionkey = 0)",
    "count(*) FILTER (WHERE n_nationkey % 2 = 0)",
]
for a in AGGS_1COL:
    emit(1, 1, f"SELECT {a} AS v FROM nation")
    emit(5, 2, f"SELECT n_regionkey, {a} AS v FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
    emit(2, 2, f"SELECT n_nationkey % 2 AS g, {a} AS v FROM nation GROUP BY n_nationkey % 2 ORDER BY g")

# ----------------------------------------------------------------- strings
STR_FNS = [
    "upper(n_name)", "lower(n_name)", "initcap(lower(n_name))",
    "title(lower(n_name))", "reverse(n_name)", "ltrim('  x  ')",
    "rtrim('  x  ')", "trim('  x  ')", "lpad(n_name, 12, '*')",
    "rpad(n_name, 12, '*')", "left(n_name, 6)", "right(n_name, 2)",
    "substr(n_name, 1, 6)", "substring(n_name, 8)",
    "replace(n_name, 'NATION', 'N')", "translate(n_name, 'NAT', 'nat')",
    "repeat(right(n_name, 1), 3)", "split_part(n_name, '_', 2)",
    "concat(n_name, ':', n_regionkey)", "concat_ws('-', n_name, n_regionkey)",
    "length(n_name)", "char_length(n_name)", "octet_length(n_name)",
    "ascii(n_name)", "chr(65 + n_regionkey)",
    "levenshtein(n_name, 'NATION_0')", "instr(n_name, '_')",
    "locate('_', n_name)", "position('_' IN n_name)",
    "startswith(n_name, 'NATION')", "endswith(n_name, '0')",
    "contains(n_name, 'ION')", "format_string('%s/%d', n_name, n_regionkey)",
    "regexp_replace(n_name, '[0-9]+', '#')",
    "regexp_extract(n_name, '([0-9]+)', 1)",
    "regexp_count(n_name, '[0-9]')", "soundex(n_name)",
    "n_name LIKE 'NATION%'", "n_name ILIKE 'nation%'",
    "n_name RLIKE '_[0-9]$'",
]
for f in STR_FNS:
    emit(25, 2, f"SELECT n_nationkey, {f} AS v FROM nation")
for f in ["upper(r_name)", "md5(r_name)", "sha2(r_name, 256)",
          "base64(CAST(r_name AS BINARY))", "hex(r_regionkey)",
          "reverse(r_name)", "length(r_name)", "trim(BOTH 'A' FROM r_name)",
          "overlay(r_name PLACING 'xx' FROM 2)", "split(r_name, ' ')"]:
    emit(5, 2, f"SELECT r_regionkey, {f} AS v FROM region")
# LIKE pattern sweep with exact counts over NATION_0..NATION_24
import re as _re
NAMES = [f"NATION_{k}" for k in NATION_KEYS]


def like_to_re(p, escape=None):
    out = ""
    i = 0
    while i < len(p):
        c = p[i]
        if escape and c == escape and i + 1 < len(p):
            out += _re.escape(p[i + 1]); i += 2; continue
        if c == "%":
            out += ".*"
        elif c == "_":
            out += "."
        else:
            out += _re.escape(c)
        i += 1
    return "^" + out + "$"


LIKES = ["NATION%", "NATION!_5", "NATION_1_", "NATION_2", "%_2%", "%4",
         "N%0", "NATION!_1%", "%TION!_%"]
for p in LIKES:
    if "!" in p:
        n = sum(1 for s in NAMES if _re.match(like_to_re(p, "!"), s))
        emit(n, 1, f"SELECT n_name FROM nation WHERE n_name LIKE '{p}' ESCAPE '!'")
    else:
        n = sum(1 for s in NAMES if _re.match(like_to_re(p), s))
        emit(n, 1, f"SELECT n_name FROM nation WHERE n_name LIKE '{p}'")
for p, rx in [("nation%", "(?i)^nation.*$"), ("%_1_", "(?i)^.*.1.$")]:
    n = sum(1 for s in NAMES if _re.match(rx, s))
    emit(n, 1, f"SELECT n_name FROM nation WHERE n_name ILIKE '{p}'")
for rx in ["_[0-9]$", "^NATION_2[0-4]$", "1[0-9]$", "^N.*[02468]$"]:
    n = sum(1 for s in NAMES if _re.search(rx, s))
    emit(n, 1, f"SELECT n_name FROM nation WHERE n_name RLIKE '{rx}'")

# ------------------------------------------------------------------- dates
DATE_FNS = [
    "year(ts)", "quarter(ts)", "month(ts)", "day(ts)", "dayofweek(ts)",
    "dayofyear(ts)", "weekofyear(ts)", "hour(ts)", "minute(ts)",
    "second(ts)", "to_date(ts)", "date_trunc('WEEK', ts)",
    "date_add(to_date(ts), 7)", "date_sub(to_date(ts), 7)",
    "add_months(ts, 2)", "months_between(ts, TIMESTAMP '2024-06-01 00:00:00')",
    "datediff(DATE '2024-06-01', ts)", "last_day(ts)",
    "next_day(ts, 'MON')", "date_format(ts, 'yyyy-MM-dd HH')",
    "date_format(ts, 'EEEE')", "unix_timestamp(ts)",
    "from_unixtime(unix_timestamp(ts))", "extract(DOW FROM ts)",
    "extract(YEAR FROM ts)", "date_part('month', ts)",
    "timestampadd(HOUR, 3, ts)", "timestampdiff(DAY, ts, TIMESTAMP '2024-02-01 00:00:00')",
    "ts + INTERVAL 90 MINUTE", "ts - INTERVAL 1 DAY",
    "make_date(2024, month(ts), 1)", "trunc(to_date(ts), 'MM')",
]
for f in DATE_FNS:
    emit(50, 2, f"SELECT event_id, {f} AS v FROM events ORDER BY event_id LIMIT 50")
emit(1, 1, "SELECT count(DISTINCT year(ts)) AS n FROM events")
emit(1, 1, "SELECT count(DISTINCT to_date(ts)) AS n FROM events")
emit(1, 1, "SELECT count(DISTINCT month(ts)) AS n FROM events")

# ------------------------------------------------------------------- casts
for rows, cols, sql in [
    (1, 1, "SELECT TRY_CAST('abc' AS INTEGER) AS v"),
    (1, 1, "SELECT TRY_CAST('42' AS INTEGER) AS v"),
    (1, 1, "SELECT TRY_CAST('3.14' AS DOUBLE) AS v"),
    (1, 1, "SELECT TRY_CAST('2024-13-40' AS DATE) AS v"),
    (1, 1, "SELECT TRY_CAST('2024-03-01' AS DATE) AS v"),
    (1, 1, "SELECT TRY_CAST('not a ts' AS TIMESTAMP) AS v"),
    (1, 1, "SELECT SAFE_CAST('abc' AS INTEGER) AS v"),
    (1, 1, "SELECT SAFE_CAST('7' AS BIGINT) AS v"),
    (1, 1, "SELECT CAST('true' AS BOOLEAN) AS v"),
    (1, 1, "SELECT CAST(1 AS BOOLEAN) AS v"),
    (1, 1, "SELECT CAST(3.99 AS INTEGER) AS v"),
    (1, 1, "SELECT CAST(3 AS DECIMAL(10, 2)) AS v"),
    (1, 1, "SELECT CAST(X'41' AS STRING) AS v"),
    (1, 1, "SELECT '123'::INTEGER AS v"),
    (1, 1, "SELECT '3.5'::DOUBLE AS v"),
    (1, 1, "SELECT 42::VARCHAR AS v"),
    (1, 1, "SELECT '2024-01-01'::DATE AS v"),
    (1, 1, "SELECT BLOB('abc') IS NOT NULL AS v"),
    (25, 2, "SELECT n_nationkey, CAST(n_nationkey AS VARCHAR) AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, n_nationkey::DOUBLE AS v FROM nation"),
    (1000, 2, "SELECT event_id, TRY_CAST(props ->> 'k' AS INTEGER) AS v FROM events"),
    (1, 1, "SELECT CAST(CAST('2024-01-05' AS DATE) AS TIMESTAMP) AS v"),
    (1, 1, "SELECT TRY_CAST('' AS INTEGER) AS v"),
    (1, 1, "SELECT CAST(true AS INTEGER) AS v"),
    (1, 1, "SELECT CAST(INTERVAL 1 DAY AS STRING) AS v"),
]:
    emit(rows, cols, sql)

# -------------------------------------------------------------------- JSON
for rows, cols, sql in [
    (1, 1, "SELECT '{\"a\": {\"b\": [1, 2, 3]}}' -> 'a' AS v"),
    (1, 1, "SELECT ('{\"a\": {\"b\": 2}}' -> 'a') ->> 'b' AS v"),
    (1, 1, "SELECT '{\"a\": 1, \"b\": 2}' @> '{\"a\": 1}' AS v"),
    (1, 1, "SELECT '{\"a\": 1}' @? '$.a' AS v"),
    (1, 1, "SELECT '{\"a\": 1}' @? '$.missing' AS v"),
    (1, 1, "SELECT json_object_keys('{\"x\": 1, \"y\": 2}') AS v"),
    (1, 1, "SELECT get_json_object('{\"a\": {\"b\": 7}}', '$.a.b') AS v"),
    (1, 1, "SELECT get_string('{\"a\": \"z\"}', 'a') AS v"),
    (1, 1, "SELECT to_json(struct(1 AS a, 'x' AS b)) AS v"),
    (1, 1, "SELECT from_json('{\"a\": 5}', 'a INT').a AS v"),
    (1, 1, "SELECT json_array_length('[1, 2, 3, 4]') AS v"),
    (1, 2, "SELECT '{\"k\": 9}' ->> 'k' AS a, '[1,2]' -> 1 AS b"),
    (1000, 2, "SELECT event_id, props -> 'k' AS v FROM events"),
    (1000, 2, "SELECT event_id, props @> '{\"k\": 87}' AS v FROM events"),
    (1, 1, "SELECT count(*) AS n FROM events WHERE props @? '$.k'"),
    (1, 1, "SELECT count(*) AS n FROM events WHERE (props ->> 'k') IS NOT NULL"),
    (1, 1, "SELECT CASE WHEN '{\"a\":1}' @? '$.a' THEN '{\"b\":2}' ->> 'b' ELSE 'x' END AS v"),
    (-1, 2, "SELECT CAST(props ->> 'k' AS INT) % 10 AS m, count(*) AS n FROM events GROUP BY m ORDER BY m"),
]:
    emit(rows, cols, sql)

# --------------------------------------------------------- numerics/bitwise
NUM_FNS = [
    "abs(n_nationkey - 12)", "sign(n_nationkey - 12)", "mod(n_nationkey, 7)",
    "pmod(n_nationkey - 12, 7)", "power(n_nationkey, 2)", "sqrt(n_nationkey)",
    "cbrt(n_nationkey)", "exp(n_regionkey)", "ln(n_nationkey + 1)",
    "log10(n_nationkey + 1)", "log2(n_nationkey + 1)", "log(2, n_nationkey + 1)",
    "floor(n_nationkey / 2.0)", "ceil(n_nationkey / 2.0)",
    "round(n_nationkey / 7.0, 2)", "negative(n_nationkey)",
    "sin(n_nationkey)", "cos(n_nationkey)", "tan(n_regionkey)",
    "atan2(n_nationkey, 3)", "degrees(n_regionkey)", "radians(n_nationkey)",
    "greatest(n_nationkey, 12, n_regionkey)", "least(n_nationkey, 12, n_regionkey)",
    "n_nationkey & 12", "n_nationkey | 12", "n_nationkey ^ 12",
    "xor(n_nationkey, 21)", "n_nationkey << 2", "n_nationkey >> 1",
    "bit_count(n_nationkey)", "shiftleft(n_nationkey, 1)",
    "shiftright(n_nationkey, 1)", "factorial(n_regionkey)",
    "isnan(CAST(n_nationkey AS DOUBLE) / 0 * 0)", "rint(n_nationkey / 3.0)",
    "hypot(n_nationkey, n_regionkey)", "e() > 2.7", "pi() > 3.1",
    "phi() > 1.6",
]
for f in NUM_FNS:
    emit(25, 2, f"SELECT n_nationkey, {f} AS v FROM nation")
for rows, cols, sql in [
    (1, 1, "SELECT 0x1F + 1_000 AS v"),
    (1, 1, "SELECT 0xFF & 0x0F AS v"),
    (1, 1, "SELECT 0xA * 0x10 AS v"),
    (1, 1, "SELECT 1_000_000 / 1_000 AS v"),
    (1, 1, "SELECT 1e3 + 1 AS v"),
    (1, 1, "SELECT 2.5e-1 AS v"),
    (1, 1, "SELECT -0x10 AS v"),
    (1, 1, "SELECT 0x0 AS v"),
    (1, 2, "SELECT 0x10 AS a, 1_0 AS b"),
]:
    emit(rows, cols, sql)

# ----------------------------------------------------------------- set ops
NK = NATION_KEYS
RK = sorted(REGION_KEYS)


def multiset_except(a, b):
    from collections import Counter
    ca, cb = Counter(a), Counter(b)
    return sum(max(0, ca[x] - cb[x]) for x in ca)


def multiset_intersect(a, b):
    from collections import Counter
    ca, cb = Counter(a), Counter(b)
    return sum(min(ca[x], cb[x]) for x in set(a) | set(b))


PROJ = {
    "n_nationkey": NK,
    "n_nationkey % 5": [k % 5 for k in NK],
    "n_regionkey": [k // 5 for k in NK] if False else None,  # order unknown; use %5 distribution facts
}
del PROJ["n_regionkey"]
for lhs_sql, lhs_vals in PROJ.items():
    for rhs_sql, rhs_vals in {"r_regionkey": RK}.items():
        emit(len(set(lhs_vals) | set(rhs_vals)), 1,
             f"SELECT {lhs_sql} AS k FROM nation UNION SELECT {rhs_sql} AS k FROM region")
        emit(len(lhs_vals) + len(rhs_vals), 1,
             f"SELECT {lhs_sql} AS k FROM nation UNION ALL SELECT {rhs_sql} AS k FROM region")
        emit(len(set(lhs_vals) & set(rhs_vals)), 1,
             f"SELECT {lhs_sql} AS k FROM nation INTERSECT SELECT {rhs_sql} AS k FROM region")
        emit(multiset_intersect(lhs_vals, rhs_vals), 1,
             f"SELECT {lhs_sql} AS k FROM nation INTERSECT ALL SELECT {rhs_sql} AS k FROM region")
        emit(len(set(lhs_vals) - set(rhs_vals)), 1,
             f"SELECT {lhs_sql} AS k FROM nation EXCEPT SELECT {rhs_sql} AS k FROM region")
        emit(multiset_except(lhs_vals, rhs_vals), 1,
             f"SELECT {lhs_sql} AS k FROM nation EXCEPT ALL SELECT {rhs_sql} AS k FROM region")
# nested set ops + order/limit
for rows, cols, sql in [
    (5, 1, "(SELECT n_nationkey AS k FROM nation INTERSECT SELECT r_regionkey FROM region) ORDER BY k LIMIT 10"),
    (3, 1, "(SELECT n_nationkey AS k FROM nation EXCEPT SELECT r_regionkey FROM region) ORDER BY k LIMIT 3"),
    (25, 1, "(SELECT n_nationkey AS k FROM nation UNION SELECT r_regionkey FROM region) ORDER BY k"),
    (5, 1, "SELECT k FROM (SELECT n_nationkey AS k FROM nation UNION ALL SELECT r_regionkey FROM region) t WHERE k < 5 GROUP BY k ORDER BY k"),
    (2, 1, "(SELECT r_regionkey AS k FROM region INTERSECT SELECT n_nationkey FROM nation) INTERSECT SELECT n_nationkey % 2 AS k FROM nation ORDER BY k"),
    (25, 2, "SELECT side, k FROM (SELECT 'a' AS side, n_nationkey AS k FROM nation UNION ALL SELECT 'b', r_regionkey FROM region) t WHERE side = 'a' ORDER BY k"),
]:
    emit(rows, cols, sql)

# ---------------------------------------------------------------- subqueries
for rows, cols, sql in [
    (5, 1, "SELECT r_regionkey FROM region WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey)"),
    (0, 1, "SELECT r_regionkey FROM region WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey)"),
    (25, 2, "SELECT n_name, (SELECT max(r_regionkey) FROM region) AS m FROM nation"),
    (25, 2, "SELECT n_name, (SELECT r_name FROM region WHERE r_regionkey = n_regionkey) AS rn FROM nation"),
    (5, 1, "SELECT n_nationkey FROM nation WHERE n_nationkey IN (SELECT r_regionkey FROM region)"),
    (20, 1, "SELECT n_nationkey FROM nation WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region)"),
    (0, 1, "SELECT n_nationkey FROM nation WHERE n_nationkey NOT IN (SELECT CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END FROM region)"),
    (1, 1, "SELECT count(*) AS n FROM nation WHERE n_regionkey = (SELECT min(r_regionkey) FROM region)"),
    (5, 2, "SELECT r_regionkey, (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey) AS n FROM region ORDER BY r_regionkey"),
    (1, 1, "SELECT count(*) AS n FROM (SELECT n_regionkey FROM nation WHERE n_nationkey IN (SELECT r_regionkey FROM region WHERE r_regionkey > 1)) t"),
    (5, 1, "SELECT n_nationkey FROM nation WHERE EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_nationkey)"),
    (25, 1, "SELECT n_nationkey FROM nation WHERE EXISTS (SELECT 1 FROM region)"),
    (0, 1, "SELECT n_nationkey FROM nation WHERE NOT EXISTS (SELECT 1 FROM region)"),
    (1, 1, "SELECT (SELECT (SELECT max(r_regionkey) FROM region) + 1) AS v"),
    (4, 1, "SELECT n_nationkey FROM nation WHERE n_nationkey < (SELECT max(r_regionkey) FROM region)"),
    (25, 2, "SELECT n_nationkey, CASE WHEN n_nationkey IN (SELECT r_regionkey FROM region) THEN 'dim' ELSE 'fact' END AS side FROM nation"),
    (1, 1, "SELECT count(*) AS n FROM region r1 WHERE r_regionkey <= ALL (SELECT r_regionkey FROM region r2 WHERE r2.r_regionkey >= r1.r_regionkey)"),
]:
    emit(rows, cols, sql)

# ------------------------------------------------- grouping analytics
for rows, cols, sql in [
    (6, 2, "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY ROLLUP(n_regionkey) ORDER BY n_regionkey NULLS FIRST"),
    (18, 3, "SELECT n_regionkey, n_nationkey % 2 AS p, count(*) AS n FROM nation GROUP BY CUBE(n_regionkey, n_nationkey % 2) ORDER BY n_regionkey NULLS FIRST, p NULLS FIRST"),
    (6, 2, "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY GROUPING SETS ((n_regionkey), ()) ORDER BY n_regionkey NULLS FIRST"),
    (7, 3, "SELECT n_regionkey, n_nationkey % 2 AS p, count(*) AS n FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey % 2)) ORDER BY n_regionkey NULLS FIRST, p NULLS FIRST"),
    (6, 3, "SELECT n_regionkey, grouping(n_regionkey) AS g, count(*) AS n FROM nation GROUP BY ROLLUP(n_regionkey) ORDER BY g, n_regionkey"),
    (16, 3, "SELECT n_regionkey, n_nationkey % 2 AS p, count(*) AS n FROM nation GROUP BY ROLLUP(n_regionkey, n_nationkey % 2) ORDER BY n_regionkey NULLS FIRST, p NULLS FIRST"),
    (5, 2, "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY ALL ORDER BY n_regionkey"),
    (5, 2, "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY 1 ORDER BY 1"),
]:
    emit(rows, cols, sql)

# -------------------------------------------------------- conditionals/misc
for rows, cols, sql in [
    (25, 2, "SELECT n_nationkey, CASE n_regionkey WHEN 0 THEN 'z' WHEN 1 THEN 'o' ELSE '?' END AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, CASE WHEN n_nationkey < 5 THEN CASE WHEN n_nationkey < 2 THEN 'a' ELSE 'b' END ELSE 'c' END AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, iif(n_nationkey % 2 = 0, 'even', 'odd') AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, coalesce(nullif(n_regionkey, 0), -1) AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, nvl(nullif(n_regionkey, 2), 99) AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, nvl2(nullif(n_regionkey, 2), 'set', 'null') AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, ifnotnull(nullif(n_regionkey, 0), 'has') AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, greatest(least(n_nationkey, 20), 5) AS v FROM nation"),
    (13, 1, "SELECT n_nationkey FROM nation WHERE iif(n_nationkey % 2 = 0, true, false)"),
    (25, 2, "SELECT n_nationkey, CASE WHEN n_nationkey IN (1, 3, 5) THEN 'odd3' WHEN n_nationkey BETWEEN 10 AND 12 THEN 'teens' ELSE 'rest' END AS v FROM nation"),
    (1, 1, "SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'x' ELSE 'null-is-false' END AS v"),
    (25, 2, "SELECT n_nationkey, isnull(nullif(n_regionkey, 1)) AS v FROM nation"),
    (25, 2, "SELECT n_nationkey, isnotnull(nullif(n_regionkey, 1)) AS v FROM nation"),
    (5, 1, "SELECT n_nationkey FROM nation WHERE nullif(n_regionkey, 0) IS NULL"),
    (20, 1, "SELECT n_nationkey FROM nation WHERE nullif(n_regionkey, 0) IS NOT NULL"),
]:
    emit(rows, cols, sql)

# ------------------------------------------------------- arrays (non-HOF)
ARR_FNS = [
    ("array_contains(sequence(1, 5), 3)", 1),
    ("array_position(array(7, 8, 9), 9)", 1),
    ("array_max(sequence(1, 9))", 1),
    ("array_min(sequence(3, 9))", 1),
    ("array_distinct(array(1, 1, 2, 3, 3))", 1),
    ("array_union(sequence(1, 3), sequence(3, 5))", 1),
    ("array_intersect(sequence(1, 5), sequence(4, 8))", 1),
    ("array_except(sequence(1, 5), sequence(4, 8))", 1),
    ("array_remove(sequence(1, 5), 3)", 1),
    ("array_repeat('x', 3)", 1),
    ("array_join(sequence(1, 3), '-')", 1),
    ("slice(sequence(1, 10), 3, 4)", 1),
    ("flatten(array(sequence(1, 2), sequence(3, 4)))", 1),
    ("arrays_zip(sequence(1, 3), sequence(4, 6))", 1),
    ("arrays_overlap(sequence(1, 3), sequence(3, 5))", 1),
    ("sort_array(array(3, 1, 2), false)", 1),
    ("sort(array(3, 1, 2))", 1),
    ("element_at(sequence(10, 20), 2)", 1),
    ("sequence(1, 9, 2)", 1),
    ("array_compact(array(1, NULL, 2))", 1),
    ("array_append(sequence(1, 3), 9)", 1),
    ("array_prepend(sequence(1, 3), 0)", 1),
    ("array_insert(sequence(1, 3), 2, 99)", 1),
    ("array_size(sequence(2, 8))", 1),
    ("cardinality(sequence(2, 8))", 1),
    ("array_contains_any(sequence(1, 3), sequence(3, 5))", 1),
    ("array_contains_all(sequence(1, 5), sequence(2, 3))", 1),
]
for f, rows in ARR_FNS:
    emit(rows, 1, f"SELECT {f} AS v")
for rows, cols, sql in [
    (16, 1, "SELECT unnest(string_split(p_name, ' ')) AS w FROM part WHERE p_partkey < 8"),
    (-1, 2, "SELECT w, count(*) AS n FROM (SELECT unnest(split(p_name, ' ')) AS w FROM part) t GROUP BY w ORDER BY w"),
    (5, 2, "SELECT r_regionkey, explode(sequence(1, 1)) AS e FROM region"),
    (10, 2, "SELECT r_regionkey, explode(sequence(1, 2)) AS e FROM region"),
    (3, 1, "SELECT unnest(array(1, 2, 3)) AS v"),
    (1, 1, "SELECT size(split(trim('a b c'), ' ')) AS v"),
]:
    emit(rows, cols, sql)

# --------------------------------------------------------- order/limit/misc
for rows, cols, sql in [
    (10, 1, "SELECT n_nationkey FROM nation ORDER BY n_nationkey DESC LIMIT 10"),
    (10, 1, "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 10 OFFSET 5"),
    (5, 1, "SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 20"),
    (0, 1, "SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 25"),
    (25, 1, "SELECT n_nationkey FROM nation ORDER BY n_name DESC, n_nationkey"),
    (25, 2, "SELECT n_nationkey, n_name FROM nation ORDER BY 2 DESC"),
    (5, 1, "SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey DESC"),
    (25, 1, "SELECT n_nationkey FROM nation ORDER BY n_nationkey % 3, n_nationkey"),
    (3, 1, "SELECT n_nationkey FROM nation ORDER BY rand() LIMIT 3"),
    (25, 2, "SELECT n_nationkey, n_name FROM nation ORDER BY upper(n_name), 1"),
    (5, 2, "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name DESC"),
    (5, 2, "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_nationkey FROM nation ORDER BY n_regionkey, n_nationkey"),
    (1, 2, "SELECT DISTINCT ON (g) g, v FROM (SELECT n_nationkey % 1 AS g, n_nationkey AS v FROM nation) t ORDER BY g, v"),
]:
    emit(rows, cols, sql)

# ------------------------------------------------------------------- CTEs
for rows, cols, sql in [
    (5, 2, "WITH rc AS (SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey) SELECT * FROM rc ORDER BY n_regionkey"),
    (5, 3, "WITH rc AS (SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey), rx AS (SELECT r_regionkey, r_name FROM region) SELECT rc.n_regionkey, rx.r_name, rc.n FROM rc JOIN rx ON rc.n_regionkey = rx.r_regionkey ORDER BY 1"),
    (1, 1, "WITH a AS (SELECT 1 AS x), b AS (SELECT x + 1 AS y FROM a), c AS (SELECT y * 2 AS z FROM b) SELECT z FROM c"),
    (25, 1, "WITH a AS (SELECT n_nationkey AS k FROM nation) SELECT a1.k FROM a a1 JOIN a a2 ON a1.k = a2.k ORDER BY a1.k"),
    (1, 2, "WITH t AS (SELECT max(n_nationkey) AS mx, min(n_nationkey) AS mn FROM nation) SELECT mx, mn FROM t"),
    (5, 1, "WITH lim AS (SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5) SELECT * FROM lim ORDER BY n_nationkey"),
]:
    emit(rows, cols, sql)

HEADER = ("# generated17 %d — quantifier matrix under NOT (op x ANY/ALL x LHS x set),"
          " chained-arrow HOF lambdas, temporal FOR + JOIN + path tables in one"
          " statement, window-frame sweep, agg/string/date/cast/JSON/numeric"
          " matrices, LIKE-pattern exact counts, multiset set ops" % len(OUT))

with open("src/test/resources/battery/shapes.tsv", "a") as f:
    f.write("\n" + HEADER + "\n")
    f.write("\n".join(OUT) + "\n")
print(f"appended {len(OUT)} statements")
