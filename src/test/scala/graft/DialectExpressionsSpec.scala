package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge-type matrix for the RuntimeReplaceable dialect expressions
  * (functions/DialectExpressions.scala). Replacement-time dispatch has no
  * analyzer safety net — an unresolvable replacement surfaces as
  * INTERNAL_ERROR, not a user error — so every expression is probed with
  * untyped NULL literals, empty arrays, type-mismatched pairs, and BINARY
  * inputs (the classes behind the r10 `ifnull(NULL, x)` crash).
  */
class DialectExpressionsSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = Graft(spark)

  // ---------------------------------------------------------------- ifnull
  test("ifnull: untyped NULL primary coerces toward the fallback") {
    val r = g.query(
      "SELECT ifnull(NULL, 9) AS a, ifnull(NULL, 'x') AS b, ifnull(NULL, NULL) AS c").head()
    assert(r.getAs[Number]("a").intValue == 9)
    assert(r.getString(1) == "x")
    assert(r.isNullAt(2))
  }

  test("ifnull: untyped NULL fallback, numeric widening, mismatched pair") {
    val r = g.query(
      "SELECT ifnull(9, NULL) AS a, ifnull(1, 2.5) AS b, " +
        "ifnull(CAST(NULL AS INT), 7) AS c").head()
    assert(r.getAs[Number](0).intValue == 9)
    assert(r.getAs[Number](1).doubleValue == 1.0)
    assert(r.getAs[Number](2).intValue == 7)
  }

  // ------------------------------------------------------- least / greatest
  test("least/greatest: single scalar, untyped NULL, array form, empty array") {
    val r = g.query(
      "SELECT least(5) AS a, least(NULL) AS b, greatest(array(1, 5, 3)) AS c, " +
        "least(array()) AS d, least(NULL, 5) AS e, greatest(1, 2.5) AS f").head()
    assert(r.getAs[Number](0).intValue == 5)
    assert(r.isNullAt(1))
    assert(r.getAs[Number](2).intValue == 5)
    assert(r.isNullAt(3))
    assert(r.getAs[Number](4).intValue == 5)
    assert(r.getAs[Number](5).doubleValue == 2.5)
  }

  // ------------------------------------------------------------ -> and ->>
  test("extract: untyped NULL and BINARY inputs route through JSON text") {
    val r = g.query(
      "SELECT NULL -> 'a' AS a, CAST('{\"a\":1}' AS BINARY) ->> 'a' AS b, " +
        "'{\"a\":{\"b\":2}}' -> 'a' ->> 'b' AS c").head()
    assert(r.isNullAt(0))
    assert(r.getString(1) == "1")
    assert(r.getString(2) == "2")
  }

  // ---------------------------------------------------------------- @? / @>
  test("exists: untyped NULL input is false, not a crash") {
    val r = g.query(
      "SELECT NULL @? 'k' AS a, '{\"a\":1}' @? 'a' AS b, '{\"a\":1}' @? 'z' AS c").head()
    assert(!r.getBoolean(0))
    assert(r.getBoolean(1))
    assert(!r.getBoolean(2))
  }

  test("contains-all: NULL operands yield NULL; empty and mismatched arrays cast") {
    val r = g.query(
      "SELECT NULL @> array(1) AS a, array(1, 2) @> array() AS b, " +
        "array(1.1, 2.2) @> array(2.2) AS c, array(1, 2, 3) @> array(2, 9) AS d").head()
    assert(r.isNullAt(0))
    assert(r.getBoolean(1))
    assert(r.getBoolean(2))
    assert(!r.getBoolean(3))
  }

  // ------------------------------------------------------------------ blob
  test("blob: NULL, numeric, struct, and the three spellings agree as STRING") {
    val r = g.query(
      "SELECT blob(NULL) AS a, blob(42.0) AS b, blob(named_struct('a', 1)) AS c, " +
        "BLOB 'abc' = b'abc' AS d, CAST('abc' AS BLOB) = BLOB 'abc' AS e").head()
    assert(r.isNullAt(0))
    assert(r.getString(1) == "42.0")
    assert(r.getString(2) == "{\"a\":1}")
    assert(r.getBoolean(3))
    assert(r.getBoolean(4))
  }

  // ---------------------------------------------------------------- search
  test("search: text substring is case-insensitive; arrays are exact members") {
    val r = g.query(
      "SELECT search('Hello World', 'world') AS a, " +
        "search(array('Alpha', 'Beta'), 'Alpha') AS b, " +
        "search(array('Alpha', 'Beta'), 'alpha') AS c, " +
        "search(array('Alpha', 'Beta'), 'Alp') AS d, " +
        "search(CAST('abc' AS BINARY), 'B') AS e").head()
    assert(r.getBoolean(0))
    assert(r.getBoolean(1))
    assert(!r.getBoolean(2))
    assert(!r.getBoolean(3))
    assert(r.getBoolean(4))
  }

  test("search: struct branch is exact membership in VALUES only (reference parity)") {
    // reference other_functions.py:77 — `item in record.values()`: field
    // names never match, partial values never match, case must match
    val r = g.query(
      "SELECT search(named_struct('city', 'Rome', 'state', 'Italy'), 'Italy') AS a, " +
        "search(named_struct('city', 'Rome'), 'city') AS b, " +
        "search(named_struct('city', 'Rome'), 'Rom') AS c, " +
        "search(named_struct('city', 'Rome'), 'rome') AS d, " +
        "search(named_struct('city', CAST(NULL AS STRING)), 'x') AS e").head()
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
    assert(!r.getBoolean(2))
    assert(!r.getBoolean(3))
    assert(!r.getBoolean(4))
  }

  test("search: untyped NULL input does not crash analysis") {
    val r = g.query("SELECT search(NULL, 'x') AS a").head()
    assert(r.isNullAt(0) || !r.getBoolean(0))
  }
}
