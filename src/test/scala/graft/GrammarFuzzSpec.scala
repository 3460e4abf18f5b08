package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Grammar-driven differential fuzz over EVERY GraftSql rewrite trigger
  * (r12 VERDICT #3 — grow the fuzz tier from XOR-only into a generator
  * that composes the triggers in operand and operator positions).
  *
  * A typed expression AST (int / bool / string) generates statements whose
  * ground truth is evaluated in Scala; each node is a rewrite trigger or a
  * composition point that places triggers in operand positions of other
  * operators:
  *
  *   numeric spellings   0x1F hex, 1_000 underscores, INTEGER '42' typed
  *   string prefixes     b'...', r'...'
  *   bracket arrays      [a,b,c] literals, 0-based [k] subscripts,
  *                       cardinality, @> containment (array and tuple RHS)
  *   JSON accessors      -> / ->> on inline JSON, chained, inside CAST
  *   quantified cmp      = / <> / < / > / <= / >= ANY|ALL over array RHS,
  *                       with arithmetic-expression LHS (exprStart capture)
  *   infix XOR           precedence-aware emission (OR < XOR < AND < NOT)
  *   INTERVAL arith      expression-LEADING minuend swap vs operand-position
  *                       (ts - INTERVAL) and plus-chains — the r12 guard
  *   EXTRACT computed    DECADE / CENTURY
  *   CASE mixing         STRING-literal + bare boolean branches
  *   @@vars              IS NULL expression position
  *   table functions     GENERATE_SERIES / UNNEST in FROM, DISTINCT ON
  *
  * Emission parenthesizes a child only when its precedence is LOWER than
  * the operator requires, so the statements exercise the engine's
  * precedence handling instead of hiding it behind full parens. Every
  * statement also carries a hazard string literal (trigger tokens inside
  * quotes) that must come back byte-identical — no rewrite may see literal
  * content as SQL.
  */
class GrammarFuzzSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = Graft(spark)

  // ---- typed AST. prec: OR 1 < XOR 2 < AND 3 < NOT 4 < cmp 5 <
  // additive 6 < multiplicative 7 < primary 9.
  private sealed trait E { def prec: Int; def sql: String }
  private def wrap(e: E, need: Int): String =
    if (e.prec < need) s"(${e.sql})" else e.sql

  private sealed trait IE extends E { def v: Long }
  private sealed trait BE extends E { def v: Boolean }
  private sealed trait SE extends E { def v: String }

  // ---- integer nodes
  private case class ILit(n: Long, spelling: Int) extends IE {
    def v = n; def prec = 9
    def sql = spelling match {
      case 1 if n >= 0 => "0x" + java.lang.Long.toHexString(n).toUpperCase
      case 2 if n >= 10 =>
        val d = n.toString; d.substring(0, 1) + "_" + d.substring(1)
      case 3 if n >= 0 => s"INTEGER '$n'"
      case _ => n.toString
    }
  }
  private case class IAdd(l: IE, r: IE, plus: Boolean) extends IE {
    def v = if (plus) l.v + r.v else l.v - r.v
    def prec = 6
    def sql = s"${wrap(l, 6)} ${if (plus) "+" else "-"} ${wrap(r, 7)}"
  }
  private case class IMul(l: IE, r: IE, times: Boolean) extends IE {
    def v = if (times) l.v * r.v else l.v % r.v
    def prec = 7
    def sql = s"${wrap(l, 7)} ${if (times) "*" else "%"} ${wrap(r, 9)}"
  }
  private case class ISubscript(elems: Seq[IE], k: Int) extends IE {
    def v = elems(k).v; def prec = 9
    def sql = s"[${elems.map(_.sql).mkString(", ")}][$k]" // 0-based
  }
  private case class ICard(elems: Seq[IE]) extends IE {
    def v = elems.size.toLong; def prec = 9
    def sql = s"cardinality([${elems.map(_.sql).mkString(", ")}])"
  }
  private case class IJson(n: Long, nested: Boolean) extends IE {
    def v = n; def prec = 9
    def sql =
      if (nested) s"""CAST('{"a":{"b":$n}}' -> 'a' ->> 'b' AS BIGINT)"""
      else s"""CAST('{"k":$n}' ->> 'k' AS BIGINT)"""
  }
  private case class IExtract(year: Int, decade: Boolean) extends IE {
    def v = if (decade) year / 10 else (year - 1) / 100 + 1
    def prec = 9
    def sql = s"EXTRACT(${if (decade) "DECADE" else "CENTURY"}" +
      s" FROM TIMESTAMP '$year-03-05 01:02:03')"
  }
  private case class ICase(c: BE, t: IE, e: IE) extends IE {
    def v = if (c.v) t.v else e.v; def prec = 9
    def sql = s"CASE WHEN ${c.sql} THEN ${t.sql} ELSE ${e.sql} END"
  }

  // ---- boolean nodes
  private case class BLit(b: Boolean) extends BE {
    def v = b; def prec = 9; def sql = if (b) "TRUE" else "FALSE"
  }
  private case class BCmp(l: IE, r: IE, op: String) extends BE {
    def v = op match {
      case "=" => l.v == r.v case "<>" => l.v != r.v case "<" => l.v < r.v
      case ">" => l.v > r.v case "<=" => l.v <= r.v case ">=" => l.v >= r.v
    }
    def prec = 5
    def sql = s"${wrap(l, 6)} $op ${wrap(r, 6)}"
  }
  private case class BNot(x: BE) extends BE {
    def v = !x.v; def prec = 4; def sql = s"NOT ${wrap(x, 4)}"
  }
  private case class BAnd(l: BE, r: BE) extends BE {
    def v = l.v && r.v; def prec = 3
    def sql = s"${wrap(l, 3)} AND ${wrap(r, 3)}"
  }
  private case class BXor(l: BE, r: BE) extends BE {
    def v = l.v ^ r.v; def prec = 2
    def sql = s"${wrap(l, 2)} XOR ${wrap(r, 2)}"
  }
  private case class BOr(l: BE, r: BE) extends BE {
    def v = l.v || r.v; def prec = 1
    def sql = s"${wrap(l, 1)} OR ${wrap(r, 1)}"
  }
  private case class BQuant(l: IE, op: String, any: Boolean, arr: Seq[IE]) extends BE {
    def cmp(a: Long, b: Long) = op match {
      case "=" => a == b case "<>" => a != b case "<" => a < b
      case ">" => a > b case "<=" => a <= b case ">=" => a >= b
    }
    def v = if (any) arr.exists(e => cmp(l.v, e.v)) else arr.forall(e => cmp(l.v, e.v))
    def prec = 5
    def sql = s"${wrap(l, 6)} $op ${if (any) "ANY" else "ALL"}" +
      s" ([${arr.map(_.sql).mkString(", ")}])"
  }
  private case class BContains(lhs: Seq[Long], rhs: Seq[Long], tuple: Boolean) extends BE {
    def v = rhs.forall(lhs.contains); def prec = 5
    def sql = s"[${lhs.mkString(", ")}] @> " +
      (if (tuple) s"(${rhs.mkString(", ")})" else s"ARRAY(${rhs.mkString(", ")})")
  }
  private case object BVarNull extends BE {
    def v = true; def prec = 5; def sql = "@@some_session_var IS NULL"
  }

  // ---- string nodes (no backslashes — r'' prefix stripping leaves Spark's
  // escape handling in effect, so a backslash would not round-trip)
  private case class SLit(s: String, prefix: String) extends SE {
    def v = s; def prec = 9
    def sql = s"$prefix'${s.replace("'", "''")}'"
  }
  private case class SJson(s: String, text: Boolean) extends SE {
    def v = s; def prec = 9
    def sql = s"""'{"k":"$s"}' ${if (text) "->>" else "->"} 'k'"""
  }
  private case class SCaseMixed(c: BE, t: String) extends SE {
    def v = if (c.v) t else "false"; def prec = 9
    def sql = s"CASE WHEN ${c.sql} THEN '$t' ELSE FALSE END"
  }
  private case class SInterval(day: Int, n: Int, leading: Boolean, unit: String) extends SE {
    // leading: INTERVAL - ts (reference minuend swap); else ts - INTERVAL.
    // Both subtract; ground truth via LocalDateTime (fixed dates far from
    // any DST transition in the session zone).
    def base = java.time.LocalDateTime.of(2024, 1, day, 6, 30, 0)
    def shifted = unit match {
      case "DAY" => base.minusDays(n)
      case "HOUR" => base.minusHours(n)
    }
    def v = shifted.toString.replace('T', ' ') + (if (shifted.getSecond == 0) ":00" else "")
    def prec = 9
    def ts = f"TIMESTAMP '2024-01-$day%02d 06:30:00'"
    def sql =
      if (leading) s"CAST(INTERVAL '$n' $unit - $ts AS STRING)"
      else s"CAST($ts - INTERVAL '$n' $unit AS STRING)"
  }
  private case class SConcat(l: SE, r: SE) extends SE {
    def v = l.v + r.v; def prec = 9
    def sql = s"concat(${l.sql}, ${r.sql})"
  }

  // ---- generator
  private val hazards = Seq(
    "x XOR y", "a -> 1", "-- nope", "b''c", "@@v", "0x1F", "1_0",
    "INTERVAL ''1'' DAY - ts", "[1,2][0]", "= ANY(a)", "FROM t", "JOIN u",
    "INTEGER ''9''", "EXTRACT(DECADE FROM x)", "GENERATE_SERIES(1,2)")

  private def genI(r: Random, depth: Int): IE =
    if (depth == 0) genILeaf(r)
    else r.nextInt(7) match {
      case 0 => IAdd(genI(r, depth - 1), genI(r, depth - 1), r.nextBoolean())
      case 1 =>
        val rhs = genILeaf(r)
        IMul(genI(r, depth - 1),
          if (!rhs.sql.startsWith("0") && rhs.v != 0) rhs else ILit(3 + r.nextInt(5), 0),
          times = r.nextBoolean() || rhs.v == 0)
      case 2 =>
        val n = 2 + r.nextInt(3)
        ISubscript(Seq.fill(n)(genILeaf(r)), r.nextInt(n))
      case 3 => ICard(Seq.fill(1 + r.nextInt(4))(genILeaf(r)))
      case 4 => ICase(genB(r, math.min(depth - 1, 1)), genILeaf(r), genILeaf(r))
      case _ => genILeaf(r)
    }

  private def genILeaf(r: Random): IE = r.nextInt(6) match {
    case 0 => IJson(r.nextInt(1000).toLong, r.nextBoolean())
    case 1 => IExtract(1850 + r.nextInt(300), r.nextBoolean())
    case _ => ILit(r.nextInt(2000).toLong, r.nextInt(4))
  }

  private def genB(r: Random, depth: Int): BE =
    if (depth == 0) r.nextInt(4) match {
      case 0 => BLit(r.nextBoolean())
      case 1 => BCmp(genILeaf(r), genILeaf(r),
        Seq("=", "<>", "<", ">", "<=", ">=")(r.nextInt(6)))
      case 2 =>
        val lhsSeq = Seq.fill(2 + r.nextInt(3))(r.nextInt(10).toLong)
        BContains(lhsSeq,
          Seq.fill(1 + r.nextInt(2))(
            if (r.nextBoolean()) lhsSeq(r.nextInt(lhsSeq.size)) else r.nextInt(10).toLong),
          r.nextBoolean())
      case _ => BVarNull
    } else r.nextInt(6) match {
      case 0 => BNot(genB(r, depth - 1))
      case 1 => BAnd(genB(r, depth - 1), genB(r, depth - 1))
      case 2 => BXor(genB(r, depth - 1), genB(r, depth - 1))
      case 3 => BOr(genB(r, depth - 1), genB(r, depth - 1))
      case 4 => BQuant(genI(r, 1), Seq("=", "<>", "<", ">", "<=", ">=")(r.nextInt(6)),
        r.nextBoolean(), Seq.fill(1 + r.nextInt(3))(genILeaf(r)))
      case _ => BCmp(genI(r, depth - 1), genI(r, depth - 1),
        Seq("=", "<>", "<", ">", "<=", ">=")(r.nextInt(6)))
    }

  private def genS(r: Random, depth: Int): SE =
    if (depth == 0) r.nextInt(3) match {
      case 0 => SLit(Seq("plain text", "a b c", "xor and or", "k1")(r.nextInt(4)),
        Seq("", "b", "r", "B", "R")(r.nextInt(5)))
      case 1 => SJson(Seq("alpha", "be ta", "g", "d4")(r.nextInt(4)), r.nextBoolean())
      case _ => SInterval(10 + r.nextInt(15), 1 + r.nextInt(9),
        r.nextBoolean(), if (r.nextBoolean()) "DAY" else "HOUR")
    } else r.nextInt(3) match {
      case 0 => SConcat(genS(r, depth - 1), genS(r, depth - 1))
      case 1 => SCaseMixed(genB(r, 1), Seq("yes", "maybe so")(r.nextInt(2)))
      case _ => genS(r, 0)
    }

  private def runOne(i: Int, sql: String, check: org.apache.spark.sql.Row => Unit): Unit = {
    val row =
      try g.query(sql).head()
      catch {
        case e: Throwable =>
          fail(s"[case $i] query failed: $sql\n${e.getMessage.take(400)}")
      }
    try check(row)
    catch {
      case e: org.scalatest.exceptions.TestFailedException =>
        fail(s"[case $i] ${e.getMessage} for: $sql")
    }
  }

  test("1,100 composed statements: every rewrite trigger in operand and operator positions") {
    val r = new Random(20260815L)
    var triggers = Map[String, Int]().withDefaultValue(0)
    (1 to 1100).foreach { i =>
      val hazard = hazards(r.nextInt(hazards.length))
      val (exprSql, expected): (String, Any) = r.nextInt(3) match {
        case 0 => val e = genI(r, 1 + r.nextInt(2)); (e.sql, e.v)
        case 1 => val e = genB(r, 1 + r.nextInt(2)); (e.sql, e.v)
        case _ => val e = genS(r, 1 + r.nextInt(2)); (e.sql, e.v)
      }
      Seq("XOR", "->", "0x", "_", "INTEGER '", "ANY", "ALL", "@>", "@@",
        "EXTRACT", "INTERVAL", "[").foreach { t =>
        if (exprSql.contains(t)) triggers += t -> (triggers(t) + 1)
      }
      // context: plain select / trailing semicolon / coalesce-wrapped /
      // WHERE-predicate (bool only) / UNION arm
      val ctx = r.nextInt(5)
      val stmt = ctx match {
        case 1 => s"SELECT $exprSql AS v, '$hazard' AS h;"
        case 2 => s"SELECT coalesce($exprSql, $exprSql) AS v, '$hazard' AS h"
        case 3 if expected.isInstanceOf[Boolean] =>
          s"SELECT count(*) AS v, '$hazard' AS h FROM (SELECT 1) WHERE $exprSql"
        case 4 => s"SELECT $exprSql AS v, '$hazard' AS h UNION ALL SELECT $exprSql, '$hazard'"
        case _ => s"SELECT $exprSql AS v, '$hazard' AS h"
      }
      val want: Any =
        if (ctx == 3 && expected.isInstanceOf[Boolean])
          (if (expected.asInstanceOf[Boolean]) 1L else 0L)
        else expected
      runOne(i, stmt, { row =>
        assert(row.get(0) != null && row.get(0).toString == want.toString,
          s"value mismatch: got ${row.get(0)}, want $want")
        assert(row.getString(1) == hazard.replace("''", "'"), "hazard literal corrupted")
      })
    }
    // the generator must actually cover every trigger family
    Seq("XOR", "->", "0x", "INTEGER '", "ANY", "@>", "EXTRACT", "INTERVAL", "[")
      .foreach(t => assert(triggers(t) >= 20, s"trigger $t seen only ${triggers(t)}x"))
  }

  test("table-function and DISTINCT ON statement templates") {
    val r = new Random(815L)
    (1 to 40).foreach { i =>
      val a = 1 + r.nextInt(5)
      val b = a + r.nextInt(20)
      runOne(i, s"SELECT sum(g) AS v, '${hazards(r.nextInt(hazards.length))}' AS h" +
        s" FROM GENERATE_SERIES($a, $b) AS t(g)",
        row => assert(row.getLong(0) == (a.toLong + b) * (b - a + 1) / 2))
    }
    (1 to 20).foreach { i =>
      val xs = Seq.fill(2 + r.nextInt(4))(r.nextInt(100))
      runOne(100 + i,
        s"SELECT sum(w) AS v FROM UNNEST([${xs.mkString(", ")}]) AS u(w)",
        row => assert(row.getLong(0) == xs.map(_.toLong).sum))
    }
    // DISTINCT ON over an inline relation: first row per key under ORDER BY
    val rows = g.query(
      "SELECT DISTINCT ON (k) k, s FROM" +
        " (VALUES (1, 'b'), (1, 'a'), (2, 'c'), (2, 'd'), (3, 'e')) AS t(k, s)" +
        " ORDER BY k, s").collect()
    assert(rows.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "a"), (2, "c"), (3, "e")))
  }

  test("balanced-splice rewrites: EXTRACT computed, DATEDIFF, ARRAY_AGG LIMIT, subscripts, typed literals") {
    val r = new Random(1337L)
    def hz = hazards(r.nextInt(hazards.length))

    // EXTRACT computed fields, operand both bare and coalesce-wrapped (the
    // wrap forces the splice through nested balanced parens)
    (1 to 40).foreach { i =>
      val (d, h, mi, sec, ms) =
        (10 + r.nextInt(18), r.nextInt(24), r.nextInt(60), r.nextInt(60), r.nextInt(1000))
      val ts = f"TIMESTAMP '2024-02-$d%02d $h%02d:$mi%02d:$sec%02d.$ms%03d'"
      val operand = if (r.nextBoolean()) ts else s"coalesce($ts, $ts)"
      val (field, want): (String, Any) = r.nextInt(4) match {
        case 0 => ("MILLISECONDS", (sec * 1000 + ms).toLong)
        case 1 =>
          val epochDay = java.time.LocalDate.of(2024, 2, d).toEpochDay
          ("JULIAN", epochDay + 2440587.5)
        case 2 => ("DATE", f"2024-02-$d%02d")
        case _ => ("TIME", f"$h%02d:$mi%02d:$sec%02d")
      }
      runOne(i, s"SELECT CAST(EXTRACT($field FROM $operand) AS STRING) AS v, '$hz' AS h",
        row => assert(row.getString(0) == want.toString,
          s"EXTRACT($field): got ${row.getString(0)}, want $want"))
    }

    // DATEDIFF('unit', a, b) → timestampdiff, both signs, unit synonyms
    (1 to 40).foreach { i =>
      val a = java.time.LocalDateTime.of(2024, 1 + r.nextInt(11), 1 + r.nextInt(28),
        r.nextInt(24), r.nextInt(60), 0)
      val b = a.plusHours(r.nextInt(2000).toLong - 1000)
      val (unit, cu) = Seq(
        ("day", java.time.temporal.ChronoUnit.DAYS),
        ("days", java.time.temporal.ChronoUnit.DAYS),
        ("hour", java.time.temporal.ChronoUnit.HOURS),
        ("hours", java.time.temporal.ChronoUnit.HOURS),
        ("minute", java.time.temporal.ChronoUnit.MINUTES))(r.nextInt(5))
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      runOne(100 + i,
        s"SELECT DATEDIFF('$unit', TIMESTAMP '${a.format(fmt)}'," +
          s" TIMESTAMP '${b.format(fmt)}') AS v, '$hz' AS h",
        row => assert(row.getLong(0) == cu.between(a, b),
          s"DATEDIFF $unit: got ${row.getLong(0)}, want ${cu.between(a, b)}"))
    }

    // ARRAY_AGG(expr LIMIT k): cardinality is min(k, n) regardless of order;
    // expression operand exercises the inner-LIMIT tail match
    (1 to 30).foreach { i =>
      val n = 1 + r.nextInt(12)
      val k = 1 + r.nextInt(15)
      val inner = if (r.nextBoolean()) "g" else "g * 2 + 1"
      runOne(200 + i,
        s"SELECT cardinality(ARRAY_AGG($inner LIMIT $k)) AS v, '$hz' AS h" +
          s" FROM GENERATE_SERIES(1, $n) AS t(g)",
        row => assert(row.get(0).toString.toLong == math.min(k, n).toLong))
    }

    // string-keyed subscripts on JSON text (graft_extract dispatch), chained
    // after -> and on nested bracket-array literals
    (1 to 30).foreach { i =>
      val x = r.nextInt(1000)
      val (sql, want) = r.nextInt(3) match {
        case 0 => (s"""CAST(('{"a": $x, "b": 2}')['a'] AS BIGINT)""", x.toLong)
        case 1 => (s"""CAST(('{"a": {"b": $x}}' -> 'a')['b'] AS BIGINT)""", x.toLong)
        case _ =>
          val m = Seq.fill(2)(Seq.fill(2)(r.nextInt(100).toLong))
          val (ri, ci) = (r.nextInt(2), r.nextInt(2))
          (s"[[${m(0).mkString(", ")}], [${m(1).mkString(", ")}]][$ri][$ci]", m(ri)(ci))
      }
      runOne(300 + i, s"SELECT $sql AS v, '$hz' AS h",
        row => assert(row.get(0).toString.toLong == want, s"subscript: $sql"))
    }

    // DATE typed literal + UNNEST tuple form
    (1 to 15).foreach { i =>
      val d = 1 + r.nextInt(28)
      runOne(400 + i,
        f"SELECT CAST(DATE '2023-06-$d%02d' AS STRING) AS v, '$hz' AS h",
        row => assert(row.getString(0) == f"2023-06-$d%02d"))
    }
    (1 to 15).foreach { i =>
      val xs = Seq.fill(2 + r.nextInt(4))(r.nextInt(50).toLong)
      runOne(500 + i,
        s"SELECT sum(w) AS v FROM UNNEST((${xs.mkString(", ")})) AS u(w)",
        row => assert(row.getLong(0) == xs.sum))
    }
  }

  test("temporal FOR and @var triggers compose with hazards, arms, and expressions") {
    // r13 VERDICT #8: the two rewrite triggers least covered by the
    // composed grammar — extractTemporal's FOR clauses and the @var →
    // session-variable rewrite — now fuzz against a Scala ground truth.
    import spark.implicits._
    val r = new Random(1414L)
    def hz = hazards(r.nextInt(hazards.length))
    val days = (1 to 28).map { d =>
      (d.toLong, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"))
    }
    g.registerDf("fz_temporal", days.toDF("id", "ts"))
    g.registerTemporalColumn("fz_temporal", "ts")

    // FOR DATES BETWEEN / SINCE / single-day, with hazard literals in the
    // select list and binding aliases between relation and FOR
    (1 to 40).foreach { i =>
      val lo = 1 + r.nextInt(20)
      val hi = lo + r.nextInt(28 - lo)
      val alias = Seq("", " t", " AS t")(r.nextInt(3))
      val (spec, want): (String, Long) = r.nextInt(3) match {
        case 0 =>
          (f"DATES BETWEEN '2024-01-$lo%02d' AND '2024-01-$hi%02d'", (hi - lo + 1).toLong)
        case 1 => (f"DATES SINCE '2024-01-$lo%02d'", (28 - lo + 1).toLong)
        case _ => (f"'2024-01-$lo%02d'", 1L)
      }
      runOne(600 + i,
        s"SELECT count(*) AS v, '$hz' AS h FROM fz_temporal$alias FOR $spec",
        row => assert(row.getLong(0) == want, s"FOR $spec: got ${row.getLong(0)}"))
    }
    // FOR inside one arm of a set operation: each arm's range is its own
    (1 to 20).foreach { i =>
      val a = 1 + r.nextInt(10)
      val b = 11 + r.nextInt(10)
      runOne(700 + i,
        f"SELECT count(*) AS v FROM fz_temporal FOR '2024-01-$a%02d'" +
          f" UNION ALL SELECT count(*) FROM fz_temporal FOR '2024-01-$b%02d'",
        row => assert(row.getLong(0) == 1L))
    }

    // @var in operand positions of grammar expressions (SET script form and
    // standalone), hazard literal carrying a fake @token that must survive
    (1 to 40).foreach { i =>
      val n = r.nextInt(1000).toLong
      val k = 1 + r.nextInt(9).toLong
      val hazard = s"not @a_var ${hz}"
      val (expr, want): (String, Long) = r.nextInt(4) match {
        case 0 => (s"@fzv + $k", n + k)
        case 1 => (s"@fzv * $k % 97", n * k % 97)
        case 2 => (s"coalesce(@fzv, $k)", n)
        case _ => (s"[@fzv, $k][0]", n)
      }
      runOne(800 + i,
        s"SET @fzv = $n; SELECT $expr AS v, '${hazard.replace("'", "''")}' AS h",
        { row =>
          assert(row.get(0).toString.toLong == want, s"@var expr $expr")
          assert(row.getString(1) == hazard, "hazard literal corrupted")
        })
    }
  }

  test("catalog-resolved bare aliases: generated join grammar with schema-distinct competitors") {
    // r14 VERDICT optional-hardening: the catalog-aware guard's POSITIVE
    // branch (every competing named relation's schema lacks the aliased
    // column, so the bare alias can only bind the view) was example-covered
    // in RewriteFuzzSpec; here the grammar composes it — random join kind,
    // competitor schema/name, alias position (select list, WHERE, ORDER BY),
    // hazard literal, and an optional second set-op arm — against a ground
    // truth read through the qualified sole-relation form. A competitor
    // carrying the column is generated in ~1/4 of cases as the in-grammar
    // negative control (the rewrite must suppress and the bare name binds
    // the competitor).
    import spark.implicits._
    val r = new Random(1616L)
    val joinKinds = Seq("JOIN", "INNER JOIN", "LEFT JOIN", "CROSS JOIN")
    def hz = hazards(r.nextInt(hazards.length)).replace("'", "''")
    val want: Map[Int, Long] = (1 to 3).map { id =>
      id -> g.query(s"SELECT $$satellites.planetId FROM $$satellites WHERE id = $id")
        .head().get(0).toString.toDouble.toLong
    }.toMap
    (1 to 60).foreach { i =>
      val id = 1 + r.nextInt(3)
      val negative = r.nextInt(4) == 0
      val comp = s"fz_cat_$i"
      val extraCols = Seq("tag", "grp", "note").take(1 + r.nextInt(2))
      val sentinel = 9000L + i
      if (negative)
        Seq((id.toLong, sentinel))
          .toDF("sid", "planet_id").createOrReplaceTempView(comp)
      else
        Seq((id.toLong, extraCols.map(c => s"$c$i").mkString("|")))
          .toDF("sid", extraCols.head).createOrReplaceTempView(comp)
      val jk = joinKinds(r.nextInt(joinKinds.length))
      val onClause =
        if (jk == "CROSS JOIN") s" WHERE $comp.sid = $$satellites.id"
        else s" ON $comp.sid = $$satellites.id"
      val viewFirst = r.nextBoolean()
      val rels =
        if (viewFirst) s"$$satellites $jk $comp$onClause"
        else s"$comp $jk $$satellites$onClause"
      val aliasPos = r.nextInt(3)
      val conj = if (jk == "CROSS JOIN") "AND" else "WHERE"
      val core = aliasPos match {
        case 0 => s"SELECT planet_id AS v, '$hz' AS h FROM $rels $conj $$satellites.id = $id"
        case 1 => s"SELECT count(*) * 0 + max(planet_id) AS v, min('$hz') AS h FROM $rels $conj planet_id >= -1 AND $$satellites.id = $id"
        case _ => s"SELECT planet_id AS v, '$hz' AS h FROM $rels $conj $$satellites.id = $id ORDER BY planet_id"
      }
      // an unparenthesized arm-level ORDER BY cannot precede UNION
      val hasUnion = aliasPos != 2 && r.nextInt(3) == 0
      val stmt =
        if (hasUnion) s"$core UNION ALL SELECT -1 AS v, 'arm2' AS h FROM $comp"
        else core
      val expect = if (negative) sentinel else want(id)
      if (hasUnion) {
        // The arm2 sentinel is -1, so a head()-only check would let a wrong
        // alias binding pass whenever the arm2 row sorts first (r15 ADVICE):
        // collect ALL rows and require the expected value among the rows the
        // main arm produced (h != 'arm2').
        val rows =
          try g.query(stmt).collect()
          catch {
            case e: Throwable =>
              fail(s"[case ${900 + i}] query failed: $stmt\n${e.getMessage.take(400)}")
          }
        val main = rows.filter(_.get(1).toString != "arm2")
          .map(_.get(0).toString.toDouble.toLong).toSeq
        assert(main.contains(expect),
          s"[case ${900 + i}] bare planet_id bound wrong (non-arm2 rows " +
            s"${main.mkString(",")} want $expect, negative=$negative) for: $stmt")
      } else runOne(900 + i, stmt, { row =>
        val got = row.get(0).toString.toDouble.toLong
        assert(got == expect,
          s"bare planet_id bound wrong (got $got want $expect, negative=$negative)")
      })
    }
  }

  test("temporal FOR at relationRefs anchors: depth, join targets, and adversarial spellings") {
    // r15 VERDICT #7: extractTemporal's anchors now come from the shared
    // relationRefs scope scan (SqlScan contract-tested), but the
    // FOR-grammar-AT-ANCHOR composition was example-covered only. This
    // grammar composes the FOR spec against the anchor positions the
    // scanner distinguishes — subquery depth, JOIN targets, alias forms —
    // with adversarial literals spelling 'FROM x FOR TODAY' inside strings
    // (masked: must never move the rewrite) and FOR-like alias words that
    // must not be eaten as a clause.
    import spark.implicits._
    val r = new Random(1717L)
    val days = (1 to 28).map { d =>
      (d.toLong, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"))
    }
    g.registerDf("fz_anchor", days.toDF("id", "ts"))
    g.registerTemporalColumn("fz_anchor", "ts")
    g.registerDf("fz_side", (1 to 28).map(d => (d.toLong, s"s$d")).toDF("id", "tag"))
    def hz = {
      // every hazard carries a relation-and-FOR spelling inside a literal —
      // the masked text the anchor scan must skip
      val inner = Seq("FROM fz_anchor FOR TODAY", "JOIN fz_anchor FOR '2024-01-05'",
        "fz_anchor FOR DATES SINCE '2024-01-01'", "FOR LAST 3 DAYS")(r.nextInt(4))
      s"x $inner ${hazards(r.nextInt(hazards.length))}".replace("'", "''")
    }
    (1 to 50).foreach { i =>
      val lo = 1 + r.nextInt(20)
      val hi = lo + r.nextInt(28 - lo)
      val spec = f"DATES BETWEEN '2024-01-$lo%02d' AND '2024-01-$hi%02d'"
      val want = (hi - lo + 1).toLong
      val alias = Seq("", " t", " AS t")(r.nextInt(3))
      val (stmt, expect): (String, Long) = r.nextInt(4) match {
        case 0 =>
          // anchor inside a subquery (depth >= 1), hazard literal outside
          (s"SELECT v, '$hz' AS h FROM (SELECT count(*) AS v FROM fz_anchor$alias FOR $spec) q",
            want)
        case 1 =>
          // anchor is a JOIN target; the un-FOR'd side must stay untouched
          (s"SELECT count(*) AS v, min('$hz') AS h FROM fz_side JOIN fz_anchor$alias FOR $spec ON fz_side.id = ${if (alias.isEmpty) "fz_anchor" else "t"}.id",
            want)
        case 2 =>
          // FOR'd anchor first, plain JOIN target second, hazard in WHERE arm
          (s"SELECT count(*) AS v FROM fz_anchor$alias FOR $spec JOIN fz_side ON fz_side.id = ${if (alias.isEmpty) "fz_anchor" else "t"}.id WHERE '$hz' <> ''",
            want)
        case _ =>
          // two anchors, each with its OWN range, composed by a set op at
          // depth; counts add
          val lo2 = 1 + r.nextInt(20)
          (f"SELECT sum(v) AS v FROM (SELECT count(*) AS v FROM fz_anchor FOR $spec%s " +
            f"UNION ALL SELECT count(*) AS v FROM fz_anchor FOR '2024-01-$lo2%02d') u",
            want + 1L)
      }
      runOne(1000 + i, stmt, { row =>
        val got = row.get(0).toString.toDouble.toLong
        assert(got == expect, s"anchor FOR: got $got want $expect")
      })
    }
    // FOR-like alias word: `fz_anchor fort` must bind the alias, not start
    // a clause — and a trailing real FOR after the alias still extracts
    runOne(1060,
      "SELECT count(*) AS v FROM fz_anchor fort FOR '2024-01-05' WHERE fort.id = 5",
      row => assert(row.get(0).toString.toDouble.toLong == 1L))
    // adversarial: the masked spelling alone (no real FOR anywhere) — the
    // rewrite must leave the statement byte-compatible with plain Spark
    runOne(1061,
      s"SELECT count(*) AS v, 'FROM fz_anchor FOR TODAY' AS h FROM fz_anchor",
      row => assert(row.get(0).toString.toDouble.toLong == 28L))
  }
}
