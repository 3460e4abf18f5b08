package graft

import org.scalatest.funsuite.AnyFunSuite

/** Seeded differential fuzz for GraftSql's string-surgery rewrites (XOR
  * operand capture, literal-prefix stripping, comment stripping, @@vars,
  * literal masking). The advisor's round-over-round findings have all been
  * in this layer — a regex seeing through a quote boundary, a splice
  * binding at the wrong precedence — so the fuzz generates statements
  * whose ground truth is computed on the Scala AST and asserts the engine
  * agrees, with hazard tokens (escaped quotes, `XOR`, `-- `, `->`, `@@`,
  * `b'`) embedded inside string literals where no rewrite may touch them.
  */
class RewriteFuzzSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = Graft(spark)

  // ---- boolean expression AST with MySQL-style precedence in the emitted
  // SQL: OR < XOR < AND < NOT < comparison. Emission parenthesizes a child
  // only when its precedence is LOWER than the parent requires, so the
  // text exercises the engine's precedence handling rather than hiding it
  // behind full parens.
  private sealed trait B { def eval: Boolean; def prec: Int; def sql: String }
  private case class Lit(b: Boolean) extends B {
    def eval = b; def prec = 9; def sql = if (b) "TRUE" else "FALSE"
  }
  private case class Cmp(a: Int, c: Int, op: String) extends B {
    def eval = op match {
      case ">" => a > c case "<" => a < c case "=" => a == c
      case "<>" => a != c case ">=" => a >= c case "<=" => a <= c
    }
    def prec = 5; def sql = s"$a $op $c"
  }
  private case class Not(x: B) extends B {
    def eval = !x.eval; def prec = 4
    def sql = s"NOT ${wrap(x, 4)}"
  }
  private case class And(l: B, r: B) extends B {
    def eval = l.eval && r.eval; def prec = 3
    def sql = s"${wrap(l, 3)} AND ${wrap(r, 3)}"
  }
  private case class Xor(l: B, r: B) extends B {
    def eval = l.eval ^ r.eval; def prec = 2
    def sql = s"${wrap(l, 2)} XOR ${wrap(r, 2)}"
  }
  private case class Or(l: B, r: B) extends B {
    def eval = l.eval || r.eval; def prec = 1
    def sql = s"${wrap(l, 1)} OR ${wrap(r, 1)}"
  }
  private def wrap(x: B, need: Int): String =
    if (x.prec < need) s"(${x.sql})" else x.sql

  private def gen(rnd: scala.util.Random, depth: Int): B =
    if (depth == 0 || rnd.nextInt(4) == 0) {
      if (rnd.nextBoolean()) Lit(rnd.nextBoolean())
      else Cmp(rnd.nextInt(5), rnd.nextInt(5),
        Seq(">", "<", "=", "<>", ">=", "<=")(rnd.nextInt(6)))
    } else rnd.nextInt(4) match {
      case 0 => Not(gen(rnd, depth - 1))
      case 1 => And(gen(rnd, depth - 1), gen(rnd, depth - 1))
      case 2 => Xor(gen(rnd, depth - 1), gen(rnd, depth - 1))
      case _ => Or(gen(rnd, depth - 1), gen(rnd, depth - 1))
    }

  // hazard fragments that have each broken (or nearly broken) a rewrite:
  // every one must survive INSIDE a string literal untouched
  private val hazards = Seq(
    "a b''c'' d", "x XOR y", "-- not a comment", "a -> 1", "b''r''",
    "@@version", "INTERVAL ''1'' DAY - ts", "NOT 1 = 2", "r''raw''",
    "FROM t,", "CASE WHEN x THEN ''y'' ELSE FALSE END", "planet_id")

  test("1200 seeded statements: XOR precedence + masked literals agree with the AST") {
    val rnd = new scala.util.Random(20260814L)
    var xorCount = 0
    (1 to 1200).foreach { i =>
      val ast = gen(rnd, 3)
      if (ast.sql.contains("XOR")) xorCount += 1
      val hazard = hazards(rnd.nextInt(hazards.length))
      val sql = s"SELECT ${ast.sql} AS v, '$hazard' AS s"
      val row =
        try g.query(sql).head()
        catch {
          case e: Throwable =>
            fail(s"[case $i] query failed: $sql\n${e.getMessage.take(300)}")
        }
      assert(row.getBoolean(0) == ast.eval,
        s"[case $i] value mismatch for: $sql (expected ${ast.eval})")
      assert(row.getString(1) == hazard.replace("''", "'"),
        s"[case $i] literal corrupted for: $sql")
    }
    // the generator must actually exercise the XOR splice path
    assert(xorCount >= 240, s"only $xorCount/1200 cases contained XOR")
  }

  test("pinned regressions: historical crash/miscompile shapes stay fixed") {
    // r10 ship-red: IFNULL with an untyped NULL first argument crashed the
    // RuntimeReplaceable rewrite (DialectExpressions.scala:146-149)
    assert(g.query("SELECT IFNULL(NULL, 3) AS v").head().get(0).toString == "3")
    assert(g.query("SELECT IFNULL(NULL, NULL) AS v").head().isNullAt(0))
    // r11 fuzz find: XOR with a parenthesized rhs spliced at the wrong
    // precedence before the balanced-operand capture
    assert(g.query("SELECT TRUE XOR (1 > 2) AS v").head().getBoolean(0))
    assert(!g.query("SELECT (1 < 2) XOR (3 > 2) AS v").head().getBoolean(0))
    // r12 advisor find: the INTERVAL-minuend swap fired MID-expression,
    // flipping the interval sign in `ts1 - INTERVAL ... - ts2` and
    // retargeting `ts + INTERVAL ... - x`; only an expression-LEADING
    // INTERVAL literal may swap (reference intervals.py:141-150)
    val mid = g.query(
      "SELECT TIMESTAMP '2024-01-03 00:00:00' - INTERVAL '1' DAY" +
        " - TIMESTAMP '2024-01-01 00:00:00' AS v").head().get(0)
    val midWant = g.query(
      "SELECT (TIMESTAMP '2024-01-03 00:00:00' - INTERVAL '1' DAY)" +
        " - TIMESTAMP '2024-01-01 00:00:00' AS v").head().get(0)
    assert(mid == midWant, s"mid-expression INTERVAL swap fired: $mid")
    val plus = g.query(
      "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '2' HOUR" +
        " - TIMESTAMP '2024-01-01 00:00:00' AS v").head().get(0)
    assert(Seq("PT2H", "2:00:00", "2 hours").exists(plus.toString.contains),
      s"plus-chain INTERVAL swap fired: $plus")
    // expression-leading minuend still swaps (the dialect's whole point)
    val lead = g.query(
      "SELECT INTERVAL '1' DAY - TIMESTAMP '2024-01-02 00:00:00' AS v").head().get(0)
    assert(lead.toString.startsWith("2024-01-01"), s"leading swap broken: $lead")
    // r12 advisor find: an UNQUALIFIED column colliding with a virtual
    // dataset's per-relation alias must NOT rewrite in a join — it binds to
    // the other relation (reference resolves aliases per-relation)
    import spark.implicits._
    Seq((1, 9001L, "meta"), (2, 9002L, "meta"))
      .toDF("sid", "planet_id", "tag").createOrReplaceTempView("sat_meta")
    val bare = g.query(
      "SELECT sat_meta.sid, planet_id FROM sat_meta" +
        " JOIN $satellites ON sat_meta.sid = $satellites.id" +
        " ORDER BY sat_meta.sid").collect()
    assert(bare.map(_.getLong(1)).sameElements(Array(9001L, 9002L)),
      "bare planet_id retargeted to $satellites.planetId in a join")
    // …while the single-relation case still resolves through the alias
    assert(g.query("SELECT planet_id FROM $satellites ORDER BY id LIMIT 1")
      .head().get(0) != null)
    // …and a relation inside a SUBQUERY has its own scope — it must not
    // disable the outer relation's alias rewrite (shapes.tsv:780 shape)
    assert(g.query("SELECT count(*) AS n FROM $satellites" +
      " WHERE planet_id IN (SELECT id FROM $planets)").head().getLong(0) > 0)
    // and a QUALIFIED virtual-relation reference still rewrites in a join
    val qual = g.query(
      "SELECT sat_meta.sid, $satellites.planet_id AS pid FROM sat_meta" +
        " JOIN $satellites ON sat_meta.sid = $satellites.id" +
        " ORDER BY sat_meta.sid").collect()
    assert(qual.nonEmpty && qual.forall(!_.isNullAt(1)))
  }

  test("alias guard: 60+ join-context virtual-dataset statements pin armSoleRelation") {
    import spark.implicits._
    Seq((1, 9001L), (2, 9002L), (3, 9003L))
      .toDF("sid", "planet_id").createOrReplaceTempView("fz_meta")

    // -- (a) string-literal hazards must NOT disable the bare-alias rewrite:
    // relTargets is literal-masked, so 'copied FROM somewhere' is content,
    // not a phantom relation (r12 advisor medium find)
    val litHazards = Seq(
      "copied FROM somewhere", "a JOIN b", "x FROM t, u", "FROM \"q\"",
      "SELECT * FROM other", "INNER JOIN (SELECT 1) d", "FROM LATERAL x",
      "UNION ALL SELECT planet_id FROM z", ", extra_rel", "JOIN UNNEST(a)")
    litHazards.zipWithIndex.foreach { case (h, i) =>
      val r = g.query(
        s"SELECT planet_id FROM $$satellites WHERE name <> '$h' ORDER BY id LIMIT 1")
        .head()
      assert(!r.isNullAt(0), s"[lit $i] literal '$h' disabled the alias rewrite")
    }

    // -- (b) table-function join targets bind no competing columns — the
    // rewrite stays enabled across UNNEST/GENERATE_SERIES join shapes
    val tfShapes = Seq(
      s"SELECT planet_id, g FROM $$satellites CROSS JOIN GENERATE_SERIES(1, 2) AS t(g) ORDER BY id, g LIMIT 4",
      s"SELECT planet_id FROM $$satellites CROSS JOIN GENERATE_SERIES(1, 1) AS t(g) ORDER BY id LIMIT 2",
      s"SELECT planet_id, w FROM $$satellites CROSS JOIN UNNEST(ARRAY(1, 2)) AS u(w) ORDER BY id, w LIMIT 4")
    tfShapes.zipWithIndex.foreach { case (q, i) =>
      val rows = g.query(q).collect()
      assert(rows.nonEmpty && rows.forall(!_.isNullAt(0)),
        s"[tf $i] table-function join disabled the alias rewrite: $q")
    }

    // -- (c) a real second relation suppresses: bare planet_id binds to the
    // OTHER side (which carries a genuine planet_id column), never to
    // $satellites.planetId — across JOIN, comma-FROM, and derived-JOIN forms
    val joinShapes = Seq(
      "SELECT planet_id FROM fz_meta JOIN $satellites ON fz_meta.sid = $satellites.id WHERE fz_meta.sid = 1",
      "SELECT planet_id FROM $satellites JOIN fz_meta ON fz_meta.sid = $satellites.id WHERE fz_meta.sid = 2",
      "SELECT planet_id FROM $satellites LEFT JOIN fz_meta ON fz_meta.sid = $satellites.id WHERE fz_meta.sid = 3",
      "SELECT planet_id FROM fz_meta, $satellites WHERE fz_meta.sid = $satellites.id AND fz_meta.sid = 1",
      "SELECT planet_id FROM $satellites JOIN (SELECT 1 AS k, 9001 AS planet_id) d ON d.k = $satellites.id")
    val expected = Seq(9001L, 9002L, 9003L, 9001L, 9001L)
    joinShapes.zip(expected).zipWithIndex.foreach { case ((q, want), i) =>
      val got = g.query(q).head().get(0).toString.toDouble.toLong
      assert(got == want,
        s"[join $i] bare planet_id retargeted (got $got, want $want): $q")
    }

    // -- (d) UNION arms are scoped independently: the $satellites-only arm
    // keeps its rewrite even when a sibling arm reads another relation
    // (r12 advisor low find: statement-global gate was a functional
    // regression vs the reference's per-relation binder)
    val armShapes = Seq(
      "SELECT planet_id FROM $satellites WHERE id = 1 UNION ALL SELECT planet_id FROM fz_meta WHERE sid = 1",
      "SELECT planet_id FROM fz_meta WHERE sid = 2 UNION ALL SELECT planet_id FROM $satellites WHERE id = 1",
      "SELECT planet_id FROM $satellites WHERE id = 1 UNION SELECT planet_id FROM $satellites WHERE id = 1",
      "SELECT planet_id FROM $satellites WHERE id = 1 UNION ALL SELECT planet_id FROM fz_meta WHERE sid = 1 UNION ALL SELECT planet_id FROM $satellites WHERE id = 2")
    armShapes.zipWithIndex.foreach { case (q, i) =>
      val rows = g.query(q).collect()
      assert(rows.nonEmpty && rows.forall(!_.isNullAt(0)),
        s"[arm $i] per-arm alias scoping failed: $q")
    }

    // -- (e) randomized composition: literal hazard × join-or-sole × clause
    // position, 40 seeded cases — sole-relation statements must resolve,
    // two-relation statements must bind the probe's planet_id
    val rnd = new scala.util.Random(13L)
    (1 to 40).foreach { i =>
      val h = litHazards(rnd.nextInt(litHazards.length))
      val joined = rnd.nextBoolean()
      if (joined) {
        val sid = 1 + rnd.nextInt(3)
        val q = s"SELECT planet_id, '$h' AS tag FROM fz_meta " +
          s"JOIN $$satellites ON fz_meta.sid = $$satellites.id WHERE fz_meta.sid = $sid"
        assert(g.query(q).head().getLong(0) == 9000L + sid, s"[mix $i] $q")
      } else {
        val q = s"SELECT planet_id, '$h' AS tag FROM $$satellites " +
          s"WHERE name <> '$h' ORDER BY id LIMIT 1"
        assert(!g.query(q).head().isNullAt(0), s"[mix $i] $q")
      }
    }
  }

  test("alias guard: catalog-resolved bare aliases in multi-relation statements") {
    import spark.implicits._
    // Competing relation WITHOUT the alias column: bare planet_id can only
    // bind to $satellites, so the catalog-aware guard (r13 VERDICT #4)
    // applies the rewrite where the purely-textual guard suppressed and the
    // statement errored — restores the reference binder's per-relation
    // resolution (virtual_datasets/planet_data.py:100-113) for joins.
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("sid", "tag")
      .createOrReplaceTempView("fz_nopid")
    // ground truth per satellite id from the sole-relation form
    val want: Map[Int, Long] = (1 to 3).map { id =>
      id -> g.query(s"SELECT planet_id FROM $$satellites WHERE id = $id")
        .head().get(0).toString.toDouble.toLong
    }.toMap
    val joinKinds = Seq("JOIN", "INNER JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN")
    val stmts: Seq[(String, Int)] =
      (for (jk <- joinKinds; id <- 1 to 3) yield Seq(
        s"SELECT planet_id FROM fz_nopid $jk $$satellites ON fz_nopid.sid = $$satellites.id WHERE $$satellites.id = $id" -> id,
        s"SELECT planet_id FROM $$satellites $jk fz_nopid ON fz_nopid.sid = $$satellites.id WHERE $$satellites.id = $id" -> id)).flatten ++
        (1 to 3).map(id =>
          s"SELECT planet_id FROM fz_nopid, $$satellites WHERE fz_nopid.sid = $$satellites.id AND $$satellites.id = $id" -> id) ++
        (1 to 3).map(id =>
          s"SELECT planet_id FROM fz_nopid n JOIN $$satellites ON n.sid = $$satellites.id WHERE $$satellites.id = $id" -> id)
    assert(stmts.size >= 30, s"want >=30 join-context statements, have ${stmts.size}")
    stmts.zipWithIndex.foreach { case ((q, id), i) =>
      val got = g.query(q).head().get(0).toString.toDouble.toLong
      assert(got == want(id), s"[cat $i] got $got want ${want(id)}: $q")
    }
    // $planets aliases resolve the same way against a column-free competitor
    val ev = g.query(
      "SELECT escape_velocity FROM fz_nopid JOIN $planets" +
        " ON fz_nopid.sid = $planets.id WHERE $planets.id = 3").head().getDouble(0)
    assert(ev == 11.2, s"catalog-resolved planets alias: $ev")
    // negative control: a competitor that DOES carry the column still
    // suppresses (fz_meta.planet_id binds) — the r12 retarget hazard
    Seq((1, 9001L)).toDF("sid", "planet_id").createOrReplaceTempView("fz_meta2")
    val kept = g.query(
      "SELECT planet_id FROM fz_meta2 JOIN $satellites" +
        " ON fz_meta2.sid = $satellites.id").head().getLong(0)
    assert(kept == 9001L, "competitor with the column must still suppress")
  }

  test("alias guard: FROM-position derived tables are opaque (r13 ADVICE)") {
    // A depth-0 derived table in FROM position was invisible to both the
    // opaque check and the named-relation regex — bare aliases binding to
    // the derived table were silently retargeted to the view's primary.
    val d1 = g.query(
      "SELECT planet_id FROM (SELECT 1 AS k, 9001 AS planet_id) d, $satellites" +
        " WHERE d.k = $satellites.id").head().get(0).toString.toDouble.toLong
    assert(d1 == 9001L, "FROM (derived), $view: bare alias must bind the derived table")
    val d2 = g.query(
      "SELECT planet_id FROM $satellites, (SELECT 1 AS k, 9002 AS planet_id) d" +
        " WHERE d.k = $satellites.id").head().get(0).toString.toDouble.toLong
    assert(d2 == 9002L, "$view, (derived): bare alias must bind the derived table")
    // …while a table-FUNCTION call in FROM position is not a derived table
    // and must not suppress the sole-relation rewrite
    val tf = g.query(
      "SELECT planet_id FROM $satellites WHERE id IN (SELECT 1 FROM range(1, 2))")
      .head()
    assert(!tf.isNullAt(0), "range() in a subquery FROM must not suppress")
  }

  test("alias guard: qualified rewrites are scoped per top-level arm (r13 ADVICE)") {
    import spark.implicits._
    Seq((1, 9001L), (2, 9002L))
      .toDF("sid", "planet_id").createOrReplaceTempView("fz_armq")
    // arm 1 binds p to $satellites (qualified alias rewrites), arm 2 binds p
    // to fz_armq — with statement-global quals, arm 2's p.planet_id was
    // rewritten to p.planetId and the statement failed analysis
    val rows = g.query(
      "SELECT p.planet_id AS v FROM $satellites p WHERE p.id = 1" +
        " UNION ALL SELECT p.planet_id AS v FROM fz_armq p WHERE p.sid = 1")
      .collect().map(_.get(0).toString.toDouble.toLong).sorted
    assert(rows.contains(9001L) && rows.length == 2,
      s"per-arm qualified scoping: ${rows.mkString(",")}")
  }

  test("set-op EXCEPT (SELECT...) arms cut; EXCEPT (cols) exclusion kept (r13 ADVICE)") {
    import spark.implicits._
    Seq((1, 9001L), (2, 9002L))
      .toDF("sid", "planet_id").createOrReplaceTempView("fz_exc")
    // parenthesized set-operation arm: must cut (the $satellites arm is then
    // sole-relation and its alias resolves); the old scanner treated every
    // `EXCEPT (` as column exclusion and merged the arms
    val setOp = g.query(
      "SELECT planet_id FROM $satellites WHERE id = 1" +
        " EXCEPT (SELECT planet_id FROM fz_exc)").collect()
    assert(setOp.length == 1 && !setOp.head.isNullAt(0),
      "EXCEPT (SELECT...) must be treated as a set operation")
    // column-exclusion form still parses as one arm
    val excl = g.query("SELECT * EXCEPT (name) FROM $satellites WHERE id = 1")
    assert(!excl.columns.map(_.toLowerCase).contains("name"),
      "EXCEPT (cols) exclusion must not be cut as a set operation")
  }

  test("XOR inside clause contexts: WHERE, CASE, nested parens, multi-statement") {
    val rnd = new scala.util.Random(42L)
    (1 to 240).foreach { i =>
      val ast = gen(rnd, 2)
      val expected = ast.eval
      // WHERE: row survives iff the predicate is true
      val n = g.query(s"SELECT 1 AS v WHERE ${ast.sql}").count()
      assert((n == 1) == expected, s"[where $i] ${ast.sql}")
      // CASE: same expression as a searched-CASE condition
      val c = g.query(s"SELECT CASE WHEN ${ast.sql} THEN 'y' ELSE 'n' END AS v").head()
      assert((c.getString(0) == "y") == expected, s"[case $i] ${ast.sql}")
      // trailing semicolon form (multi-statement scanner boundary)
      val t = g.query(s"SELECT ${ast.sql} AS v;").head()
      assert(t.getBoolean(0) == expected, s"[semi $i] ${ast.sql}")
    }
  }
}
