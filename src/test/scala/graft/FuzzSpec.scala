package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differential fuzzing (the reference's tier-4 strategy,
  * tests/fuzzing/test_sql_fuzzer_*.py): generate random single-table
  * predicates, run them BOTH as graft-dialect SQL (full rewrite pipeline)
  * and as directly-constructed DataFrame plans, and require identical
  * results. Catches dialect-rewrite corruption (literals, operators,
  * precedence) that fixed test corpora miss. Seeded, so failures reproduce.
  */
class FuzzSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = {
    val eng = Graft(spark)
    eng.registerDir(SharedSpark.sf)
    eng
  }

  private case class Pred(sql: String, col: Column)

  private val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
  private val cmp = Seq[(String, (Column, Column) => Column)](
    ("=", _ === _), ("<>", _ =!= _), ("<", _ < _),
    (">", _ > _), ("<=", _ <= _), (">=", _ >= _))

  private val leafGen: Gen[Pred] = for {
    c <- Gen.oneOf(numCols)
    op <- Gen.oneOf(cmp)
    v <- Gen.chooseNum(0, 400000)
  } yield Pred(s"$c ${op._1} $v", op._2(col(c), lit(v)))

  private def predGen(depth: Int): Gen[Pred] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for {
        a <- predGen(depth - 1); b <- predGen(depth - 1)
        conj <- Gen.oneOf(true, false)
      } yield
        if (conj) Pred(s"(${a.sql}) AND (${b.sql})", a.col && b.col)
        else Pred(s"(${a.sql}) OR (${b.sql})", a.col || b.col)),
      1 -> predGen(depth - 1).map(p => Pred(s"NOT (${p.sql})", !p.col)))

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("random predicates: dialect SQL == DataFrame plan (60 seeded cases)") {
    val orders = Tables.df(spark, SharedSpark.sf, "orders")
    samples(predGen(3), 60, seed = 20260812L).foreach { p =>
      val viaSql = g.query(s"SELECT count(*) AS n FROM orders WHERE ${p.sql}")
        .head().getLong(0)
      val viaDf = orders.filter(p.col).count()
      assert(viaSql == viaDf, s"mismatch for: ${p.sql}")
    }
  }

  test("random arithmetic projections: dialect SQL == DataFrame plan (30 cases)") {
    val genExpr = for {
      c <- Gen.oneOf("o_orderkey", "o_custkey")
      k <- Gen.chooseNum(1, 1000)
      op <- Gen.oneOf("+", "-", "*", "%")
    } yield (s"$c $op $k", op match {
      case "+" => col(c) + k
      case "-" => col(c) - k
      case "*" => col(c) * k
      case _ => col(c) % k
    })
    val orders = Tables.df(spark, SharedSpark.sf, "orders")
    samples(genExpr, 30, seed = 4242L).foreach { case (sqlExpr, colExpr) =>
      val viaSql = g.query(
        s"SELECT sum(CAST(($sqlExpr) AS BIGINT)) AS s FROM orders").head().getLong(0)
      val viaDf = orders.agg(sum(colExpr.cast("bigint"))).head().getLong(0)
      assert(viaSql == viaDf, s"mismatch for: $sqlExpr")
    }
  }

  test("random quantified comparisons: dialect ANY/ALL == higher-order plan (30 cases)") {
    val gen = for {
      c <- Gen.oneOf("o_orderkey", "o_custkey")
      vs <- Gen.listOfN(3, Gen.chooseNum(0, 3000))
      op <- Gen.oneOf("=", "!=", ">", "<")
      kw <- Gen.oneOf("ANY", "ALL")
    } yield (c, vs, op, kw)
    val orders = Tables.df(spark, SharedSpark.sf, "orders")
    samples(gen, 30, seed = 777L).foreach { case (c, vs, op, kw) =>
      // ALL supports = / != in the dialect; map unsupported combos to ANY
      val kw2 = if (kw == "ALL" && (op == ">" || op == "<")) "ANY" else kw
      val arr = vs.mkString("array(", ", ", ")")
      val viaSql = g.query(
        s"SELECT count(*) AS n FROM orders WHERE $c $op $kw2($arr)").head().getLong(0)
      val lam: Column => Column = x => op match {
        case "=" => col(c) === x; case "!=" => col(c) =!= x
        case ">" => col(c) > x; case _ => col(c) < x
      }
      val pred = if (kw2 == "ANY") exists(array(vs.map(lit): _*), lam)
        else forall(array(vs.map(lit): _*), lam)
      val viaDf = orders.filter(pred).count()
      assert(viaSql == viaDf, s"mismatch for: $c $op $kw2($arr)")
    }
  }

  test("random numeric-literal spellings: hex/underscores == plain decimals (30 cases)") {
    val gen = for {
      v <- Gen.chooseNum(1000, 4000000)
      style <- Gen.oneOf("hex", "underscore")
    } yield (v, style)
    val orders = Tables.df(spark, SharedSpark.sf, "orders")
    samples(gen, 30, seed = 999L).foreach { case (v, style) =>
      val spelled = style match {
        case "hex" => "0x" + java.lang.Long.toHexString(v)
        case _ =>
          val ds = v.toString.reverse.grouped(3).mkString("_").reverse
          ds
      }
      val viaSql = g.query(
        s"SELECT count(*) AS n FROM orders WHERE o_orderkey < $spelled").head().getLong(0)
      val viaDf = orders.filter(col("o_orderkey") < v).count()
      assert(viaSql == viaDf, s"mismatch for literal $spelled (= $v)")
    }
  }

  test("random JSON arrow accessors on literals == get_json_object (20 cases)") {
    val gen = for {
      k <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
      v <- Gen.chooseNum(0, 10000)
    } yield (k, v)
    samples(gen, 20, seed = 31337L).foreach { case (k, v) =>
      val json = s"""{"$k": $v}"""
      val viaArrow = g.query(s"SELECT '$json' ->> '$k' AS v").head().getString(0)
      val viaFn = g.query(s"SELECT get_json_object('$json', '$$.$k') AS v").head().getString(0)
      assert(viaArrow == viaFn && viaArrow == v.toString,
        s"mismatch for $json ->> '$k': arrow=$viaArrow fn=$viaFn")
    }
  }
}
