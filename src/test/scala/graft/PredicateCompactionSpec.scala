package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{EqualTo, GreaterThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation

/** Plan- and semantics-level properties of the PredicateCompaction optimizer
  * rule (plans/PredicateCompaction.scala): redundant range conjuncts merge
  * to the tight pair, contradictions plan as empty relations with no scan,
  * equality folds its range, and results always match the uncompacted
  * semantics.
  */
class PredicateCompactionSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private def li = Tables.df(spark, SharedSpark.sf, "lineitem")

  test("redundant bounds merge to one lower and one upper comparison") {
    val df = li.filter(col("l_quantity") > 5 && col("l_quantity") > 3
      && col("l_quantity") <= 47 && col("l_quantity") < 49)
    val filters = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    assert(filters.size == 1)
    val comparisons = filters.head.collect {
      case g: GreaterThan => ("gt", g.right.toString)
      case l: LessThanOrEqual => ("le", l.right.toString)
    }
    assert(comparisons.toSet == Set(("gt", "5.0"), ("le", "47.0")),
      s"expected the tight (5, 47] pair, got $comparisons")
    // semantics unchanged vs the manually tight filter
    assert(df.count() ==
      li.filter(col("l_quantity") > 5 && col("l_quantity") <= 47).count())
  }

  test("range contradiction plans as an empty LocalRelation with no scan") {
    val df = li.filter(col("l_quantity") > 40 && col("l_quantity") < 10)
    assert(df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation] ||
      df.queryExecution.optimizedPlan.collectFirst { case l: LocalRelation => l }.isDefined,
      "contradictory range did not collapse to an empty relation")
    assert(!df.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "contradictory filter still schedules a file scan")
    assert(df.count() == 0)
  }

  test("equality folds a consistent range and contradicts an inconsistent one") {
    val folded = li.filter(col("l_quantity") === 5 && col("l_quantity") > 1)
    val conds = folded.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    assert(conds.size == 1)
    assert(conds.head.collect { case e: EqualTo => e }.size == 1)
    assert(conds.head.collect { case g: GreaterThan => g }.isEmpty,
      "equality did not absorb the redundant lower bound")
    assert(folded.count() == li.filter(col("l_quantity") === 5).count())

    val contra = li.filter(col("l_quantity") === 5 && col("l_quantity") > 7)
    assert(contra.count() == 0)
    assert(!contra.queryExecution.executedPlan.toString.contains("Scan parquet"))
  }

  test("non-literal and mixed predicates pass through untouched") {
    // only one rangeable conjunct per column → rule leaves the filter alone
    val df = li.filter(col("l_quantity") > 5 && col("l_discount") < lit(0.05)
      && col("l_returnflag") === col("l_linestatus"))
    assert(df.count() ==
      li.where("l_quantity > 5 and l_discount < 0.05 and l_returnflag = l_linestatus")
        .count())
  }

  test("differential fuzz: 200 random range-conjunct sets match Scala-side evaluation") {
    val nation = Tables.df(spark, SharedSpark.sf, "nation")
    val allKeys = nation.select(col("n_nationkey"))
      .collect().map(_.getAs[Number](0).longValue).sorted
    val rnd = new scala.util.Random(20260814)
    val ops = Seq(">", ">=", "<", "<=", "=")
    for (trial <- 1 to 200) {
      val conjuncts = (1 to (2 + rnd.nextInt(4))).map { _ =>
        (ops(rnd.nextInt(ops.size)), rnd.nextInt(30).toLong - 2)
      }
      val cond = conjuncts.map { case (op, v) => s"n_nationkey $op $v" }
        .mkString(" AND ")
      val expected = allKeys.count { k =>
        conjuncts.forall {
          case (">", v) => k > v
          case (">=", v) => k >= v
          case ("<", v) => k < v
          case ("<=", v) => k <= v
          case ("=", v) => k == v
        }
      }
      val got = nation.where(cond).count()
      assert(got == expected, s"trial $trial: WHERE $cond → $got, expected $expected")
    }
  }

  test("null-bearing column: compaction preserves Kleene drop semantics") {
    import spark.implicits._
    val d = Seq[java.lang.Double](1.0, 6.0, null, 50.0).toDF("x")
    val compacted = d.filter(col("x") > 5 && col("x") > 3 && col("x") < 49)
    assert(compacted.collect().map(_.getDouble(0)).toSet == Set(6.0))
    val contra = d.filter(col("x") > 5 && col("x") < 2)
    assert(contra.count() == 0)
  }
}
