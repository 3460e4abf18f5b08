package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Row-level visibility filters — the Spark-native equivalent of the
  * reference's `visibility_filters` hook (reference:
  * opteryx/planner/logical_planner/logical_planner.py:1116-1145
  * `apply_visibility_filters`, plumbed through `planner/__init__.py:126`
  * and `binder/__init__.py:216`): per-relation predicates in disjunctive
  * normal form, injected directly above every scan of the relation so the
  * engine enforces row-level security regardless of how the query spells
  * its access.
  *
  * DNF model (mirrors the reference's `build_expression_tree` input,
  * logical_planner.py:1011-1060):
  *   - a CLAUSE is a conjunction: `Seq[(column, operator, value)]` — all
  *     tuples must hold;
  *   - a FILTER is a disjunction of clauses: `Seq[clause]` — any clause
  *     admits the row;
  *   - the EMPTY filter (`Seq.empty`) hides the relation entirely (the
  *     reference inserts a constant `TRUE = FALSE` predicate,
  *     logical_planner.py:1122-1138).
  *
  * Because the filter becomes an ordinary Catalyst `Filter` over the base
  * relation, predicate pushdown applies: simple comparisons reach the
  * parquet scan as PushedFilters, so at 100 TB a visibility filter PRUNES
  * I/O rather than post-filtering it (spec-asserted in GraftSqlSpec).
  */
object Visibility {

  type Clause = Seq[(String, String, Any)]
  type Dnf = Seq[Clause]

  /** Operators follow the reference's comparison-node spellings
    * (logical_planner.py build_expression_tree / sqlparser Eq, NotEq, …). */
  private def predicate(column: String, op: String, value: Any): Column = {
    val c = col(column)
    def v = lit(value)
    op match {
      case "Eq"        => c === v
      case "NotEq"     => c =!= v
      case "Gt"        => c > v
      case "GtEq"      => c >= v
      case "Lt"        => c < v
      case "LtEq"      => c <= v
      case "Like"      => c.like(value.toString)
      case "NotLike"   => !c.like(value.toString)
      case "InList"    => c.isin(seqOf(value): _*)
      case "NotInList" => !c.isin(seqOf(value): _*)
      case "IsNull"    => c.isNull
      case "IsNotNull" => c.isNotNull
      case other => throw new IllegalArgumentException(
        s"unknown visibility-filter operator `$other` (column `$column`)")
    }
  }

  private def seqOf(value: Any): Seq[Any] = value match {
    case s: Seq[_] => s
    case a: Array[_] => a.toSeq
    case other => Seq(other)
  }

  /** DNF → one Catalyst boolean Column. Empty DNF → constant FALSE (the
    * relation is not visible at all). */
  def toColumn(dnf: Dnf): Column =
    if (dnf.isEmpty) lit(false)
    else dnf.map { clause =>
      if (clause.isEmpty) lit(true)
      else clause.map { case (c, op, v) => predicate(c, op, v) }.reduce(_ && _)
    }.reduce(_ || _)
}
