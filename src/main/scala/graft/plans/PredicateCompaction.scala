package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Predicate range compaction — a custom Catalyst optimizer rule supplying
  * the two range-algebra simplifications the built-in optimizer does not do
  * (reference: opteryx/planner/optimizer/strategies/predicate_compaction.py —
  * merge same-column range predicates; contradiction → empty scan, the
  * NullReaderNode planning path at physical_planner.py:78-81):
  *
  *  - redundancy: `x > 5 AND x > 3` → `x > 5`; the surviving conjunction
  *    carries ONE lower and ONE upper bound per column, so the parquet
  *    pushdown (and row-group pruning) sees the tight range instead of a
  *    pile of overlapping comparisons;
  *  - contradiction: `x > 5 AND x < 2` → the Filter's child is replaced by
  *    an empty LocalRelation — no scan is scheduled at all, which at 100 TB
  *    is the difference between 0 tasks and a full pushdown-filtered read.
  *
  * Null semantics make both rewrites exact, not approximate: a NULL `x`
  * evaluates every comparison to NULL, so the row is dropped by the original
  * filter AND by the compacted one (or the empty relation). Scope is
  * deliberately conservative: only attribute-vs-foldable-literal comparisons
  * where the literal type equals the attribute type (no implicit casts) and
  * the type has a total order we trust (numeric, date, timestamp, string);
  * everything else passes through untouched.
  *
  * Registered two ways: [[graft.GraftSession.prepare]] appends it to
  * `spark.experimental.extraOptimizations` for embedded sessions, and
  * [[GraftExtensions]] injects it via `spark.sql.extensions` for cluster
  * deployments.
  */
object PredicateCompaction extends Rule[LogicalPlan] with PredicateHelper {

  private def orderable(t: DataType): Boolean = t match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType | StringType => true
    case _ => false
  }

  /** One column's accumulated bounds: (value, inclusive). */
  private final case class Bounds(
      lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)], eq: Option[Any])

  /** Normalize a conjunct to (attr, op-kind, literal value); kinds:
    * ">"/">="/"<"/"<="/"=". Literal-on-the-left comparisons are flipped. */
  private def normalized(e: Expression): Option[(Attribute, String, Any)] = e match {
    case GreaterThan(a: Attribute, l: Literal) if ok(a, l) => Some((a, ">", l.value))
    case GreaterThanOrEqual(a: Attribute, l: Literal) if ok(a, l) => Some((a, ">=", l.value))
    case LessThan(a: Attribute, l: Literal) if ok(a, l) => Some((a, "<", l.value))
    case LessThanOrEqual(a: Attribute, l: Literal) if ok(a, l) => Some((a, "<=", l.value))
    case EqualTo(a: Attribute, l: Literal) if ok(a, l) => Some((a, "=", l.value))
    case GreaterThan(l: Literal, a: Attribute) if ok(a, l) => Some((a, "<", l.value))
    case GreaterThanOrEqual(l: Literal, a: Attribute) if ok(a, l) => Some((a, "<=", l.value))
    case LessThan(l: Literal, a: Attribute) if ok(a, l) => Some((a, ">", l.value))
    case LessThanOrEqual(l: Literal, a: Attribute) if ok(a, l) => Some((a, ">=", l.value))
    case EqualTo(l: Literal, a: Attribute) if ok(a, l) => Some((a, "=", l.value))
    case _ => None
  }

  private def ok(a: Attribute, l: Literal): Boolean =
    l.value != null && l.dataType == a.dataType && orderable(a.dataType)

  def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if !child.isStreaming =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (ranged, passThrough) = conjuncts.partition(normalized(_).isDefined)
      // nothing to merge unless a column carries at least two range conjuncts
      val byAttr = ranged.flatMap(normalized).groupBy(_._1.exprId)
      if (!byAttr.values.exists(_.size >= 2)) f
      else {
        var contradiction = false
        val rebuilt = byAttr.toSeq.sortBy(_._2.head._1.name).flatMap { case (_, cs) =>
          val attr = cs.head._1
          val ord = TypeUtils.getInterpretedOrdering(attr.dataType)
          var b = Bounds(None, None, None)
          cs.foreach { case (_, op, v) =>
            op match {
              case ">" | ">=" =>
                val inc = op == ">="
                b = if (b.lo.forall { case (lv, linc) =>
                  ord.compare(v, lv) > 0 || (ord.compare(v, lv) == 0 && !inc && linc)
                }) b.copy(lo = Some((v, inc))) else b
              case "<" | "<=" =>
                val inc = op == "<="
                b = if (b.hi.forall { case (hv, hinc) =>
                  ord.compare(v, hv) < 0 || (ord.compare(v, hv) == 0 && !inc && hinc)
                }) b.copy(hi = Some((v, inc))) else b
              case "=" =>
                if (b.eq.exists(ev => ord.compare(ev, v) != 0)) contradiction = true
                else b = b.copy(eq = Some(v))
            }
          }
          // equality folds the range: keep only `= v` if it satisfies the
          // bounds, otherwise the conjunction is unsatisfiable
          val lit = (v: Any) => Literal.create(v, attr.dataType)
          b.eq match {
            case Some(v) =>
              val loOk = b.lo.forall { case (lv, inc) =>
                val c = ord.compare(v, lv); if (inc) c >= 0 else c > 0 }
              val hiOk = b.hi.forall { case (hv, inc) =>
                val c = ord.compare(v, hv); if (inc) c <= 0 else c < 0 }
              if (!loOk || !hiOk) { contradiction = true; Nil }
              else Seq(EqualTo(attr, lit(v)))
            case None =>
              for (((lv, linc), (hv, hinc)) <- b.lo.zip(b.hi)) {
                val c = ord.compare(lv, hv)
                if (c > 0 || (c == 0 && !(linc && hinc))) contradiction = true
              }
              b.lo.map { case (v, inc) =>
                if (inc) GreaterThanOrEqual(attr, lit(v)) else GreaterThan(attr, lit(v))
              }.toSeq ++
                b.hi.map { case (v, inc) =>
                  if (inc) LessThanOrEqual(attr, lit(v)) else LessThan(attr, lit(v))
                }
          }
        }
        if (contradiction) LocalRelation(f.output)
        else {
          // ranges first: the cheap, null-safe range guards evaluate before
          // arbitrary pass-through conjuncts, so a range that used to
          // short-circuit an error-throwing predicate (ANSI mode) still does
          val all = rebuilt ++ passThrough
          if (all.isEmpty) child else Filter(all.reduce(And), child)
        }
      }
  }
}

/** `spark.sql.extensions` entry point for cluster deployments:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PredicateCompaction)
}
