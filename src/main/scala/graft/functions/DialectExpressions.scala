package graft.functions

import org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Type-dispatching dialect accessors (reference: the `->`/`->>`/`@?`
  * operators at opteryx/managers/expression/ops.py:291-365 and SEARCH at
  * opteryx/functions/other_functions.py:27-60 accept STRUCT, MAP, ARRAY and
  * JSON-text inputs alike).
  *
  * A Catalyst FunctionRegistry builder can't branch on input types — they
  * are unresolved at build time — so these are `RuntimeReplaceable`
  * expressions: children resolve normally, then `replacement` picks the
  * native Spark expression for the resolved input type (struct field
  * access, map lookup, array subscript, or get_json_object) and the
  * optimizer's ReplaceExpressions swaps it in, keeping full codegen.
  */
object DialectExpressions {

  private def keyString(key: Expression): Option[String] = key match {
    case Literal(s: UTF8String, StringType) => Some(s.toString)
    case _ => None
  }

  /** JSON path for the fall-through get_json_object tier: `'$...'` keys
    * pass through as paths, string keys become `$.key`, integers `$[i]`. */
  private def jsonPath(key: Expression): Expression = key match {
    case Literal(s: UTF8String, StringType) if s.toString.startsWith("$") => key
    case _ => key.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Concat(Seq(Literal("$["), Cast(key, StringType), Literal("]")))
      case _ => Concat(Seq(Literal("$."), Cast(key, StringType)))
    }
  }

  /** `x -> k` / `x ->> k` (asText casts the element to STRING). */
  case class GraftExtract(input: Expression, key: Expression, asText: Boolean)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(input, key)
    override def prettyName: String =
      if (asText) "graft_extract_text" else "graft_extract"
    override lazy val replacement: Expression = {
      val base = input.dataType match {
        case _: StructType | _: MapType | _: ArrayType =>
          ExtractValue(input, key, caseInsensitiveResolution)
        case BinaryType | NullType =>
          // replacement is not re-analyzed, so GetJsonObject never gets an
          // implicit cast — feed it STRING explicitly (NULL input → NULL out)
          GetJsonObject(Cast(input, StringType), jsonPath(key))
        case _ => GetJsonObject(input, jsonPath(key))
      }
      if (asText) Cast(base, StringType) else base
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(input = newChildren(0), key = newChildren(1))
  }

  /** `x @? 'path'` — path/key existence. Struct: field exists (analysis-time
    * constant). Map: key present. Array: index in bounds. JSON text: the
    * path resolves to a non-null value. */
  case class GraftExists(input: Expression, key: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(input, key)
    override def prettyName: String = "graft_exists"
    override lazy val replacement: Expression = input.dataType match {
      case s: StructType =>
        Literal(keyString(key).exists(k =>
          s.fieldNames.exists(caseInsensitiveResolution(_, k))))
      case m: MapType => ArrayContains(MapKeys(input), Cast(key, m.keyType))
      case _: ArrayType =>
        And(GreaterThanOrEqual(key, Literal(0)),
          LessThan(Cast(key, IntegerType), Size(input)))
      case BinaryType | NullType =>
        IsNotNull(GetJsonObject(Cast(input, StringType), jsonPath(key)))
      case _ => IsNotNull(GetJsonObject(input, jsonPath(key)))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(input = newChildren(0), key = newChildren(1))
  }

  /** `a @> b` array containment (every element of b present in a). Casts
    * the items side to the container's type so mixed spellings
    * (`(1.1, 2.2) @> [2.2]`, `x @> []`) resolve; an untyped empty items
    * array is trivially contained. */
  case class GraftContainsAll(container: Expression, items: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(container, items)
    override def prettyName: String = "array_contains_all"
    override lazy val replacement: Expression = (container.dataType, items.dataType) match {
      case (NullType, _) | (_, NullType) =>
        // a NULL operand (not an empty array literal) yields NULL, and must
        // not reach the Cast branches below (Cast to NullType is invalid)
        Literal.create(null, BooleanType)
      case (_, ArrayType(NullType, _)) => Literal(true)
      case (ArrayType(NullType, _), _) =>
        // an untyped empty container holds only an empty items side
        EqualTo(Size(items), Literal(0))
      case (c, i) if c == i =>
        EqualTo(Size(ArrayExcept(items, container)), Literal(0))
      case (c, _) =>
        EqualTo(Size(ArrayExcept(Cast(items, c), container)), Literal(0))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(container = newChildren(0), items = newChildren(1))
  }

  /** BLOB(x) — the dialect's bytes constructor. This engine represents the
    * BLOB surface as UTF-8 STRING (comparisons, LIKE, casts to numerics all
    * behave as the reference's bytes do over UTF-8 text); complex inputs
    * serialize to JSON text first, so `BLOB(struct) -> 'k'` chains work. */
  case class GraftBlob(input: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(input)
    override def prettyName: String = "blob"
    override lazy val replacement: Expression = input.dataType match {
      case _: StructType | _: MapType | _: ArrayType =>
        StructsToJson(Map.empty, input, Some(SQLConf.get.sessionLocalTimeZone))
      case _ => Cast(input, StringType)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(input = newChildren(0))
  }

  /** IFNULL with the reference's dynamic typing: mismatched fallback types
    * cast to the primary's type instead of failing analysis
    * (`IFNULL(bool_expr, 'Jake')`). Same-type and numeric pairs keep
    * Spark's native coercion. */
  case class GraftIfNull(primary: Expression, fallback: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(primary, fallback)
    override def prettyName: String = "ifnull"
    private def numeric(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _ => false
    }
    override lazy val replacement: Expression =
      if (primary.dataType == fallback.dataType)
        Coalesce(Seq(primary, fallback))
      else if (primary.dataType == NullType)
        // `ifnull(NULL, x)`: coerce toward the fallback's type — Cast INTO
        // NullType is unresolvable and would crash analysis
        Coalesce(Seq(Cast(primary, fallback.dataType), fallback))
      else if (fallback.dataType == NullType)
        Coalesce(Seq(primary, Cast(fallback, primary.dataType)))
      else if (numeric(primary.dataType) && numeric(fallback.dataType))
        // post-TypeCoercion: widen by hand like GraftExtrema
        org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findWiderCommonType(Seq(primary.dataType, fallback.dataType)) match {
          case Some(t) => Coalesce(Seq(
            if (primary.dataType == t) primary else Cast(primary, t),
            if (fallback.dataType == t) fallback else Cast(fallback, t)))
          case None => Coalesce(Seq(primary, Cast(fallback, primary.dataType)))
        }
      else Coalesce(Seq(primary, Cast(fallback, primary.dataType)))
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(primary = newChildren(0), fallback = newChildren(1))
  }

  /** LEAST/GREATEST with the reference's single-array form:
    * `LEAST(ARRAY_AGG(x))` = array minimum. Multi-arg keeps Spark's
    * native Least/Greatest. */
  case class GraftExtrema(args: Seq[Expression], greatest: Boolean)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = args
    override def prettyName: String = if (greatest) "greatest" else "least"
    override lazy val replacement: Expression = args match {
      case Seq(one) if one.dataType.isInstanceOf[ArrayType] =>
        if (greatest) ArrayMax(one) else ArrayMin(one)
      case Seq(one) =>
        // single scalar (incl. untyped NULL) — native Least/Greatest require
        // two children, and the extremum of one value is itself
        one
      case _ =>
        // replacement happens after the analyzer's TypeCoercion pass, so
        // mixed-width args (`greatest(bigint_col, 1)`) must be widened here
        val types = args.map(_.dataType)
        val coerced =
          if (types.distinct.size <= 1) args
          else org.apache.spark.sql.catalyst.analysis.TypeCoercion
            .findWiderCommonType(types) match {
            case Some(t) => args.map(a => if (a.dataType == t) a else Cast(a, t))
            case None => args
          }
        if (greatest) Greatest(coerced) else Least(coerced)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(args = newChildren)
  }

  /** SEARCH(x, term): case-insensitive substring on text; exact (case-
    * sensitive) membership on arrays and on struct VALUES — the reference's
    * struct branch is `item in record.values()`
    * (opteryx/functions/other_functions.py:77), so field names never match
    * and partial values never match. Null records search as false. */
  case class GraftSearch(input: Expression, term: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(input, term)
    override def prettyName: String = "search"
    override lazy val replacement: Expression = input.dataType match {
      case ArrayType(_, _) =>
        ArrayContains(Cast(input, ArrayType(StringType)), Cast(term, StringType))
      case s: StructType =>
        // exact membership over the struct's field values (stringified);
        // coalesce → false matches the reference's null-record pre-filter
        val values = s.fields.zipWithIndex.map { case (f, i) =>
          Cast(GetStructField(input, i, Some(f.name)), StringType)
        }
        Coalesce(Seq(
          ArrayContains(CreateArray(values.toIndexedSeq), Cast(term, StringType)),
          Literal(false)))
      case _ =>
        Contains(Lower(Cast(input, StringType)), Lower(Cast(term, StringType)))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(input = newChildren(0), term = newChildren(1))
  }
}
