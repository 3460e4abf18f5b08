package graft

import java.util.regex.Matcher

/** Pre-parse SQL dialect shim: rewrites the reference engine's non-ANSI
  * spellings into Spark SQL before parsing — the same strategy the reference
  * itself uses for syntax its parser can't express
  * (reference: opteryx/planner/sql_rewriter.py:37-58).
  *
  * Handled here (SURVEY.md §4 "custom Catalyst work"):
  *  - JSON accessors  `expr -> 'k'`, `expr ->> 'k'`  → get_json_object
  *    (reference: opteryx/managers/expression/binary_operators.py:203-218)
  *  - JSON path-exists `expr @? '$.k'` → get_json_object(...) IS NOT NULL
  *    (reference: opteryx/managers/expression/ops.py:291-365)
  *  - `SELECT DISTINCT ON (cols) ...` → ranked-window subquery
  *    (reference: opteryx/operators/distinct_node.py:178-183)
  *  - temporal `FOR ...` clauses → extracted per-relation date ranges
  *    (reference: opteryx/planner/sql_rewriter.py:51-55, 283-390)
  *  - zero-config path tables `FROM 'path/file.parquet'`
  *
  * These are string-level rewrites over a quote-aware tokenization — the
  * rewriting never touches string literals' contents.
  */
object GraftSql {

  /** A relation-scoped temporal restriction extracted from `FOR` syntax.
    * The rewritten SQL references `viewName`; the session layer registers it
    * as the base relation filtered to [start, end]. */
  final case class TemporalRange(relation: String, start: String, end: String, viewName: String)

  final case class Rewritten(
      sql: String,
      temporal: Seq[TemporalRange],
      pathTables: Seq[String])

  def rewrite(sql: String): Rewritten = {
    var s = stripComments(sql)
    val (afterTemporal, ranges) = extractTemporal(s)
    s = afterTemporal
    val (afterPaths, paths) = extractPathTables(s)
    s = afterPaths
    s = rewriteJsonOps(s)
    s = rewriteQuantified(s)
    s = rewriteDistinctOn(s)
    s = rewriteVariables(s)
    s = rewriteVirtualTables(s)
    s = rewriteTableFunctions(s)
    Rewritten(s.trim, ranges, paths)
  }

  // -- comments ---------------------------------------------------------

  private def stripComments(sql: String): String =
    mapOutsideLiterals(sql) { text =>
      text.replaceAll("--[^\n]*", " ").replaceAll("(?s)/\\*.*?\\*/", " ")
    }

  /** Apply a transformation only to the regions of `sql` outside single-quoted
    * string literals (literals are preserved verbatim). */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '\'') {
        out.append(f(seg.toString)); seg.clear()
        inStr = true
        out.append(c)
      } else if (inStr && c == '\'') {
        // handle escaped '' inside literal
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          out.append("''"); i += 1
        } else {
          inStr = false
          out.append(c)
        }
      } else if (inStr) out.append(c)
      else seg.append(c)
      i += 1
    }
    out.append(f(seg.toString))
    out.toString
  }

  // -- temporal FOR clauses ----------------------------------------------

  // FROM <rel> FOR <spec> where spec ∈ {TODAY, YESTERDAY, '<ts>',
  // DATES BETWEEN a AND b, DATES SINCE x, LAST n DAYS}
  private val forClause =
    ("""(?is)\b(FROM|JOIN)\s+([\w.$]+)(\s+(?:AS\s+)?\w+)?\s+FOR\s+""" +
      """(TODAY|YESTERDAY|'[^']*'|DATES\s+BETWEEN\s+('[^']*'|TODAY|YESTERDAY)\s+AND\s+('[^']*'|TODAY|YESTERDAY)|DATES\s+SINCE\s+('[^']*'|TODAY|YESTERDAY)|LAST\s+(\d+)\s+DAYS)""").r

  private def resolveDate(token: String): String = token.trim.toUpperCase match {
    case "TODAY" => "current_date()"
    case "YESTERDAY" => "date_sub(current_date(), 1)"
    case t => t.replaceAll("(?i)^'(.*)'$", "'$1'") // keep quoted literal as-is
  }

  private def extractTemporal(sql: String): (String, Seq[TemporalRange]) = {
    val ranges = scala.collection.mutable.ArrayBuffer.empty[TemporalRange]
    val rewritten = forClause.replaceAllIn(sql, m => {
      val keyword = m.group(1)
      val rel = m.group(2)
      // keep the original name visible as alias so qualified column refs
      // (`events.ts`) keep resolving
      val alias = Option(m.group(3)).map(_.trim)
        .getOrElse(rel.split('.').last.replaceAll("\\W", "_"))
      val spec = m.group(4)
      val specU = spec.toUpperCase
      val (start, end) =
        if (specU.startsWith("DATES BETWEEN")) (resolveDate(m.group(5)), resolveDate(m.group(6)))
        else if (specU.startsWith("DATES SINCE")) (resolveDate(m.group(7)), "current_timestamp()")
        else if (specU.startsWith("LAST")) (s"date_sub(current_date(), ${m.group(8)})", "current_timestamp()")
        else (resolveDate(spec), resolveDate(spec))
      val view = rel.replaceAll("\\W", "_") + "__for_" + ranges.size
      ranges += TemporalRange(rel, start, end, view)
      Matcher.quoteReplacement(s"$keyword $view $alias ")
    })
    (rewritten, ranges.toSeq)
  }

  // -- zero-config path tables --------------------------------------------

  private val pathTable =
    """(?is)\b(FROM|JOIN)\s+'([^']+\.(?:parquet|csv|tsv|psv|json|jsonl|orc|avro|(?:csv|tsv|psv|json|jsonl)\.gz|(?:json|jsonl)\.zst))'""".r

  /** Turn `FROM 'x/y.parquet'` into `FROM <generated view>`; caller registers
    * each returned path as a temp view named by [[viewNameFor]]. */
  private def extractPathTables(sql: String): (String, Seq[String]) = {
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    val rewritten = pathTable.replaceAllIn(sql, m => {
      paths += m.group(2)
      Matcher.quoteReplacement(s"${m.group(1)} ${viewNameFor(m.group(2))}")
    })
    (rewritten, paths.toSeq)
  }

  def viewNameFor(path: String): String =
    "path_" + java.lang.Integer.toHexString(path.hashCode) + "_" +
      path.split('/').last.takeWhile(_ != '.').replaceAll("\\W", "_")

  // -- JSON operators ------------------------------------------------------

  // expr ->> 'key'  /  expr -> 'key'  (also integer subscripts)
  private val arrowOp = """([\w.\)\]]+)\s*->>?\s*'([^']+)'""".r
  private val arrowIdx = """([\w.\)\]]+)\s*->>?\s*(\d+)""".r
  private val atQuestion = """([\w.\)\]]+)\s*@\?\s*'([^']+)'""".r
  private val atArrow = """([\w.\)\]]+)\s*@>\s*'(\{[^']*\})'""".r

  /** `col @> '{"k":1,"s":"x"}'` (JSONB containment, reference AtArrow at
    * opteryx/managers/expression/ops.py:291-365): every key/value of the
    * literal must match in the column's JSON. Compiled to one
    * get_json_object conjunct per literal entry. */
  private def rewriteAtArrow(sql: String): String =
    atArrow.replaceAllIn(sql, m => {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(m.group(2))
      val it = node.fields()
      val conjuncts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val e = it.next()
        val v = if (e.getValue.isTextual) e.getValue.asText() else e.getValue.toString
        conjuncts += s"get_json_object(${m.group(1)}, '$$.${e.getKey}') = '${v.replace("'", "''")}'"
      }
      Matcher.quoteReplacement(
        if (conjuncts.isEmpty) "TRUE" else conjuncts.mkString("(", " AND ", ")"))
    })

  private def rewriteJsonOps(sql: String): String = {
    var s = sql
    if (s.contains("@>")) s = rewriteAtArrow(s)
    if (s.contains("@?"))
      s = atQuestion.replaceAllIn(s, m => Matcher.quoteReplacement(
        s"get_json_object(${m.group(1)}, '${jsonPath(m.group(2))}') IS NOT NULL"))
    if (s.contains("->")) {
      s = arrowOp.replaceAllIn(s, m => Matcher.quoteReplacement(
        s"get_json_object(${m.group(1)}, '${jsonPath(m.group(2))}')"))
      s = arrowIdx.replaceAllIn(s, m => Matcher.quoteReplacement(
        s"get_json_object(${m.group(1)}, '$$[${m.group(2)}]')"))
    }
    s
  }

  private def jsonPath(key: String): String =
    if (key.startsWith("$")) key else s"$$.$key"

  // -- array-quantified comparisons -------------------------------------------

  private val anyOp = """(?i)('[^']*'|[\w.]+)\s*(=|!=|<>|>=|<=|>|<)\s*ANY\s*\(\s*([\w.]+)\s*\)""".r
  private val allOp = """(?i)('[^']*'|[\w.]+)\s*(=|!=|<>)\s*ALL\s*\(\s*([\w.]+)\s*\)""".r
  private val anyLike = """(?i)('[^']*'|[\w.]+)\s+(I?LIKE)\s+ANY\s*\(\s*([\w.]+)\s*\)""".r

  /** Scalar-vs-array quantified comparisons (reference:
    * opteryx/managers/expression/ops.py:254-290 — `x = ANY(arr)`,
    * `x != ALL(arr)`, `x LIKE ANY(arr)`) → Spark higher-order
    * `exists`/`forall` lambdas, which stay codegen-friendly. */
  private def rewriteQuantified(sql: String): String = {
    var s = sql
    if (s.toUpperCase.contains("ANY") || s.toUpperCase.contains("ALL")) {
      s = anyLike.replaceAllIn(s, m => {
        val like = if (m.group(2).equalsIgnoreCase("ILIKE"))
          s"ilike(__x, ${m.group(1)})" else s"__x LIKE ${m.group(1)}"
        Matcher.quoteReplacement(s"exists(${m.group(3)}, __x -> $like)")
      })
      s = anyOp.replaceAllIn(s, m => Matcher.quoteReplacement(
        s"exists(${m.group(3)}, __x -> ${m.group(1)} ${m.group(2)} __x)"))
      s = allOp.replaceAllIn(s, m => Matcher.quoteReplacement(
        s"forall(${m.group(3)}, __x -> ${m.group(1)} ${m.group(2)} __x)"))
    }
    s
  }

  // -- @variables ------------------------------------------------------------

  /** `@name` references → Spark 4 session variables, qualified as
    * `system.session.name` so they can't collide with column names
    * (reference: SET/SHOW variable nodes, opteryx/operators/set_variable_node.py). */
  private def rewriteVariables(sql: String): String =
    mapOutsideLiterals(sql) {
      _.replaceAll("""@(\w+)""", "system.session.$1")
    }

  // -- virtual datasets + table functions -------------------------------------

  /** `$planets` etc. → registered view names (Spark unquoted identifiers
    * exclude `$`; reference registry at opteryx/virtual_datasets/__init__.py:13-24). */
  private def rewriteVirtualTables(sql: String): String =
    mapOutsideLiterals(sql) {
      _.replaceAll("""\$([A-Za-z_]\w*)""", graft.sources.VirtualDatasets.prefix + "$1")
    }

  private val fakeFn = """(?i)\bFAKE\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Table functions (reference: opteryx/operators/function_dataset_node.py:583-651):
    * FAKE(rows, cols) → range + rand() projection; GENERATE_SERIES / UNNEST →
    * Spark's native sequence()/explode() table-valued functions. */
  private def rewriteTableFunctions(sql: String): String = {
    var s = mapOutsideLiterals(sql) { text =>
      fakeFn.replaceAllIn(text, m => {
        val cols = (0 until m.group(2).toInt)
          .map(i => s"rand() AS column_$i").mkString(", ")
        Matcher.quoteReplacement(s"(SELECT $cols FROM range(0, ${m.group(1)}))")
      })
    }
    s = mapOutsideLiterals(s) { text =>
      text
        .replaceAll("""(?i)\bGENERATE_SERIES\s*\(""", "explode(sequence(")
        .replaceAll("""(?i)\bUNNEST\s*\(""", "explode(")
    }
    // close the extra paren opened by the sequence( splice
    if (s != sql && s.contains("explode(sequence(")) {
      s = s.replaceAll("""(?i)explode\(sequence\(([^)]*)\)""", "explode(sequence($1))")
    }
    s
  }

  // -- DISTINCT ON -----------------------------------------------------------

  private val distinctOn =
    """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(([^)]+)\)\s+(.*?)\s+FROM\s+(.*?)(\s+ORDER\s+BY\s+(.+?))?(\s+LIMIT\s+\d+(?:\s+OFFSET\s+\d+)?)?\s*;?\s*$""".r

  /** `SELECT DISTINCT ON (k) cols FROM t ORDER BY o [LIMIT n]` →
    * first row per k under o, deterministic (reference picks the first seen
    * row; with ORDER BY the choice is well-defined). An outer ORDER BY/LIMIT
    * stays outside the ranking window. */
  private def rewriteDistinctOn(sql: String): String = sql match {
    case distinctOn(keys, sel, from, _, order, limit) =>
      val ord = Option(order).map(_.trim).filter(_.nonEmpty).getOrElse(keys.trim)
      val tail = Option(order).map(o => s" ORDER BY ${o.trim}").getOrElse("") +
        Option(limit).map(_.trim).map(" " + _).getOrElse("")
      s"""SELECT ${sel.trim} FROM (
         |  SELECT *, row_number() OVER (PARTITION BY ${keys.trim} ORDER BY $ord) AS __g_rn
         |  FROM $from
         |) WHERE __g_rn = 1$tail""".stripMargin
    case other => other
  }
}
