package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** Seeded differential fuzz for the dialect's JSON accessor surface
  * (`->`, `->>`, `@?` over JSON text — GraftSql.rewriteJsonOps feeding
  * DialectExpressions.GraftExtract/GraftExists): random documents are
  * generated with jackson, the expected extraction computed on the
  * jackson tree with GetJsonObject's conventions (scalars unquote,
  * containers serialize compact, JSON null reads as SQL NULL), and the
  * engine must agree on every case — including keys that are absent,
  * nested one level, or whose values contain rewrite hazard words.
  */
class JsonAccessFuzzSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = Graft(spark)
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private val keys = Seq("a", "b", "c", "d", "e")
  // hazard words that must not wake any rewrite while inside JSON strings
  private val words = Seq("plain", "x XOR y", "a -> 1", "-- dash", "@@v",
    "FROM t", "INTERVAL 1 DAY", "b r raw", "CASE WHEN")

  private def genValue(rnd: scala.util.Random, depth: Int): JsonNode =
    rnd.nextInt(if (depth > 0) 7 else 5) match {
      case 0 => om.getNodeFactory.numberNode(rnd.nextInt(1000) - 500)
      case 1 => om.getNodeFactory.textNode(words(rnd.nextInt(words.length)))
      case 2 => om.getNodeFactory.booleanNode(rnd.nextBoolean())
      case 3 => om.getNodeFactory.nullNode()
      case 4 => om.getNodeFactory.numberNode(rnd.nextInt(100) / 4.0)
      case 5 => genObject(rnd, depth - 1)
      case _ =>
        val arr = om.createArrayNode()
        (0 until rnd.nextInt(4)).foreach(_ => arr.add(rnd.nextInt(100)))
        arr
    }

  private def genObject(rnd: scala.util.Random, depth: Int): ObjectNode = {
    val o = om.createObjectNode()
    keys.take(1 + rnd.nextInt(keys.length)).foreach { k =>
      if (rnd.nextInt(5) > 0) o.set[JsonNode](k, genValue(rnd, depth))
    }
    o
  }

  /** GetJsonObject's answer for `$.key` on this document. */
  private def expected(doc: ObjectNode, key: String): Option[String] = {
    val v = doc.get(key)
    if (v == null || v.isNull) None
    else if (v.isTextual) Some(v.asText)
    else Some(om.writeValueAsString(v))
  }

  test("200 random documents: -> / ->> / @? agree with the jackson ground truth") {
    val rnd = new scala.util.Random(1123581321L)
    (1 to 800).foreach { i =>
      val doc = genObject(rnd, 1)
      val json = om.writeValueAsString(doc)
      val key = keys(rnd.nextInt(keys.length))
      val sql = s"SELECT '$json' ->> '$key' AS v, '$json' @? '$key' AS p"
      val row =
        try g.query(sql).head()
        catch { case e: Throwable =>
          fail(s"[case $i] failed: $sql\n${e.getMessage.take(300)}")
        }
      val exp = expected(doc, key)
      val got = Option(row.getString(0))
      assert(got == exp, s"[case $i] $sql\n  expected $exp got $got")
      assert(row.getBoolean(1) == exp.isDefined,
        s"[case $i] presence mismatch for $sql")
    }
  }

  test("nested chains and array roots extract like the jackson tree") {
    val rnd = new scala.util.Random(271828L)
    (1 to 240).foreach { i =>
      val inner = genObject(rnd, 0)
      val doc = om.createObjectNode()
      doc.set[JsonNode]("a", inner)
      val json = om.writeValueAsString(doc)
      val key = keys(rnd.nextInt(keys.length))
      val row = g.query(s"SELECT '$json' -> 'a' ->> '$key' AS v").head()
      assert(Option(row.getString(0)) == expected(inner, key),
        s"[chain $i] '$json' -> 'a' ->> '$key'")
    }
    // integer subscripts on a JSON array root are 0-based elements
    val arr = g.query("SELECT '[10,20,30]' -> 1 AS v, '[10,20,30]' @? 5 AS p").head()
    assert(arr.getString(0) == "20")
    assert(!arr.getBoolean(1))
  }
}
