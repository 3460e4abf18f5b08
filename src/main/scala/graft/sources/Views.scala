package graft.sources

import org.apache.spark.sql.SparkSession

/** JSON-defined views and prepared statements (reference:
  * opteryx/planner/views/__init__.py:12-41 — views resolved from a JSON
  * definition file; EXECUTE prepared statements from a JSON registry,
  * opteryx/planner/logical_planner/logical_planner.py:757-827).
  *
  * File shape (same as the reference's): `{ "name": "SELECT ...", ... }`.
  * Definitions are stored raw and planned per use, so a view over a
  * temp table picks up the table's current contents.
  */
class Views(spark: SparkSession) {

  private val defs = scala.collection.mutable.Map.empty[String, String]

  def define(name: String, sql: String): Unit = defs(name) = sql

  def loadJson(path: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val it = root.fields()
    while (it.hasNext) { val e = it.next(); defs(e.getKey) = e.getValue.asText() }
  }

  def names: Seq[String] = defs.keys.toSeq.sorted

  def isDefined(name: String): Boolean = defs.contains(name)

  def sqlFor(name: String): String = defs(name)

  /** Register every known view as a temp view (planned now). */
  def materializeAll(rewrite: String => String): Unit =
    defs.foreach { case (n, sql) =>
      spark.sql(rewrite(sql)).createOrReplaceTempView(n)
    }
}
