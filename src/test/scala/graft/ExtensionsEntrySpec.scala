package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exercises the `spark.sql.extensions=graft.plans.GraftExtensions` entry
  * point — the cluster-deployment path (`spark-submit --conf ...`), distinct
  * from the programmatic `extraOptimizations` path PredicateCompactionSpec
  * covers. `spark.sql.extensions` is a STATIC conf read from the
  * SparkContext's SparkConf when the session is built, so it cannot take
  * effect on this JVM's shared context; the spec therefore launches
  * tools/ExtensionsCheck in a child JVM with a fresh context — the same
  * reflection-instantiation route spark-submit uses — and asserts its plan
  * checks pass.
  */
class ExtensionsEntrySpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("spark.sql.extensions=graft.plans.GraftExtensions wires the rule on a fresh session") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.ExtensionsCheck", SharedSpark.sf)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val code = proc.waitFor()
    assert(code == 0 && out.contains("EXTCHECK OK"),
      s"child-JVM extensions check failed (exit $code):\n${out.takeRight(3000)}")
  }
}
