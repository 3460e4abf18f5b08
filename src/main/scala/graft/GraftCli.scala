package graft

/** CLI entry — the Spark-native equivalent of `python -m opteryx "SELECT…"`
  * (reference: opteryx/__main__.py, opteryx/command.py): run one statement in
  * the graft dialect against files/registered tables, emit table, csv, jsonl,
  * or parquet.
  *
  * Usage:
  *   runMain graft.GraftCli [--dir <testdataDir>] [--format table|csv|jsonl|parquet]
  *                          [--output <path>] [--limit N] <sql>
  */
object GraftCli {
  def main(args: Array[String]): Unit = {
    var dir: Option[String] = None
    var format = "table"
    var output: Option[String] = None
    var limit = 100
    val sqlParts = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--dir" => dir = Some(args(i + 1)); i += 2
        case "--format" => format = args(i + 1); i += 2
        case "--output" => output = Some(args(i + 1)); i += 2
        case "--limit" => limit = args(i + 1).toInt; i += 2
        case other => sqlParts += other; i += 1
      }
    }
    val sql = sqlParts.mkString(" ")
    require(sql.nonEmpty, "usage: GraftCli [--dir d] [--format f] [--output p] [--limit n] <sql>")
    val g = Graft.embedded()
    try {
      dir.foreach(g.registerDir)
      val df = g.query(sql)
      (format, output) match {
        case ("parquet", Some(p)) => df.write.mode("overwrite").parquet(p)
        case ("csv", Some(p)) =>
          df.coalesce(1).write.mode("overwrite").option("header", "true").csv(p)
        case ("jsonl", Some(p)) => df.coalesce(1).write.mode("overwrite").json(p)
        case ("csv", None) =>
          println(df.columns.mkString(","))
          df.limit(limit).collect().foreach(r => println(r.toSeq.map(String.valueOf).mkString(",")))
        case ("jsonl", None) => df.limit(limit).toJSON.collect().foreach(println)
        case _ => df.show(limit, truncate = false)
      }
    } finally g.spark.stop()
  }
}
