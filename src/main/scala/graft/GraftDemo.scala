package graft
object GraftDemo {
  def main(args: Array[String]): Unit = {
    val g = Graft.embedded()
    g.registerDir("/root/testdata/sf0.001")
    println("JSON==" + g.query("SELECT event_id, props ->> 'k' AS k FROM events ORDER BY event_id LIMIT 2").collect().mkString("; "))
    println("PATH==" + g.query("SELECT count(*) AS n FROM '/root/testdata/sf0.001/region.parquet'").head())
    val csvDir = java.nio.file.Files.createTempDirectory("graft_demo").toString
    g.query("SELECT * FROM '/root/testdata/sf0.001/nation.parquet'")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$csvDir/nation_csv")
    val csvPart = java.nio.file.Files.list(java.nio.file.Paths.get(s"$csvDir/nation_csv"))
      .toArray.map(_.toString).filter(_.endsWith(".csv")).head
    println("CSVPATH==" + g.query(s"SELECT count(*) AS n, max(n_nationkey) AS mx FROM '$csvPart'").head())
    println("FOR==" + g.query("SELECT count(*) AS n FROM events FOR DATES BETWEEN '2024-01-01' AND '2024-01-02'").head())
    println("DON==" + g.query("SELECT DISTINCT ON (l_returnflag) l_returnflag, l_quantity FROM lineitem ORDER BY l_returnflag, l_quantity DESC").collect().mkString("; "))
    println("FN==" + g.query("SELECT title('hello graft') AS t, humanize(1234567) AS h, cosine_similarity(array(1d,0d), array(0d,1d)) AS c").head())
    g.spark.stop()
  }
}
