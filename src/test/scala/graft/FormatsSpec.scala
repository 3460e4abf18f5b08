package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.sources.Formats
import java.nio.file.{Files, Paths}

/** Format registry round-trips (SURVEY.md §2.5): every supported extension
  * must read back the nation fixture with identical rows. */
class FormatsSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  private val tmp = Files.createTempDirectory("graft_formats").toString
  private def nation: DataFrame = Tables.df(spark, SharedSpark.sf, "nation")

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.by((s: Seq[String]) => s.mkString("")))

  private val expected = canon(nation)

  test("csv round-trip") {
    val p = s"$tmp/nation_csv"
    nation.coalesce(1).write.mode("overwrite").option("header", "true").csv(p)
    val f = Files.list(Paths.get(p)).toArray.map(_.toString).filter(_.endsWith(".csv")).head
    assert(canon(Formats.read(spark, f)) == expected)
  }

  test("tsv and psv round-trip") {
    for ((sep, ext) <- Seq(("\t", "tsv"), ("|", "psv"))) {
      val dir = s"$tmp/nation_dir_$ext"
      nation.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("sep", sep).csv(dir)
      val part = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(_.endsWith(".csv")).head
      val renamed = s"$tmp/nation.$ext"
      Files.copy(Paths.get(part), Paths.get(renamed),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      assert(canon(Formats.read(spark, renamed)) == expected, ext)
    }
  }

  test("jsonl round-trip") {
    val p = s"$tmp/nation_jsonl"
    nation.coalesce(1).write.mode("overwrite").json(p)
    assert(canon(Formats.read(spark, s"$p/part-*.json")) == expected)
  }

  test("jsonl+zstd round-trip") {
    val rows = nation.toJSON.collect().mkString("\n")
    val out = s"$tmp/nation.jsonl.zst"
    val os = new java.io.FileOutputStream(out)
    val zs = new com.github.luben.zstd.ZstdOutputStream(os)
    zs.write(rows.getBytes("UTF-8")); zs.close()
    assert(canon(Formats.read(spark, out)) == expected)
  }

  test("orc round-trip") {
    val p = s"$tmp/nation.orc"
    nation.write.mode("overwrite").orc(p)
    assert(canon(Formats.read(spark, p)) == expected)
  }

  test("avro round-trip (avro-mapred reader)") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
    val schema: Schema = SchemaBuilder.record("nation").fields()
      .optionalLong("n_nationkey").optionalString("n_name")
      .optionalLong("n_regionkey").endRecord()
    val out = s"$tmp/nation.avro"
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(out))
    nation.selectExpr("cast(n_nationkey as long) k", "n_name nm",
      "cast(n_regionkey as long) rk").collect().foreach { r =>
      w.append(new GenericRecordBuilder(schema)
        .set("n_nationkey", java.lang.Long.valueOf(r.getLong(0)))
        .set("n_name", r.getString(1))
        .set("n_regionkey", java.lang.Long.valueOf(r.getLong(2)))
        .build())
    }
    w.close()
    val df = Formats.read(spark, out)
    assert(df.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(canon(df) == expected)
  }

  test("feather / arrow-ipc round-trip (arrow-vector reader)") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import scala.jdk.CollectionConverters._
    val fields = List(
      new Field("n_nationkey", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("n_name", FieldType.nullable(new ArrowType.Utf8()), null),
      new Field("n_regionkey", FieldType.nullable(new ArrowType.Int(64, true)), null))
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    val rows = nation.selectExpr("cast(n_nationkey as long)", "n_name",
      "cast(n_regionkey as long)").collect()
    val k = root.getVector(0).asInstanceOf[BigIntVector]
    val nm = root.getVector(1).asInstanceOf[VarCharVector]
    val rk = root.getVector(2).asInstanceOf[BigIntVector]
    root.allocateNew()
    rows.zipWithIndex.foreach { case (r, i) =>
      k.setSafe(i, r.getLong(0))
      nm.setSafe(i, r.getString(1).getBytes("UTF-8"))
      rk.setSafe(i, r.getLong(2))
    }
    root.setRowCount(rows.length)
    val out = s"$tmp/nation.feather"
    val ch = new java.io.FileOutputStream(out).getChannel
    val w = new ArrowFileWriter(root, null, ch)
    w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
    root.close(); alloc.close()

    val df = Formats.read(spark, out)
    assert(df.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(canon(df) == expected)
    // .arrow / .ipc extensions route to the same decoder
    java.nio.file.Files.copy(java.nio.file.Paths.get(out),
      java.nio.file.Paths.get(s"$tmp/nation.ipc"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(canon(Formats.read(spark, s"$tmp/nation.ipc")) == expected)
  }

  test("normalize: missing columns null-filled, extras dropped, types cast") {
    val target = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("extra_col", DoubleType)))
    val df = Formats.normalize(
      nation.withColumn("junk", org.apache.spark.sql.functions.lit(1)), target)
    assert(df.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "extra_col"))
    assert(df.filter("extra_col IS NOT NULL").count() == 0)
    assert(df.count() == nation.count())
  }

  test("mergeSchemas widens numerics and unions fields") {
    val a = StructType(Seq(
      StructField("x", IntegerType), StructField("y", StringType)))
    val b = StructType(Seq(
      StructField("x", DoubleType), StructField("z", LongType)))
    val m = Formats.mergeSchemas(a, b)
    assert(m("x").dataType == DoubleType)
    assert(m.fieldNames.toSet == Set("x", "y", "z"))
    val d = Formats.mergeSchemas(
      StructType(Seq(StructField("d", DecimalType(10, 2)))),
      StructType(Seq(StructField("d", DecimalType(12, 1)))))
    assert(d("d").dataType == DecimalType(12, 2))
  }
}
