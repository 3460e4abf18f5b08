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

  test("jsonl+xz round-trip") {
    val rows = nation.toJSON.collect().mkString("\n")
    val out = s"$tmp/nation.jsonl.xz"
    val os = new java.io.FileOutputStream(out)
    val xs = new org.tukaani.xz.XZOutputStream(os, new org.tukaani.xz.LZMA2Options())
    xs.write(rows.getBytes("UTF-8")); xs.close()
    assert(canon(Formats.read(spark, out)) == expected)
  }

  test("jsonl+lzma (raw legacy container) round-trip") {
    val rows = nation.toJSON.collect().mkString("\n")
    val out = s"$tmp/nation.jsonl.lzma"
    val os = new java.io.FileOutputStream(out)
    // LZMAOutputStream with known size -1 writes the raw .lzma header
    val ls = new org.tukaani.xz.LZMAOutputStream(os, new org.tukaani.xz.LZMA2Options(), -1L)
    ls.write(rows.getBytes("UTF-8")); ls.close()
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

  test("feather: tinyint/smallint and tz-aware timestamp columns decode") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{SmallIntVector, TinyIntVector, TimeStampMicroTZVector, VectorSchemaRoot}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.TimeUnit
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import scala.jdk.CollectionConverters._
    val fields = List(
      new Field("i8", FieldType.nullable(new ArrowType.Int(8, true)), null),
      new Field("i16", FieldType.nullable(new ArrowType.Int(16, true)), null),
      new Field("ts", FieldType.nullable(
        new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")), null))
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    val i8 = root.getVector(0).asInstanceOf[TinyIntVector]
    val i16 = root.getVector(1).asInstanceOf[SmallIntVector]
    val ts = root.getVector(2).asInstanceOf[TimeStampMicroTZVector]
    root.allocateNew()
    i8.setSafe(0, 7); i16.setSafe(0, 300)
    ts.setSafe(0, 1700000000000000L) // 2023-11-14T22:13:20Z in micros
    i8.setNull(1); i16.setNull(1); ts.setNull(1)
    root.setRowCount(2)
    val out = s"$tmp/narrow.feather"
    val ch = new java.io.FileOutputStream(out).getChannel
    val w = new ArrowFileWriter(root, null, ch)
    w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
    root.close(); alloc.close()

    val df = Formats.read(spark, out)
    assert(df.schema("i8").dataType == IntegerType)
    assert(df.schema("i16").dataType == IntegerType)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("i8").collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).getInt(0) == 7 && got(1).getInt(1) == 300)
    assert(got(1).getTimestamp(2).toInstant ==
      java.time.Instant.ofEpochSecond(1700000000L))
  }

  test("xlsx: shared strings, inline strings, typed columns, sparse cells") {
    // hand-built workbook: the OOXML subset readXlsx targets (shared-string
    // header + mixed shared/inline/number/boolean cells, one missing cell)
    val sharedXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
        |<si><t>name</t></si><si><t>qty</t></si><si><t>price</t></si><si><t>ok</t></si>
        |<si><r><t>sp</t></r><r><t>lit</t></r></si>
        |</sst>""".stripMargin
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2"><v>3</v></c><c r="C2"><v>1.5</v></c><c r="D2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>plain</t></is></c><c r="B3"><v>40</v></c><c r="D3" t="b"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val out = s"$tmp/book.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(out))
    for ((name, content) <- Seq(
      "xl/sharedStrings.xml" -> sharedXml, "xl/worksheets/sheet1.xml" -> sheetXml)) {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()

    val df = Formats.read(spark, out)
    assert(df.columns.toSeq == Seq("name", "qty", "price", "ok"))
    assert(df.schema("qty").dataType == LongType)
    assert(df.schema("price").dataType == DoubleType)
    assert(df.schema("ok").dataType == BooleanType)
    val rows = df.orderBy("qty").collect()
    assert(rows(0).getString(0) == "split") // multi-run shared string
    assert(rows(0).getLong(1) == 3L && rows(0).getDouble(2) == 1.5 && rows(0).getBoolean(3))
    assert(rows(1).getString(0) == "plain" && rows(1).isNullAt(2) && !rows(1).getBoolean(3))
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
