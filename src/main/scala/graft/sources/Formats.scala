package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** File-format registry — the Spark-native equivalent of the reference's
  * decoder table (reference: opteryx/utils/file_decoders.py:876-894:
  * parquet, orc, avro, arrow/ipc, csv, tsv, psv, jsonl[+zstd/+lzma],
  * vortex, xlsx).
  *
  * parquet/orc/csv/tsv/psv/json[l] ride the built-in DataSource V2 readers,
  * so column pruning, predicate pushdown, and (for parquet/orc) row-group
  * pruning are Catalyst-owned — the reference hand-rolls these per decoder
  * (file_decoders.py:218-360). avro has no bundled Spark datasource in this
  * environment, so it is implemented over avro-mapred's
  * `AvroKeyInputFormat` (still distributed: one task per file split).
  * `.jsonl.zst` is decompressed in-JVM with zstd-jni per file — whole-file
  * tasks, same non-splittable granularity as the reference's zstd decoder.
  * feather (v2) / arrow / ipc ride the bundled arrow-vector ArrowFileReader
  * — one task per file (IPC record batches aren't split further; fine for
  * the interchange-file role these formats play). xlsx/vortex: no reader
  * jar in this environment — unsupported, as documented in SURVEY.md §2.5.
  */
object Formats {

  /** Read `path`, picking the decoder from the file extension (the
    * reference's prefix/extension routing, connectors/__init__.py:95-103). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    def csvWith(sep: String): DataFrame =
      spark.read.option("header", "true").option("inferSchema", "true")
        .option("sep", sep).csv(path)
    if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".orc")) spark.read.orc(path)
    else if (lower.endsWith(".csv") || lower.endsWith(".csv.gz")) csvWith(",")
    else if (lower.endsWith(".tsv") || lower.endsWith(".tsv.gz")) csvWith("\t")
    else if (lower.endsWith(".psv") || lower.endsWith(".psv.gz")) csvWith("|")
    else if (lower.endsWith(".jsonl.zst") || lower.endsWith(".json.zst"))
      readJsonZstd(spark, path)
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl")
      || lower.endsWith(".json.gz") || lower.endsWith(".jsonl.gz"))
      spark.read.json(path)
    else if (lower.endsWith(".avro")) readAvro(spark, path)
    else if (lower.endsWith(".feather") || lower.endsWith(".arrow")
      || lower.endsWith(".ipc")) readArrowIpc(spark, path)
    else sys.error(s"unsupported format for $path (see SURVEY.md §2.5)")
  }

  // ---------------------------------------------------------------- jsonl+zstd

  /** zstd-compressed JSONL. Hadoop's ZStandardCodec needs the native hadoop
    * lib (absent here), so decompress with zstd-jni inside each task; each
    * file is one task — acceptable because zstd frames aren't splittable
    * anyway (the reference decompresses whole blobs too,
    * file_decoders.py jsonl+zstd entry). */
  private def readJsonZstd(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) =>
        val in = new com.github.luben.zstd.ZstdInputStream(stream.open())
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }.toDS()
    spark.read.json(lines)
  }

  // ---------------------------------------------------------------- avro

  /** Avro container files via avro-mapred (no spark-avro datasource in this
    * environment). Supports flat records of primitive / nullable-union
    * fields — the shapes the reference's avro decoder handles. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericRecord
    import org.apache.avro.mapred.FsInput
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.GenericDatumReader
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}

    val conf = spark.sparkContext.hadoopConfiguration
    // schema from the first file (container files are self-describing)
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val first = {
      val p = new HPath(path)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".avro")).head
      else p
    }
    val reader = new DataFileReader[GenericRecord](
      new FsInput(first, conf), new GenericDatumReader[GenericRecord]())
    val avroSchema = try reader.getSchema finally reader.close()
    val structType = avroToSpark(avroSchema)
    val schemaJson = avroSchema.toString

    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.AvroKeyInputFormat
    import org.apache.hadoop.io.NullWritable
    val rows = spark.sparkContext
      .newAPIHadoopFile(path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val fields = schema.getFields
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq((0 until fields.size).map(i => avroValue(rec.get(i))))
        }
      }
    spark.createDataFrame(rows, structType)
  }

  private def avroToSpark(schema: org.apache.avro.Schema): StructType = {
    import org.apache.avro.Schema.Type._
    def fieldType(s: org.apache.avro.Schema): (DataType, Boolean) = s.getType match {
      case BOOLEAN => (BooleanType, false)
      case INT => (IntegerType, false)
      case LONG => (LongType, false)
      case FLOAT => (FloatType, false)
      case DOUBLE => (DoubleType, false)
      case STRING => (StringType, false)
      case BYTES => (BinaryType, false)
      case UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != NULL)
        require(nonNull.size == 1, s"unsupported avro union: $s")
        (fieldType(nonNull.head)._1, true)
      case other => sys.error(s"unsupported avro type $other (flat primitives only)")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = fieldType(f.schema())
      StructField(f.name(), t, nullable)
    }.toSeq)
  }

  private def avroValue(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: scala.collection.mutable.Buffer[A] =
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
  }

  // ---------------------------------------------------------- feather / ipc

  /** Arrow IPC file format — which is exactly feather v2 (reference decoder:
    * opteryx/utils/file_decoders.py:876-894 arrow/feather/ipc entries).
    * Schema comes from the first file's footer on the driver; each file then
    * decodes inside its own task via the bundled arrow-vector reader. Flat
    * primitive columns (int/float/bool/utf8/binary/date/timestamp/decimal) —
    * the shapes the reference's decoder handles for interchange files. */
  def readArrowIpc(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val structType = {
      val p = new HPath(path)
      val first =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => !f.getName.startsWith(".") && !f.getName.startsWith("_")).head
        else p
      val in = fs.open(first)
      val bytes =
        try {
          val len = fs.getFileStatus(first).getLen.toInt
          val b = new Array[Byte](len); in.readFully(0, b); b
        } finally in.close()
      withIpcReader(bytes)(r => arrowToSpark(r.getVectorSchemaRoot.getSchema))
    }
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, stream) =>
      val bytes = stream.toArray()
      withIpcReader(bytes) { reader =>
        val root = reader.getVectorSchemaRoot
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (reader.loadNextBatch()) {
          val vectors = (0 until root.getSchema.getFields.size).map(root.getVector)
          var i = 0
          while (i < root.getRowCount) {
            out += Row.fromSeq(vectors.map(v => arrowValue(v.getObject(i))))
            i += 1
          }
        }
        out.toList
      }
    }
    spark.createDataFrame(rows, structType)
  }

  private def withIpcReader[A](bytes: Array[Byte])(
      f: org.apache.arrow.vector.ipc.ArrowFileReader => A): A = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val chan = new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes)
    val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(chan, alloc)
    try f(reader)
    finally { reader.close(); alloc.close() }
  }

  private def arrowToSpark(schema: org.apache.arrow.vector.types.pojo.Schema): StructType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    def fieldType(t: ArrowType): DataType = t match {
      case i: ArrowType.Int if i.getBitWidth <= 32 => IntegerType
      case _: ArrowType.Int => LongType
      case f: ArrowType.FloatingPoint
          if f.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.FloatingPoint => DoubleType
      case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
      case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Date => DateType
      case _: ArrowType.Timestamp => TimestampNTZType
      case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
      case other => sys.error(s"unsupported arrow type $other (flat primitives only)")
    }
    StructType(schema.getFields.asScala.map(f =>
      StructField(f.getName, fieldType(f.getType), f.isNullable)).toSeq)
  }

  private def arrowValue(v: Any): Any = v match {
    case t: org.apache.arrow.vector.util.Text => t.toString
    case d: java.time.LocalDateTime => d // TimestampNTZ external type
    case d: java.time.LocalDate => java.sql.Date.valueOf(d)
    case other => other
  }

  // ------------------------------------------------------- schema-on-read

  /** Normalize a scanned DataFrame to a bound schema: missing columns become
    * typed nulls, extra columns are dropped, order and types align
    * (reference: normalize_morsel at opteryx/operators/read_node.py:91-129).
    * Pure projection — no shuffle, survives any scale. */
  def normalize(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(target.fields.map { f =>
      present.get(f.name.toLowerCase) match {
        case Some(actual) => col(actual).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }.toSeq: _*)
  }

  /** Merge two observed schemas, widening numerics (the reference refines
    * Decimal/List types across morsels — read_node.py:132-156 merge_schemas). */
  def mergeSchemas(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name.toLowerCase -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name.toLowerCase) match {
        case Some(fb) if fb.dataType != fa.dataType =>
          fa.copy(dataType = widen(fa.dataType, fb.dataType), nullable = true)
        case Some(fb) => fa.copy(nullable = fa.nullable || fb.nullable)
        case None => fa.copy(nullable = true)
      }
    }
    val extra = b.fields.filterNot(f => a.fieldNames.map(_.toLowerCase).contains(f.name.toLowerCase))
      .map(_.copy(nullable = true))
    StructType(merged ++ extra)
  }

  private val numericOrder: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 4, DoubleType -> 5)

  private def widen(x: DataType, y: DataType): DataType = (x, y) match {
    case (a, b) if a == b => a
    case (a: DecimalType, b: DecimalType) =>
      DecimalType(math.max(a.precision, b.precision), math.max(a.scale, b.scale))
    case (a, b) if numericOrder.contains(a) && numericOrder.contains(b) =>
      if (numericOrder(a) >= numericOrder(b)) a else b
    case (ArrayType(a, n1), ArrayType(b, n2)) => ArrayType(widen(a, b), n1 || n2)
    case _ => StringType // incompatible drift → string, like schema-on-read CSV
  }
}
