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
  * the interchange-file role these formats play). xlsx is decoded with the
  * JDK alone (ZipInputStream + StAX, [[readXlsx]]) — first sheet, header
  * row, typed flat columns, matching the reference's decoder scope.
  * vortex: no reader jar in this environment — unsupported, as documented
  * in SURVEY.md §2.5.
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
      readJsonCompressed(spark, path,
        in => new com.github.luben.zstd.ZstdInputStream(in))
    else if (lower.endsWith(".jsonl.xz") || lower.endsWith(".json.xz"))
      readJsonCompressed(spark, path,
        in => new org.tukaani.xz.XZInputStream(in))
    else if (lower.endsWith(".jsonl.lzma") || lower.endsWith(".json.lzma"))
      readJsonCompressed(spark, path,
        in => new org.tukaani.xz.LZMAInputStream(in))
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl")
      || lower.endsWith(".json.gz") || lower.endsWith(".jsonl.gz"))
      spark.read.json(path)
    else if (lower.endsWith(".avro")) readAvro(spark, path)
    else if (lower.endsWith(".feather") || lower.endsWith(".arrow")
      || lower.endsWith(".ipc")) readArrowIpc(spark, path)
    else if (lower.endsWith(".xlsx")) readXlsx(spark, path)
    else if (!lower.split('/').last.contains('.'))
      // extension-less leaf = a dataset DIRECTORY (reference: dataset names
      // are disk paths — connectors/disk_connector.py reads the partition
      // dir); parquet is the partition format
      spark.read.parquet(path)
    else sys.error(s"unsupported format for $path (see SURVEY.md §2.5)")
  }

  // ---------------------------------------------------------------- xlsx

  /** xlsx workbooks via the JDK only (java.util.zip + StAX) — no POI-style
    * reader jar exists in this environment, but the OOXML subset the
    * reference's decoder handles (file_decoders.py xlsx entry: first sheet,
    * header row, flat strings/numbers/booleans) needs none. Reads shared
    * strings plus the first `xl/worksheets/sheet*.xml`; first row is the
    * header; columns are typed LONG / DOUBLE / BOOLEAN when every non-null
    * cell agrees, STRING otherwise. Like the reference, the file is decoded
    * whole (spreadsheets are interchange files, not data lakes); rows are
    * then parallelized so downstream plan work is distributed. */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

    val fs = FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val bytes = {
      val in = fs.open(new HPath(path))
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    }

    def entryBytes(pred: String => Boolean): Option[(String, Array[Byte])] = {
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        var best: Option[(String, Array[Byte])] = None
        var e = zin.getNextEntry
        while (e != null) {
          if (pred(e.getName) && best.forall(_._1 > e.getName)) {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](64 * 1024)
            var n = zin.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
            best = Some(e.getName -> buf.toByteArray)
          }
          e = zin.getNextEntry
        }
        best
      } finally zin.close()
    }

    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)

    // shared-strings table (optional; <si> items may be split into runs)
    val shared: IndexedSeq[String] = entryBytes(_ == "xl/sharedStrings.xml").map { case (_, b) =>
      val r = factory.createXMLStreamReader(new java.io.ByteArrayInputStream(b), "UTF-8")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new java.lang.StringBuilder
      var inT = false
      var depth = 0
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => cur.setLength(0); depth += 1
                case "t" => inT = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "si" => out += cur.toString
                case "t" => inT = false
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    // worksheet cells → rows of (colIndex -> raw cell)
    sealed trait Cell
    case class NumCell(v: Double) extends Cell
    case class BoolCell(v: Boolean) extends Cell
    case class StrCell(v: String) extends Cell

    val sheet = entryBytes(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .getOrElse(sys.error(s"no worksheet found in $path"))._2
    val rows = {
      val r = factory.createXMLStreamReader(new java.io.ByteArrayInputStream(sheet), "UTF-8")
      val out = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Cell]]
      var row = Map.empty[Int, Cell]
      var cellCol = -1
      var cellType = "n"
      var nextCol = 0
      val text = new java.lang.StringBuilder
      var capture = false
      def colOf(ref: String): Int = {
        var c = 0
        var i = 0
        while (i < ref.length && ref.charAt(i).isLetter) {
          c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
        }
        c - 1
      }
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "row" => row = Map.empty; nextCol = 0
              case "c" =>
                val ref = Option(r.getAttributeValue(null, "r"))
                cellCol = ref.map(colOf).getOrElse(nextCol)
                nextCol = cellCol + 1
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              case "v" | "t" => capture = true; text.setLength(0)
              case _ =>
            }
            case XMLStreamConstants.CHARACTERS if capture => text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "v" | "t" =>
                capture = false
                val raw = text.toString
                val cell: Option[Cell] = cellType match {
                  case "s" => raw.toIntOption.flatMap(shared.lift).map(StrCell.apply)
                  case "b" => Some(BoolCell(raw.trim == "1"))
                  case "str" | "inlineStr" => Some(StrCell(raw))
                  case _ => raw.trim.toDoubleOption.map(NumCell.apply).orElse(Some(StrCell(raw)))
                }
                // inlineStr wraps <is><t>; both END(t) paths land here once
                if (cellCol >= 0) cell.foreach(c => row = row.updated(cellCol, c))
              case "row" => out += row
              case _ =>
            }
            case _ =>
          }
        }
      } finally r.close()
      out.toVector
    }
    if (rows.isEmpty) sys.error(s"empty worksheet in $path")

    val nCols = rows.iterator.flatMap(_.keys).max + 1
    def asString(c: Cell): String = c match {
      case NumCell(v) => if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
      case BoolCell(v) => v.toString
      case StrCell(v) => v
    }
    val header = (0 until nCols).map(i => rows.head.get(i).map(asString).getOrElse(s"col_$i"))
    val body = rows.tail
    def colCells(i: Int) = body.iterator.flatMap(_.get(i))
    val types: IndexedSeq[DataType] = (0 until nCols).map { i =>
      val cells = colCells(i).toVector
      if (cells.isEmpty) StringType
      else if (cells.forall { case NumCell(v) => v == math.rint(v) && math.abs(v) < 1e15; case _ => false })
        LongType
      else if (cells.forall(_.isInstanceOf[NumCell])) DoubleType
      else if (cells.forall(_.isInstanceOf[BoolCell])) BooleanType
      else StringType
    }
    val schema = StructType((0 until nCols).map(i =>
      StructField(header(i), types(i), nullable = true)))
    val data = body.map { m =>
      Row.fromSeq((0 until nCols).map { i =>
        m.get(i).map { c =>
          (types(i), c) match {
            case (LongType, NumCell(v)) => v.toLong
            case (DoubleType, NumCell(v)) => v
            case (BooleanType, BoolCell(v)) => v
            case (_, cell) => asString(cell)
          }
        }.orNull
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, math.min(data.size / 10000, 32))),
      schema)
  }

  // ------------------------------------------------- jsonl+zstd / jsonl+lzma

  /** Compressed JSONL for codecs Hadoop can't decode here: zstd (Hadoop's
    * ZStandardCodec needs the native hadoop lib, absent) and lzma/xz (no
    * Hadoop codec at all; decoded with xz-java — XZInputStream for .xz
    * containers, LZMAInputStream for raw legacy .lzma — reference
    * file_decoders.py jsonl+lzma entry, which Python's lzma module likewise
    * covers for both). Decompress inside each task; each file is one task —
    * acceptable because neither frame format is splittable anyway (the
    * reference decompresses whole blobs too). */
  private def readJsonCompressed(spark: SparkSession, path: String,
      wrap: java.io.InputStream => java.io.InputStream): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) =>
        val in = wrap(stream.open())
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
        val fields = root.getSchema.getFields
        val converters =
          (0 until fields.size).map(i => arrowConverter(fields.get(i).getType))
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (reader.loadNextBatch()) {
          val vectors = (0 until fields.size).map(root.getVector)
          var i = 0
          while (i < root.getRowCount) {
            out += Row.fromSeq(vectors.indices.map(c => converters(c)(vectors(c).getObject(i))))
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
      case ts: ArrowType.Timestamp =>
        if (ts.getTimezone == null) TimestampNTZType else TimestampType
      case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
      case other => sys.error(s"unsupported arrow type $other (flat primitives only)")
    }
    StructType(schema.getFields.asScala.map(f =>
      StructField(f.getName, fieldType(f.getType), f.isNullable)).toSeq)
  }

  /** Per-column value converter from the arrow vector's `getObject` result to
    * the Row external type for [[arrowToSpark]]'s mapping. Sub-32-bit int
    * vectors hand back Byte/Short (the IntegerType encoder rejects them), and
    * tz-aware timestamp vectors hand back epoch Longs in the column's unit. */
  private def arrowConverter(t: org.apache.arrow.vector.types.pojo.ArrowType): Any => Any = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    import org.apache.arrow.vector.types.TimeUnit
    t match {
      case i: ArrowType.Int if i.getBitWidth <= 32 => {
        case null => null
        case n: java.lang.Number => Int.box(n.intValue)
        case other => other
      }
      case _: ArrowType.Int => {
        case null => null
        case n: java.lang.Number => Long.box(n.longValue)
        case other => other
      }
      case ts: ArrowType.Timestamp if ts.getTimezone != null =>
        val unit = ts.getUnit
        locally {
          case null => null
          case l: java.lang.Long =>
            val instant = unit match {
              case TimeUnit.SECOND => java.time.Instant.ofEpochSecond(l)
              case TimeUnit.MILLISECOND => java.time.Instant.ofEpochMilli(l)
              case TimeUnit.MICROSECOND => java.time.Instant.ofEpochSecond(
                Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L)
              case TimeUnit.NANOSECOND => java.time.Instant.ofEpochSecond(
                Math.floorDiv(l, 1000000000L), Math.floorMod(l, 1000000000L))
            }
            java.sql.Timestamp.from(instant)
          case other => other
        }
      case _: ArrowType.Date => {
        case null => null
        case d: java.time.LocalDate => java.sql.Date.valueOf(d)
        // DateMilliVector hands back LocalDateTime
        case d: java.time.LocalDateTime => java.sql.Date.valueOf(d.toLocalDate)
        case other => other
      }
      case _ => arrowValue
    }
  }

  private val arrowValue: Any => Any = {
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
