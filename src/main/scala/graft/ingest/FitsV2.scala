package graft.ingest

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 FITS source: `spark.read.format("fits").option("hdu", 1)
  * .load(glob)` exposes one BINTABLE extension as a RELATIONAL table —
  * one Spark row per FITS table row, scalar cells typed, repeat>1
  * numeric cells as arrays. Builds on the same pure-Scala parser as
  * [[Fits]] (S2/S3; reference: cosmo/filesystem.py:34–92) but plugs into
  * the planner properly:
  *
  *  - one InputPartition per file — the reference's dask per-file
  *    fan-out (filesystem.py:355–373) as genuine scan parallelism;
  *  - COLUMN PRUNING pushed into the scan (SupportsPushDownRequiredColumns):
  *    only requested columns are byte-decoded, so `select(two cols)`
  *    never pays for the other twenty — the property SURVEY.md §4 calls
  *    out as "a scan that reads all columns for a 2-column projection is
  *    wrong";
  *  - gzip containers handled per file, schema inferred from the first
  *    file (all files of one product type share a layout, as the
  *    reference's per-model requests assume).
  *
  * Options: `hdu` (extension index, default 1), `headers`
  * (comma-separated PRIMARY-header keys to attach as string columns).
  * A `_file` column always carries the source path.
  */
class FitsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fits"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FitsV2.schemaFor(FitsV2.resolvePaths(options), FitsV2.hduIndex(options),
      FitsV2.headerKeys(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    FitsV2Table(schema, new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = true
}

/** Serializable carrier for the driver's Hadoop configuration, so
  * executor-side reads see configured filesystems/credentials (what
  * Spark's own file sources do via their broadcast conf). Hadoop's
  * `Configuration` is a `Writable`, not `Serializable` — ship it through
  * its own wire format. */
class SerializableHadoopConf(@transient private var conf: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

object FitsV2 {
  /** Driver-side session Hadoop conf, serializably wrapped. */
  def sessionConf(): SerializableHadoopConf =
    new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())

  def hduIndex(options: CaseInsensitiveStringMap): Int =
    Option(options.get("hdu")).map(_.toInt).getOrElse(1)

  def headerKeys(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("headers")).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq.empty)

  /** Expand the load path/glob into concrete file paths (driver-side). */
  def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("path")).orElse(Option(options.get("paths")))
      .getOrElse(throw new IllegalArgumentException("fits source needs a path"))
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(raw)
    val fs = FileSystem.get(p.toUri, conf)
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    require(matches.nonEmpty, s"no files match $raw")
    matches.map(_.getPath.toString)
  }

  private[ingest] def readFile(path: String,
      conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 20)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      Fits.gunzipIfNeeded(out.toByteArray)
    } finally in.close()
  }

  /** Read ONLY the primary header of a file: stream 2880-byte blocks
    * (through a streaming gunzip for .gz) until the END card, never
    * touching the data sections. This is what makes header-predicate
    * file pruning cheap — a few KB per file instead of the whole
    * product, the FITS analog of reading a parquet footer. */
  private[ingest] def readPrimaryHeader(path: String,
      conf: org.apache.hadoop.conf.Configuration): Map[String, String] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val raw = fs.open(p)
    try {
      val head = new java.io.BufferedInputStream(raw, 8192)
      head.mark(2)
      val b0 = head.read(); val b1 = head.read()
      head.reset()
      val in: java.io.InputStream =
        if (b0 == 0x1f && b1 == 0x8b) new java.util.zip.GZIPInputStream(head)
        else head
      val out = new java.io.ByteArrayOutputStream(2880 * 4)
      val block = new Array[Byte](2880)
      var done = false
      while (!done) {
        var got = 0
        while (got < 2880) {
          val n = in.read(block, got, 2880 - got)
          if (n < 0) throw new java.io.EOFException(s"truncated FITS header: $path")
          got += n
        }
        out.write(block)
        val text = new String(block, "US-ASCII")
        done = text.grouped(80).exists(c =>
          c.startsWith("END     ") || c.trim == "END")
      }
      // reuse the full card parser on just the header blocks: a header-only
      // byte slice parses as one data-less HDU
      Fits.parseHdus(out.toByteArray).head.header
    } finally raw.close()
  }

  private def sparkType(spec: Fits.ColSpec): DataType = {
    val elem = spec.code match {
      case 'A' => StringType
      case 'D' => DoubleType
      case 'E' => FloatType
      case 'J' | 'I' | 'B' => IntegerType
      case 'K' => LongType
      case 'L' => BooleanType
    }
    if (spec.code == 'A') elem
    else if (spec.desc != ' ') ArrayType(elem, containsNull = false)
    else if (spec.repeat == 1) elem
    else ArrayType(elem, containsNull = false)
  }

  def schemaFor(paths: Seq[String], hdu: Int, headers: Seq[String]): StructType = {
    val bytes = readFile(paths.head, sessionConf().value)
    val hdus = Fits.parseHdus(bytes)
    val cols = Fits.tableCols(hdus(hdu))
    StructType(
      StructField("_file", StringType, nullable = false) +:
        headers.map(k => StructField(k, StringType)) ++:
        cols.map(s => StructField(s.name, sparkType(s))))
  }

  /** Decode one cell (scalar, string, fixed-repeat array, or
    * variable-length heap array — `heapStart` is the absolute heap
    * offset of the cell's HDU, ignored for fixed cells). */
  private[ingest] def cellValue(bytes: Array[Byte], base: Int,
                                spec: Fits.ColSpec, heapStart: Int): Any = {
    import java.nio.ByteBuffer
    def scalar(code: Char, at: Int): Any = code match {
      case 'D' => ByteBuffer.wrap(bytes, at, 8).getDouble
      case 'E' => ByteBuffer.wrap(bytes, at, 4).getFloat
      case 'J' => ByteBuffer.wrap(bytes, at, 4).getInt
      case 'I' => ByteBuffer.wrap(bytes, at, 2).getShort.toInt
      case 'K' => ByteBuffer.wrap(bytes, at, 8).getLong
      case 'B' => bytes(at) & 0xff
      case 'L' => bytes(at) == 'T'.toByte
    }
    def unit(code: Char): Int = code match {
      case 'A' | 'L' | 'B' => 1
      case 'I' => 2
      case 'E' | 'J' => 4
      case 'D' | 'K' => 8
    }
    if (spec.desc != ' ') {
      if (spec.repeat == 0)
        return if (spec.code == 'A') UTF8String.fromString("")
               else new GenericArrayData(Array.empty[Any])
      val (cnt, off) =
        if (spec.desc == 'P')
          (ByteBuffer.wrap(bytes, base, 4).getInt,
            ByteBuffer.wrap(bytes, base + 4, 4).getInt.toLong)
        else
          (ByteBuffer.wrap(bytes, base, 8).getLong.toInt,
            ByteBuffer.wrap(bytes, base + 8, 8).getLong)
      val at0 = heapStart + off.toInt
      if (spec.code == 'A')
        UTF8String.fromString(new String(bytes, at0, cnt, "US-ASCII").trim)
      else {
        val u = unit(spec.code)
        new GenericArrayData(
          (0 until cnt).map(i => scalar(spec.code, at0 + i * u)).toArray)
      }
    }
    else if (spec.code == 'A')
      UTF8String.fromString(new String(bytes, base, spec.repeat, "US-ASCII").trim)
    else if (spec.repeat == 1) scalar(spec.code, base)
    else {
      val unitB = spec.cellBytes / spec.repeat
      new GenericArrayData(
        (0 until spec.repeat).map(i => scalar(spec.code, base + i * unitB)).toArray)
    }
  }
}

case class FitsV2Table(tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String = "fits"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new FitsScanBuilder(tableSchema,
      FitsV2.resolvePaths(options), FitsV2.hduIndex(options),
      FitsV2.headerKeys(options), FitsV2.sessionConf())
}

class FitsScanBuilder(fullSchema: StructType, paths: Seq[String], hdu: Int,
                      headerKeys: Seq[String], conf: SerializableHadoopConf)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = fullSchema
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // FILE-LEVEL pruning: a predicate over `_file` or a primary-header
  // column is constant across every row of a file, so satisfying files
  // can be selected before any table byte is decoded — the custom-source
  // analog of partition pruning. Accepted filters are fully enforced by
  // the prune (a file either passes or contributes no rows), so nothing
  // is returned as residual.
  private def fileLevel(attr: String): Boolean =
    attr == "_file" || headerKeys.contains(attr)

  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => fileLevel(a)
    case In(a, vs) if vs.forall(_.isInstanceOf[String]) => fileLevel(a)
    case StringStartsWith(a, _) => fileLevel(a)
    case StringEndsWith(a, _) => fileLevel(a)
    case StringContains(a, _) => fileLevel(a)
    case IsNotNull(a) => fileLevel(a)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(prunable)
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    FitsScan(required, paths, hdu, conf, accepted)
}

case class FitsScan(readSchemaV: StructType, paths: Seq[String], hdu: Int,
                    conf: SerializableHadoopConf,
                    pushed: Array[org.apache.spark.sql.sources.Filter])
  extends Scan with Batch {
  import org.apache.spark.sql.sources._

  override def readSchema(): StructType = readSchemaV
  override def toBatch: Batch = this
  override def description(): String =
    s"FITS hdu=$hdu columns=[${readSchemaV.fieldNames.mkString(",")}]" +
      (if (pushed.nonEmpty) s" PushedFilters: [${pushed.mkString(", ")}]" else "")

  private def matches(f: Filter, lookup: String => Option[String]): Boolean =
    f match {
      case EqualTo(a, v) => lookup(a).contains(v.toString)
      case In(a, vs) => lookup(a).exists(x => vs.exists(v => v != null && v.toString == x))
      case StringStartsWith(a, p) => lookup(a).exists(_.startsWith(p))
      case StringEndsWith(a, s) => lookup(a).exists(_.endsWith(s))
      case StringContains(a, s) => lookup(a).exists(_.contains(s))
      case IsNotNull(a) => lookup(a).isDefined
      case _ => true
    }

  /** Paths surviving the pushed file-level predicates. `_file` filters
    * cost nothing; header filters read ONLY each candidate's primary
    * header (KBs, driver-side — the same planning-time cost profile as
    * parquet footer reads), and only when such a filter exists. */
  private[graft] lazy val prunedPaths: Seq[String] = {
    val (pathFs, headerFs) = pushed.partition(_.references.forall(_ == "_file"))
    val byPath = paths.filter(p => pathFs.forall(matches(_, {
      case "_file" => Some(p)
      case _ => None
    })))
    if (headerFs.isEmpty) byPath
    else byPath.filter { p =>
      val hdr = FitsV2.readPrimaryHeader(p, conf.value)
      headerFs.forall(matches(_, {
        case "_file" => Some(p)
        case k => hdr.get(k)
      }))
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    prunedPaths.map(p => FitsFilePartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    FitsReaderFactory(readSchemaV, hdu, conf)
}

case class FitsFilePartition(path: String) extends InputPartition

case class FitsReaderFactory(schema: StructType, hdu: Int,
                             conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[FitsFilePartition].path
    new PartitionReader[InternalRow] {
      private val bytes = FitsV2.readFile(path, conf.value)
      private val hdus = Fits.parseHdus(bytes)
      private val ext = hdus(hdu)
      private val primary = hdus.head
      private val specByName = Fits.tableCols(ext).map(s => s.name -> s).toMap
      private val rowLen = ext.header("NAXIS1").toInt
      private val nRows = ext.header("NAXIS2").toInt
      // per required field: decode plan — only PRUNED columns touch bytes
      private val pathValue = UTF8String.fromString(path)
      private val decoders: Array[Int => Any] = schema.fields.map { f =>
        if (f.name == "_file") (_: Int) => pathValue
        else specByName.get(f.name) match {
          case Some(spec) =>
            val hs = Fits.heapStart(ext)
            (r: Int) => FitsV2.cellValue(bytes,
              ext.dataStart + r * rowLen + spec.offset, spec, hs)
          case None => // a primary-header key column
            val v = primary.header.get(f.name)
              .map(UTF8String.fromString).orNull
            (_: Int) => v
        }
      }
      private var row = -1
      override def next(): Boolean = { row += 1; row < nRows }
      override def get(): InternalRow =
        new GenericInternalRow(decoders.map(d => d(row)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
