package graft.sources.v2

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.core.VariantSchema

/** VCF as a DataSourceV2 `TableProvider` (SURVEY.md §4.2(3) "v2:
  * DataSourceV2 with pushdown of chrom/pos"):
  *
  *   spark.read.format("vcf").load(dirOrGlobOfVcfOrVcfGz)
  *
  * - one input partition per file (gzip VCF is not splittable; many-file
  *   cohorts parallelize at file granularity, the same unit the
  *   reference's chunked parser used);
  * - chrom equality/IN and pos range filters are PUSHED to the source:
  *   non-matching variants are skipped during the streaming parse,
  *   before any row materializes (for .gz there is nothing better —
  *   region slicing over seekable storage belongs to the parquet store,
  *   written once via Vcf.toParquet);
  * - emits `VariantSchema` rows with the reference sentinels (GT -1,
  *   DP -1, GQ NaN, absent AO/RO → null).
  */
class VcfDataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "vcf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = VariantSchema.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // load(p1, p2) stores a JSON array under "paths", not "path" —
    // fail HERE with the real reason instead of a null-Path error at
    // job planning (single-path glob patterns cover the common case)
    val path = properties.get("path")
    if (path == null && properties.get("paths") != null)
      throw new UnsupportedOperationException(
        "format(\"vcf\") supports ONE path per load() — pass a glob " +
          "(load(\"dir/*.vcf\")) or union multiple single-path loads")
    require(path != null, "format(\"vcf\") needs a path: load(<path>)")
    new VcfTable(path)
  }
  override def supportsExternalMetadata(): Boolean = false
}

class VcfTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"vcf:$path"
  override def schema(): StructType = VariantSchema.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VcfScanBuilder(Option(options.get("path")).getOrElse(path))
}

class VcfScanBuilder(path: String) extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("chrom", _: String) => true
      case In("chrom", vs) => vs.forall(_.isInstanceOf[String])
      case GreaterThan("pos", _: Long) | GreaterThanOrEqual("pos", _: Long) => true
      case LessThan("pos", _: Long) | LessThanOrEqual("pos", _: Long) => true
      case _ => false
    }
    pushed = supported
    // DSv2 contract: filters NOT returned here are treated as fully
    // handled by the source and REMOVED from the plan — correctness would
    // then rest entirely on keep() exactly enforcing each accepted
    // predicate. Returning `filters` unchanged keeps Spark re-applying
    // everything, so the source-side skip stays purely an optimization
    // and a future keep()/pushFilters mismatch cannot drop rows.
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new VcfScan(path, pushed)
}

class VcfScan(path: String, filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = VariantSchema.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"VcfScan($path, pushed=[${filters.mkString(",")}])"

  // Session Hadoop conf, not `new Configuration()`: Spark-configured
  // filesystem settings (fs.s3a credentials, fs.defaultFS, …) must reach
  // both driver-side planning and the executor-side readers.
  private def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] =
    VcfListing.visibleFiles(path, sessionConf(), missingOk = false)
      .map(p => VcfInputPartition(p.toString): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new VcfReaderFactory(filters, org.apache.spark.sql.graft.bridge.serializableConf(sessionConf()))

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new VcfMicroBatchStream(path, filters, sessionConf())
}

/** Micro-batch streaming over a growing directory of VCF files: the
  * offset is a count into the name-sorted file listing, so each new file
  * is exactly one unit of progress and every micro-batch reuses
  * VcfPartitionReader unchanged (one partition per file, same pushdown).
  *
  * Producer contract (documented, like part-file conventions): files are
  * immutable once visible and new files sort lexicographically AFTER
  * already-delivered ones — a late file that sorts earlier would shift
  * the slice (the cost of a metadata-log-free offset; Spark's own file
  * source carries a checkpoint log to lift this).
  */
/** ONE file-listing rule for the batch scan and the micro-batch
  * stream (they drifted: the stream re-derived file names by string
  * splitting and silently returned empty for a missing path): visible
  * = regular files whose NAME does not start with '.' or '_'
  * (part-file marker convention). `missingOk` is the one legitimate
  * difference — a stream polls a directory that may not exist yet; a
  * batch read of a missing path is an error. */
private[sources] object VcfListing {
  def visibleFiles(path: String, conf: Configuration,
                   missingOk: Boolean): Array[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val statuses: Array[FileStatus] =
      if (fs.isDirectory(p)) fs.listStatus(p).filter(_.isFile)
      else fs.globStatus(p) match {
        case null if missingOk => Array.empty
        case null => Array(fs.getFileStatus(p))
        case g => g.filter(_.isFile)
      }
    statuses.map(_.getPath)
      .filterNot(q => q.getName.startsWith(".") || q.getName.startsWith("_"))
  }
}

class VcfMicroBatchStream(path: String, filters: Array[Filter], conf: Configuration)
    extends streaming.MicroBatchStream {

  private def listFiles(): Array[String] =
    VcfListing.visibleFiles(path, conf, missingOk = true).map(_.toString).sorted

  override def initialOffset(): streaming.Offset = VcfStreamOffset(0)
  override def latestOffset(): streaming.Offset = VcfStreamOffset(listFiles().length)
  override def deserializeOffset(json: String): streaming.Offset =
    VcfStreamOffset(json.trim.toInt)

  override def planInputPartitions(start: streaming.Offset, end: streaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VcfStreamOffset].seen
    val e = end.asInstanceOf[VcfStreamOffset].seen
    listFiles().slice(s, e).map(f => VcfInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VcfReaderFactory(filters, org.apache.spark.sql.graft.bridge.serializableConf(conf))

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class VcfStreamOffset(seen: Int) extends streaming.Offset {
  override def json(): String = seen.toString
}

case class VcfInputPartition(file: String) extends InputPartition

class VcfReaderFactory(
    filters: Array[Filter],
    conf: org.apache.spark.sql.graft.SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VcfPartitionReader(partition.asInstanceOf[VcfInputPartition].file, filters, conf.value)
}

/** Streaming line parser for one VCF file. */
class VcfPartitionReader(file: String, filters: Array[Filter], conf: Configuration)
    extends PartitionReader[InternalRow] {

  // PERMISSIVE applies to the FILE too, not just its lines: a
  // zero-byte or truncated .gz (a partially-uploaded drop) must read
  // as empty, not crash the task forever (GZIPInputStream's
  // constructor throws EOFException on an empty stream) — and the raw
  // handle must not leak when the codec constructor fails
  private val lines: java.io.BufferedReader = {
    val p = new Path(file)
    val raw = p.getFileSystem(conf).open(p)
    val stream =
      if (file.endsWith(".gz")) {
        try new java.util.zip.GZIPInputStream(raw, 1 << 16)
        catch {
          case scala.util.control.NonFatal(_) =>
            raw.close()
            new java.io.ByteArrayInputStream(Array.emptyByteArray)
        }
      } else raw
    new java.io.BufferedReader(
      new java.io.InputStreamReader(stream, "UTF-8"), 1 << 16)
  }

  private var current: InternalRow = _

  private def keep(chrom: String, pos: Long): Boolean = filters.forall {
    case EqualTo("chrom", v: String) => chrom == v
    case In("chrom", vs) => vs.contains(chrom)
    case GreaterThan("pos", v: Long) => pos > v
    case GreaterThanOrEqual("pos", v: Long) => pos >= v
    case LessThan("pos", v: Long) => pos < v
    case LessThanOrEqual("pos", v: Long) => pos <= v
    case _ => true
  }

  override def next(): Boolean = {
    var line = lines.readLine()
    while (line != null) {
      if (line.nonEmpty && line.charAt(0) != '#') {
        // malformed lines are dropped (PERMISSIVE), not fatal
        val row =
          try parse(line)
          catch { case _: NumberFormatException => null }
        if (row != null) { current = row; return true }
      }
      line = lines.readLine()
    }
    false
  }

  /** @return null when the pushed filters reject the variant. */
  private def parse(line: String): InternalRow = {
    val f = line.split("\t", -1)
    if (f.length < 10) return null
    val chrom = f(0)
    val pos = f(1).toLong
    if (!keep(chrom, pos)) return null

    val fmt = f(8).split(":", -1)
    def idx(key: String): Int = fmt.indexOf(key)
    val (gi, di, qi, ai, ri) = (idx("GT"), idx("DP"), idx("GQ"), idx("AO"), idx("RO"))

    val n = f.length - 9
    val gt = new Array[Any](n)
    val dp = new Array[Any](n)
    val gq = new Array[Any](n)
    val ao = if (ai >= 0) new Array[Any](n) else null
    val ro = if (ri >= 0) new Array[Any](n) else null

    var s = 0
    while (s < n) {
      val parts = f(9 + s).split(":", -1)
      def part(i: Int): String = if (i >= 0 && i < parts.length) parts(i) else null

      val g = part(gi)
      // same GT token semantics as Vcf.scala: "." = one missing allele
      // ([-1]); only an absent GT field gets the diploid default [-1,-1]
      gt(s) =
        if (g == null) new GenericArrayData(Array[Any](-1, -1))
        else {
          val alleles = g.split("[/|]", -1)
          new GenericArrayData(alleles.map(a =>
            (if (a == "." || a.isEmpty) -1 else a.toInt): Any))
        }
      val d = part(di)
      dp(s) = if (d == null || d == ".") -1 else d.toInt
      val q = part(qi)
      gq(s) = if (q == null || q == ".") Double.NaN else q.toDouble
      if (ao != null) {
        val a = part(ai)
        ao(s) = if (a == null || a == ".") null
          else new GenericArrayData(a.split(",", -1).map(_.toInt: Any))
      }
      if (ro != null) {
        val r = part(ri)
        ro(s) = if (r == null || r == ".") -1 else r.toInt
      }
      s += 1
    }

    val alt: Any =
      if (f(4) == ".") new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(f(4).split(",", -1).map(UTF8String.fromString(_): Any))

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(chrom),
      pos,
      if (f(2) == ".") null else UTF8String.fromString(f(2)),
      UTF8String.fromString(f(3)),
      alt,
      if (f(5) == ".") null else f(5).toDouble,
      new GenericArrayData(gt),
      new GenericArrayData(dp),
      new GenericArrayData(gq),
      if (ao == null) null else new GenericArrayData(ao),
      if (ro == null) null else new GenericArrayData(ro)))
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
