package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for folders of wav files — the custom-source tier of the
  * extension ladder (SURVEY §2.1: "a custom FileTable/DataSource V2 for
  * audio"), complementing the UDF decode path ([[FolderSource]]) with
  * scan-level pushdown the UDF path can't express:
  *
  *  - **column pruning**: a query that doesn't touch `data` never decodes
  *    — audio bytes aren't even read; a metadata query (`filepath, fs,
  *    total_frames`) reads only RIFF headers (~100 B/file).
  *  - **frame-range pushdown**: `.option("frameStart", a)/.option("frameStop", b)`
  *    seeks in each file and reads header + requested range only
  *    ([[WavCodec.decodeRange]]) — the reference's read_range
  *    (processors.py:42-47) pushed to the source.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-wav").option("recursive", "true")
  *     .load("/data/audio")                 // schema below
  *     .select("filepath", "fs")            // ← no decode happens
  * }}}
  *
  * One input partition per file (audio clips are the natural work unit;
  * Spark schedules them across executors). The file listing runs on the
  * driver via the Hadoop FS — the same approach as Spark's file sources'
  * InMemoryFileIndex.
  */
final class WavDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wav"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WavDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WavTable(properties.asScala.toMap)
}

object WavDataSource {
  val schema: StructType = StructType(Seq(
    StructField("filepath", StringType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("subdb", StringType, nullable = false),
    StructField("fs", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("total_frames", LongType, nullable = false),
    StructField("data", ArrayType(DoubleType), nullable = true)))

  /** Driver-side sorted recursive listing (reference helpers.py:363-367
    * deterministic order).
    */
  private[sources] def listFiles(path: String, ext: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(s".$ext"))
        // Full qualified URI (scheme + authority): executors re-resolve the
        // string against a fresh Configuration, so a bare path would silently
        // rebind hdfs://… or s3a://… files to the default filesystem.
        out += f.getPath.toString
    }
    out.result().sorted
  }
}

private[sources] final class WavTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-wav:${props.getOrElse("path", "")}"
  override def schema(): StructType = WavDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WavScanBuilder(props ++ options.asScala)
}

private[sources] final class WavScanBuilder(opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WavDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WavScan(
    path = opts.getOrElse("path",
      throw new IllegalArgumentException("graft-wav needs a path")),
    ext = opts.getOrElse("ext", "wav"),
    range = for {
      a <- opts.get("framestart")
      b <- opts.get("framestop")
    } yield (a.toInt, b.toInt),
    required = required)
}

private[sources] final class WavScan(path: String, ext: String,
    range: Option[(Int, Int)], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-wav path=$path cols=${required.fieldNames.mkString(",")} range=$range"

  override def planInputPartitions(): Array[InputPartition] =
    WavDataSource.listFiles(path, ext).map(f => WavFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WavReaderFactory(required.fieldNames, range)
}

private[sources] final case class WavFilePartition(file: String) extends InputPartition

/** One reader per file. Decodes only when `data` is required: metadata
  * columns come from the RIFF header alone (tiny positioned read), and a
  * pushed frame range bounds the decode to header + range bytes.
  */
private[sources] final class WavReaderFactory(cols: Array[String],
    range: Option[(Int, Int)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WavFilePartition].file
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done

      override def get(): InternalRow = {
        done = true
        val needData = cols.contains("data")
        // header-only probe when data isn't needed: an empty frame window
        // still parses fs/channels/total_frames but reads zero sample bytes
        val r =
          if (needData) WavCodec.decodeRangeInfo(file,
            range.map(_._1).getOrElse(0), range.map(_._2).getOrElse(Int.MaxValue))
          else WavCodec.decodeRangeInfo(file, 0, 0)
        // Exposed filepath matches FolderSource (FolderSource.scala:38):
        // local "file:" scheme stripped, remote schemes (hdfs/s3a) kept —
        // so filepath joins across the two sources never silently miss.
        // The qualified URI `file` is still what we open with above.
        val exposed = file.replaceFirst("^file:", "")
        val name = exposed.substring(exposed.lastIndexOf('/') + 1)
        val parent = exposed.substring(0, exposed.lastIndexOf('/'))
        val subdb = parent.substring(parent.lastIndexOf('/') + 1)
        val values: Array[Any] = cols.map {
          case "filepath" => UTF8String.fromString(exposed)
          case "filename" => UTF8String.fromString(name)
          case "subdb" => UTF8String.fromString(subdb)
          case "fs" => r.wav.fs
          case "channels" => r.wav.channels
          case "total_frames" => r.totalFrames
          case "data" => if (needData) new GenericArrayData(r.wav.samples) else null
          case c => throw new IllegalArgumentException(s"unknown column $c")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = ()
    }
  }
}
