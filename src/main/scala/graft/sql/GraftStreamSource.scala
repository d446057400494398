package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.StructType

import graft.sources.AtomicWarehouse

/** The warehouse as a STRUCTURED STREAMING source — Delta's streaming-table
  * shape over the graft manifest:
  *
  * {{{
  * spark.readStream
  *   .option("startingVersion", "0")   // default: current head (new data only)
  *   .table("graft.facts.orders")
  * }}}
  *
  * Offsets ARE commit versions: each micro-batch reads exactly the files
  * the manifest gained in (startOffset, endOffset] — deterministic from
  * the log, so checkpoint replay re-plans the identical batch
  * (exactly-once with any idempotent/transactional sink). The source is
  * APPEND-ONLY with loud refusals (the [[AtomicWarehouse
  * .appendedFilesBetween]] contract): a truncate, copy-on-write rewrite,
  * or DV delete inside a window throws rather than silently replaying or
  * dropping rows — stream the change feed (`graft_changes`) for row-level
  * change semantics. Scan tasks run Spark's own parquet row reader per
  * file (schema-evolution windows null-fill; renames read through the
  * stable physical names), one partition per file so a 1000-executor
  * cluster fans a large backlog batch out file-parallel.
  */
class GraftScanBuilder(wh: AtomicWarehouse, table: String,
    logicalSchema: StructType,
    options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
    extends ScanBuilder {
  override def build(): Scan = new GraftScan(wh, table, logicalSchema,
    Option(options.get("startingversion")).map(_.trim.toInt))
}

class GraftScan(wh: AtomicWarehouse, table: String, logicalSchema: StructType,
    startingVersion: Option[Int]) extends Scan {

  override def readSchema(): StructType = logicalSchema

  override def description(): String = s"graft streaming scan of $table"

  /** Batch SELECTs never reach this: [[GraftRelationResolution]] replaces
    * the relation with the engine-built parquet plan during analysis. A
    * code path that still lands here is a bug worth a loud error, not a
    * slow fallback.
    */
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    throw new UnsupportedOperationException(
      s"batch reads of $table resolve through the analyzer rule; " +
        "this V2 scan only serves readStream")

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(wh, table, startingVersion)
}

/** JSON-round-trippable offset: the commit version. */
case class GraftStreamOffset(version: Int) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

class GraftMicroBatchStream(wh: AtomicWarehouse, table: String,
    startingVersion: Option[Int]) extends MicroBatchStream {

  override def initialOffset(): Offset =
    // default: the head at stream start — new appends only (replay the
    // whole history with startingVersion=0; retention bounds it exactly
    // as it bounds appendsBetween)
    GraftStreamOffset(startingVersion.getOrElse(wh.headVersion()))

  override def latestOffset(): Offset = GraftStreamOffset(wh.headVersion())

  override def deserializeOffset(json: String): Offset = {
    val v = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad graft offset: $json"))
      .group(1).toInt
    GraftStreamOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (from, to) = (start.asInstanceOf[GraftStreamOffset].version,
      end.asInstanceOf[GraftStreamOffset].version)
    wh.appendedFilesBetween(table, from, to).map { f =>
      val p = new Path(s"${wh.path(table)}/$f")
      val st = p.getFileSystem(wh.spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p)
      GraftFilePartition(st.getPath.toString, st.getLen, st.getModificationTime)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val phys = wh.physicalReadSchema(table).getOrElse(throw new IllegalStateException(
      s"streaming $table needs a manifest-recorded schema — write through " +
        "the manifest first"))
    // physical names are stable across renames and positions match the
    // logical schema, so the physical-named rows ARE the logical rows
    GraftStreamReaderFactory(shims.parquetRowReader(wh.spark, phys))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class GraftFilePartition(path: String, fileSize: Long,
    modificationTime: Long) extends InputPartition

case class GraftStreamReaderFactory(
    readFn: PartitionedFile => Iterator[InternalRow]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new PartitionReader[InternalRow] {
      private val it = readFn(
        shims.partitionedFile(p.path, p.fileSize, p.modificationTime))
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
