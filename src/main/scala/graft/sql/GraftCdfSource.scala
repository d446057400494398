package graft.sql

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability,
  TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.AtomicWarehouse

/** The CHANGE FEED as a Structured Streaming source — Delta's
  * `readChangeFeed` shape:
  *
  * {{{
  * spark.readStream.format("graft-cdf")
  *   .option("root", "/data/wh").option("table", "facts/orders")
  *   .option("startingVersion", "0")     // default: current head
  *   .load()
  * }}}
  *
  * Row-level CDC where the append-only table stream refuses: each
  * micro-batch replays its commit window under [[AtomicWarehouse
  * .changesBetween]]'s exact semantics — appended data files stream as
  * `insert` rows, recorded DML slices stream as their
  * pre/post-image/delete rows, row-preserving maintenance (`cdfnoop`) is
  * invisible, and truncates / un-recorded rewrites / purged retention
  * windows REFUSE loudly. Output schema = the table's columns +
  * `_change_type` + `_commit_version`. A separate `format` (not a catalog
  * table read) because the schema differs from the table's — the same
  * reason Delta routes CDF reads through an option on its format.
  *
  * Tables with a column-mapping rename history refuse (their change
  * slices carry era-logical names the fixed-schema file reader cannot
  * retarget; the batch `changesBetween` handles those).
  */
class GraftCdfSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def resolve(options: CaseInsensitiveStringMap): (AtomicWarehouse, String) = {
    val root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      "graft-cdf needs .option(\"root\", <warehouse dir>)"))
    val table = Option(options.get("table")).getOrElse(throw new IllegalArgumentException(
      "graft-cdf needs .option(\"table\", <table name>)"))
    (new AtomicWarehouse(SparkSession.active, root), table)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (wh, table) = resolve(options)
    val base = wh.catalogSchema(table).orElse(wh.inferSchema(table))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-cdf: table $table has no schema (never written?)"))
    StructType(wh.cdfSchemaOf(base).fields.toSeq :+
      StructField("_commit_version", IntegerType, nullable = false))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (wh, table) = resolve(opts)
    new GraftCdfTable(wh, table, schema)
  }
}

class GraftCdfTable(wh: AtomicWarehouse, table: String, outSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"graft-cdf:$table"

  override def schema(): StructType = outSchema

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.MICRO_BATCH_READ)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(wh.columnMap(table).isEmpty &&
      wh.columnMap(wh.changesTableOf(table)).isEmpty,
      s"graft-cdf cannot stream $table: it has a column-mapping rename " +
        "history (era slices carry era names) — use the batch changesBetween")
    val startingVersion = Option(options.get("startingversion")).map(_.trim.toInt)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft cdf stream of $table"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftCdfMicroBatchStream(wh, table, outSchema, startingVersion)
      }
    }
  }
}

class GraftCdfMicroBatchStream(wh: AtomicWarehouse, table: String,
    outSchema: StructType, startingVersion: Option[Int]) extends MicroBatchStream {

  override def initialOffset(): Offset =
    GraftStreamOffset(startingVersion.getOrElse(wh.headVersion()))

  override def latestOffset(): Offset = GraftStreamOffset(wh.headVersion())

  override def deserializeOffset(json: String): Offset = {
    val v = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad graft-cdf offset: $json"))
      .group(1).toInt
    GraftStreamOffset(v)
  }

  /** Partitions are sized from the MANIFEST (stats lines carry bytes) with
    * one directory listing as the legacy fallback — never a per-file serial
    * stat loop on the driver (the table-source planning contract).
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (from, to) = (start.asInstanceOf[GraftStreamOffset].version,
      end.asInstanceOf[GraftStreamOffset].version)
    wh.cdfWindowGuards(table, from, to)
    val windows = wh.cdfWindowFiles(table, from, to)
    val chT = wh.changesTableOf(table)
    def sizesFor(slice: Boolean): Map[String, Long] = wh.streamFileSizes(
      if (slice) chT else table,
      windows.filter(_._3 == slice).flatMap(_._2).distinct, to)
    val dataSizes = sizesFor(slice = false)
    val sliceSizes = sizesFor(slice = true)
    windows.flatMap { case (v, files, isSlice) =>
      val dir = if (isSlice) wh.path(chT) else wh.path(table)
      val sizes = if (isSlice) sliceSizes else dataSizes
      files.map(f => GraftCdfFilePartition(s"$dir/$f", sizes(f), 0L, v, isSlice))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // out schema = table columns + _change_type + _commit_version: data
    // files hold the first n, slice files the first n+1
    val dataSchema = StructType(outSchema.fields.dropRight(2))
    val sliceSchema = StructType(outSchema.fields.dropRight(1))
    GraftCdfReaderFactory(
      shims.parquetRowReader(wh.spark, dataSchema),
      shims.parquetRowReader(wh.spark, sliceSchema))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class GraftCdfFilePartition(path: String, fileSize: Long,
    modificationTime: Long, version: Int, isSlice: Boolean) extends InputPartition

case class GraftCdfReaderFactory(
    readData: PartitionedFile => Iterator[InternalRow],
    readSlice: PartitionedFile => Iterator[InternalRow]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdfFilePartition]
    val pf = shims.partitionedFile(p.path, p.fileSize, p.modificationTime)
    // appended data files label every row `insert`; slices carry their own
    // _change_type — both gain the commit version
    val suffix: InternalRow =
      if (p.isSlice) InternalRow(p.version)
      else InternalRow(UTF8String.fromString("insert"), p.version)
    val it = if (p.isSlice) readSlice(pf) else readData(pf)
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = joined(it.next(), suffix); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
