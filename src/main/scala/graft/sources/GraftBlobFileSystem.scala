package graft.sources

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.SparkSession

/** An object-store-style Hadoop FileSystem with its own URI scheme
  * (`graftblob://`), backed by the local FS — the proof-of-seam for
  * SURVEY §7's stance that storage is a CONNECTOR detail, not engine
  * semantics: register the scheme and point [[Warehouse]] at a
  * `graftblob:` root, and the entire engine (EP1 pipeline, merge layer,
  * ledger, dedup stream) runs against the new scheme with zero changes in
  * `operators/` (ConnectorSpec proves it). A production deployment swaps in
  * `abfs://`/`s3a://` against the reference's Azure Blob storage
  * (core/storage.py:23-110) exactly the same way: a Hadoop FS
  * implementation + one configuration key, no engine code.
  */
class GraftBlobFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftblob"
  override def getUri: URI = URI.create("graftblob:///")
}

object GraftBlobFileSystem {
  /** Register the scheme on the session's Hadoop configuration. */
  def install(spark: SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftblob.impl", classOf[GraftBlobFileSystem].getName)
}
