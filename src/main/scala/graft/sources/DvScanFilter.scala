package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Executor-side deletion-vector application — the 100 TB regime of the DV
  * read path (Delta's design: each scan task applies ITS file's tombstone
  * bitmap; no join, no shuffle, no driver materialization).
  *
  * The driver broadcasts only the manifest's (file → DV JSON) map —
  * O(manifest) bytes however many rows are dead — plus the Hadoop conf.
  * Each task resolves the DV for the file it is reading: inline JSON
  * parses in place; sidecars stream from `<table>/_dv/` once per
  * (thread, file) through a small thread-local LRU, so per-task memory is
  * ONE file's ordinals (bounded by the per-file density the compaction
  * threshold manages), never the table's total tombstones. Membership is
  * a binary search over the sorted ordinal array.
  */
object DvScanFilter {

  /** thread-local (sidecar path → sorted ordinals), tiny LRU: a scan task
    * reads one file (occasionally a coalesced handful), so 4 entries cover
    * the working set without pinning past files' DVs for the executor's
    * lifetime.
    */
  private val cache =
    new ThreadLocal[scala.collection.mutable.LinkedHashMap[String, Array[Long]]] {
      override def initialValue() =
        scala.collection.mutable.LinkedHashMap.empty[String, Array[Long]]
    }
  private val CacheEntries = 4

  private def loadSidecar(conf: Configuration, p: String): Array[Long] = {
    val hp = new Path(p)
    val in = new java.io.DataInputStream(hp.getFileSystem(conf).open(hp))
    try {
      val n = in.readInt()
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = in.readLong(); i += 1 }
      a // written sorted (writeDvSidecar takes the merged sorted set)
    } finally in.close()
  }

  private def ordinals(conf: Configuration, dvDir: String, file: String,
      json: String): Array[Long] = {
    val c = cache.get()
    c.get(file) match {
      case Some(a) => a
      case None =>
        val a = DvRec.sidecarLeaf(json) match {
          case None => DvRec.fromJson(json).toArray // inline: ≤ dvInlineMax
          case Some(leaf) => loadSidecar(conf, s"$dvDir/$leaf")
        }
        if (c.size >= CacheEntries) c.remove(c.head._1)
        c.put(file, a)
        a
    }
  }

  /** True iff (file, ord) is tombstoned. `dvJson` is the manifest map for
    * the table (rel leaf → DV JSON); files without an entry are all-live.
    */
  def dead(conf: Configuration, dvDir: String, dvJson: Map[String, String],
      file: String, ord: Long): Boolean =
    dvJson.get(file) match {
      case None => false
      case Some(json) =>
        java.util.Arrays.binarySearch(ordinals(conf, dvDir, file, json), ord) >= 0
    }
}
