package graft.operators

import scala.jdk.CollectionConverters._

import graft.sources.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Persisted, incrementally-maintained connected components — the dedup
  * GRAPH kept alive across batches, the missing piece between the
  * incremental pair producers ([[Dedup.incrementalLshVerifiedPairs]], the
  * dedup streams) and the component-level consumers ([[Dedup.survivors]]):
  * without it, every new batch of near-dup edges forces
  * [[Dedup.connectedComponents]] over the FULL accumulated pair set.
  *
  * State:
  *   - `cc/Components` `(id, comp)` — one row per seen node, comp = the
  *     component's min id at the time the row was written, files id-sorted
  *     so a batch's endpoint lookup In-literal-prunes to matched row groups
  *     (the dedup point-probe layout);
  *   - `cc/Merges` `(old, new)` — the LAZY RELABELING journal: when a new
  *     edge bridges two existing components, nothing corpus-sized is
  *     rewritten — one `(loser, winner)` row lands here, and readers apply
  *     the journal's transitive closure (driver-resolved: the journal is
  *     merge-count-sized, tiny by construction). [[fold]] amortizes the
  *     journal back into a clean rewrite, exactly like the fold/vacuum
  *     cycle of the transactional log itself.
  *
  * [[addEdges]] is batch-sized end to end: edges collect to the driver (the
  * [[Dedup.connectedComponents]] local-path contract — near-dup EDGES are
  * tiny relative to the corpus; cap-checked), endpoint component lookup
  * probes the state table by id literals, union-find runs over the
  * COMPONENT-level graph (≤ endpoints + journal entries), and the commit
  * appends only new-node rows plus merge-journal rows. The state table is
  * never rewritten outside [[fold]].
  *
  * Exactness anchor (spec + `dedup_components_incremental` oracle):
  * accumulated state after any batch split ≡ [[Dedup.connectedComponents]]
  * over the union of all edges — min-id labels, bit-identical.
  */
class PersistedComponents(wh: Warehouse, probeIdLimit: Int = 1000,
    maxBatchEdges: Int = 1000000) {

  val stateTable = "cc/Components"
  val mergesTable = "cc/Merges"

  val stateSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("comp", LongType, nullable = false)))
  val mergesSchema: StructType = StructType(Seq(
    StructField("old", LongType, nullable = false),
    StructField("new", LongType, nullable = false)))

  /** Full CC over `pairs` → clean state, empty journal (replaces both). */
  def build(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b"): Unit = {
    val comps = Dedup.connectedComponents(
        pairs.select(col(idA).cast(LongType).as("id_a"), col(idB).cast(LongType).as("id_b")))
      .select(col("id").cast(LongType).as("id"), col("component").cast(LongType).as("comp"))
    wh.atomically { w =>
      w.replace(stateTable, comps.repartitionByRange(col("id")).sortWithinPartitions("id"))
      w.replace(mergesTable, wh.spark.createDataFrame(
        wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], mergesSchema))
    }
  }

  /** The merge journal's transitive closure, driver-resolved with path
    * compression — journal size = number of component merges since the last
    * [[fold]], tiny by construction.
    */
  private def closure(): Map[Long, Long] = {
    if (!wh.exists(mergesTable)) return Map.empty
    val parent = scala.collection.mutable.Map[Long, Long]()
    wh.read(mergesTable, mergesSchema).collect()
      .foreach(r => parent(r.getLong(0)) = r.getLong(1))
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  /** Fold `edges` (`id_a`, `id_b` long) into the state: new nodes append,
    * bridged components journal a merge — nothing corpus-sized moves.
    * Min-id labeling is preserved: a merge's winner is the smaller resolved
    * component label, and a new node adopting an existing component gets
    * its RESOLVED label (so state rows never point at a journal loser the
    * moment they are written).
    */
  def addEdges(edges: DataFrame, idA: String = "id_a", idB: String = "id_b"): Unit = {
    require(wh.exists(stateTable), s"$stateTable absent — build() first")
    val capped = edges.select(col(idA).cast(LongType).as("a"), col(idB).cast(LongType).as("b"))
      .limit(maxBatchEdges + 1).collect().map(r => (r.getLong(0), r.getLong(1)))
    require(capped.length <= maxBatchEdges,
      s"edge batch exceeds $maxBatchEdges — split the batch (edges collect to the driver here)")
    if (capped.isEmpty) return
    val ids = capped.flatMap(e => Seq(e._1, e._2)).distinct
    val cl = closure()
    // endpoint lookup: In-literal point probe on the id-sorted state when the
    // batch is small (row-group pruning); broadcast semi-join above the cap
    // (a 10k-literal predicate is the known parquet-reader stack hazard)
    val state = wh.read(stateTable, stateSchema)
    val probed = if (ids.length <= probeIdLimit)
      state.filter(col("id").isin(ids.map(Long.box): _*))
    else state.join(broadcast(wh.spark.createDataFrame(
      ids.sorted.map(i => org.apache.spark.sql.Row(i)).toSeq.asJava,
      StructType(Seq(StructField("id", LongType, nullable = false))))), Seq("id"))
    val known: Map[Long, Long] = probed.collect().map(r => r.getLong(0) -> {
      val c = r.getLong(1); cl.getOrElse(c, c)
    }).toMap

    // union-find over component labels (existing comp or the node itself)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
    }
    def compOf(id: Long): Long = known.getOrElse(id, id)
    capped.foreach { case (a, b) => union(compOf(a), compOf(b)) }

    // journal rows: every existing component label whose root moved
    val remaps = known.values.toSeq.distinct
      .map(c => c -> find(c)).filter { case (o, n) => o != n }
    // new nodes: resolved label at write time
    val newRows = ids.filterNot(known.contains).sorted.toSeq
      .map(id => org.apache.spark.sql.Row(id, find(compOf(id))))
    import scala.jdk.CollectionConverters._
    wh.atomically { w =>
      if (newRows.nonEmpty)
        w.append(stateTable, wh.spark.createDataFrame(newRows.asJava, stateSchema)
          .sortWithinPartitions("id"))
      if (remaps.nonEmpty)
        w.append(mergesTable, wh.spark.createDataFrame(
          remaps.map { case (o, n) => org.apache.spark.sql.Row(o, n) }.asJava,
          mergesSchema))
    }
  }

  /** Every seen node with its CURRENT component label (journal applied). */
  def components(): DataFrame = {
    val cl = closure()
    val state = wh.read(stateTable, stateSchema)
    if (cl.isEmpty) state.select(col("id"), col("comp").as("component"))
    else {
      val clDf = wh.spark.createDataFrame(
        cl.toSeq.map { case (o, n) => org.apache.spark.sql.Row(o, n) }.asJava, mergesSchema)
      state.join(broadcast(clDf), state("comp") === clDf("old"), "left")
        .select(col("id"), coalesce(col("new"), col("comp")).as("component"))
    }
  }

  /** Amortize the journal into a clean id-sorted rewrite (empty journal
    * after) — run it like compaction, on the same maintenance cadence.
    */
  def fold(): Unit = {
    val resolved = components().select(col("id"), col("component").as("comp"))
    wh.atomically { w =>
      w.replace(stateTable,
        resolved.repartitionByRange(col("id")).sortWithinPartitions("id"))
      w.replace(mergesTable, wh.spark.createDataFrame(
        wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], mergesSchema))
    }
  }
}
