package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

/** Join-based rewrite of the reference's three MERGE stored procedures
  * (called at core/etl_orchestrator.py:168-189; prose semantics in
  * docs/ETL_ENHANCEMENTS.md:25-29 — the SQL itself is not in the repo, so the
  * key semantics below are the engine's contract, per SURVEY.md §7 risk 1):
  *
  *   - Provider  (J1): insert-if-absent, keyed by provider name
  *   - Product   (J2): upsert, keyed by description hash
  *     (IX_Product_DescriptionHash, core/entities.py:106,116)
  *   - Provider_Product (J3): upsert on (ProviderId, ProductId), FKs resolved
  *     by name/description joins inside the merge
  *   - ProviderSynonym (J4) and UnitOfMeasure auto-create (J5) resolve keys
  *
  * Key normalization: SQL Server compares these columns under a
  * case-insensitive collation and ANSI padding (trailing spaces ignored), so
  * every merge key is `lower(rtrim(x))` while the stored display value stays
  * raw (SURVEY.md §7 risk 6: "Serrano " and "Serrano" are distinct staging
  * rows but one dimension row).
  *
  * Scale notes: every join here has a dimension on one side, and the staged
  * side collapses to dimension cardinality after its per-batch dedup, so the
  * joins want to be broadcast hash joins — no shuffle of the big side. The
  * hints are CONDITIONAL on the side's leaf-stats size ([[broadcastIfSmall]]):
  * a hard `broadcast()` overrides AQE, so a dimension that outgrew executor
  * memory (10⁸ products is a multi-GB hash set) would be force-shipped with
  * no escape hatch; unhinted, AQE still broadcasts at runtime when the actual
  * size allows and falls back to a shuffled join when it doesn't — the same
  * reasoning documented at `Dedup.nearDupDedupBy`. Dense id assignment uses a
  * single-partition window over NEW rows only (per-batch novelty is
  * file-sized, not fact-sized); if a deployment ever bulk-loads
  * dimension-scale novelty, switch to `monotonically_increasing_id` + offset.
  */
object Merge {

  /** CI-AS + ANSI-padding equality key. */
  def keyOf(c: Column): Column = lower(rtrim(c))

  /** Broadcast hint only while the side's size estimate stays under
    * `spark.graft.merge.broadcastMaxBytes` (default 64 MB; -1 = never hint,
    * which specs use to prove the unhinted chain still plans sanely).
    *
    * The estimate is the SUM OF LEAF-RELATION STATS on the side's ANALYZED
    * plan — deliberately not `optimizedPlan.stats`: the analyzed plan is
    * computed eagerly when the Dataset is constructed, and each leaf's stats
    * (file-index bytes for parquet relations, literal bytes for local data)
    * are memoized on the immutable leaf node that derived frames share, so
    * the check is free. Forcing `optimizedPlan` here cost a full extra
    * analyze+optimize pass (with relation stat resolution) per hinted join —
    * ×6 call sites × every merge in a pipeline — and measurably doubled the
    * merge-chain wall clock (round-9 bench, flat canaries).
    *
    * Leaf-sum is an upper bound on the side's output for the subplans used
    * here (selections, per-batch aggregations, lookup unions, key-restricting
    * joins — nothing row-expanding), so relative to the old behavior it can
    * only SKIP hints it would have issued, never add one: the underestimate
    * hazard (forcing a genuinely-large side onto every executor with no
    * escape hatch) would need a leaf stat smaller than the files it indexes.
    * An unhinted join is always safe — AQE still broadcasts genuinely-small
    * sides at runtime and falls back to a shuffled join when it must.
    */
  private def broadcastIfSmall(df: DataFrame): DataFrame = {
    val maxBytes = df.sparkSession.conf
      .get("spark.graft.merge.broadcastMaxBytes", (64L << 20).toString).toLong
    if (maxBytes < 0) df
    else {
      val leafBytes = df.queryExecution.analyzed.collectLeaves()
        .map(_.stats.sizeInBytes).sum
      if (leafBytes <= maxBytes) broadcast(df) else df
    }
  }

  /** Product natural key — sha2-256 of the normalized description, stored as
    * 32 raw bytes like the reference's `DescriptionHash LargeBinary(32)`.
    */
  def descHash(c: Column): Column = unhex(sha2(keyOf(c), 256))

  private def nextIds(df: DataFrame, orderKey: Column, maxId: Int): DataFrame =
    df.withColumn("Id", (lit(maxId) + row_number().over(Window.orderBy(orderKey))).cast(IntegerType))

  private def maxIdOf(dim: DataFrame): Int = {
    val r = dim.agg(max(col("Id"))).head()
    if (r.isNullAt(0)) 0 else r.getInt(0)
  }

  final case class MergeResult(
      provider: DataFrame,
      unitOfMeasure: DataFrame,
      product: DataFrame,
      providerProduct: DataFrame)

  /** J1 + J4 — insert new providers, skip existing (synonym-aware). */
  def mergeProviders(dim: DataFrame, synonyms: DataFrame, stagingProvider: DataFrame): DataFrame = {
    // one candidate per normalized name; keep the lexicographically-first raw
    // spelling as the display name (deterministic; the DB's MERGE keeps
    // whichever staging row it saw first)
    val candidates = stagingProvider
      .groupBy(keyOf(col("Name")).as("k"))
      .agg(min(col("Name")).as("Name"))

    val viaSynonym = candidates.join(
      broadcastIfSmall(synonyms.select(keyOf(col("Synonym")).as("k"))), Seq("k"), "left_anti")

    val novel = viaSynonym.join(
      broadcastIfSmall(dim.select(keyOf(col("Name")).as("k"))), Seq("k"), "left_anti")

    val inserted = nextIds(novel, col("k"), maxIdOf(dim))
      .select(col("Id"), col("Name"), current_timestamp().as("CreateDt"))

    dim.unionByName(inserted)
  }

  /** J5 — resolve unit-of-measure acronyms; auto-create unseen units
    * ("automatically creates new units of measure as needed",
    * docs/ETL_ENHANCEMENTS.md:23).
    */
  def mergeUnitsOfMeasure(dim: DataFrame, acronyms: DataFrame, stagingProduct: DataFrame): DataFrame = {
    val staged = stagingProduct
      .filter(col("UnitOfMeasure").isNotNull)
      .groupBy(keyOf(col("UnitOfMeasure")).as("k"))
      .agg(min(col("UnitOfMeasure")).as("Acronym"))

    val known = dim.select(keyOf(col("Acronym")).as("k"))
      .union(acronyms.select(keyOf(col("Acronym")).as("k")))

    val novel = staged.join(broadcastIfSmall(known), Seq("k"), "left_anti")
    val inserted = nextIds(novel, col("k"), maxIdOf(dim))
      .select(col("Id"), col("Acronym"), col("Acronym").as("Name"))

    dim.unionByName(inserted)
  }

  /** Broadcast lookup: normalized acronym → UnitOfMeasureId (direct + alias). */
  private def uomLookup(uom: DataFrame, acronyms: DataFrame): DataFrame = {
    val direct = uom.select(keyOf(col("Acronym")).as("k"), col("Id").as("UnitOfMeasureId"))
    val alias = acronyms
      .select(keyOf(col("Acronym")).as("k"), col("UnitOfMeasureId"))
    // direct wins over alias on conflict
    direct.unionByName(alias.join(direct.select(col("k")), Seq("k"), "left_anti"))
  }

  /** J2 — upsert products on description hash; update Measure/UoM/UpdatedDt
    * for matches, insert new ids for novel descriptions.
    */
  def mergeProducts(
      dim: DataFrame,
      uom: DataFrame,
      uomAcronyms: DataFrame,
      stagingProduct: DataFrame): DataFrame = {

    val staged = stagingProduct
      .filter(col("Description").isNotNull)
      .groupBy(descHash(col("Description")).as("hash"))
      .agg(
        min(col("Description")).as("s_Description"),
        min(col("Measure")).as("s_Measure"),
        min(col("UnitOfMeasure")).as("s_Unit"),
        min(col("UnitPrice")).as("s_UnitPrice"))
      .join(broadcastIfSmall(uomLookup(uom, uomAcronyms)), keyOf(col("s_Unit")) === col("k"), "left")
      .drop("k")
      .withColumnRenamed("UnitOfMeasureId", "s_UomId")

    val dimKeyed = dim.withColumn("hash", coalesce(col("DescriptionHash"), descHash(col("Description"))))

    // NO broadcast hint: Spark cannot broadcast-hash a FULL outer join, so a
    // hint silently degrades it to BroadcastNestedLoopJoin — O(dim×staged)
    // pair compares. Unhinted, the equi full-outer plans as a sort-merge /
    // shuffled-hash join: O(n+m) on dimension-sized sides (PlanAudit flags
    // any BNLJ reappearing here)
    val joined = dimKeyed.join(staged, Seq("hash"), "full_outer")

    val matchedOrExisting = joined.filter(col("Id").isNotNull).select(
      col("Id"),
      coalesce(col("UnitPrice"), col("s_UnitPrice")).as("UnitPrice"),
      col("Description"),
      when(col("s_Description").isNotNull,
        col("s_Measure").try_cast(DecimalType(18, 2))).otherwise(col("Measure")).as("Measure"),
      when(col("s_Description").isNotNull,
        coalesce(col("s_UomId"), col("UnitOfMeasureId"))).otherwise(col("UnitOfMeasureId")).as("UnitOfMeasureId"),
      col("CreatedDt"),
      when(col("s_Description").isNotNull, current_timestamp()).otherwise(col("UpdatedDt")).as("UpdatedDt"),
      col("hash").as("DescriptionHash"))

    val novel = joined.filter(col("Id").isNull)
    val inserted = nextIds(novel, col("hash"), maxIdOf(dim)).select(
      col("Id"),
      col("s_UnitPrice").as("UnitPrice"),
      col("s_Description").as("Description"),
      col("s_Measure").try_cast(DecimalType(18, 2)).as("Measure"),
      col("s_UomId").as("UnitOfMeasureId"),
      current_timestamp().as("CreatedDt"),
      lit(null).cast("timestamp").as("UpdatedDt"),
      col("hash").as("DescriptionHash"))

    matchedOrExisting.unionByName(inserted)
  }

  /** Broadcast lookup: normalized provider name → ProviderId (direct + synonym). */
  private def providerLookup(provider: DataFrame, synonyms: DataFrame): DataFrame = {
    val direct = provider.select(keyOf(col("Name")).as("k"), col("Id").as("ProviderId"))
    val viaSyn = synonyms.select(keyOf(col("Synonym")).as("k"), col("ProviderId"))
    direct.unionByName(viaSyn.join(direct.select(col("k")), Seq("k"), "left_anti"))
  }

  /** J3 — resolve FKs by name/description joins, then upsert on the id pair. */
  def mergeProviderProducts(
      dim: DataFrame,
      provider: DataFrame,
      synonyms: DataFrame,
      product: DataFrame,
      stagingProviderProduct: DataFrame): DataFrame = {

    val prodKey = product.select(
      coalesce(col("DescriptionHash"), descHash(col("Description"))).as("hash"),
      col("Id").as("r_ProductId"))

    val resolved = stagingProviderProduct
      .drop("ProductId", "ProviderId") // placeholder 0s; real ids resolved here
      .withColumn("hash", descHash(col("ProductDescription")))
      .join(broadcastIfSmall(providerLookup(provider, synonyms)),
        keyOf(col("ProviderName")) === col("k"), "left")
      .drop("k")
      .join(broadcastIfSmall(prodKey), Seq("hash"), "left")
      .filter(col("r_ProductId").isNotNull && col("ProviderId").isNotNull)

    // one upsert row per (provider, product): the WHOLE latest-review row wins
    // (not independent per-column maxes, which would fabricate a row mixing
    // fields from different staging rows). Null dates lose; ties break on
    // (price, package, iva) for determinism.
    val sDt = to_timestamp(col("LastReviewDt"), "yyyy-MM-dd")
    val sPkg = col("PackageUnits").try_cast(IntegerType)
    val sIva = col("IVA").try_cast(DecimalType(18, 2))
    val sPrice = col("Price").try_cast(DecimalType(18, 2))
    val stagedRow = struct(sDt.as("dt"), sPkg.as("pkg"), sIva.as("iva"), sPrice.as("price"))
    val orderKey = struct(sDt, sPrice, sPkg, sIva)
    val staged = resolved.groupBy(col("ProviderId"), col("r_ProductId").as("ProductId"))
      .agg(max_by(stagedRow, orderKey).as("w"))
      .select(col("ProviderId"), col("ProductId"),
        col("w.dt").as("s_LastReviewDt"),
        col("w.pkg").as("s_PackageUnits"),
        col("w.iva").as("s_IVA"),
        col("w.price").as("s_Price"))

    // Upsert without shuffling the fact: the staged side is file-sized, so
    // (a) update pass = fact LEFT JOIN broadcast(staged) — BroadcastHashJoin,
    // fact stays in place; (b) novelty = staged ANTI broadcast(matched keys),
    // where matched keys come from an inner broadcast probe of the fact.
    // (Production path for a truly huge bridge: partition by id-bucket and
    // rewrite only touched partitions; the join shape stays identical.)
    val existing = dim.join(broadcastIfSmall(staged), Seq("ProviderId", "ProductId"), "left").select(
      col("Id"), col("ProductId"), col("ProviderId"),
      col("IsValidated"),
      coalesce(col("s_LastReviewDt"), col("LastReviewDt")).as("LastReviewDt"),
      coalesce(col("s_PackageUnits"), col("PackageUnits")).as("PackageUnits"),
      coalesce(col("s_IVA"), col("IVA")).as("IVA"),
      coalesce(col("s_Price"), col("Price")).as("Price"))

    val matchedKeys = dim
      .join(broadcastIfSmall(staged.select(col("ProviderId"), col("ProductId"))),
        Seq("ProviderId", "ProductId"), "inner")
      .select(col("ProviderId"), col("ProductId"))

    val inserted = nextIds(
        staged.join(broadcastIfSmall(matchedKeys), Seq("ProviderId", "ProductId"), "left_anti"),
        struct(col("ProviderId"), col("ProductId")), maxIdOf(dim))
      .select(
        col("Id"), col("ProductId"), col("ProviderId"),
        lit(false).as("IsValidated"),
        col("s_LastReviewDt").as("LastReviewDt"),
        col("s_PackageUnits").as("PackageUnits"),
        col("s_IVA").as("IVA"),
        col("s_Price").as("Price"))

    existing.unionByName(inserted)
  }
}
