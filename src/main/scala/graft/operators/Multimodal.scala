package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns beside a typed metadata struct; decode / feature-extraction runs
  * batched per partition so a native decoder (libjpeg/ffmpeg/torchcodec in a
  * real deployment) is initialized once per task, not per row — the Scala
  * analogue of a Pandas-UDF-over-`mapInPandas` stage.
  *
  * The decode step itself is STUBBED (this container has no media codecs):
  * [[MediaDecoder.DeterministicStub]] derives a fake-but-stable feature
  * vector and fake dimensions from the bytes, so the Spark-side plumbing —
  * schema, batching, partitioning, output shape — is fully real and tested,
  * and swapping in a true codec touches exactly one trait impl.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),        // image | audio | video
    StructField("content_length", LongType),
    StructField("content_sha", StringType)))

  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Media decoder boundary. Real impls bind a native codec; init is per
    * partition (see extractFeatures).
    */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): Row // featureType-shaped
  }

  object MediaDecoder {
    /** Deterministic stand-in: dimensions and an 8-dim feature vector derived
      * from content bytes. STUB — replace with a codec-backed impl to run on
      * real media; everything around it is production plumbing.
      *
      * Derivation uses the repo's md5Long convention (first 15 hex chars of
      * md5 as a 60-bit non-negative long) so a SQL oracle can restate it
      * exactly: `('0x'||substr(md5(s),1,15))::BIGINT` in DuckDB.
      */
    object DeterministicStub extends MediaDecoder {
      override def decode(kind: String, bytes: Array[Byte]): Row = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60-bit, >= 0
        val w = (16 + h % 1024).toInt
        val ht = (16 + (h / 1024) % 1024).toInt
        val frames = if (kind == "video") (1 + h % 300).toInt else 1
        val feat = Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xff) / 255.0f)
        Row(w, ht, frames, feat.toSeq)
      }
    }

    /** REAL raster decode on the JDK's own codecs — `javax.imageio` ships
      * PNG/JPEG/BMP/GIF readers even with no native media libraries
      * installed, so still images need no stub. The feature is a
      * `grid`×`grid` mean-luminance thumbnail (Rec. 601 luma over the sRGB
      * ints `getRGB` returns), row-major, each cell in [0,1]:
      * integer-exact accumulation (sum of `299r+587g+114b` per pixel)
      * followed by ONE float division, so a fixed payload decodes to a
      * bit-exact vector on any JVM — golden fixtures pin exact floats
      * (MultimodalSpec). Cell bounds are `floor(g·extent/grid)`; images
      * smaller than the grid duplicate edge pixels rather than emit empty
      * cells, keeping the vector length fixed at grid².
      *
      * The DeterministicStub stays the ORACLE-facing decoder: a DuckDB
      * oracle can restate md5-derived features but cannot decode PNG, so
      * driver queries keep the stub while ImageIo is pinned by spec
      * fixtures. One `decoder` argument swaps them.
      */
    final class ImageIo(grid: Int = 4) extends MediaDecoder {
      require(grid > 0, "grid must be positive")
      override def decode(kind: String, bytes: Array[Byte]): Row = {
        require(kind == "image",
          s"ImageIo decodes still images, got kind '$kind'")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, "payload is not a decodable image " +
          "(JDK codecs: PNG/JPEG/BMP/GIF)")
        val (w, h) = (img.getWidth, img.getHeight)
        val feat = new Array[Float](grid * grid)
        var gy = 0
        while (gy < grid) {
          val y0 = (gy * h / grid).min(h - 1)
          val y1 = math.max((gy + 1) * h / grid, y0 + 1)
          var gx = 0
          while (gx < grid) {
            val x0 = (gx * w / grid).min(w - 1)
            val x1 = math.max((gx + 1) * w / grid, x0 + 1)
            var lumaMilli = 0L // Σ(299r + 587g + 114b): integer-exact
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                lumaMilli += 299L * ((rgb >> 16) & 0xff) +
                  587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            val n = (x1 - x0).toLong * (y1 - y0)
            feat(gy * grid + gx) = (lumaMilli.toDouble / (n * 255000.0)).toFloat
            gx += 1
          }
          gy += 1
        }
        Row(w, h, 1, feat.toSeq)
      }
    }
  }

  /** Wrap a table with a synthetic binary payload column (test/demo path:
    * the "media" is the utf-8 text itself). Real ingestion reads
    * `spark.read.format("binaryFile")` or parquet with a binary column.
    */
  def withSyntheticMedia(df: DataFrame, textCol: String, kind: String = "image"): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(kind).as("kind"),
        length(col("content")).cast(LongType).as("content_length"),
        sha2(col("content"), 256).as("content_sha")))

  /** Batched per-partition decode: one decoder per task, rows streamed
    * through it. Output = input id + featureType columns.
    *
    * Typed `Dataset.mapPartitions` (not `df.rdd`): the row encoder keeps the
    * stage inside Tungsten — no deserialization hop out of the optimized
    * plan, and downstream operators keep whole-stage codegen.
    */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
      decoder: MediaDecoder): DataFrame = {
    val outSchema = StructType(StructField(idCol, LongType) +: featureType.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("media_meta")
    df.mapPartitions { rows =>
      // decoder init happens here, once per partition
      rows.map { r =>
        val decoded = decoder.decode(
          r.getStruct(metaIdx).getString(0), r.getAs[Array[Byte]](contentIdx))
        Row.fromSeq(r.getLong(idIdx) +: decoded.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame-sampling plan for video payloads: every `stride`-th frame index up
    * to n_frames — pure column math over the metadata, no decode needed, so
    * planning which frames to fetch costs nothing at 100 TB.
    */
  def sampledFrameIndices(features: DataFrame, stride: Int): DataFrame =
    features.withColumn("frame_idx",
      when(col("n_frames") > 1, sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array(lit(0))))
}
