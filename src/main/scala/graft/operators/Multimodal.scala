package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM-data-pipeline tier).
  *
  * Media (image/audio/video) is modeled as an opaque `binary` payload
  * column plus typed metadata — the standard large-scale layout (payload
  * bytes stay columnar in parquet, metadata columns stay prunable, and a
  * scan that only needs metadata never touches the bytes).
  *
  * The decode step is a STUB by design (no image/audio codecs in this
  *environment): [[StubDecoder.decode]] derives deterministic fake
  * dimensions from an md5 of the payload. Everything around it — the
  * binary schema, the typed `Dataset[MediaAsset]`, the `mapPartitions`
  * batch shape (one decoder instance per partition, streamed iterator,
  * never materializing a partition in memory) — is the real Spark
  * plumbing a production decoder would drop into.
  */
object Multimodal {

  /** One media row: payload + metadata, the parquet-friendly layout. */
  case class MediaAsset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Decoder output: per-asset features (fake, but deterministic). */
  case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      payload_md5: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Deterministic stand-in for a real codec: "decodes" width/height/
    * duration from the payload digest. A real implementation replaces
    * only this object (e.g. with javacv / a JNI codec), keeping the
    * partition-level batching in [[decodeFeatures]] untouched. */
  object StubDecoder {
    def decode(a: MediaAsset): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val digest = md.digest(a.payload)
      val hex = digest.map(b => f"${b & 0xff}%02x").mkString
      // Unsigned ints from digest prefixes — same arithmetic as the
      // DuckDB oracle (('0x'||substr(md5,..))::BIGINT % k).
      val w = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1920L).toInt
      val h = (java.lang.Long.parseLong(hex.substring(8, 16), 16) % 1080L).toInt
      val d = java.lang.Long.parseLong(hex.substring(16, 24), 16) % 600000L
      MediaFeatures(a.asset_id, a.media_type, a.payload.length.toLong, hex, w, h, d)
    }
  }

  /** Wrap a text table as fake media assets: payload = UTF-8 bytes.
    * Gives the binary-column pipeline a deterministic input that exists
    * in every test scale factor. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      // Deterministic modality assignment from the id.
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** Partition-batched decode: one decoder per partition (amortizes any
    * codec init cost), pure iterator streaming (no per-partition
    * materialization), output is a typed Dataset with a stable schema.
    * This is the Scala analogue of `mapInPandas` batch decoding. */
  def decodeFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map(StubDecoder.decode)
    }
  }

  /** Metadata-only projection + per-modality stats — demonstrates that
    * metadata queries prune the payload column out of the scan. */
  def modalityStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"))
}
