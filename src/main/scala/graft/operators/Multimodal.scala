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
  * Two decode tiers:
  *  - [[ImageCodec]]/[[decodeMedia]] — REAL pure-JVM codecs:
  *    `javax.imageio` PNG decode (width/height/bands from the actual
  *    pixel raster) and `javax.sound.sampled` WAV decode (duration from
  *    the actual frame count/rate). No native libraries, runs headless
  *    on any executor. The q76 oracle closes the loop end-to-end:
  *    payloads are ENCODED from id-derived dimensions, decoded back by
  *    the real codecs, and DuckDB recomputes the expected dimensions
  *    from the ids — a byte-level round-trip check.
  *  - [[StubDecoder]]/[[decodeFeatures]] — the md5 stand-in kept for
  *    formats with no JVM codec in this environment (video): derives
  *    deterministic fake dimensions from a digest of the payload, so
  *    the partition-batched plumbing is exercised at corpus scale on
  *    any payload bytes (q27).
  * Both share the same shape: typed `Dataset`, `mapPartitions` batch
  * decode (one decoder instance per partition, streamed iterator,
  * never materializing a partition in memory) — the Scala analogue of
  * `mapInPandas` batch decoding.
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

  // ---------------------------------------------------------------
  // Real pure-JVM codecs (VERDICT r05 item 5): javax.imageio PNG,
  // javax.sound.sampled WAV. Encode exists so the pipeline has real
  // media bytes at every test scale (the testdata tables carry text
  // only); decode is what a production ingest runs.
  // ---------------------------------------------------------------

  /** Decoded media row: -1 marks a field the modality doesn't have
    * (image → no duration, audio → no raster), keeping the schema
    * fixed and hash-comparable. */
  case class DecodedMedia(
      asset_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, duration_ms: Long)

  /** Deterministic real-media encoders + the matching decoders.
    * Dimensions derive from the asset id by fixed arithmetic
    * (width = 16 + id % 97, height = 16 + id % 53, duration_ms =
    * 100 + id % 200), so an engine-independent oracle can recompute
    * what the codec must read back out of the bytes. */
  object ImageCodec {
    /** Solid-color RGB PNG with id-derived dimensions, via
      * `javax.imageio` (headless-safe: BufferedImage needs no
      * display). */
    def encodePng(id: Long): Array[Byte] = {
      val w = 16 + (id % 97).toInt
      val h = 16 + (id % 53).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val rgb = ((id * 2654435761L) & 0xffffffL).toInt
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real PNG/JPEG decode: dimensions + band count from the decoded
      * raster itself. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      (img.getWidth, img.getHeight, img.getRaster.getNumBands)
    }

    private val SampleRate = 8000

    /** PCM16 mono WAV with an id-derived duration: 8 samples per ms at
      * 8 kHz, so duration_ms = 100 + id % 200 exactly. Sample values
      * are an id-seeded sawtooth — content is irrelevant to the header
      * round-trip but keeps payloads distinct. */
    def encodeWav(id: Long): Array[Byte] = {
      val nSamples = 8 * (100 + (id % 200).toInt)
      val data = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = (((id + i) * 2654435761L) % 65536L - 32768L).toShort
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        SampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real WAV decode: duration from the stream's frame count and
      * rate (header + length, not trusted metadata). */
    def decodeWavMs(bytes: Array[Byte]): Long = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try math.round(
        ais.getFrameLength * 1000.0 / ais.getFormat.getFrameRate)
      finally ais.close()
    }
  }

  /** Patterned-PNG tooling for the image near-dup pipeline (q89):
    * decode → average-pool resize → perceptual average-hash → dedup.
    *
    * The encoder paints an 8x8 MACRO-GRID scaled to an id-derived
    * pixel size (both dimensions multiples of 8), with cell
    * intensities a fixed function of the id's pattern class
    * (`id % classes`). Exact average-pooling back to 8x8 therefore
    * recovers the macro-grid precisely regardless of pixel size, so
    * the aHash is a pure function of the class — and the dedup
    * expectation is SQL-expressible (`min(id) per id % classes`) even
    * though the engine must earn it through real codec + resize +
    * hash work (the q76 oracle trick extended to image CONTENT). */
  object PatternCodec {
    /** Grayscale macro-cell intensity for pattern class c — fixed
      * arithmetic, distinct thresholded bit patterns per class
      * (spec-pinned). */
    private def cell(i: Int, j: Int, c: Int): Int =
      ((i * 8 + j) * 31 + c * 97 + (i * j + c * c) * 13) % 251

    def encodePatternPng(id: Long, classes: Int): Array[Byte] = {
      val w = 8 * (1 + (id % 4).toInt)
      val h = 8 * (1 + ((id / 4) % 4).toInt)
      val c = (id % classes).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val cw = w / 8
      val ch = h / 8
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = cell(x / cw, y / ch, c)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode + EXACT average-pool to the 8x8 grid (integer sums over
      * uniform cells — dimensions are multiples of 8 by construction,
      * and PNG is lossless, so pooling reproduces the macro grid) +
      * 64-bit average-hash: bit = cell mean STRICTLY above the global
      * mean (scaled-integer compare, no float thresholds). */
    def ahashPng(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      val w = img.getWidth
      val h = img.getHeight
      require(w % 8 == 0 && h % 8 == 0, s"dims not 8-divisible: ${w}x$h")
      val cw = w / 8
      val ch = h / 8
      val sums = new Array[Long](64) // per-cell intensity sums
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sums((y / ch) * 8 + (x / cw)) += img.getRGB(x, y) & 0xff
          x += 1
        }
        y += 1
      }
      val cellPx = cw.toLong * ch
      var total = 0L
      var k = 0
      while (k < 64) { total += sums(k); k += 1 }
      // bit_k = mean_k > mean_all  <=>  sums(k) * 64 * cellPx-units:
      // compare sums(k) / cellPx > total / (64 * cellPx) in integers.
      var hash = 0L
      k = 0
      while (k < 64) {
        if (sums(k) * 64L > total) hash |= (1L << k)
        k += 1
      }
      hash
    }
  }

  /** Perceptual image dedup over patterned assets: partition-batched
    * decode+resize+hash, then the q20 canonical-survivor shape on the
    * 64-bit aHash (hash equi-groupBy — pairs never materialize; at
    * near-dup thresholds > 0 the hash would feed the SimHash byte-band
    * join instead). */
  def imageNearDup(assets: Dataset[MediaAsset]): DataFrame =
    canonicalByFingerprint(assets, "ahash",
      a => (a.asset_id, PatternCodec.ahashPng(a.payload)))

  /** Shared canonical-survivor tail of [[imageNearDup]] /
    * [[audioNearDup]]: per-partition decode+fingerprint, then the q20
    * shape (min-id per fingerprint, equi-joined back — candidates
    * never pairwise). The fingerprint frame is PERSISTED with a
    * [[CacheLease]]: it feeds BOTH join sides, and unpersisted each
    * side would re-run the decode tier (the dominant cost — real
    * codec work per asset) in its own exchange subtree. */
  private def canonicalByFingerprint(assets: Dataset[MediaAsset],
      fpCol: String, fp: MediaAsset => (Long, Long)): DataFrame = {
    import assets.sparkSession.implicits._
    val hashed = assets.mapPartitions(it => it.map(fp))
      .toDF("asset_id", fpCol).persist()
    CacheLease.releaseAfterAction(
      hashed.join(
        hashed.groupBy(col(fpCol))
          .agg(org.apache.spark.sql.functions.min(col("asset_id"))
            .as("canonical_id")),
        fpCol)
        .select(col("asset_id"), col("canonical_id")))(
      () => { hashed.unpersist(); () })
  }

  /** The id column of an asset synthesizer, SPREAD to the session's
    * cores (guide §2.5): the real-codec encode tier runs inside an
    * opaque `Dataset.map` directly over a pruned one-column scan —
    * one small parquet file, ONE partition — so without the spread
    * every per-asset encode (and the fused decode/fingerprint above
    * it) runs single-task on local[N] until the first exchange. The
    * codecs are per-row pure functions of the id, so row order is
    * irrelevant; Spread skips itself when the scan already fills the
    * cores. */
  private def spreadIds(ids: DataFrame, idCol: String): DataFrame =
    Spread.toCores(ids.select(col(idCol).cast("long").as(idCol)))

  /** Patterned-PNG assets for [[imageNearDup]]. */
  def patternAssetsFromIds(ids: DataFrame, idCol: String,
      classes: Int): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, idCol).as[Long].map { id =>
      MediaAsset(id, "image", PatternCodec.encodePatternPng(id, classes))
    }
  }

  /** Tone-pattern WAV tooling for the audio near-dup pipeline (q147,
    * VERDICT r08 item 8): decode → per-band energy pool →
    * loudness-invariant fingerprint → dedup. The [[PatternCodec]]
    * discipline in the time domain: the encoder writes 16 equal time
    * BANDS whose |amplitude| is a fixed function of the id's pattern
    * class, at id-VARIED band length and gain — exact per-band energy
    * pooling plus a relative (above-the-file-mean) threshold recovers
    * the class regardless of duration or loudness, so the fingerprint
    * is a pure function of the class and the dedup expectation is
    * SQL-expressible (`min(id) per id % classes`) even though the
    * engine must earn it through real WAV decode + band analysis
    * (gain/length vary WITHIN every class — the replica index
    * id / classes draws them — so the invariance is exercised by
    * construction, never satisfied byte-for-byte). */
  object ToneCodec {
    private val SampleRate = 8000
    private val Bands = 16

    /** Band amplitude for pattern class c — the [[PatternCodec]] cell
      * arithmetic on 16 time bands; distinct thresholded fingerprints
      * for every class (spec-pinned). */
    def band(k: Int, c: Int): Int =
      (k * 31 + c * 97 + k * k * 13) % 251

    /** PCM16 mono WAV whose 16 equal time bands hold constant
      * |amplitude| = gain * band(k, id % classes); band length
      * (duration) and gain vary with the REPLICA index (id / classes),
      * NOT the raw id — `id % 3` would be a pure function of
      * `id % classes` whenever 3 divides `classes`, making gain
      * constant within every class and the loudness-invariance claim
      * vacuously untestable (a gain-DEPENDENT fingerprint regression
      * would still pass). With the replica index, same-class assets
      * sweep all 4 lengths x 3 gains as replicas accumulate. */
    def encodeToneWav(id: Long, classes: Int): Array[Byte] = {
      val rep = (id / classes).toInt
      val segLen = 800 * (1 + (rep % 4))
      val gain = 1 + (rep % 3)
      val c = (id % classes).toInt
      val n = Bands * segLen
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val amp = gain * band(i / segLen, c)
        val v = (if (i % 2 == 0) amp else -amp).toShort
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        SampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real WAV decode + exact per-band |sample| sums + the 16-bit
      * loudness-invariant fingerprint: bit_k = band energy STRICTLY
      * above the file mean (scaled-integer compare, no float
      * thresholds — gain and band length cancel out of the
      * inequality, so the fingerprint depends on the pattern class
      * only). */
    def toneFingerprint(bytes: Array[Byte]): Int = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val frames = ais.getFrameLength.toInt
        require(frames % Bands == 0, s"frame count $frames not band-divisible")
        val segLen = frames / Bands
        val buf = ais.readAllBytes()
        val sums = new Array[Long](Bands)
        var i = 0
        while (i < frames) {
          val v = (((buf(2 * i + 1) & 0xff) << 8) | (buf(2 * i) & 0xff)).toShort
          sums(i / segLen) += math.abs(v.toLong)
          i += 1
        }
        var total = 0L
        var k = 0
        while (k < Bands) { total += sums(k); k += 1 }
        var fp = 0
        k = 0
        while (k < Bands) {
          if (sums(k) * Bands > total) fp |= (1 << k)
          k += 1
        }
        fp
      } finally ais.close()
    }
  }

  /** Perceptual audio dedup over tone-pattern assets — [[imageNearDup]]
    * for the audio modality: partition-batched decode + band-energy
    * fingerprint, then the q20 canonical-survivor shape on the
    * fingerprint (hash equi-groupBy — candidates from an equi-join
    * key, pairs never materialize). */
  def audioNearDup(assets: Dataset[MediaAsset]): DataFrame =
    canonicalByFingerprint(assets, "fingerprint",
      a => (a.asset_id, ToneCodec.toneFingerprint(a.payload).toLong))

  /** Tone-pattern WAV assets for [[audioNearDup]]. */
  def toneAssetsFromIds(ids: DataFrame, idCol: String,
      classes: Int): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, idCol).as[Long].map { id =>
      MediaAsset(id, "audio", ToneCodec.encodeToneWav(id, classes))
    }
  }

  /** One sampled video frame: real decoded dimensions. */
  case class SampledFrame(asset_id: Long, frame_idx: Int,
      width: Int, height: Int)

  /** Video frame-sampling (the brief's last multimodal op). There is
    * no pure-JVM codec for real video containers, so the container is
    * a DEFINED trivial format — "GVID", frame count, then
    * length-prefixed REAL PNG frames — and everything around the
    * container choice is the genuine article: the sampler parses the
    * byte layout, seeks to every k-th frame, and decodes THOSE frames
    * only with `javax.imageio` (the point of frame sampling — touch a
    * fraction of the payload). Frame dimensions derive from
    * (id, frame) by fixed arithmetic, so the q90 oracle recomputes
    * expected (frame_idx, width, height) rows from ids alone and a
    * match proves container parsing + selective real decode. */
  object VideoCodec {
    private val Magic = Array[Byte]('G', 'V', 'I', 'D')

    def frameCount(id: Long): Int = 4 + (id % 5).toInt

    def encodeVideo(id: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write(Magic)
      val n = frameCount(id)
      out.writeInt(n)
      var f = 0
      while (f < n) {
        val frame = ImageCodec.encodePng(id * 31 + f)
        out.writeInt(frame.length)
        out.write(frame)
        f += 1
      }
      out.flush()
      bos.toByteArray
    }

    /** Parse the container and REAL-decode every `every`-th frame. */
    def sampleFrames(assetId: Long, bytes: Array[Byte],
        every: Int): Seq[SampledFrame] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic), "not a GVID payload")
      val n = in.readInt()
      val out = Seq.newBuilder[SampledFrame]
      var f = 0
      while (f < n) {
        val len = in.readInt()
        if (f % every == 0) {
          val frame = new Array[Byte](len)
          in.readFully(frame)
          val (w, h, _) = ImageCodec.decodeImage(frame)
          out += SampledFrame(assetId, f, w, h)
        } else {
          var skipped = 0L
          while (skipped < len) skipped += in.skip(len - skipped)
        }
        f += 1
      }
      out.result()
    }
  }

  /** Synthetic GVID assets from an id-bearing table. */
  def videoAssetsFromIds(ids: DataFrame, idCol: String): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, idCol).as[Long]
      .map(id => MediaAsset(id, "video", VideoCodec.encodeVideo(id)))
  }

  /** Partition-batched frame sampling: every `every`-th frame of each
    * video really decoded, one row per sampled frame. */
  def sampleVideoFrames(assets: Dataset[MediaAsset],
      every: Int): Dataset[SampledFrame] = {
    import assets.sparkSession.implicits._
    assets.flatMap(a => VideoCodec.sampleFrames(a.asset_id, a.payload, every))
  }

  /** Real media assets from any id-bearing table: even ids encode as
    * PNG images, odd ids as WAV audio — a deterministic mixed-modality
    * corpus with genuine bytes in the payload column. */
  def mediaAssetsFromIds(ids: DataFrame, idCol: String): Dataset[MediaAsset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, idCol).as[Long].map { id =>
      if (id % 2 == 0) MediaAsset(id, "image", ImageCodec.encodePng(id))
      else MediaAsset(id, "audio", ImageCodec.encodeWav(id))
    }
  }

  /** Partition-batched REAL decode: dispatches on media_type, one
    * iterator pass, no per-partition materialization. Unknown types
    * (e.g. video — no pure-JVM codec) fall back to -1 dimensions
    * rather than failing the batch. */
  def decodeMedia(assets: Dataset[MediaAsset]): Dataset[DecodedMedia] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.media_type match {
          case "image" =>
            val (w, h, c) = ImageCodec.decodeImage(a.payload)
            DecodedMedia(a.asset_id, a.media_type, a.payload.length.toLong,
              w, h, c, -1L)
          case "audio" =>
            DecodedMedia(a.asset_id, a.media_type, a.payload.length.toLong,
              -1, -1, -1, ImageCodec.decodeWavMs(a.payload))
          case _ =>
            DecodedMedia(a.asset_id, a.media_type, a.payload.length.toLong,
              -1, -1, -1, -1L)
        }
      }
    }
  }
}
