package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample operators.
  *
  * Execution model: the Spark-side plumbing — schema, partition sizing,
  * per-partition batched processing, frame explode — is real and tested.
  * The IMAGE codec is real: [[JdkImageCodec]] decodes PNG/BMP/JPEG/GIF
  * through `javax.imageio` (pure JDK, no native deps). The AUDIO codec
  * is real: [[JdkAudioCodec]] decodes WAV/AIFF/AU through
  * `javax.sound.sampled` (pure JDK) with true sample rate and duration.
  * Video (and non-decodable image/audio bytes) falls back to
  * [[DecodeStub]], which derives deterministic fake features from the
  * bytes — this environment has no video libraries. Swapping a real
  * video codec in changes ONE function and nothing about the
  * distributed plan, exactly as the image and audio branches
  * demonstrate.
  *
  * Scale notes:
  *  - media rows are large (MBs); [[repartitionBySize]] packs partitions
  *    to a byte budget instead of a row count so one task neither OOMs on
  *    4K video nor starves on thumbnails;
  *  - decode runs via `mapPartitions` in batches of `batchSize` — the
  *    shape a vectorized/native decoder wants (amortized init per batch,
  *    bounded memory per task);
  *  - frame sampling is a `explode(sequence(...))` — pure narrow codegen,
  *    no shuffle; downstream per-frame ops inherit the parallelism.
  */
object MediaOps {

  /** Typed metadata carried alongside the opaque bytes. */
  case class MediaMeta(format: String, width: Int, height: Int,
                       sampleRate: Int, durationMs: Long)

  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte],
                         meta: MediaMeta)

  /** Decoded representation: a fixed-length feature payload per media
    * item plus the modality's true signal dimensions — (width, height)
    * from a real image decode, (sampleRate, durationMs) from a real
    * audio decode; metadata passthrough where the payload didn't
    * decode. A real pipeline would hold pixels / PCM samples here. */
  case class DecodedMedia(media_id: Long, kind: String, width: Int,
                          height: Int, sampleRate: Int, durationMs: Long,
                          features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame_ts_ms: Long,
                   frame_bytes: Array[Byte])

  // ───────────────────────── real JDK image codec ──────────────────

  /** Pure-JDK image codec: `javax.imageio` reads PNG/BMP/JPEG/GIF with
    * zero native dependencies. Every function is total over arbitrary
    * bytes by returning None for payloads no registered reader
    * accepts — the operators fall back to [[DecodeStub]] then, so the
    * pipeline is REAL for real images and still runs on anything. */
  object JdkImageCodec {

    // the default ImageIO cache spools every read/write through a temp
    // FILE in java.io.tmpdir — pure disk churn for byte arrays already
    // in memory, and per-row on the decode hot path
    javax.imageio.ImageIO.setUseCache(false)

    /** Total over arbitrary bytes: the JDK readers throw
      * RuntimeExceptions (not just IOException) on malformed headers,
      * and a corrupt payload must fall back to the stub, not kill the
      * task. */
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.length == 0) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Decode and project the raster into a `dim`-length feature
      * vector: the Rec.601 luminance of pixel (x, y) accumulates into
      * `out[(y*w + x) % dim]`, scaled by 1/255 — a deterministic
      * grayscale folding (the classic baseline before a learned
      * encoder). Returns the TRUE decoded (width, height), which is
      * how callers observe that a real decode happened. */
    def features(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
      decode(bytes).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Float](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            out(((y.toLong * w + x) % dim).toInt) += lum / 255.0f
            x += 1
          }
          y += 1
        }
        (w, h, out)
      }

    /** Real resize: decode, scale through Graphics2D onto a w×h RGB
      * raster, re-encode as PNG. Headless-safe (BufferedImage needs no
      * display). */
    def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decode(bytes).map { img =>
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
  }

  // ───────────────────────── real JDK audio codec ──────────────────

  /** Pure-JDK audio codec: `javax.sound.sampled` reads WAV/AIFF/AU
    * (and converts 8-bit / μ-law / A-law payloads to PCM) with zero
    * native dependencies — the audio twin of [[JdkImageCodec]]. Total
    * over arbitrary bytes: anything no registered reader accepts
    * returns None and the operators fall back to [[DecodeStub]]. */
  object JdkAudioCodec {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    /** Decode to 16-bit signed PCM and project the samples into a
      * `dim`-length feature vector: |sample|/32768 of sample i
      * accumulates into `out[i % dim]` — the same deterministic
      * folding as the image luminance features. Returns the TRUE
      * (sampleRate, durationMs) read from the audio header, which is
      * how callers observe that a real decode happened. */
    def features(bytes: Array[Byte], dim: Int): Option[(Int, Long, Array[Float])] =
      if (bytes == null || bytes.length == 0) None
      else try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val src = in.getFormat
          // normalize to 16-bit signed little-endian PCM: the JDK
          // converts 8-bit, μ-law, and A-law for free, so the sample
          // loop below reads ONE representation
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            src.getChannels * 2, src.getSampleRate, false)
          val pcmIn = AudioSystem.getAudioInputStream(target, in)
          try {
            val pcm = pcmIn.readAllBytes()
            val nSamples = pcm.length / 2
            val out = new Array[Float](dim)
            var i = 0
            while (i < nSamples) {
              val s = (((pcm(2 * i + 1) & 0xff) << 8) |
                (pcm(2 * i) & 0xff)).toShort
              out(i % dim) += math.abs(s.toInt) / 32768.0f
              i += 1
            }
            val rate = target.getSampleRate.toInt
            val frames = nSamples / target.getChannels
            Some((rate, frames * 1000L / rate, out))
          } finally pcmIn.close()
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Wrap raw little-endian PCM bytes in a canonical 44-byte RIFF/
      * WAVE header (16-bit mono) — the encode side of the codec, and
      * how the harness manufactures REAL decodable audio payloads
      * from deterministic bytes. */
    def wavWrap(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)               // PCM
        .putShort(1)               // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)    // byte rate
        .putShort(2)               // block align
        .putShort(16)              // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(pcm.length)
        .put(pcm)
      bb.array()
    }
  }

  // ───────────────────────── stubbed codec ─────────────────────────

  /** STUB decoder — deterministic fake standing in for the AUDIO/VIDEO
    * codecs (ffmpeg is not available in this environment; images go
    * through the real [[JdkImageCodec]]). Real implementation: decode
    * `bytes` per `meta.format`; everything distributed about the
    * operator (batching, schema, partitioning) stays identical. */
  object DecodeStub {
    /** Fake "decode": a `dim`-length float feature vector from a rolling
      * hash over the bytes — deterministic, cheap, collision-spread. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      // a null payload (e.g. a NULL-text document cast to binary)
      // embeds as the zero vector, like an empty payload — a real
      // decoder would reject it upstream
      if (bytes == null) return out
      var h = 1125899906842597L // large prime seed
      var i = 0
      while (i < bytes.length) {
        h = 31 * h + bytes(i)
        out(math.floorMod(i, dim).toInt) += (h % 1000L) / 1000.0f
        i += 1
      }
      out
    }

    /** Fake resize: metadata change + deterministic byte payload of the
      * target size (real impl: bilinear/lanczos over decoded pixels). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes.isEmpty) return bytes // nothing to resample
      val out = new Array[Byte]((w.toLong * h % 4096).toInt.max(1))
      var i = 0
      while (i < out.length) {
        out(i) = bytes(math.floorMod(i * 31, bytes.length))
        i += 1
      }
      out
    }
  }

  // ─────────────────────── distributed plumbing ───────────────────────

  /** Pack media rows into partitions of ~`targetBytes` payload each —
    * size-aware parallelism for heavy binary rows. Greedy bin-packing
    * runs independently per input partition (fully distributed, no
    * global sort): rows accumulate into a bin until the byte budget is
    * exceeded, then the bins are shuffled one-bin-per-reducer
    * (approximately — bins hash onto ~total/target reducers, so an
    * occasional reducer holds two bins; a single oversized row gets a
    * bin of its own rather than OOMing a packed partition). One stats
    * pass sizes the reducer count. */
  def repartitionBySize(df: DataFrame, targetBytes: Long): DataFrame = {
    val spark = df.sparkSession
    // coalesce: a null bytes cell must count as 0, not NPE getLong below
    val sized = df.withColumn("_sz",
      coalesce(length(col("bytes")).cast("long"), lit(0L)))
    val total = sized.agg(coalesce(sum(col("_sz")), lit(0L))).head.getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)

    val schema = sized.schema.add("_bin", org.apache.spark.sql.types.LongType,
      nullable = false)
    val szIdx = sized.schema.fieldIndex("_sz")
    val binned = sized.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = 0L
      var bin = 0L
      it.map { r =>
        val sz = math.max(r.getLong(szIdx), 0L)
        if (acc > 0 && acc + sz > targetBytes) { bin += 1; acc = 0L }
        acc += sz
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ ((pid.toLong << 24) | bin))
      }
    }
    spark.createDataFrame(binned, schema)
      .repartition(parts, col("_bin"))
      .drop("_sz", "_bin")
  }

  /** Batched decode via mapPartitions: the iterator is consumed in
    * `batchSize` groups so a native decoder can amortize per-batch init
    * and memory stays bounded regardless of partition size. */
  def decode(media: Dataset[MediaRecord], dim: Int = 64,
             batchSize: Int = 32): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // image payloads take the REAL javax.imageio path (and report
        // the true decoded dimensions); audio payloads the REAL
        // javax.sound.sampled path (true sample rate + duration);
        // video and non-decodable bytes fall back to the
        // deterministic stub
        batch.iterator.map { m =>
          val real = m.kind match {
            case "image" => JdkImageCodec.features(m.bytes, dim).map {
              case (w, h, f) => DecodedMedia(m.media_id, m.kind, w, h,
                m.meta.sampleRate, m.meta.durationMs, f)
            }
            case "audio" => JdkAudioCodec.features(m.bytes, dim).map {
              case (rate, durMs, f) => DecodedMedia(m.media_id, m.kind,
                m.meta.width, m.meta.height, rate, durMs, f)
            }
            case _ => None
          }
          real.getOrElse(DecodedMedia(m.media_id, m.kind, m.meta.width,
            m.meta.height, m.meta.sampleRate, m.meta.durationMs,
            DecodeStub.features(m.bytes, dim)))
        }
      }
    }
  }

  /** Resize images: real decode + Graphics2D scale + PNG re-encode for
    * decodable payloads, deterministic stub bytes otherwise. Metadata
    * reflects the target size either way. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind == "image")
        JdkImageCodec.resizePng(m.bytes, w, h) match {
          case Some(px) => m.copy(bytes = px,
            meta = m.meta.copy(format = "png", width = w, height = h))
          case None => m.copy(bytes = DecodeStub.resize(m.bytes, w, h),
            meta = m.meta.copy(width = w, height = h))
        }
      else m
    }
  }

  /** Sample one frame every `everyMs` from video rows: pure narrow
    * explode — each media row becomes duration/everyMs frame rows with
    * deterministic (stub) frame bytes. */
  def frameSample(media: Dataset[MediaRecord], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = (m.meta.durationMs / everyMs).toInt
      (0 until n).iterator.map { i =>
        val start = math.floorMod(i * 257, m.bytes.length.max(1))
        val len = math.min(64, m.bytes.length - start).max(0)
        Frame(m.media_id, i, i * everyMs,
          java.util.Arrays.copyOfRange(m.bytes, start, start + len))
      }
    }
  }

  /** Feature extraction to an embedding column — output plugs straight
    * into the similarity surface (cosine / ANN operators). */
  def embed(media: Dataset[MediaRecord], dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    // kind rides along: it is the blocking key of the near-dup path
    // (q85) and costs nothing for callers that drop it
    decode(media, dim).select(col("media_id").as("vec_id"), col("kind"),
      col("features").as("embedding"))
  }

  /** Deterministic media view derived from the harness `documents`
    * table (bytes = UTF-8 text payload) — lets the binary-column
    * operators run against oracle-checkable data. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      // reject null payloads AT THE BOUNDARY: every operator over
      // MediaRecord (decode/resize/frameSample) assumes bytes != null,
      // and a half-tolerant layer would just move the failure around.
      // The oracles carry the same predicate.
      .filter(col("text").isNotNull)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        struct(
          lit("stub").as("format"),
          (col("doc_id") % 640 + 1).cast("int").as("width"),
          (col("doc_id") % 480 + 1).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (length(col("text")) * 4).cast("long").as("durationMs")
        ).as("meta"))
}
