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
  * The VIDEO codec is real for MJPEG/AVI: [[JdkVideoCodec]] parses the
  * RIFF container directly and decodes each frame through the image
  * codec (pure JDK) — true dimensions, frame count, and duration.
  * Non-MJPEG video (H.264 etc. — needs libraries this environment
  * lacks) and non-decodable payloads of any kind fall back to
  * [[DecodeStub]]; swapping a fuller codec in changes ONE function and
  * nothing about the distributed plan, exactly as the image, audio,
  * and MJPEG branches demonstrate.
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
        val out = new Array[Float](dim)
        lumaInto(img, out)
        (img.getWidth, img.getHeight, out)
      }

    /** The luminance-folding kernel shared by the image features and
      * the per-frame video features: Rec.601 luma of pixel (x, y)
      * accumulates into `out[(y*w + x) % dim]`, scaled by 1/255. */
    private[multimodal] def lumaInto(img: java.awt.image.BufferedImage,
                                     out: Array[Float]): Unit = {
      val w = img.getWidth
      val h = img.getHeight
      val dim = out.length
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
    }

    /** JPEG-encode a raster. Lives HERE so every caller (q109's
      * manufactured frames, the spec's fixtures) inherits this
      * object's `ImageIO.setUseCache(false)` init — a bare
      * `ImageIO.write` from a lambda that never touched this object
      * spools every encode through a temp FILE in java.io.tmpdir. */
    def encodeJpg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
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
    import javax.sound.sampled.{AudioFormat, AudioInputStream,
      UnsupportedAudioFileException}
    import javax.sound.sampled.spi.{AudioFileReader, FormatConversionProvider}

    // `AudioSystem.getAudioInputStream` re-walks the SPI registry on
    // EVERY call (`JDK13Services` builds a fresh ServiceLoader and
    // re-instantiates each provider per lookup) — measured at ~84 µs/row
    // of pure dispatch in the 100× decode run, dominating the actual
    // header parse. The registry is static per JVM, so load each SPI
    // surface ONCE per executor and dispatch over the cached array.
    private lazy val fileReaders: Array[AudioFileReader] = {
      val it = java.util.ServiceLoader.load(classOf[AudioFileReader]).iterator()
      val b = Array.newBuilder[AudioFileReader]
      while (it.hasNext) b += it.next()
      b.result()
    }
    private lazy val converters: Array[FormatConversionProvider] = {
      val it = java.util.ServiceLoader
        .load(classOf[FormatConversionProvider]).iterator()
      val b = Array.newBuilder[FormatConversionProvider]
      while (it.hasNext) b += it.next()
      b.result()
    }

    // last reader that accepted a payload, tried first on the next row
    // (plain volatile int — a stale read just costs one extra probe):
    // real corpora are format-homogeneous, so the steady state is ONE
    // reader attempt and ZERO UnsupportedAudioFileException throws per
    // row. The throws matter more than they look: fillInStackTrace
    // walks the full task stack, and an executor stack is an order of
    // magnitude deeper than a driver loop's.
    @volatile private var stickyReader = 0

    /** First cached reader that accepts the payload (the same
      * first-match contract AudioSystem implements, minus the per-call
      * registry walk), sticky-starting at the last successful one. */
    private def open(bytes: Array[Byte]): Option[AudioInputStream] = {
      val n = fileReaders.length
      val start = { val s = stickyReader; if (s < n) s else 0 }
      var k = 0
      while (k < n) {
        val i = (start + k) % n
        try {
          val in = fileReaders(i).getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          stickyReader = i
          return Some(in)
        } catch {
          case _: UnsupportedAudioFileException => // not this reader's format
          case scala.util.control.NonFatal(_)   => // malformed for this reader
        }
        k += 1
      }
      None
    }

    /** Decode to 16-bit signed PCM and project the samples into a
      * `dim`-length feature vector: |sample|/32768 of sample i
      * accumulates into `out[i % dim]` — the same deterministic
      * folding as the image luminance features. Returns the TRUE
      * (sampleRate, durationMs) read from the audio header, which is
      * how callers observe that a real decode happened. */
    def features(bytes: Array[Byte], dim: Int): Option[(Int, Long, Array[Float])] =
      if (bytes == null || bytes.length == 0) None
      else try open(bytes).flatMap { in =>
        try {
          val src = in.getFormat
          // normalize to 16-bit signed little-endian PCM: the JDK
          // converts 8-bit, μ-law, and A-law for free, so the sample
          // loop below reads ONE representation. Already-conformant
          // payloads (canonical 16-bit WAV — the overwhelmingly common
          // case) skip conversion AND its per-call SPI walk entirely.
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            src.getChannels * 2, src.getSampleRate, false)
          val conformant = src.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            src.getSampleSizeInBits == 16 && !src.isBigEndian &&
            src.getFrameSize == src.getChannels * 2
          val pcmInOpt =
            if (conformant) Some(in)
            else converters.find(_.isConversionSupported(target, src))
              .map(_.getAudioInputStream(target, in))
          pcmInOpt.map { pcmIn =>
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
              (rate, frames * 1000L / rate, out)
            } finally pcmIn.close()
          }
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

  // ───────────────────────── real JDK video codec ──────────────────

  /** Pure-JDK MJPEG/AVI video codec — the recipe that made images
    * (round 6) and audio (round 7) real, applied to video: the AVI
    * container is parsed directly (a RIFF chunk walk, no native libs),
    * and every `00dc` frame payload is a plain JPEG the existing
    * [[JdkImageCodec]] decodes. Total over arbitrary bytes: anything
    * that is not a RIFF/AVI with ImageIO-decodable frames returns None
    * and the operators fall back to [[DecodeStub]] — which remains the
    * documented stand-in for non-MJPEG codecs (H.264 etc. need
    * libraries this environment lacks). [[aviWrap]] is the encode
    * side: how the harness manufactures REAL decodable video payloads
    * from deterministic frames (wavWrap's video twin). */
  object JdkVideoCodec {

    /** Parsed container: header frame timing + declared dims, and the
      * raw JPEG bytes of every video frame in stream order. */
    case class AviVideo(usPerFrame: Long, width: Int, height: Int,
                        frames: IndexedSeq[Array[Byte]])

    /** Walk the RIFF tree: `avih` inside `hdrl` yields timing/dims,
      * `..dc`/`..db` chunks inside `movi` (or its `rec ` sublists)
      * yield frame payloads. Tolerant of unknown chunks (skipped via
      * their declared size, word-aligned) and of truncation (parses
      * what is there; a container with zero frames is None). */
    def parseAvi(bytes: Array[Byte]): Option[AviVideo] =
      if (bytes == null || bytes.length < 24) None
      else try {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(): String = {
          val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
        }
        if (fourcc() != "RIFF") return None
        val riffSz = bb.getInt
        if (fourcc() != "AVI ") return None
        var usPerFrame = 0L
        var w = 0
        var h = 0
        val frames = Vector.newBuilder[Array[Byte]]
        var nFrames = 0
        def walk(end: Int, inMovi: Boolean, inHdrl: Boolean): Unit =
          while (bb.position() + 8 <= end) {
            val id = fourcc()
            val sz = bb.getInt
            val start = bb.position()
            val next = start + sz + (sz & 1)
            if (sz < 0 || next > end) return // truncated: keep what parsed
            if (id == "LIST" && sz >= 4) {
              val lt = fourcc()
              walk(start + sz, inMovi || lt == "movi" || lt == "rec ",
                inHdrl || lt == "hdrl")
            } else if (id == "avih" && inHdrl && sz >= 40) {
              usPerFrame = bb.getInt(start) & 0xffffffffL
              w = bb.getInt(start + 32)
              h = bb.getInt(start + 36)
            } else if (inMovi && (id.endsWith("dc") || id.endsWith("db"))) {
              frames += java.util.Arrays.copyOfRange(bytes, start, start + sz)
              nFrames += 1
            }
            bb.position(next)
          }
        walk(math.min(8L + riffSz, bytes.length.toLong).toInt,
          inMovi = false, inHdrl = false)
        val fs = frames.result()
        if (fs.isEmpty) None else Some(AviVideo(usPerFrame, w, h, fs))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Decode and project: TRUE (width, height) from the ImageIO
      * decode of the first frame (the `avih` header dims are only a
      * cross-check, never the source of truth — the q101 "metadata
      * lies" discipline), duration = real frame count × header frame
      * timing, and a feature vector folding every decoded frame's
      * Rec.601 luminance (the image formula applied per frame). None
      * unless at least one frame actually decodes. */
    def features(bytes: Array[Byte], dim: Int)
        : Option[(Int, Int, Long, Array[Float])] =
      parseAvi(bytes).flatMap { avi =>
        val out = new Array[Float](dim)
        var w = 0
        var h = 0
        var decoded = 0
        avi.frames.foreach { fb =>
          JdkImageCodec.decode(fb).foreach { img =>
            if (decoded == 0) { w = img.getWidth; h = img.getHeight }
            JdkImageCodec.lumaInto(img, out)
            decoded += 1
          }
        }
        if (decoded == 0) None
        else Some((w, h, avi.frames.length * avi.usPerFrame / 1000L, out))
      }

    /** Wrap JPEG frames in a minimal canonical MJPEG/AVI container
      * (RIFF → hdrl(avih, strl(strh 'vids'/'MJPG', strf)) → movi of
      * `00dc` chunks) — the encode side of the codec, and how the
      * harness manufactures REAL decodable video payloads from
      * deterministic frames. */
    def aviWrap(frames: Seq[Array[Byte]], usPerFrame: Long,
                width: Int, height: Int): Array[Byte] = {
      def bb(n: Int) = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(s: String) = s.getBytes("US-ASCII")
      def chunk(id: String, body: Array[Byte]): Array[Byte] =
        bb(8 + body.length + (body.length & 1))
          .put(fcc(id)).putInt(body.length).put(body).array()
      def list(lt: String, children: Array[Byte]*): Array[Byte] = {
        val body = children.foldLeft(Array.emptyByteArray)(_ ++ _)
        bb(12 + body.length).put(fcc("LIST")).putInt(4 + body.length)
          .put(fcc(lt)).put(body).array()
      }
      val avih = bb(56).putInt(usPerFrame.toInt).putInt(0).putInt(0)
        .putInt(0).putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height).array() // 4 reserved ints stay 0
      val strh = bb(56).put(fcc("vids")).put(fcc("MJPG"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(usPerFrame.toInt).putInt(1000000) // fps = rate/scale
        .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort).array()
      val strf = bb(40).putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24).put(fcc("MJPG"))
        .putInt(width * height * 3).array() // trailing 4 ints stay 0
      val hdrl = list("hdrl", chunk("avih", avih),
        list("strl", chunk("strh", strh), chunk("strf", strf)))
      val movi = list("movi", frames.map(chunk("00dc", _)): _*)
      val body = fcc("AVI ") ++ hdrl ++ movi
      bb(8 + body.length).put(fcc("RIFF")).putInt(body.length)
        .put(body).array()
    }
  }

  // ───────────────────────── stubbed codec ─────────────────────────

  /** STUB decoder — deterministic fake standing in for codecs the JDK
    * cannot express (non-MJPEG video: H.264/VP9 need libraries this
    * environment lacks) and for non-decodable payloads of any kind.
    * Images go through the real [[JdkImageCodec]], WAV/AIFF/AU audio
    * through [[JdkAudioCodec]], MJPEG/AVI video through
    * [[JdkVideoCodec]]. Real implementation: decode `bytes` per
    * `meta.format`; everything distributed about the operator
    * (batching, schema, partitioning) stays identical. */
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
        // video payloads the REAL RIFF/MJPEG path (true first-frame
        // dimensions + frame-count duration); non-decodable bytes
        // fall back to the deterministic stub
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
            case "video" => JdkVideoCodec.features(m.bytes, dim).map {
              case (w, h, durMs, f) => DecodedMedia(m.media_id, m.kind,
                w, h, m.meta.sampleRate, durMs, f)
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
    * flatMap — each media row becomes duration/everyMs frame rows, no
    * shuffle. MJPEG/AVI payloads take the REAL path: true duration
    * from the container (frame count × header timing) and the actual
    * JPEG bytes of the frame covering each sample instant;
    * non-decodable payloads keep the deterministic stub (metadata
    * duration, derived bytes). */
  def frameSample(media: Dataset[MediaRecord], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      JdkVideoCodec.parseAvi(m.bytes) match {
        case Some(avi) if avi.usPerFrame > 0 =>
          val durMs = avi.frames.length * avi.usPerFrame / 1000L
          val n = (durMs / everyMs).toInt
          (0 until n).iterator.map { i =>
            val idx = math.min((i * everyMs * 1000L / avi.usPerFrame).toInt,
              avi.frames.length - 1)
            Frame(m.media_id, i, i * everyMs, avi.frames(idx))
          }
        case _ =>
          val n = (m.meta.durationMs / everyMs).toInt
          (0 until n).iterator.map { i =>
            val start = math.floorMod(i * 257, m.bytes.length.max(1))
            val len = math.min(64, m.bytes.length - start).max(0)
            Frame(m.media_id, i, i * everyMs,
              java.util.Arrays.copyOfRange(m.bytes, start, start + len))
          }
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
