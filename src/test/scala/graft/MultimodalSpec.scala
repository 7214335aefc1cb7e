package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps
import graft.multimodal.MediaOps.{MediaMeta, MediaRecord}

class MultimodalSpec extends SparkSpec {

  private def sample(): Seq[MediaRecord] = Seq(
    MediaRecord(1, "image", Array.tabulate(300)(_.toByte),
      MediaMeta("png", 640, 480, 0, 0)),
    MediaRecord(2, "video", Array.tabulate(5000)(i => (i * 7).toByte),
      MediaMeta("mp4", 1920, 1080, 0, 4500)),
    MediaRecord(3, "audio", Array.tabulate(800)(i => (i * 3).toByte),
      MediaMeta("wav", 0, 0, 16000, 2000)))

  test("decode: batched mapPartitions yields one fixed-dim vector per row") {
    import spark.implicits._
    val ds = spark.createDataset(sample()).repartition(2)
    val out = MediaOps.decode(ds, dim = 16, batchSize = 2).collect()
    assert(out.length === 3)
    assert(out.forall(_.features.length === 16))
    // determinism: same bytes -> same features
    val again = MediaOps.decode(spark.createDataset(sample()), dim = 16).collect()
    assert(out.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("resize touches only images and rewrites metadata") {
    import spark.implicits._
    val out = MediaOps.resize(spark.createDataset(sample()), 100, 50)
      .collect().sortBy(_.media_id)
    assert(out(0).meta.width === 100 && out(0).meta.height === 50)
    assert(out(1).meta.width === 1920, "video must be untouched")
    assert(out(2).meta === sample()(2).meta)
  }

  test("frameSample explodes video into ts-stamped frames") {
    import spark.implicits._
    val frames = MediaOps.frameSample(spark.createDataset(sample()), 1000)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 4) // 4500ms / 1000
    assert(frames.map(_.media_id).distinct.toSeq === Seq(2L))
    assert(frames.map(_.frame_ts_ms).toSeq === Seq(0L, 1000L, 2000L, 3000L))
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("embed output plugs into the cosine similarity surface") {
    import spark.implicits._
    val emb = MediaOps.embed(spark.createDataset(sample()), dim = 8)
    val joined = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.similarity.VectorFunctions.cosine(
          col("a.embedding"), col("b.embedding")).as("cos"))
      .collect()
    assert(joined.length === 3)
    assert(joined.forall(r => !r.isNullAt(2) && math.abs(r.getDouble(2)) <= 1.000001))
  }

  test("media near-dup pairs planted byte-duplicates, not distinct assets") {
    import spark.implicits._
    // asset 10 duplicates asset 1's bytes exactly (identical features,
    // cosine 1.0 — must pair); 2/3 are unrelated payloads
    val ds = spark.createDataset(sample() :+
      MediaRecord(10, "image", Array.tabulate(300)(_.toByte),
        MediaMeta("png", 640, 480, 0, 0)))
    def emb() = MediaOps.embed(ds)
    val pairs = graft.multimodal.MediaQueries
      .mediaNearDupPairs(emb()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1 && p._2 == 10 && p._3 == 1.0),
      s"exact byte-dup must pair at cosine 1.0; got ${pairs.toSeq}")
    assert(!pairs.exists(p => Set(p._1, p._2).subsetOf(Set(1L, 2L, 3L))),
      s"distinct assets must not pair: ${pairs.toSeq}")
    // determinism: the stub features + md5 planes reproduce exactly
    val again = graft.multimodal.MediaQueries
      .mediaNearDupPairs(emb()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === again.toSeq)
  }

  // a real 8x6 PNG with a deterministic gradient pattern, built with
  // the same pure-JDK imaging the codec decodes with
  private def pngBytes(w: Int = 8, h: Int = 6): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31) % 256 << 16) | ((y * 57) % 256 << 8) |
        ((x * y * 13) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decode runs the real JDK codec on PNG payloads") {
    import spark.implicits._
    val bytes = pngBytes()
    // meta deliberately LIES about the dimensions: only a real decode
    // can report the true 8x6 raster
    val ds = spark.createDataset(Seq(
      MediaRecord(7, "image", bytes, MediaMeta("png", 999, 999, 0, 0))))
    val out = MediaOps.decode(ds, dim = 16).collect().head
    assert(out.width === 8 && out.height === 6,
      s"decoded dims must come from the raster, got ${out.width}x${out.height}")
    // features equal a locally recomputed luminance projection of the
    // decoded pixels — the distributed decode IS the real decode
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val exp = new Array[Float](16)
    for (y <- 0 until 6; x <- 0 until 8) {
      val rgb = img.getRGB(x, y)
      val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
      exp((y * 8 + x) % 16) += lum / 255.0f
    }
    assert(out.features.toSeq === exp.toSeq)
    // and it is NOT the stub's output
    assert(!out.features.sameElements(
      MediaOps.DecodeStub.features(bytes, 16)))
    // non-decodable image bytes still fall back to the stub
    val junk = spark.createDataset(Seq(MediaRecord(8, "image",
      Array.tabulate(300)(_.toByte), MediaMeta("png", 640, 480, 0, 0))))
    val fb = MediaOps.decode(junk, dim = 16).collect().head
    assert(fb.width === 640 && fb.features.sameElements(
      MediaOps.DecodeStub.features(Array.tabulate(300)(_.toByte), 16)))
  }

  test("decode runs the real JDK codec on WAV payloads") {
    import spark.implicits._
    // a 440 Hz-ish sine at 8 kHz, 0.25 s — real PCM through a real
    // RIFF header
    val rate = 8000
    val n = rate / 4
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 12000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bytes = MediaOps.JdkAudioCodec.wavWrap(pcm, rate)
    // meta deliberately LIES about rate and duration: only a real
    // header parse can report 8000 Hz / 250 ms
    val ds = spark.createDataset(Seq(
      MediaRecord(9, "audio", bytes, MediaMeta("wav", 0, 0, 44100, 99999L))))
    val out = MediaOps.decode(ds, dim = 16).collect().head
    assert(out.sampleRate === rate, s"true rate expected, got ${out.sampleRate}")
    assert(out.durationMs === 250L, s"true duration expected, got ${out.durationMs}")
    // features equal a locally recomputed |sample| folding of the
    // PCM — the distributed decode IS the real decode
    val exp = new Array[Float](16)
    for (i <- 0 until n) {
      val s = (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort
      exp(i % 16) += math.abs(s.toInt) / 32768.0f
    }
    assert(out.features.toSeq === exp.toSeq)
    // and it is NOT the stub's output
    assert(!out.features.sameElements(MediaOps.DecodeStub.features(bytes, 16)))
    // non-decodable audio bytes still fall back to the stub (and the
    // declared metadata)
    val junk = spark.createDataset(Seq(MediaRecord(10, "audio",
      Array.tabulate(800)(i => (i * 3).toByte),
      MediaMeta("wav", 0, 0, 16000, 2000))))
    val fb = MediaOps.decode(junk, dim = 16).collect().head
    assert(fb.sampleRate === 16000 && fb.durationMs === 2000L &&
      fb.features.sameElements(MediaOps.DecodeStub.features(
        Array.tabulate(800)(i => (i * 3).toByte), 16)))
  }

  test("decode runs the real JDK codec on MJPEG/AVI payloads") {
    import spark.implicits._
    // three real JPEG frames (distinct fills so luma varies) in a real
    // RIFF/AVI container at 20 fps
    val frames = (0 until 3).map { i =>
      val img = new java.awt.image.BufferedImage(10, 7,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(40 * i + 20, 10 * i + 5, 200 - 30 * i))
        g.fillRect(0, 0, 10, 7)
      } finally g.dispose()
      MediaOps.JdkImageCodec.encodeJpg(img)
    }
    val bytes = MediaOps.JdkVideoCodec.aviWrap(frames, usPerFrame = 50000L,
      width = 10, height = 7)
    // meta deliberately LIES about dims and duration: only a real RIFF
    // walk + frame decode can report 10x7 / 150 ms
    val ds = spark.createDataset(Seq(
      MediaRecord(11, "video", bytes, MediaMeta("avi", 999, 999, 0, 77777L))))
    val out = MediaOps.decode(ds, dim = 16).collect().head
    assert(out.width === 10 && out.height === 7,
      s"decoded dims must come from the frames, got ${out.width}x${out.height}")
    assert(out.durationMs === 150L,
      s"duration must be frameCount x header timing, got ${out.durationMs}")
    // features equal a locally recomputed luminance folding over the
    // SAME decoded frame pixels — the distributed decode IS the real
    // decode (JPEG is lossy, so recompute from the encoded frames, not
    // the source rasters)
    val exp = new Array[Float](16)
    frames.foreach { fb =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
      for (y <- 0 until 7; x <- 0 until 10) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        exp((y * 10 + x) % 16) += lum / 255.0f
      }
    }
    assert(out.features.toSeq === exp.toSeq)
    assert(!out.features.sameElements(MediaOps.DecodeStub.features(bytes, 16)))
    // frameSample walks the REAL movi chunks: 50 ms/frame sampled
    // every 50 ms = every frame once, payloads byte-identical to the
    // encoded JPEGs
    val fs = MediaOps.frameSample(ds, everyMs = 50L).collect().sortBy(_.frame_idx)
    assert(fs.length === 3)
    assert(fs.map(_.frame_ts_ms).toSeq === Seq(0L, 50L, 100L))
    fs.zip(frames).foreach { case (f, orig) =>
      assert(f.frame_bytes.sameElements(orig),
        s"frame ${f.frame_idx} must be the original JPEG payload")
    }
    // non-AVI video bytes still fall back to the stub (and the
    // declared metadata) on BOTH paths
    val junkBytes = Array.tabulate(500)(i => (i * 7).toByte)
    val junk = spark.createDataset(Seq(MediaRecord(12, "video",
      junkBytes, MediaMeta("mp4", 640, 480, 0, 200L))))
    val fb2 = MediaOps.decode(junk, dim = 16).collect().head
    assert(fb2.width === 640 && fb2.durationMs === 200L &&
      fb2.features.sameElements(MediaOps.DecodeStub.features(junkBytes, 16)))
    assert(MediaOps.frameSample(junk, everyMs = 100L).collect().length === 2)
  }

  test("resize re-encodes a real PNG at the target raster size") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(7, "image", pngBytes(), MediaMeta("png", 8, 6, 0, 0))))
    val out = MediaOps.resize(ds, 4, 3).collect().head
    assert(out.meta.width === 4 && out.meta.height === 3 &&
      out.meta.format === "png")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.bytes))
    assert(back != null && back.getWidth === 4 && back.getHeight === 3,
      "resized payload must itself be a decodable 4x3 image")
  }

  test("q113 media pair artifact builds once and equals q85") {
    val root = java.nio.file.Files.createTempDirectory("graft-mpi-spec")
    val prev = sys.props.get("graft.artifacts.dir")
    sys.props("graft.artifacts.dir") = root.toString
    try {
      val sf = "/root/testdata/sf0.001"
      val q85 = graft.multimodal.MediaQueries.queries("q85_media_neardup")
        .build(spark, sf).collect()
      val q113 = graft.multimodal.MediaQueries.queries("q113_media_pair_index")
        .build(spark, sf).collect()
      assert(q113.toSeq == q85.toSeq,
        "the artifact read path must reproduce the build path")
      // artifact exists and a second read adds nothing
      val dir = graft.text.Artifacts.dir(sf,
        graft.multimodal.MediaQueries.mediaPairArtifactName)
      assert(java.nio.file.Files.isDirectory(dir))
      val mtime = java.nio.file.Files.getLastModifiedTime(dir)
      assert(graft.multimodal.MediaQueries.queries("q113_media_pair_index")
        .build(spark, sf).collect().toSeq == q85.toSeq)
      assert(java.nio.file.Files.getLastModifiedTime(dir) == mtime,
        "second read must reuse, not rebuild")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.artifacts.dir") = v
        case None    => sys.props.remove("graft.artifacts.dir")
      }
    }
  }

  test("repartitionBySize packs by byte budget") {
    val df = MediaOps.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val packed = MediaOps.repartitionBySize(df, targetBytes = 16 * 1024)
    assert(packed.rdd.getNumPartitions >= 2)
    assert(packed.count() === df.count())
  }
}
