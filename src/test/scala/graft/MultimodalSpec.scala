package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.RawDoc

/** Multimodal plumbing beyond the oracle-checked decode (q25): resize and
  * frame-sample stages — stubbed codec bodies, real Spark shapes (typed
  * mapPartitions / flatMap generators, bounded memory).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def raw = {
    import spark.implicits._
    Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[RawDoc]
  }

  test("decodeImages reads real PNGs from the binaryFile source: width, height, pixel mean") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // write 5 grayscale PNGs with known dimensions and a deterministic
    // gradient; record the expected mean while painting
    val dir = java.nio.file.Files.createTempDirectory("graft_png").toFile
    val expected = (0 until 5).map { i =>
      val (w, h) = (8 + i, 5 + i)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      var sum = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 31 + y * 17 + i * 7) % 256
        img.getRaster.setSample(x, y, 0, v)
        sum += v
      }
      val f = new java.io.File(dir, s"img_$i.png")
      assert(javax.imageio.ImageIO.write(img, "png", f))
      f.getName -> (w.toLong, h.toLong, sum / (w * h))
    }.toMap

    val files = spark.read.format("binaryFile")
      .load(dir.getAbsolutePath + "/*.png")
      .select(col("path"), col("content")).as[Multimodal.ImageFile]
    val got = Multimodal.decodeImages(files).collect()
    assert(got.length == expected.size)
    got.foreach { m =>
      val name = m.path.substring(m.path.lastIndexOf('/') + 1)
      val (w, h, mean) = expected(name)
      assert(m.width == w && m.height == h, s"$name dims")
      assert(math.abs(m.mean_pixel - mean) < 1e-9, s"$name mean")
    }
  }

  test("decodeBase64Png decodes the reference's base64-PNG payload shape") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // one 4x3 image, all pixels 200 -> mean exactly 200.0
    val img = new BufferedImage(4, 3, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 3; x <- 0 until 4) img.getRaster.setSample(x, y, 0, 200)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val b64 = java.util.Base64.getEncoder.encodeToString(baos.toByteArray)

    val payloads = Seq((7L, b64)).toDF("vec_id", "image_base64")
    val got = Multimodal.decodeBase64Png(spark, payloads, "vec_id", "image_base64").collect()
    assert(got.length == 1)
    assert(got.head.path == "7" && got.head.width == 4 && got.head.height == 3)
    assert(math.abs(got.head.mean_pixel - 200.0) < 1e-9)
  }

  test("resizeTo caps every payload at w*h bytes with declared dimensions") {
    import spark.implicits._
    val out = Multimodal.resizeTo(raw, 8, 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.width == 8 && r.height == 4)
      assert(r.data.length <= 32 && r.data.length > 0)
    }
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeTo(raw, 8, 4).collect()
    assert(out.map(_.data.toSeq).toSeq == again.map(_.data.toSeq).toSeq)
  }

  test("pixel normalize and channel triple match the reference arithmetic") {
    import spark.implicits._
    val px = Seq((1L, Seq(0, 128, 255))).toDF("id", "pix")
    val out = px.select(
      Multimodal.normalizePixels(col("pix")).as("norm"),
      Multimodal.channelTriple(col("pix")).as("rgb")).head()
    assert(out.getSeq[Double](0) == Seq(0.0, 128.0 / 255.0, 1.0))
    assert(out.getSeq[Int](1) == Seq(0, 0, 0, 128, 128, 128, 255, 255, 255))
  }

  test("empty payloads decode to defined rows, never task failures") {
    import spark.implicits._
    // a zero-length blob and a normal one through every stubbed codec stage
    val docs = Seq(RawDoc(1L, Array.emptyByteArray), RawDoc(2L, "ab".getBytes("UTF-8"))).toDS()

    val decoded = docs.mapPartitions(_.map(Multimodal.decodeStub)).collect().sortBy(_.doc_id)
    assert(decoded(0) == Multimodal.DecodedMeta(1L, 0L, 1L, 1L, 0.0)) // defined, not NaN/AIOOBE
    assert(decoded(1).n_bytes == 2L && !decoded(1).mean_byte.isNaN)

    val resized = Multimodal.resizeTo(docs, 8, 4).collect().sortBy(_.doc_id)
    assert(resized(0).data.isEmpty && resized(0).width == 8L && resized(0).height == 4L)

    val frames = Multimodal.sampleFrames(docs, frameBytes = 16, stride = 2).collect()
    assert(frames.isEmpty) // both payloads are shorter than one frame — zero rows, zero errors
  }

  test("token/text operators are defined on zero-length text") {
    import spark.implicits._
    val docs = Seq((1L, "", "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("graft_empty_docs")
    val tc = docs.select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("n_ws"),
      size(org.apache.spark.sql.functions.regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("long").as("n_re"))
      .head()
    assert(tc.getLong(1) == 1L && tc.getLong(2) == 0L) // split("") -> [""]: defined, documented
    // the q25 decode path on an empty-text row (cast to zero-length binary)
    val meta = docs.select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[RawDoc].mapPartitions(_.map(Multimodal.decodeStub)).head()
    assert(meta == Multimodal.DecodedMeta(1L, 0L, 1L, 1L, 0.0))
  }

  test("sampleFrames emits every stride-th fixed-size frame") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(raw, frameBytes = 16, stride = 2)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    val lens = raw.collect().map(d => d.doc_id -> d.data.length).toMap
    byDoc.foreach { case (id, fs) =>
      val expected = (0 until lens(id) / 16 by 2).map(_.toLong)
      assert(fs.map(_.frame_no).sorted.toSeq == expected)
      fs.foreach(f => assert(f.frame.length == 16))
    }
  }

  test("resizeDecoded resamples ACTUAL decoded PNGs: known pixels land at floor-index positions") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // one 4x4 grayscale PNG with pixel (x,y) = 16y + x — downsample to 2x2
    // keeps (0,0),(2,0),(0,2),(2,2) = 0, 2, 32, 34
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4) img.getRaster.setSample(x, y, 0, 16 * y + x)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val files = Seq(Multimodal.ImageFile("mem://a.png", baos.toByteArray)).toDS()

    val out = Multimodal.resizeDecoded(files, w = 2, h = 2).head()
    assert(out.width == 2L && out.height == 2L)
    // decode the emitted PNG and read the resampled pixels back
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.png))
    assert(dec.getWidth == 2 && dec.getHeight == 2)
    val got = for (y <- 0 until 2; x <- 0 until 2) yield dec.getRaster.getSample(x, y, 0)
    assert(got == Seq(0, 2, 32, 34), s"got $got")

    // upsample path: 4x4 -> 8x8 repeats each source pixel in a 2x2 block
    val up = Multimodal.resizeDecoded(files, w = 8, h = 8).head()
    val dec8 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up.png))
    assert(dec8.getRaster.getSample(1, 1, 0) == 0 && dec8.getRaster.getSample(7, 7, 0) == 51)

    // palette-indexed PNG: raw samples are palette INDICES, not colors —
    // the canonicalization must convert through the color model, so the
    // resized image carries the palette's COLORS, not re-mapped indices
    val pal = new java.awt.image.IndexColorModel(8, 2,
      Array[Byte](10, 200.toByte), Array[Byte](20, 100), Array[Byte](30, 50))
    val idx = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_INDEXED, pal)
    for (y <- 0 until 4; x <- 0 until 4) idx.getRaster.setSample(x, y, 0, (x + y) % 2)
    val pbaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(idx, "png", pbaos)
    val pres = Multimodal.resizeDecoded(
      Seq(Multimodal.ImageFile("mem://pal.png", pbaos.toByteArray)).toDS(), w = 2, h = 2).head()
    val pdec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pres.png))
    // out(0,0) = src(0,0) = palette entry 0 = RGB(10,20,30); out(1,0) = src(2,0) = entry 0 too;
    // out(0,1) = src(0,2) = entry 0; src(1,1)-style odd positions never sampled at stride 2
    assert((pdec.getRGB(0, 0) & 0xffffff) == ((10 << 16) | (20 << 8) | 30),
      f"palette colors must survive the resize, got ${pdec.getRGB(0, 0)}%08x")
  }

  test("pixelResize is REAL nearest-neighbor resampling through the PNG codec") {
    import spark.implicits._
    // integer scale: 4x4 frame of bytes 0..15 halved to 2x2 keeps pixels
    // at even (x,y): out = [src(0,0), src(2,0), src(0,2), src(2,2)]
    val sq = Seq(RawDoc(1L, Array.tabulate(16)(_.toByte))).toDS()
    val half = Multimodal.pixelResize(sq, srcW = 4, srcH = 4, w = 2, h = 2).head()
    assert(half.width == 2L && half.height == 2L)
    assert(half.data.toSeq == Seq[Byte](0, 2, 8, 10))

    // non-integer scale (3x3 -> 2x2) exercises the floor index math:
    // sx = ox*3/2 in {0, 1}, sy likewise -> [src(0,0), src(1,0), src(0,1), src(1,1)]
    val tri = Seq(RawDoc(2L, Array.tabulate(9)(_.toByte))).toDS()
    val down = Multimodal.pixelResize(tri, srcW = 3, srcH = 3, w = 2, h = 2).head()
    assert(down.data.toSeq == Seq[Byte](0, 1, 3, 4))

    // a payload shorter than the frame fills cyclically: pixel i = byte i mod len
    val cyc = Seq(RawDoc(3L, Array[Byte](10, 20, 30))).toDS()
    val c = Multimodal.pixelResize(cyc, srcW = 2, srcH = 2, w = 2, h = 2).head()
    assert(c.data.toSeq == Seq[Byte](10, 20, 30, 10))

    // empty payload: defined empty frame, not a task failure
    val empty = Seq(RawDoc(4L, Array.emptyByteArray)).toDS()
    val e = Multimodal.pixelResize(empty, srcW = 4, srcH = 4, w = 2, h = 2).head()
    assert(e.data.isEmpty && e.width == 2L && e.height == 2L)

    // upsample (2x2 -> 4x4) repeats source pixels: out(x,y) = src(x/2, y/2)
    val up2 = Multimodal.pixelResize(
      Seq(RawDoc(5L, Array[Byte](1, 2, 3, 4))).toDS(), srcW = 2, srcH = 2, w = 4, h = 4).head()
    assert(up2.data.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("pngPcaEncoder embeds RGB, RGBA and palette encodings of the same image identically") {
    // ADVICE r10: the grayscale mean must ignore the alpha band (RGBA ==
    // RGB for the same colors) and must resolve palette INDICES to their
    // sRGB entries, not read them as intensities. Same 8x8 pixel field
    // encoded three ways -> byte-identical embeddings.
    import java.awt.image.{BufferedImage, IndexColorModel}
    val W = 8; val H = 8
    val palette = Array(0x102030, 0x405060, 0x708090, 0xa0b0c0)
    def colorAt(x: Int, y: Int): Int = palette((x + y * 3) % 4)

    val rgb = new BufferedImage(W, H, BufferedImage.TYPE_3BYTE_BGR)
    val rgba = new BufferedImage(W, H, BufferedImage.TYPE_INT_ARGB)
    val r = palette.map(c => ((c >> 16) & 0xff).toByte)
    val g = palette.map(c => ((c >> 8) & 0xff).toByte)
    val b = palette.map(c => (c & 0xff).toByte)
    val indexed = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_INDEXED,
      new IndexColorModel(8, 4, r, g, b))
    for (y <- 0 until H; x <- 0 until W) {
      val c = colorAt(x, y)
      rgb.setRGB(x, y, 0xff000000 | c)
      // varying, sometimes-translucent alpha: it must not leak into the mean
      rgba.setRGB(x, y, (((x * 31 + y * 7) % 256) << 24) | c)
      indexed.getRaster.setSample(x, y, 0, (x + y * 3) % 4)
    }
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos)); bos.toByteArray
    }
    // 2-component artifact: mean-of-all + an alternating contrast row
    val art = java.nio.file.Files.createTempDirectory("graft_codec_inv").resolve("eigen.csv")
    val row0 = Array.fill(W * H)("1.0").mkString(",")
    val row1 = Array.tabulate(W * H)(i => if (i % 2 == 0) "1.0" else "-1.0").mkString(",")
    java.nio.file.Files.write(art, s"$row0\n$row1".getBytes("UTF-8"))
    val enc = Multimodal.pngPcaEncoder(art.toString, W, H)()
    val Seq(eRgb, eRgba, eIdx) = Seq(rgb, rgba, indexed).map(i => enc(png(i)).toSeq)
    assert(eRgb == eRgba, s"RGBA must embed exactly as RGB: $eRgb vs $eRgba")
    assert(eRgb == eIdx, s"palette must resolve to sRGB entries: $eRgb vs $eIdx")
    // and the values are the actual color means, not palette indices
    val expected0 = (for (y <- 0 until H; x <- 0 until W) yield {
      val c = colorAt(x, y)
      (((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)) / 3.0f / 255.0f
    }).sum
    assert(math.abs(eRgb.head - expected0) < 1e-3, s"${eRgb.head} vs $expected0")
  }
}
