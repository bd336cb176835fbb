package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("binary payload plumbing: schema, batching, deterministic features") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "media/img", "hello world".getBytes("UTF-8")),
      MediaRecord(2L, "media/img", Array.emptyByteArray),
      MediaRecord(3L, "media/aud", ("x" * 1000).getBytes("UTF-8"))
    ).toDS()
    val feats = Multimodal.extractFeatures(media, nFrames = 4, batchSize = 2)
      .collect().map(f => f.doc_id -> f).toMap

    val f1 = feats(1L)
    assert(f1.n_bytes == 11)
    assert(f1.width == 64 + 11 % 193 && f1.height == 64 + (11 * 31) % 149)
    assert(f1.frame_checksums.length == 4)
    // deterministic: recomputing yields identical values
    val again = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(again(1L) == f1)

    val f2 = feats(2L) // empty payload: all-zero features, no crash
    assert(f2.n_bytes == 0 && f2.entropy == 0.0 && f2.frame_checksums.forall(_ == 0L))

    val f3 = feats(3L) // single-symbol payload: zero entropy, mean = 'x'
    assert(f3.entropy == 0.0 && f3.mean_byte == 'x'.toInt.toDouble)
  }

  test("media features over the fixture documents run distributed") {
    val out = Multimodal.extractFeatures(Multimodal.mediaDataset(spark, TestSession.sf))
    assert(out.count() == 500)
  }

  /** JDK-only image fixture: encode a blank w×h image to `fmt` bytes. */
  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("real image payloads decode header dimensions; non-images fall back to stub") {
    import spark.implicits._
    val png = imageBytes(20, 30, "png")
    val bmp = imageBytes(7, 5, "bmp")
    val jpg = imageBytes(33, 17, "jpg")
    val txt = "not an image at all".getBytes("UTF-8")
    // the decode function itself
    assert(Multimodal.decode(png) == ((20, 30)))
    assert(Multimodal.decode(bmp) == ((7, 5)))
    assert(Multimodal.decode(jpg) == ((33, 17)))
    assert(Multimodal.decode(txt) == Multimodal.decodeStub(txt))
    // corrupt header: PNG magic but truncated body → stub fallback, no crash
    val corrupt = png.take(12)
    assert(Multimodal.decode(corrupt) == Multimodal.decodeStub(corrupt))
    // and through the distributed batched extractor
    val media = Seq(
      MediaRecord(1L, "media/img", png),
      MediaRecord(2L, "media/img", bmp),
      MediaRecord(3L, "media/txt", txt)
    ).toDS()
    val feats = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(feats(1L) == ((20, 30)) && feats(2L) == ((7, 5)))
    assert(feats(3L) == Multimodal.decodeStub(txt))
  }
}
