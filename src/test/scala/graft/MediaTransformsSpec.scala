package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Dhash, MediaTransforms, Multimodal}
import graft.multimodal.Multimodal.MediaRecord

class MediaTransformsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("targetDims: aspect-preserving, floor, no upscale, sides >= 1") {
    assert(MediaTransforms.targetDims(20, 30) == ((5, 8)))   // 20*8/30 = 5.33
    assert(MediaTransforms.targetDims(30, 20) == ((8, 5)))
    assert(MediaTransforms.targetDims(5, 3) == ((5, 3)))     // inside the box: untouched
    assert(MediaTransforms.targetDims(8, 8) == ((8, 8)))
    assert(MediaTransforms.targetDims(1000, 1) == ((8, 1)))  // floor-to-zero clamps to 1
    assert(MediaTransforms.targetDims(1, 1000) == ((1, 8)))
  }

  /** Solid-color RGB image encoded as PNG. */
  private def flatPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  /** Left half black, right half white. */
  private def splitPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("real pixel resize: area-average downscale of decoded PNGs") {
    // flat image: every thumb cell is the flat color's Rec.601 luma
    val gray = flatPng(100, 60, 0x808080) // luma (299+587+114)*128/1000 = 128
    val grid = MediaTransforms.resizeGrid(gray, 8, 5)
    assert(grid.length == 40 && grid.forall(_ == 128))
    // split image at even dims: left cells 0, right cells 255
    val split = MediaTransforms.resizeGrid(splitPng(80, 40), 8, 4)
    for (r <- 0 until 4; c <- 0 until 8) {
      val v = split(r * 8 + c)
      assert(if (c < 4) v == 0 else v == 255, s"cell ($r,$c) = $v")
    }
    // resolution invariance of the kernel: the same split pattern at 2x
    // resolution downsamples to the identical thumb grid
    assert(MediaTransforms.resizeGrid(splitPng(160, 80), 8, 4).toSeq == split.toSeq)
    // non-image payloads take the deterministic byte-slice path
    val txt = "0123456789abcdef".getBytes("UTF-8")
    assert(MediaTransforms.resizeGrid(txt, 4, 2).toSeq == Dhash.stubCells(txt, 8).toSeq)
  }

  test("thumbnails: distributed batched pass, real + stub payloads") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "media/img", flatPng(100, 60, 0x808080)),
      MediaRecord(2L, "media/txt", "hello world".getBytes("UTF-8")),
      MediaRecord(3L, "media/img", Array.emptyByteArray)
    ).toDS()
    val t = MediaTransforms.thumbnails(media, batchSize = 2)
      .collect().map(x => x.doc_id -> x).toMap
    assert(t(1L).width == 100 && t(1L).height == 60)
    assert((t(1L).thumb_w, t(1L).thumb_h) == ((8, 4))) // 60*8/100 = 4.8 -> 4
    assert(t(1L).thumb_cells.forall(_ == 128))
    // stub record: dims from decodeStub, cells from stubCells
    val (w2, h2) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(t(2L).width == w2 && t(2L).height == h2)
    assert(t(3L).thumb_cells.forall(_ == 0)) // empty payload: all-zero grid
  }

  test("frame stats: offsets, sums, and the integer scene-change flag") {
    import spark.implicits._
    val payload = ("a" * 100 + "z" * 100).getBytes("UTF-8") // 97 / 122 halves
    val media = Seq(MediaRecord(1L, "media/vid", payload)).toDS()
    val fr = MediaTransforms.frameStats(media).collect().sortBy(_.frame_idx)
    assert(fr.map(_.byte_offset).toSeq == Seq(0L, 50L, 100L, 150L))
    assert(fr.map(_.frame_bytes).toSeq == Seq(50L, 50L, 50L, 50L))
    assert(fr(0).mean_byte == 97.0 && fr(3).mean_byte == 122.0)
    // |122 - 97| = 25 > 16 exactly at the frame-2 boundary
    assert(fr.map(_.scene_change).toSeq == Seq(0, 0, 1, 0))
    // empty payload: four empty frames, no change flags, no crash
    val empty = MediaTransforms.frameStats(
      Seq(MediaRecord(2L, "media/vid", Array.emptyByteArray)).toDS()).collect()
    assert(empty.length == 4 && empty.forall(f =>
      f.frame_bytes == 0 && f.mean_byte == 0.0 && f.scene_change == 0))
  }

  test("audio energy: windowed integer energy, silence, first-tie argmax") {
    import spark.implicits._
    val silent = Array.fill[Byte](256)(128.toByte)      // (128-128)^2 = 0
    val loud = Array.fill[Byte](256)(0.toByte)          // 128^2 * 256
    val media = Seq(
      MediaRecord(1L, "media/aud", silent ++ loud),
      MediaRecord(2L, "media/aud", loud ++ loud),       // tie: first window wins
      MediaRecord(3L, "media/aud", Array.emptyByteArray)
    ).toDS()
    val e = MediaTransforms.audioEnergy(media).collect().map(x => x.doc_id -> x).toMap
    val wE = 128L * 128L * 256L
    assert(e(1L).n_windows == 2 && e(1L).total_energy == wE)
    assert(e(1L).peak_window == 1 && e(1L).peak_energy == wE)
    assert(e(1L).silent_windows == 1)
    assert(e(2L).peak_window == 0 && e(2L).total_energy == 2 * wE)
    assert(e(3L).n_windows == 0 && e(3L).peak_window == -1 && e(3L).total_energy == 0)
  }
}
