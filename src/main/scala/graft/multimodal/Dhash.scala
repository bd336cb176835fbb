package graft.multimodal

/** 64-bit difference-hash (dHash) perceptual image fingerprint — the
  * pixel-content dedup signal an LLM data pipeline uses to catch re-encoded /
  * resized / brightness-shifted copies of the same image that byte-level
  * digests (md5) can never pair.
  *
  * The classic recipe (Krawetz's dHash): downscale to a 9×8 grayscale grid,
  * then emit one bit per horizontally-adjacent cell pair — bit set iff the
  * right cell is brighter than the left. The hash depends only on the
  * DIRECTION of local luminance gradients, so global brightness/contrast
  * shifts and resampling leave it (nearly) unchanged, while different images
  * land ~32 bits apart. Duplicate detection is then Hamming distance over
  * the 64-bit codes.
  *
  * Determinism is load-bearing here (the DuckDB oracle and the
  * repartitioning-invariance spec both demand bit-equality), so every step
  * is integer arithmetic with floor boundaries:
  *
  *  - the downscale is an exact integer AREA AVERAGE over floor-partitioned
  *    pixel blocks — no `Graphics2D` float resampling (whose kernel choice is
  *    platform/JVM dependent);
  *  - grayscale is integer Rec.601 luma `(299R + 587G + 114B) / 1000`;
  *  - non-image payloads (no ImageIO reader claims the magic bytes — e.g.
  *    the fixture's utf-8 text payloads — or a corrupt header) take the
  *    deterministic [[stubGrid]] byte-slice path, which DuckDB can replay
  *    exactly, keeping the whole operator oracle-checkable end-to-end while
  *    the real pixel path is pinned by generated-PNG specs.
  */
object Dhash {

  /** Grid is 9 columns × 8 rows → 8 comparisons per row → 64 bits. */
  val GridW = 9
  val GridH = 8
  val Cells: Int = GridW * GridH // 72

  // The default ImageIO disk-scratch cache would create/delete a temp file
  // per decoded record on the executor hot path; force the in-memory cache
  // once per JVM (idempotent, shared with Multimodal.decode's own guard).
  @volatile private var memCacheSet = false
  private def ensureMemCache(): Unit =
    if (!memCacheSet) { javax.imageio.ImageIO.setUseCache(false); memCacheSet = true }

  /** Integer Rec.601 luma of a packed sRGB pixel, on the 0..255 grid. */
  private def luma(rgb: Int): Long = {
    val r = (rgb >>> 16) & 0xff
    val g = (rgb >>> 8) & 0xff
    val b = rgb & 0xff
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  /** 9×8 grayscale grid from decoded pixels: exact integer area-average of
    * luma over each cell's floor-partitioned pixel block. A degenerate image
    * dimension (< grid dimension) clamps each block to ≥ 1 pixel.
    */
  def imageGrid(img: java.awt.image.BufferedImage): Array[Int] =
    imageGridAt(img, GridW, GridH)

  /** [[imageGrid]] at an arbitrary `gw`×`gh` grid — the shared integer
    * area-average downscale kernel (also the thumbnail resizer in
    * [[MediaTransforms]]). Row-major output, cell `(r, c)` at `r*gw + c`.
    */
  def imageGridAt(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](gw * gh)
    var r = 0
    while (r < gh) {
      val y0 = math.min((r.toLong * h / gh).toInt, h - 1)
      val y1 = math.max(y0 + 1, ((r + 1).toLong * h / gh).toInt)
      var c = 0
      while (c < gw) {
        val x0 = math.min((c.toLong * w / gw).toInt, w - 1)
        val x1 = math.max(x0 + 1, ((c + 1).toLong * w / gw).toInt)
        var s = 0L
        var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) { s += luma(img.getRGB(x, y)); n += 1; x += 1 }
          y += 1
        }
        out(r * gw + c) = if (n == 0) 0 else (s / n).toInt
        c += 1
      }
      r += 1
    }
    out
  }

  /** Deterministic grid for NON-image payloads: cell k = integer mean of the
    * unsigned bytes in the k-th of 72 equal floor-partitioned slices (an
    * empty slice — payload shorter than the grid — reads the single byte at
    * its clamped start offset; empty payload → all-zero grid). Pure integer
    * arithmetic over byte values, so the DuckDB oracle replays it exactly
    * over `ord()` of the fixture's ASCII payload characters.
    */
  def stubGrid(payload: Array[Byte]): Array[Int] = stubCells(payload, Cells)

  /** [[stubGrid]] at an arbitrary cell count — the shared 1-D byte-slice
    * downscale for non-image payloads (also [[MediaTransforms]]' stub
    * thumbnail path).
    */
  def stubCells(payload: Array[Byte], cells: Int): Array[Int] = {
    val out = new Array[Int](cells)
    val n = if (payload == null) 0 else payload.length
    if (n == 0) return out
    var k = 0
    while (k < cells) {
      val from = (k.toLong * n / cells).toInt
      val until = ((k + 1).toLong * n / cells).toInt
      if (until <= from) out(k) = payload(math.min(from, n - 1)) & 0xff
      else {
        var s = 0L
        var j = from
        while (j < until) { s += payload(j) & 0xff; j += 1 }
        out(k) = (s / (until - from)).toInt
      }
      k += 1
    }
    out
  }

  /** Bit `r*8 + c` of the hash is set iff `grid(r, c+1) > grid(r, c)`. */
  def fromGrid(g: Array[Int]): Long = {
    var out = 0L
    var r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        if (g(r * GridW + c + 1) > g(r * GridW + c)) out |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Grayscale grid for any payload: full pixel decode when an ImageIO
    * reader claims the bytes (PNG/JPEG/BMP/GIF/TIFF via the JDK readers),
    * [[stubGrid]] otherwise (including claimed-but-corrupt payloads).
    */
  def grid(payload: Array[Byte]): Array[Int] = {
    if (payload == null || payload.isEmpty) return new Array[Int](Cells)
    ensureMemCache()
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) stubGrid(payload) else imageGrid(img)
  }

  /** The 64-bit dHash of a binary payload — the [[graft.functions.DHash64]]
    * expression's kernel (called from generated code, hence total:
    * never throws, null/empty → 0L grid → hash of a flat image).
    */
  def hash(payload: Array[Byte]): Long = fromGrid(grid(payload))
}
