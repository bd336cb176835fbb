package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Media TRANSFORM plumbing (north-star extension): the per-asset
  * preprocessing steps a multimodal training pipeline runs between ingest
  * and dedup/featurization — thumbnail resize, video-style frame sampling
  * with scene-change detection, and audio-style windowed energy / silence
  * profiling. Companions to [[Multimodal]]'s decode/feature/near-dup ops.
  *
  * Same stub discipline as the rest of the module: the IMAGE pixel path is
  * REAL (ImageIO decode → the integer area-average downscale shared with
  * [[Dhash.imageGridAt]], spec-pinned on generated PNGs); audio/video
  * decode — for which this container has no codecs — is the documented
  * deterministic byte-level interpretation (bytes AS unsigned samples /
  * floor-partitioned byte slices AS frames), which keeps every op
  * oracle-checkable end-to-end while the plumbing (binary schema, batched
  * `mapPartitions`, output grain) is exactly what a real codec would slot
  * into.
  *
  * Scale: every op is a narrow map over the media scan — payloads never
  * shuffle; outputs are doc-grain (resize, audio) or 4-rows-per-doc (frames).
  * Scene-change and silence flags are INTEGER cross-multiplied comparisons,
  * never float thresholds, so results are partitioning- and engine-invariant.
  */
object MediaTransforms {

  /** Thumbnail bounding box (max side, no upscale). Deliberately tiny — the
    * embedder-input / near-dup-grid size; the kernel is resolution-agnostic.
    */
  val ThumbMaxSide = 8

  /** Frames sampled per payload (the video frame-sample shape). */
  val FrameCount = 4

  /** Audio window: 256 byte-samples per energy window. */
  val AudioWindow = 256

  /** A window is silent when its mean square amplitude < this. */
  val SilenceMeanSq = 100L

  /** Scene change: adjacent frame mean bytes differ by more than this. */
  val SceneDeltaMean = 16L

  final case class MediaThumb(
      doc_id: Long, width: Int, height: Int,
      thumb_w: Int, thumb_h: Int, thumb_cells: Seq[Int])

  final case class FrameStat(
      doc_id: Long, frame_idx: Int, byte_offset: Long, frame_bytes: Long,
      byte_sum: Long, mean_byte: Double, scene_change: Int)

  final case class AudioEnergy(
      doc_id: Long, n_samples: Long, n_windows: Long, total_energy: Long,
      peak_energy: Long, peak_window: Long, silent_windows: Long)

  /** Aspect-preserving integer target dims: fit (w, h) inside a
    * `maxSide`-square, floor division, never upscale, each side ≥ 1.
    */
  def targetDims(w: Int, h: Int, maxSide: Int = ThumbMaxSide): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxSide) (w, h)
    else (math.max(1, (w.toLong * maxSide / m).toInt),
      math.max(1, (h.toLong * maxSide / m).toInt))
  }

  /** Downscaled grayscale content at (gw, gh): real pixel decode → the
    * integer area-average kernel ([[Dhash.imageGridAt]]) when an ImageIO
    * reader claims the bytes; the deterministic 1-D byte-slice grid
    * ([[Dhash.stubCells]]) otherwise. Row-major, values 0..255.
    */
  def resizeGrid(payload: Array[Byte], gw: Int, gh: Int): Array[Int] = {
    if (payload == null || payload.isEmpty) return new Array[Int](gw * gh)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) Dhash.stubCells(payload, gw * gh)
    else Dhash.imageGridAt(img, gw, gh)
  }

  /** Batched thumbnail pass: decode dims, compute the aspect-preserving
    * target, downscale. One narrow map; payloads never shuffle. Image
    * payloads are pixel-decoded ONCE — dims and the grid come from the same
    * `BufferedImage` (no separate header probe); non-images take the stub
    * dims + byte-slice grid.
    */
  def thumbnails(media: Dataset[Multimodal.MediaRecord],
      maxSide: Int = ThumbMaxSide, batchSize: Int = 64): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup (codec/scaler init) happens here, once per batch
        batch.iterator.map { r =>
          val p = if (r.payload == null) Array.emptyByteArray else r.payload
          val img =
            if (p.isEmpty) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
              catch { case _: Exception => null }
          val (w, h) =
            if (img != null) (img.getWidth, img.getHeight)
            else Multimodal.decodeStub(p)
          val (tw, th) = targetDims(w, h, maxSide)
          val cells =
            if (img != null) Dhash.imageGridAt(img, tw, th)
            else if (p.isEmpty) new Array[Int](tw * th)
            else Dhash.stubCells(p, tw * th)
          MediaThumb(r.doc_id, w, h, tw, th, cells.toIndexedSeq)
        }
      }
    }
  }

  /** Even frame sampling with scene-change detection: payload split into
    * [[FrameCount]] floor-partitioned slices; per frame its offset, length,
    * byte sum and mean; `scene_change` = 1 when the mean jumps more than
    * [[SceneDeltaMean]] vs the previous frame — compared exactly via integer
    * cross-multiplication (|s·pb − ps·b| > Δ·b·pb), so an empty frame never
    * triggers and no float threshold enters the result.
    */
  def frameStats(media: Dataset[Multimodal.MediaRecord],
      nFrames: Int = FrameCount, batchSize: Int = 64): Dataset[FrameStat] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val p = if (r.payload == null) Array.emptyByteArray else r.payload
          val n = p.length.toLong
          var prevBytes = 0L
          var prevSum = 0L
          (0 until nFrames).map { k =>
            val from = k * n / nFrames
            val until = (k + 1) * n / nFrames
            val fb = until - from
            var s = 0L
            var j = from
            while (j < until) { s += p(j.toInt) & 0xff; j += 1 }
            val mean = if (fb == 0) 0.0 else s.toDouble / fb
            val change =
              if (k > 0 && math.abs(s * prevBytes - prevSum * fb) >
                SceneDeltaMean * fb * prevBytes) 1 else 0
            prevBytes = fb
            prevSum = s
            FrameStat(r.doc_id, k, from, fb, s, mean, change)
          }
        }
      }
    }
  }

  /** Windowed energy profile, payload bytes as unsigned samples centered at
    * 128 (the PCM-u8 convention — a real audio decoder would produce exactly
    * this shape): per [[AudioWindow]]-sample window the integer energy
    * Σ(b−128)²; doc-grain totals, argmax window (first on ties), and the
    * silent-window count (mean square < [[SilenceMeanSq]], compared as
    * energy < threshold·window_len — integers only).
    */
  def audioEnergy(media: Dataset[Multimodal.MediaRecord],
      window: Int = AudioWindow, batchSize: Int = 64): Dataset[AudioEnergy] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val p = if (r.payload == null) Array.emptyByteArray else r.payload
          val n = p.length
          val nw = (n + window - 1) / window
          var total = 0L
          var peak = 0L
          var peakIdx = -1L
          var silent = 0L
          var k = 0
          while (k < nw) {
            val from = k * window
            val until = math.min(from + window, n)
            var e = 0L
            var j = from
            while (j < until) {
              val d = (p(j) & 0xff) - 128L
              e += d * d
              j += 1
            }
            total += e
            if (peakIdx < 0 || e > peak) { peak = e; peakIdx = k }
            if (e < SilenceMeanSq * (until - from)) silent += 1
            k += 1
          }
          AudioEnergy(r.doc_id, n.toLong, nw.toLong, total,
            if (peakIdx < 0) 0L else peak, peakIdx, silent)
        }
      }
    }
  }

  // --------------------------------------------------------------------------
  // Registered ops
  // --------------------------------------------------------------------------

  /** Shared oracle CTE: per-doc byte values + length (fixture payloads are
    * the documents' ASCII text, so `ord(char)` == byte — the
    * [[Multimodal]] convention).
    */
  private val byteCtes =
    """d AS (SELECT doc_id, list_transform(string_split(text,''), x -> ord(x)) AS o,
      |             octet_length(encode(text)) AS n
      |      FROM documents)""".stripMargin

  def ops: Seq[Op] = Seq(
    // Aspect-preserving thumbnail: source dims (stub path — closed form of
    // n), target dims, and the md5 digest of the downscaled grid. The oracle
    // replays the stub byte-slice downscale exactly (the dhash-grid pattern
    // at a per-doc variable cell count); the real pixel downscale is pinned
    // by MediaTransformsSpec on generated PNGs, where DuckDB can't follow.
    Op.sql("media_resize",
      s"""WITH $byteCtes,
         |dims AS (SELECT doc_id, o, n,
         |                64 + (n % 193) AS w, 64 + ((n*31) % 149) AS h FROM d),
         |t AS (SELECT doc_id, o, n, w, h,
         |             CASE WHEN GREATEST(w, h) <= $ThumbMaxSide THEN w
         |                  ELSE GREATEST(1, (w*$ThumbMaxSide)//GREATEST(w, h)) END AS tw,
         |             CASE WHEN GREATEST(w, h) <= $ThumbMaxSide THEN h
         |                  ELSE GREATEST(1, (h*$ThumbMaxSide)//GREATEST(w, h)) END AS th
         |      FROM dims),
         |cells AS (SELECT doc_id, w, h, tw, th,
         |            list_transform(generate_series(0, tw*th - 1), k ->
         |              CASE WHEN n = 0 THEN 0
         |                   WHEN ((k+1)*n)//(tw*th) <= (k*n)//(tw*th)
         |                     THEN o[LEAST((k*n)//(tw*th), n-1)+1]
         |                   ELSE CAST(list_sum(o[(k*n)//(tw*th)+1 : ((k+1)*n)//(tw*th)]) AS BIGINT)
         |                        // (((k+1)*n)//(tw*th) - (k*n)//(tw*th)) END) AS cs
         |          FROM t)
         |SELECT doc_id, w AS width, h AS height, tw AS thumb_w, th AS thumb_h,
         |       md5(array_to_string(cs, ',')) AS thumb_digest
         |FROM cells""".stripMargin) { (s, d) =>
      thumbnails(Multimodal.mediaDataset(s, d)).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("thumb_w"), col("thumb_h"),
          md5(concat_ws(",", transform(col("thumb_cells"), _.cast("string"))))
            .as("thumb_digest"))
    },

    // Video-style frame sampling: 4 floor-partitioned frames per payload
    // with offsets, sizes, integer byte sums and the cross-multiplied
    // scene-change flag; one IEEE division per mean (both engines divide
    // the same integers — the media_features_meta precedent).
    Op.sql("media_frame_stats",
      s"""WITH $byteCtes,
         |fr AS (SELECT doc_id, k AS frame_idx,
         |              (k*n)//$FrameCount AS byte_offset,
         |              ((k+1)*n)//$FrameCount - (k*n)//$FrameCount AS frame_bytes,
         |              CASE WHEN ((k+1)*n)//$FrameCount <= (k*n)//$FrameCount THEN 0
         |                   ELSE CAST(list_sum(o[(k*n)//$FrameCount+1 : ((k+1)*n)//$FrameCount]) AS BIGINT)
         |              END AS byte_sum
         |       FROM d, generate_series(0, ${FrameCount - 1}) t(k)),
         |fl AS (SELECT fr.*, LAG(frame_bytes) OVER w AS pb, LAG(byte_sum) OVER w AS ps
         |       FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
         |SELECT doc_id, frame_idx, byte_offset, frame_bytes, byte_sum,
         |       CASE WHEN frame_bytes = 0 THEN 0.0
         |            ELSE CAST(byte_sum AS DOUBLE) / frame_bytes END AS mean_byte,
         |       CAST(CASE WHEN frame_idx = 0 THEN 0
         |                 WHEN abs(byte_sum * pb - ps * frame_bytes)
         |                      > $SceneDeltaMean * frame_bytes * pb THEN 1
         |                 ELSE 0 END AS INTEGER) AS scene_change
         |FROM fl""".stripMargin) { (s, d) =>
      frameStats(Multimodal.mediaDataset(s, d)).toDF()
    },

    // Audio-style loudness profile: windowed integer energy, argmax window,
    // silence ratio material — the trim-silence / drop-dead-air curation
    // signal, all integers so bit-identical across engines.
    Op.sql("media_audio_energy",
      s"""WITH $byteCtes,
         |w AS (SELECT doc_id, o, n, (n + ${AudioWindow - 1})//$AudioWindow AS nw FROM d),
         |en AS (SELECT doc_id, n, nw,
         |         list_transform(generate_series(0, nw - 1), k ->
         |           CAST(list_sum(list_transform(o[k*$AudioWindow+1 : LEAST((k+1)*$AudioWindow, n)],
         |                x -> (x - 128)*(x - 128))) AS BIGINT)) AS es
         |       FROM w)
         |SELECT doc_id, n AS n_samples, nw AS n_windows,
         |       COALESCE(CAST(list_sum(es) AS BIGINT), 0) AS total_energy,
         |       COALESCE(list_max(es), 0) AS peak_energy,
         |       CASE WHEN nw = 0 THEN -1
         |            ELSE list_position(es, list_max(es)) - 1 END AS peak_window,
         |       COALESCE(CAST(list_sum(list_transform(generate_series(0, nw - 1), k ->
         |         CASE WHEN es[k+1] < $SilenceMeanSq * (LEAST((k+1)*$AudioWindow, n) - k*$AudioWindow)
         |              THEN 1 ELSE 0 END)) AS BIGINT), 0) AS silent_windows
         |FROM en""".stripMargin) { (s, d) =>
      audioEnergy(Multimodal.mediaDataset(s, d)).toDF()
    },
  )
}
