package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine

/** Round-11 batch 1: the REAL image decode path (VERDICT r10 task 7) —
  * the multimodal tier's last stub boundary closed with javax.imageio.
  */
object QueriesR11a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- mm_decode_px: full PNG decode via javax.imageio

  private val decodePx = Q(
    "mm_decode_px",
    "FULL image decode through a REAL codec, oracle-graded — closes the " +
      "multimodal tier's one remaining stub (header-level PNG/WAV/JPEG " +
      "parsing was already real; pixel decode was a deterministic " +
      "fake). Every 16th document synthesizes a 16×16 RGB image whose " +
      "pixel (x,y) is a pure function of (doc_id, x, y), encodes it to " +
      "a genuine PNG with javax.imageio's encoder, and DECODES IT BACK " +
      "with the real decoder inside mapPartitions (codec init amortized " +
      "per partition, constant memory per row — the extractFeatures " +
      "batch shape). Graded output: decoded raster dims plus exact " +
      "channel sums and a position-weighted moment Σ(x+1)(y+1)·r that " +
      "would catch any transposition. PNG is lossless, so the oracle " +
      "replays the pixel formula in SQL and the hash-compare checks the " +
      "actual encoder→decoder round-trip bit-for-bit. Scale shape: " +
      "map-only (zero shuffle before the output sort) — decode " +
      "pipelines at 100 TB are exactly this: narrow per-row kernels " +
      "whose parallelism is the scan's.",
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal
      val ids = t(s, d, "documents")
        .filter(col("doc_id") % 16 === 0)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        // ImageIO scanner registry warm + cache off happen on first use
        // in this task; both kernels below are per-row and allocation-flat
        it.map { id =>
          Multimodal.decodePngStats(id, Multimodal.encodePng(id, 16, 16))
        }
      }.toDF()
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH ids AS (SELECT doc_id FROM documents
                         WHERE doc_id % 16 = 0),
            px AS (SELECT doc_id, x, y,
                          (7 * doc_id + 3 * x + 5 * y) % 256 AS r,
                          (11 * doc_id + x * y) % 256 AS g,
                          (13 * doc_id + 2 * x + y * y) % 256 AS b
                   FROM ids
                   CROSS JOIN (SELECT unnest(range(0, 16)) AS x)
                   CROSS JOIN (SELECT unnest(range(0, 16)) AS y))
            SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
                   CAST(sum(r) AS BIGINT) AS r_sum,
                   CAST(sum(g) AS BIGINT) AS g_sum,
                   CAST(sum(b) AS BIGINT) AS b_sum,
                   CAST(sum((x + 1) * (y + 1) * r) AS BIGINT) AS pos_moment
            FROM px GROUP BY doc_id ORDER BY doc_id"""))

  // ------------- mm_decode_audio: full WAV decode via javax.sound

  private val decodeAudio = Q(
    "mm_decode_audio",
    "FULL audio decode through a REAL codec, oracle-graded — the audio " +
      "sibling of mm_decode_px (mm_pcm_stats already parses PCM bytes " +
      "at fixed RIFF offsets; this drives javax.sound's actual WAV " +
      "codec, which walks the chunk structure and reports the format). " +
      "Every 16th-plus-one document synthesizes 64 deterministic 16-bit " +
      "mono PCM samples, encodes them with AudioSystem.write, and " +
      "decodes back with AudioSystem.getAudioInputStream inside " +
      "mapPartitions. Graded output: codec-reported sample rate, exact " +
      "sample count, DC sum, peak magnitude, energy — PCM is lossless, " +
      "so the oracle replays the synthesis formula in SQL and the hash " +
      "check covers the real encoder→decoder round-trip. Map-only at " +
      "any scale (the mm_decode_px shape).",
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal
      val ids = t(s, d, "documents")
        .filter(col("doc_id") % 16 === 1)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.map { id =>
          val sr = (8000 + (id % 5) * 8820).toInt
          Multimodal.decodeWavStats(id, Multimodal.encodeWav(id, 64, sr))
        }
      }.toDF()
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH ids AS (SELECT doc_id FROM documents
                         WHERE doc_id % 16 = 1),
            samp AS (SELECT doc_id,
                            (31 * doc_id + 7 * i * i) % 65536 AS u
                     FROM ids CROSS JOIN
                       (SELECT unnest(range(0, 64)) AS i)),
            sgn AS (SELECT doc_id,
                           CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
                             AS v
                    FROM samp)
            SELECT s.doc_id AS doc_id,
                   CAST(8000 + (s.doc_id % 5) * 8820 AS INT) AS sample_rate,
                   CAST(count(*) AS BIGINT) AS n_samples,
                   CAST(sum(v) AS BIGINT) AS dc_sum,
                   CAST(max(abs(v)) AS BIGINT) AS peak,
                   CAST(sum(v * v) AS BIGINT) AS energy
            FROM sgn s GROUP BY s.doc_id ORDER BY doc_id"""))

  // ------------- mm_resize_px: real decode → resize → re-encode loop

  private val resizePx = Q(
    "mm_resize_px",
    "FULL image transcode loop, oracle-graded — decode via " +
      "javax.imageio, NEAREST-NEIGHBOR resize 16×16 → 8×8 (src pixel " +
      "(⌊x·16/8⌋, ⌊y·16/8⌋): an exact integer mapping, deliberately " +
      "not Graphics2D's interpolating renderer, so the oracle can " +
      "replay it), re-encode as PNG, decode AGAIN and grade the " +
      "resized raster's exact channel sums — every byte passes through " +
      "the real codec twice. Closes the brief's 'resize' verb with a " +
      "real kernel (resizeMeta remains the metadata-only form for " +
      "codec-less media). Map-only at any scale.",
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal
      val ids = t(s, d, "documents")
        .filter(col("doc_id") % 16 === 2)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.map { id =>
          val resized = Multimodal.resizePng(
            Multimodal.encodePng(id, 16, 16), 8, 8)
          Multimodal.decodePngStats(id, resized)
        }
      }.toDF()
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH ids AS (SELECT doc_id FROM documents
                         WHERE doc_id % 16 = 2),
            px AS (SELECT doc_id, x, y,
                          (7 * doc_id + 3 * (2 * x) + 5 * (2 * y)) % 256
                            AS r,
                          (11 * doc_id + (2 * x) * (2 * y)) % 256 AS g,
                          (13 * doc_id + 2 * (2 * x) + (2 * y) * (2 * y))
                            % 256 AS b
                   FROM ids
                   CROSS JOIN (SELECT unnest(range(0, 8)) AS x)
                   CROSS JOIN (SELECT unnest(range(0, 8)) AS y))
            SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
                   CAST(sum(r) AS BIGINT) AS r_sum,
                   CAST(sum(g) AS BIGINT) AS g_sum,
                   CAST(sum(b) AS BIGINT) AS b_sum,
                   CAST(sum((x + 1) * (y + 1) * r) AS BIGINT) AS pos_moment
            FROM px GROUP BY doc_id ORDER BY doc_id"""))

  // ------------- mm_frame_decode: container walk + real sampled decode
  // (mm_frame_sample is the expression-only container-slicing form in
  // QueriesNext; this one actually decodes the sampled frames)

  private val frameSample = Q(
    "mm_frame_decode",
    "REAL frame sampling, oracle-graded — closes the brief's " +
      "'frame-sample' verb with actual decodes: each doc packs 6 " +
      "16×16 PNG frames (frame f's pixels derive from id·8+f — a " +
      "formula the oracle replays) into a length-prefixed container " +
      "(the MJPEG-minus-headers layout), the kernel walks the frame " +
      "index and decodes ONLY every 2nd frame with javax.imageio — " +
      "the decode-what-you-keep discipline a video pipeline needs " +
      "(skipped frames cost a seek, not a decode) — and the graded " +
      "output is frame counts plus exact channel sums over the " +
      "sampled frames. Map-only at any scale.",
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal
      val ids = t(s, d, "documents")
        .filter(col("doc_id") % 16 === 3)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.map { id =>
          val container = Multimodal.packFrames(
            (0 until 6).map(f => Multimodal.encodePng(id * 8 + f, 16, 16)))
          Multimodal.sampleDecodeFrames(id, container, everyK = 2)
        }
      }.toDF()
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH ids AS (SELECT doc_id FROM documents
                         WHERE doc_id % 16 = 3),
            fx AS (SELECT doc_id, doc_id * 8 + f AS fid
                   FROM ids
                   CROSS JOIN (SELECT unnest([0, 2, 4]) AS f)),
            px AS (SELECT doc_id,
                          (7 * fid + 3 * x + 5 * y) % 256 AS r,
                          (11 * fid + x * y) % 256 AS g,
                          (13 * fid + 2 * x + y * y) % 256 AS b
                   FROM fx
                   CROSS JOIN (SELECT unnest(range(0, 16)) AS x)
                   CROSS JOIN (SELECT unnest(range(0, 16)) AS y))
            SELECT doc_id, CAST(6 AS INT) AS n_frames,
                   CAST(3 AS INT) AS n_sampled,
                   CAST(sum(r) AS BIGINT) AS r_sum,
                   CAST(sum(g) AS BIGINT) AS g_sum,
                   CAST(sum(b) AS BIGINT) AS b_sum
            FROM px GROUP BY doc_id ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(decodePx, decodeAudio, resizePx, frameSample)
}
