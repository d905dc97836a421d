package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column machinery (SURVEY.md §2B X4): media payloads travel as
  * opaque `binary` columns next to typed metadata, and per-row decode /
  * feature-extraction runs PARTITION-WISE over the binary payloads — the
  * shape a real image/audio decoder plugs into at 100 TB (no driver
  * collection, no per-row task, batch-amortized codec setup per partition).
  *
  * The container has no media codecs, so `decodeStub` is a clearly-marked
  * deterministic fake: features are integer arithmetic over the payload's
  * decoded characters. That keeps the Spark-side plumbing (binary schema,
  * mapPartitions batching, typed output Encoder) real AND lets the DuckDB
  * oracle reproduce the exact values (ascii/substr arithmetic), so the
  * plumbing is hash-verified end-to-end, not just smoke-tested.
  */
object Multimodal {

  /** Typed decode output: one feature row per media payload. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double)

  /** Wrap documents as a media table: payload = UTF-8 bytes in an opaque
    * `binary` column plus typed metadata — the canonical multimodal layout.
    * A real pipeline would read image/audio bytes from object storage the
    * same way (binaryFile source or parquet binary column).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // deterministic modality assignment standing in for a real mime type
      // (pmod, not %: a negative id would hit element_at index 0 → error)
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("lang").as("source_lang")).as("meta"))

  /** STUB DECODER — stands in for an image/audio codec (none installed in
    * this container). Deterministic arithmetic over the payload's decoded
    * characters; the real-codec swap point is exactly this function body.
    */
  private[multimodal] def decodeOne(docId: Long, mediaType: String,
      bytes: Array[Byte]): MediaFeatures = {
    val text = new String(bytes, StandardCharsets.UTF_8)
    // CODE POINTS, not UTF-16 units: the oracle's length()/substr()/ascii()
    // are code-point semantics, and a non-BMP char (surrogate pair) would
    // otherwise diverge in every feature below
    val cps = text.codePoints().toArray
    val n = cps.length
    val cp = (i: Int) => if (n == 0) 0 else cps(math.min(i, n - 1))
    val k = math.min(16, n)
    val sum16 = (0 until k).map(i => cps(i).toLong).sum
    MediaFeatures(
      doc_id = docId,
      media_type = mediaType,
      n_bytes = bytes.length.toLong,
      width = 32 + cp(0) % 64,
      height = 32 + cp(1) % 64,
      n_frames = 1 + n % 8,
      brightness = if (k == 0) 0.0 else sum16.toDouble / k)
  }

  /** Partition-wise feature extraction over the binary payloads. One
    * iterator pass per partition: this is where a real decoder would
    * initialize once per partition (codec context, model weights) and
    * stream rows through — the 100 TB-correct shape.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.map { case (id, mt, bytes) => decodeOne(id, mt, bytes) }
      }
  }

  /** Deterministic resize: fit each media item into a `maxDim` square box
    * preserving aspect ratio — pure integer arithmetic (floor division),
    * so the oracle replays it exactly. Emits the new dimensions plus the
    * proportional storage estimate (`ceil(n_bytes · new_area / area)` in
    * exact integer form). The real-codec swap point is the same
    * partition-wise decode seam as [[decodeFeatures]]; resize itself is a
    * narrow metadata projection (whole-stage codegen, no shuffle).
    */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    val w = col("width").cast(LongType)
    val h = col("height").cast(LongType)
    val maxSide = greatest(w, h)
    // a row fits (maxSide <= maxDim) iff it needs no scaling — this also
    // covers degenerate 0-dim rows, so the scaling branch's divisor
    // greatest(width, height) is always >= 1 when evaluated (ANSI-safe).
    val fits = maxSide <= maxDim
    // clamp to >= 1 so extreme aspect ratios never emit a 0-sized side:
    // width=0 × height=500 at maxDim=64 scales to 1×64, not 0×64
    val newW = when(fits, w).otherwise(greatest(lit(1L),
      expr(s"(width * $maxDim) div greatest(width, height)")))
    val newH = when(fits, h).otherwise(greatest(lit(1L),
      expr(s"(height * $maxDim) div greatest(width, height)")))
    features.toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        newW.as("new_width"),
        newH.as("new_height"),
        // integer ceil((n_bytes·newW·newH)/(w·h)) via (a+d-1)/d — the
        // numerator stays < 2^53, so the double division is exact and
        // floor() recovers the exact integer on both engines. The
        // division is guarded structurally inside when() (ANSI mode).
        when(w * h > 0,
          floor((col("n_bytes") * newW * newH + w * h - lit(1)) / (w * h))
            .cast(LongType))
          .otherwise(lit(null)).as("resized_bytes"))
  }

  /** Typed audio-decode output: one row per fixed-width sample frame. */
  final case class AudioFrame(
      doc_id: Long,
      frame_idx: Long,
      n_samples: Long,
      energy: Long)

  /** Audio frame energy through the same stubbed codec seam: for
    * audio-typed payloads, fake-decode the byte stream to "PCM samples"
    * (code points — the real-codec swap point is the flatMap body), tile
    * into non-overlapping `frame`-sample windows, and emit each frame's
    * energy Σ sample² as an EXACT integer (a real pipeline would follow
    * with silence trimming / VAD on these frames). Empty payloads emit no
    * frames.
    *
    * Scale: partition-wise flatMap (decoder init once per partition), one
    * output row per frame — fan-out n/frame per payload, no shuffle; the
    * frame explode happens inside the scan partition.
    */
  def audioFrameEnergy(media: DataFrame, frame: Int): Dataset[AudioFrame] = {
    require(frame >= 1, s"frame width must be >= 1 sample, got $frame")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.flatMap { case (id, bytes) =>
          val cps = new String(bytes, StandardCharsets.UTF_8)
            .codePoints().toArray
          cps.grouped(frame).zipWithIndex.map { case (g, j) =>
            AudioFrame(id, j.toLong, g.length.toLong,
              g.map(c => c.toLong * c).sum)
          }
        }
      }
  }

  /** Perceptual-hash bits and bands: a 60-bit dHash (difference hash —
    * the sign sequence of adjacent-sample gradients, the classic image
    * near-dup signature) computed over the stub decode's sample stream.
    * 60 bits, not 64: bit 63 would need `1 << 63`, which overflows
    * signed int64 differently across engines; 60 keeps every partial sum
    * positive and ANSI-safe. 4 bands × 15 bits give the pigeonhole
    * guarantee: hamming(a, b) ≤ 3 ⇒ at least one band is bit-identical.
    */
  val PhashBits = 60
  val PhashBands = 4
  val PhashBandBits: Int = PhashBits / PhashBands

  private[multimodal] def dhashOne(docId: Long, mediaType: String,
      bytes: Array[Byte]): (Long, String, Long) = {
    val text = new String(bytes, StandardCharsets.UTF_8)
    val cps = text.codePoints().toArray
    val n = cps.length
    val cp = (i: Int) => if (n == 0) 0 else cps(math.min(i, n - 1))
    var sig = 0L
    var i = 0
    while (i < PhashBits) {
      if (cp(i) > cp(i + 1)) sig |= (1L << i)
      i += 1
    }
    (docId, mediaType, sig)
  }

  /** Per-payload perceptual hash `(doc_id, media_type, phash)` — same
    * partition-wise decode seam as [[decodeFeatures]] (a real pipeline
    * hashes the decoded pixel stream; the stub hashes the decoded
    * character stream with identical shape).
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(rows => rows.map {
        case (id, mt, bytes) => dhashOne(id, mt, bytes)
      })
      .toDF("doc_id", "media_type", "phash")
  }

  /** Perceptual near-dup pairs at `hamming ≤ maxHamming` WITHOUT an
    * all-pairs comparison: candidates come from an EQUI-join on the
    * 4×15-bit bands (pigeonhole: a pair under the threshold must agree
    * on ≥ ⌈bands − maxHamming⌉ ≥ 1 band), then `bit_count(xor)` verifies
    * exactly — the multimodal sibling of the LSH/SymSpell bucket→verify
    * shape. Scale: shuffle is bands× the hash table; a bucket is bounded
    * by the count of hashes sharing a band value, never n².
    */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < PhashBands,
      s"pigeonhole blocking needs maxHamming < $PhashBands bands")
    val banded = hashes
      .select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(PhashBands - 1))).as("band"))
      .select(col("doc_id"), col("phash"), col("band"),
        expr(s"(phash >> (band * $PhashBandBits)) & ${(1 << PhashBandBits) - 1}")
          .as("band_value"))
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band")
          && col("a.band_value") === col("b.band_value")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(ph_a ^ ph_b) AS bigint)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic frame sampling: one row per sampled frame index, with a
    * per-frame fingerprint — the explode shape of video frame extraction.
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("n_frames"),
        explode(sequence(lit(1), col("n_frames"))).as("frame_idx"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        (col("width") * 31 + col("frame_idx")).as("frame_fingerprint"))
}
