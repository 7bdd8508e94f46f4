package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY §2.10): image/audio/video as
  * opaque `binary` payloads with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample plumbing a
  * training-data pipeline needs.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[StubCodec]] is a deterministic fake that stands in
  * for e.g. a JPEG decoder. Everything around it — the schema contract,
  * batch iteration via `mapPartitions`, partition sizing, the
  * metadata/payload split — is real and is what matters on a cluster:
  * decode is per-row CPU work that scales linearly with partition
  * count and never shuffles.
  */
object Multimodal {

  /** Canonical multimodal schema: id + opaque payload + typed metadata.
    * Parquet stores the payload as a binary column (row group striping
    * keeps scans of metadata-only queries cheap via column pruning).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))), nullable = true)))

  /** Feature row produced by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Deterministic fake codec: "decodes" a payload into a fixed-length
    * feature vector derived from byte statistics. Replace with a real
    * decoder (JNI/FFM to libjpeg etc.) in production — the call site,
    * batching and schema stay identical.
    *
    * Both outputs are ENGINE-PORTABLE, so the whole mapPartitions codec
    * path is oracle-checkable end to end (`q_media_features`), not just
    * the column plumbing around it: the checksum is md5 hex (not a Java
    * 31-hash, whose silent Long wraparound no SQL engine replays), and
    * each feature slot is an exact integer byte sum — integer-valued
    * floats are exact and order-independent below 2^24, and the largest
    * possible slot sum (payload bytes × 255) stays far under that for
    * any document in scope.
    */
  object StubCodec {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xFF)
        i += 1
      }
      out
    }
    def checksum(payload: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(payload)
        .map(b => f"${b & 0xff}%02x").mkString
  }

  /** The native-decoder contract [[StubCodec]] stands in for: `open()`
    * builds ONE per-partition context (native handles, pinned
    * buffers, thread-local scratch — the expensive part a real
    * libjpeg/ffmpeg binding amortizes across a batch), and the
    * context decodes row payloads until the task completes. A decoder
    * MUST throw on corrupt input — [[extractFeaturesGuarded]] maps
    * the throw to a quarantine row instead of failing the job.
    */
  trait MediaCodec extends Serializable {
    def open(): MediaCodecContext
  }
  trait MediaCodecContext {
    def decode(payload: Array[Byte], dim: Int): Array[Float]
    def close(): Unit
  }

  /** [[StubCodec]] wrapped in the [[MediaCodec]] contract (stateless,
    * so the "context" is trivial — a real codec's would not be).
    */
  object StubMediaCodec extends MediaCodec {
    def open(): MediaCodecContext = new MediaCodecContext {
      def decode(payload: Array[Byte], dim: Int): Array[Float] =
        StubCodec.decode(payload, dim)
      def close(): Unit = ()
    }
  }

  /** [[featureSchema]] plus the quarantine columns: `status` is
    * 'ok' | 'corrupt' | 'oversized', `err` carries the decoder's
    * message on 'corrupt' rows.
    */
  val guardedFeatureSchema: StructType = StructType(
    featureSchema.fields.toSeq :+
      StructField("status", StringType, nullable = false) :+
      StructField("err", StringType, nullable = true))

  /** Production decode seam: [[extractFeatures]] with the three
    * failure modes a native codec hits on real corpora handled as
    * DATA, not job failures —
    *
    *  - **corrupt payload**: the decoder throws; the row lands in the
    *    output with `status='corrupt'`, the error message, empty
    *    features, and its checksum (so the corrupt artifact is still
    *    content-addressable for the K6 quarantine sink). One bad
    *    JPEG must never kill a 100 TB pass.
    *  - **oversized payload (row-size guard)**: payloads larger than
    *    `maxPayloadBytes` are routed to `status='oversized'` WITHOUT
    *    entering the decoder. The scan itself cannot split a single
    *    row — a payload past `spark.sql.files.maxPartitionBytes`
    *    simply becomes a one-row input partition — so the memory
    *    hazard is not the scan but the DECODER's working set
    *    (payload × decode expansion, in native allocations the
    *    executor's heap limits don't see). The guard bounds decoder
    *    input explicitly; quarantined oversized rows are re-processed
    *    out of band (dedicated high-memory queue), the K6 pattern.
    *  - **per-partition context reuse**: `codec.open()` runs ONCE per
    *    partition (not per row) and is closed on task completion even
    *    when a decode throws — the amortization contract that makes
    *    mapPartitions the right seam (spec-counted).
    *
    * Split the output with `status == 'ok'` vs not — the quarantine
    * side output carries everything an operator needs to triage.
    */
  def extractFeaturesGuarded(media: DataFrame, dim: Int,
      codec: MediaCodec = StubMediaCodec,
      maxPayloadBytes: Int = 64 << 20): DataFrame = {
    require(maxPayloadBytes > 0, "maxPayloadBytes must be positive")
    val enc = org.apache.spark.sql.Encoders.row(guardedFeatureSchema)
    media.select("media_id", "payload", "meta.format")
      .mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else {
          val ctx = codec.open()
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => ctx.close()))
          rows.map { r =>
            val id = r.getLong(0)
            val payload = if (r.isNullAt(1)) Array.empty[Byte]
              else r.getAs[Array[Byte]](1)
            val fmt = if (r.isNullAt(2)) null else r.getString(2)
            val sum = StubCodec.checksum(payload)
            if (payload.length > maxPayloadBytes)
              Row(id, fmt, payload.length, sum, Seq.empty[Float],
                "oversized", null)
            else
              try Row(id, fmt, payload.length, sum,
                ctx.decode(payload, dim).toSeq, "ok", null)
              catch {
                case scala.util.control.NonFatal(e) =>
                  Row(id, fmt, payload.length, sum, Seq.empty[Float],
                    "corrupt", String.valueOf(e.getMessage))
              }
          }
        }
      }(enc)
  }

  /** Build a media table from any binary-able column — used by tests
    * and the harness queries to synthesize media rows from text.
    */
  def fromBinary(df: DataFrame, idCol: String, binCol: String,
      format: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(binCol).cast("binary").as("payload"),
      struct(lit(format).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")).as("meta"))

  /** Decode + feature-extract over partitions. `mapPartitions` (not a
    * per-row UDF) so a real codec can amortize per-batch setup
    * (decoder contexts, pinned buffers) exactly like a Pandas-UDF batch
    * would; output rows stay columnar downstream.
    */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "payload", "meta.format")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte]
            else r.getAs[Array[Byte]](1)
          val fmt = if (r.isNullAt(2)) null else r.getString(2)
          Row(id, fmt, payload.length, StubCodec.checksum(payload),
            StubCodec.decode(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Difference-hash (dHash) half over a feature vector: bit k set
    * iff `features[lo+k+1] > features[lo+k+2]` (1-based adjacent
    * comparison), packed as Σ bit·2^k — 32 bits per half, so the sum
    * stays far from any overflow and replays as plain integer
    * arithmetic in any engine (a 64-bit OR-fold would need the sign
    * bit). The perceptual-hash convention: adjacent-gradient signs
    * are stable under small payload edits, so near-identical media
    * land hamming-close.
    */
  def dHashHalf(features: Column, lo: Int): Column =
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, k) =>
      acc + when(
        element_at(features, k + lit(lo + 1)) >
          element_at(features, k + lit(lo + 2)),
        pow(lit(2.0), k.cast("double")).cast("long")).otherwise(0L))

  /** Banded perceptual near-dup over media payloads: dHash the
    * [[StubCodec]] feature vectors (dim 65 → 64 gradient bits as two
    * 32-bit halves), block candidates on 4 16-bit bands (a pair must
    * agree exactly on ≥1 band — the simhash/minhash banding trick, so
    * candidates are an equi-join, never all pairs), verify by true
    * hamming distance ≤ `maxHamming`. Output one row per qualifying
    * pair: (media_a, media_b, hamming).
    *
    * Scale: the feature/codec pass is row-local mapPartitions; the
    * only exchanges carry (id, 2 longs) hashes and the banded
    * candidates. Band width 16 bits keeps hot buckets rare; a
    * degenerate corpus (all-equal payloads) degrades to the honest
    * quadratic of its true duplicate set, like every banding scheme.
    */
  def mediaNearDup(media: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be >= 0")
    val feats = extractFeatures(media, dim = 65)
      .select(col("media_id"),
        col("features").cast("array<double>").as("__f"))
      .select(col("media_id"),
        dHashHalf(col("__f"), 0).as("__lo"),
        dHashHalf(col("__f"), 32).as("__hi"))
      .localCheckpoint(true) // feeds both sides of the band self-join
    val banded = feats.select(col("media_id"), col("__lo"), col("__hi"),
      explode(array(
        struct(lit(0).as("bi"),
          (col("__lo") % 65536).as("bv")),
        struct(lit(1).as("bi"),
          (col("__lo") / 65536).cast("long").as("bv")),
        struct(lit(2).as("bi"),
          (col("__hi") % 65536).as("bv")),
        struct(lit(3).as("bi"),
          (col("__hi") / 65536).cast("long").as("bv")))).as("__band"))
    val a = banded.select(col("media_id").as("media_a"),
      col("__lo").as("lo_a"), col("__hi").as("hi_a"), col("__band"))
    val b = banded.select(col("media_id").as("media_b"),
      col("__lo").as("lo_b"), col("__hi").as("hi_b"), col("__band"))
    a.join(b, Seq("__band")).filter(col("media_a") < col("media_b"))
      .groupBy(col("media_a"), col("media_b"))
      .agg(first((bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
        bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("long"))
        .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** "Resize" stub: truncate/pad payload to `n` bytes — stands in for
    * an image resize; pure column expressions (no codec needed for the
    * byte-level contract).
    */
  def resizePayload(media: DataFrame, n: Int): DataFrame =
    media.withColumn("payload",
      substring(col("payload"), 1, n))
      .withColumn("meta", col("meta").withField("width", lit(n)))

  /** 1-based byte offsets 1, 1+stride, … ≤ |payload|; empty/null
    * payload → empty (sequence(1,0) would count DOWN and fabricate
    * offsets).
    */
  private def frameOffsets(payload: Column, stride: Int): Column =
    when(length(payload) === 0 || payload.isNull,
        array().cast("array<int>"))
      .otherwise(filter(
        transform(sequence(lit(1), length(payload)),
          i => when(pmod(i - 1, lit(stride)) === 0, i)
            .otherwise(lit(null))),
        x => x.isNotNull))

  /** Frame-sample stub for video-like payloads: every `stride`-th byte
    * as a "frame" — the partition/batch shape of real frame sampling.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      frameOffsets(col("payload"), stride).as("frame_offsets"))

  /** Frame extraction as ROWS — the shape a real video pipeline needs
    * downstream (one row per sampled frame, carrying its bytes for
    * the decode/feature stage): (media_id, frame_no 0-based,
    * frame_offset 1-based, frame binary of ≤ `frameLen` bytes from
    * the payload at the offset). The stub slice stands in for a codec
    * frame-grab; the PLUMBING — per-frame row explosion, byte
    * slicing, schema — is the real contract, and it is entirely
    * row-local: posexplode + substr, no exchange, no codec state on
    * the driver. A short tail frame (payload end inside the slice) is
    * emitted short, mirroring real last-frame behavior.
    */
  def explodeFrames(media: DataFrame, stride: Int, frameLen: Int)
      : DataFrame = {
    require(stride > 0, "stride must be positive")
    require(frameLen > 0, "frameLen must be positive")
    media.select(col("media_id"), col("payload"),
        posexplode(frameOffsets(col("payload"), stride))
          .as(Seq("frame_no", "frame_offset")))
      .select(col("media_id"), col("frame_no"), col("frame_offset"),
        col("payload").substr(col("frame_offset"), lit(frameLen))
          .as("frame"))
  }

  /** Scene-change detection over sampled frames — the shot-boundary
    * pass a video training pipeline runs to pick one representative
    * frame per scene instead of `stride`-blind sampling: per media,
    * decode each [[explodeFrames]] frame to its feature vector
    * ([[StubCodec]] byte-sum slots — exact integers, so the whole
    * chain is oracle-replayable like `q_media_features`) and cut
    * where the L1 feature distance to the previous frame exceeds
    * `threshold`. Frame 0 always opens a scene. Output: (media_id,
    * frame_no, dist — null on frame 0, scene_cut).
    *
    * Scale shape: frame explosion and the per-frame decode are
    * row-local (the decode sits in one mapPartitions, the real-codec
    * batching seam); the only exchange is ONE media-keyed window
    * whose partitions are bounded by payload size / stride — frames
    * of one video never spread across machines, and no stage holds
    * more than a frame pair per row.
    */
  def sceneChanges(media: DataFrame, stride: Int, frameLen: Int,
      dim: Int, threshold: Long): DataFrame = {
    import org.apache.spark.sql.Row
    require(dim > 0, "dim must be positive")
    require(threshold >= 0, "threshold must be >= 0")
    val frames = explodeFrames(media, stride, frameLen)
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("features", ArrayType(IntegerType), nullable = false))))
    val feats = frames.select("media_id", "frame_no", "frame")
      .mapPartitions { rows =>
        rows.map { r =>
          val f = if (r.isNullAt(2)) Array.empty[Byte]
            else r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getInt(1),
            StubCodec.decode(f, dim).map(_.toInt).toSeq)
        }
      }(enc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_no"))
    feats
      .withColumn("__prev", lag(col("features"), 1).over(w))
      .withColumn("dist",
        when(col("__prev").isNull, lit(null).cast("long"))
          .otherwise(aggregate(
            zip_with(col("features"), col("__prev"),
              (a, b) => abs(a - b).cast("long")),
            lit(0L), (acc, x) => acc + x)))
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        col("dist"),
        (col("frame_no") === 0 || col("dist") > threshold)
          .as("scene_cut"))
  }
}
