package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (statistics over the raw bytes stand
  * in for pixel/sample decoding) — but every piece of Spark plumbing
  * around it is real and tested: the binary+metadata schema, pure-Column
  * byte slicing for frame sampling, and the per-partition typed
  * `mapPartitions` batch shape a real decoder plugs into (decoder
  * contexts are expensive; you initialize one per PARTITION, not per row
  * — exactly where ffmpeg/ImageIO/JNI handles would live at 100 TB).
  *
  * Scale: all ops are map-only over the media table (no shuffle);
  * binary payloads stay columnar in parquet; frame sampling prunes bytes
  * BEFORE any downstream shuffle, which is the difference between moving
  * 100 TB and moving 3 TB of sampled frames.
  */
object Multimodal {

  val FrameBytes = 256

  /** Deterministic media table derived from `documents`: content = utf-8
    * bytes of the text (a stand-in for real image/audio/video payloads),
    * kind and metadata derived from doc_id. Schema is the real contract:
    * (media_id long, kind string, content binary,
    *  meta struct<width int, height int, sample_rate int, format string>).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = docs.select(
    col("doc_id").as("media_id"),
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3).cast("int") + 1).as("kind"),
    col("text").cast("binary").as("content"),
    struct(
      (lit(32) + (col("doc_id") % 8).cast("int") * 16).as("width"),
      (lit(32) + (col("doc_id") % 5).cast("int") * 32).as("height"),
      lit(16000).as("sample_rate"),
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (col("doc_id") % 3).cast("int") + 1).as("format")).as("meta"))

  /** Byte-level stats + frame count from metadata — pure Columns. */
  def mediaStats(media: DataFrame): DataFrame = media.select(
    col("media_id"), col("kind"),
    length(col("content")).as("n_bytes"),
    col("meta.width").as("width"),
    col("meta.height").as("height"),
    col("meta.format").as("format"),
    ((length(col("content")) + lit(FrameBytes - 1)) / lit(FrameBytes))
      .cast("int").as("n_frames"))

  /** Frame sampling: every `every`-th fixed-size byte window of the
    * content, fingerprinted. Pure Columns — `substring` slices BinaryType
    * directly; the explode carries only sampled frames downstream.
    */
  def frameSample(media: DataFrame, every: Int = 4): DataFrame = {
    val nFrames = ((length(col("content")) + lit(FrameBytes - 1))
      / lit(FrameBytes)).cast("int")
    media
      .where(col("kind") === "video" && length(col("content")) > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), nFrames - 1, lit(every))).as("frame_idx"),
        col("content"))
      .select(col("media_id"), col("frame_idx"),
        md5(substring(col("content"),
          col("frame_idx") * FrameBytes + 1, lit(FrameBytes))).as("frame_md5"),
        length(substring(col("content"),
          col("frame_idx") * FrameBytes + 1, lit(FrameBytes))).as("frame_bytes"))
  }

  /** Resize STUB: the "resized" payload is deterministically the first
    * quarter of the bytes (a real implementation decodes, scales with an
    * image library, re-encodes). Metadata transform + fingerprint are
    * the real contract being exercised.
    */
  def resizeStub(media: DataFrame, factor: Int = 2): DataFrame = media.select(
    col("media_id"),
    (col("meta.width") / factor).cast("int").as("width"),
    (col("meta.height") / factor).cast("int").as("height"),
    md5(substring(col("content"), lit(1),
      ((length(col("content")) + lit(3)) / lit(4)).cast("int")))
      .as("resized_md5"),
    ((length(col("content")) + lit(3)) / lit(4)).cast("int")
      .as("resized_bytes"))

  /** Decode STUB over the real per-partition batch shape: one "decoder"
    * per partition (where an ImageIO/ffmpeg context would be created),
    * rows streamed through it. The stub "decodes" to mean byte intensity;
    * a real decoder returns pixel arrays with the same plumbing.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = media.select(col("media_id"), col("content"),
      col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
    typed.mapPartitions { rows =>
      // real impl: val decoder = Decoder.open(...) — once per partition
      rows.map { case (id, bytes, w, h) =>
        var s = 0L
        var i = 0
        while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
        val mean =
          if (bytes.isEmpty) 0.0
          else BigDecimal(s.toDouble / bytes.length * 1.0e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1.0e6
        (id, w, h, mean)
      }
    }.toDF("media_id", "width", "height", "mean_intensity")
  }

  /** 64-bit perceptual hash (aHash shape) over the raw payload bytes:
    * the payload splits into 64 equal segments (bounds ⌊k·n/64⌋), bit k
    * set iff segment k's mean byte value exceeds the whole payload's
    * mean. Every comparison is an integer cross-multiplication
    * (segSum·n > total·segLen) — no floating point anywhere, so the
    * DuckDB oracle matches bit-for-bit. On real media this runs on the
    * DECODED pixels; over the stub payload the plumbing and the hash
    * algebra are the real contract (same stance as [[decodeStub]]).
    */
  def phash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < n) { total += bytes(i) & 0xff; i += 1 }
    var out = 0L
    var k = 0
    while (k < 64) {
      val from = (k.toLong * n / 64).toInt
      val until = ((k + 1).toLong * n / 64).toInt
      if (until > from) {
        var s = 0L
        var j = from
        while (j < until) { s += bytes(j) & 0xff; j += 1 }
        if (s * n > total * (until - from)) out |= 1L << k
      }
      k += 1
    }
    out
  }

  /** (media_id, phash) via the typed per-partition shape. */
  def phash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => (id, phash64(bytes)) }
      .toDF("media_id", "phash")
  }

  /** Media near-duplicates: perceptual-hash pairs within Hamming
    * distance 3 via the same pigeonhole banding as the SimHash text path
    * (64 bits = 4×16 bands — complete recall, see
    * [[Dedup.hammingNearDupPairs]]). The phash frame is materialized
    * once (localCheckpoint) for its three consumers.
    */
  def nearDupPairs(spark: SparkSession, media: DataFrame,
                   maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearDupPairs(
      phash(spark, media).localCheckpoint(false),
      "media_id", "phash", bitsPerBand = 16, nBands = 4,
      maxHamming = maxHamming)

  /** Incremental media near-dup — the daily-delta shape for the
    * multimodal column: a new batch of payloads perceptually hashed and
    * checked against the PERSISTED phash index, without re-decoding (or
    * even re-reading) any historical payload. Completes the
    * incremental-form family (text pairs/spans/chunks, BM25, ANN,
    * clusters — and now media): history contributes only its 8-byte
    * hash per item, scanned once; the delta pays one decode+hash pass.
    * Same 4×16 pigeonhole bands as [[nearDupPairs]] (complete recall
    * for Hamming ≤ 3); emits (hist_media, delta_media, hamming).
    */
  def incrementalNearDups(spark: SparkSession, histPhash: DataFrame,
                          deltaMedia: DataFrame, maxHamming: Int = 3,
                          maxBucket: Int = Dedup.MaxBucketSize): DataFrame =
    Dedup.hammingIncrementalPairs(histPhash, phash(spark, deltaMedia),
        "media_id", "phash", bitsPerBand = 16, nBands = 4,
        maxHamming = maxHamming, maxBucket = maxBucket)
      .select(col("hist_id").as("hist_media"),
        col("delta_id").as("delta_media"), col("hamming"))
      .orderBy(col("hist_media"), col("delta_media"))

  /** 64-bin byte histogram (feature extraction) via the same typed
    * per-partition shape; emits (media_id, bin, cnt) rows so results are
    * flat-relational (no array columns in the comparison surface).
    */
  def byteHistogram(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
    typed.flatMap { case (id, bytes) =>
      val hist = new Array[Long](64)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) / 4) += 1; i += 1 }
      hist.iterator.zipWithIndex.collect {
        case (n, bin) if n > 0 => (id, bin, n)
      }
    }.toDF("media_id", "bin", "cnt")
  }
}
