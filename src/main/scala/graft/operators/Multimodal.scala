package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 D1-D3): media payloads as
  * opaque `binary` columns with typed metadata, content-hash dedup, and
  * a REAL image decode path — D2 assembles valid 24-bit BMP files in
  * the plan and parses them back (header fields + per-channel pixel
  * statistics) two independent ways: a codegen'd columnar decode for
  * the gate and a batched typed decoder for library composition. No
  * external media libs needed: BMP is an uncompressed format a byte
  * decoder fully covers; codec formats (JPEG/MP3/H.264) would slot
  * into the same `mapPartitions` batch shape via their libraries.
  */
object Multimodal {

  /** The multimodal table: payload bytes + typed metadata. Synthesized
    * deterministically from `documents` (payload = utf-8 bytes of text;
    * kind/width/height derived from the id) — at production scale this
    * is a parquet/lance table of real media bytes with identical shape. */
  def mmTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id",
      $"text".cast("binary").as("payload"),
      when($"doc_id" % 3 === 0, "image")
        .when($"doc_id" % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      (lit(16) + $"doc_id" % 64).cast("int").as("width"),
      (lit(16) + $"doc_id" % 48).cast("int").as("height"))
  }

  /** D1 `mm_metadata` — per-kind byte statistics over the payload
    * column. Byte length is metadata-only compute (at scale, with
    * parquet binary columns, the scan still reads the bytes — real
    * pipelines store `n_bytes` as an explicit stat column to let the
    * optimizer skip payload IO; modeled here by deriving then
    * aggregating). One partial-agg shuffle on 3 keys. */
  def mmMetadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mmTable(spark, dir)
      .select($"kind", length($"payload").as("n_bytes"), $"width", $"height")
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"n_bytes".cast("long")).as("sum_bytes"),
        max($"n_bytes").as("max_bytes"),
        avg($"width".cast("double")).as("avg_width"))
  }

  val mmMetadataSql: String =
    """WITH mm AS (
      |  SELECT doc_id, encode(text) AS payload,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |         CAST(16 + doc_id % 64 AS INT) AS width,
      |         CAST(16 + doc_id % 48 AS INT) AS height
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n_items,
      |       CAST(SUM(octet_length(payload)) AS BIGINT) AS sum_bytes,
      |       CAST(MAX(octet_length(payload)) AS INT) AS max_bytes,
      |       SUM(CAST(width AS DOUBLE)) / COUNT(*) AS avg_width
      |FROM mm GROUP BY kind""".stripMargin

  /** The image table for D2: REAL BMP files (24-bit uncompressed,
    * BITMAPINFOHEADER) assembled byte-for-byte in the plan from each
    * image-kind document's id — 'BM' magic, little-endian size/offset
    * fields, 40-byte DIB header, BGR pixel rows padded to the 4-byte
    * row stride the format requires (widths 3..10, so the corpus
    * plants BOTH padded and stride-aligned rows; padding bytes are
    * 0xAB, not zero, so a decoder that misstrides pulls them into a
    * channel sum and diverges at the gate). Both row ORIENTATIONS are
    * planted too: odd ids store negative biHeight (top-down, image
    * rows in stored order), even ids the standard bottom-up layout
    * (stored row s carries IMAGE row h−1−s). IMAGE pixel (r, c)
    * channel ch carries (doc_id·7 + r·31 + c·13 + ch·101) mod 256 in
    * either layout, so every decoded statistic has one closed form
    * the DuckDB oracle recomputes independently of orientation — a
    * decoder that samples stored instead of image rows diverges on
    * every even-id resize. At production scale this table is a
    * parquet/lance directory of scraped media; the decode path below
    * is identical. */
  private def bmpTableRaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // little-endian hex of the low `bytes` bytes of a long column
    def le(x: Column, bytes: Int): Column =
      concat((0 until bytes).map(k =>
        lpad(hex(shiftright(x, 8 * k).bitwiseAND(lit(255L))), 2, "0")): _*)
    Tables.documents(spark, dir)
      .filter($"doc_id" % 3 === 0) // the mm "image" kind
      .select($"doc_id",
        (lit(3) + $"doc_id" % 8).cast("int").as("w"),
        (lit(2) + $"doc_id" % 6).cast("int").as("h"),
        ($"doc_id" % 2 === 1).as("td")) // top-down: negative biHeight
      .withColumn("stride", expr("cast(((w * 3 + 3) div 4) * 4 as int)"))
      // biHeight field: two's-complement −h for the top-down layout
      .withColumn("hfield",
        when($"td", lit(4294967296L) - $"h").otherwise($"h".cast("long")))
      .withColumn("header_hex", concat(
        lit("424D"), le(lit(54L) + ($"stride" * $"h").cast("long"), 4), lit("00000000"),
        le(lit(54L), 4), le(lit(40L), 4), le($"w".cast("long"), 4), le($"hfield", 4),
        lit("0100"), lit("1800"), lit("00000000"), le(($"stride" * $"h").cast("long"), 4),
        le(lit(2835L), 4), le(lit(2835L), 4), lit("00000000"), lit("00000000")))
      // stored row s holds image row s (top-down) or h−1−s (bottom-up)
      .withColumn("pixel_hex", expr(
        """concat_ws('', transform(sequence(0, h * stride - 1),
          |  i -> lpad(hex(if(i % stride < w * 3,
          |                   (doc_id * 7
          |                    + (if(td, i div stride, h - 1 - i div stride)) * 31
          |                    + ((i % stride) div 3) * 13
          |                    + ((i % stride) % 3) * 101) % 256,
          |                   171)), 2, '0')))""".stripMargin))
      .select($"doc_id", unhex(concat($"header_hex", $"pixel_hex")).as("payload"))
  }

  /** [[bmpTableRaw]], materialized once per (session, dir): in
    * production these bytes sit in parquet/lance and every header
    * predicate reads them for free; here the payload is a per-pixel
    * hex assembly in the plan, and predicate pushdown would substitute
    * that whole assembly into each scan-side filter (decoder
    * quarantine + magic check), re-encoding every image once per
    * predicate. Memoized because three consumers (both D2 decode paths
    * and D4) would otherwise each run their own materialization job;
    * the checkpointed blocks are a few hundred KB and die with the
    * session. */
  private val bmpCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  def bmpTable(spark: SparkSession, dir: String): DataFrame =
    bmpCache.getOrElseUpdate((spark, dir), bmpTableRaw(spark, dir).localCheckpoint())

  /** Little-endian int decoded from `bytes` bytes of the binary
    * `payload` column at 1-based offset `off` — shared by every
    * columnar header decoder so the byte-order/offset convention
    * lives in one place. */
  private def leInt(off: Int, bytes: Int): Column = {
    val h = hex(substring(col("payload"), off, bytes))
    val u = conv(concat((bytes - 1 to 0 by -1).map(k => substring(h, 2 * k + 1, 2)): _*),
      16, 10).cast("long")
    // reinterpret the unsigned conv() value as SIGNED 32-bit: BMP
    // height is signed (negative = top-down), and a direct int cast of
    // 0xFFFFFFFE under ANSI throws instead of letting the quarantine
    // filter the row
    ((u + lit(2147483648L)) % lit(4294967296L) - lit(2147483648L)).cast("int")
  }

  /** One encoded media item (input to the typed decode stage). */
  final case class MmItem(doc_id: Long, payload: Array[Byte])
  /** Decoded header + per-channel statistics of one image. */
  final case class MmFeatures(doc_id: Long, width_px: Int, height_px: Int,
                              bpp: Int, n_bytes: Int,
                              mean_b: Double, mean_g: Double, mean_r: Double)

  /** Typed BMP decoder: parses the binary header (magic, little-endian
    * width/height/bpp/data-offset) and folds the BGR pixel block into
    * per-channel means. Batched `mapPartitions` is the Scala analogue
    * of arrow-batched decode UDFs — real decoders amortize codec init
    * per batch; one task per partition, no shuffle. Items that fail the
    * magic check are dropped (corrupt-input quarantine). */
  private def decodeBmp(batch: Seq[MmItem]): Seq[MmFeatures] =
    batch.flatMap { it =>
      val p = it.payload
      def u8(i: Int): Int = p(i) & 0xff
      def le32(off: Int): Int =
        u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
      if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) None
      else {
        val w = le32(18); val hRaw = le32(22)
        val bpp = u8(28) | (u8(29) << 8)
        val off = le32(10)
        // biHeight is SIGNED: negative = top-down row order (legal for
        // uncompressed BMPs); the lattice height is |h|. Whole-image
        // channel means are row-order independent, so both
        // orientations share this fold. BMP rows are 4-byte aligned:
        // row stride = ceil(w*3/4)*4, and the fold walks w*3 pixel
        // bytes per row then skips the padding. Quarantine
        // (decode-silently-wrong is never an option): only 24bpp
        // images whose declared |h| padded rows actually fit inside
        // the payload. (Long arithmetic: crafted headers must
        // quarantine, not overflow; |Int.MinValue| stays negative and
        // quarantines.)
        val h = math.abs(hRaw)
        val stride = ((w * 3L + 3) / 4) * 4
        // division form: `p.length < off + stride * h` would OVERFLOW
        // Long for w ≈ h ≈ 2³¹ crafted headers and wrap past the check
        if (bpp != 24 || w <= 0 || h <= 0 ||
            off < 54 || off > p.length || h > (p.length - off) / stride) None
        else {
          // decode exactly the declared lattice (padding + trailing
          // bytes ignored)
          val npix = w.toLong * h
          val sums = new Array[Long](3)
          var r = 0
          while (r < h) {
            var i = off + r * stride.toInt
            val end = i + 3 * w
            while (i < end) {
              sums(0) += u8(i); sums(1) += u8(i + 1); sums(2) += u8(i + 2)
              i += 3
            }
            r += 1
          }
          Some(MmFeatures(it.doc_id, w, h, bpp, p.length,
            sums(0).toDouble / npix, sums(1).toDouble / npix, sums(2).toDouble / npix))
        }
      }
    }

  /** D2's typed decode pipeline — what downstream consumers compose
    * with; the spec pins it equal to the codegen'd SQL decode of
    * [[mmFeatureExtract]]. */
  def mmFeatures(spark: SparkSession, dir: String, batchSize: Int = 64): Dataset[MmFeatures] = {
    import spark.implicits._
    mmFeaturesTyped(bmpTable(spark, dir).select($"doc_id", $"payload").as[MmItem], batchSize)
  }

  /** Item-based core of the typed decode path — lets the quarantine be
    * pinned on crafted payloads, not just the generator corpus. */
  def mmFeaturesTyped(items: Dataset[MmItem], batchSize: Int = 64): Dataset[MmFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBmp)
    }
  }

  /** D3 `mm_dedup` — content-hash dedup of binary payloads: the
    * image/audio dedup primitive (identical bytes → identical md5 →
    * one keeper). Corpus = mm table ∪ an exact re-ingest (ids + 1e6,
    * same payloads) so every payload provably collapses to one group.
    * One hash-partitioned groupBy on the 128-bit digest — no payload
    * bytes ever shuffle (only the hash and the id), which is the whole
    * point at media scale. */
  def mmDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mm = mmTable(spark, dir).select($"doc_id", $"payload")
    val corpus = mm.unionAll(
      mm.select(($"doc_id" + NearDup.BigOffset).as("doc_id"), $"payload"))
    corpus
      .select($"doc_id", md5($"payload").as("payload_md5"))
      .groupBy($"payload_md5")
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper_id"))
  }

  /** Oracle hashes the VARCHAR text — the same utf-8 bytes the Spark
    * side hashes as binary, so the digests agree. */
  val mmDedupSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + ${NearDup.BigOffset}, text FROM documents)
       |SELECT md5(text) AS payload_md5, COUNT(*) AS n_copies,
       |       MIN(doc_id) AS keeper_id
       |FROM corpus GROUP BY 1""".stripMargin

  /** D2 `mm_feature_extract` — BMP header + pixel-statistics decode as
    * a pure columnar plan: the header ints come out of little-endian
    * hex slices (`hex`/`conv` — codegen'd string ops), and the channel
    * sums fold over the BINARY payload directly — `substring` on a
    * binary column is fixed-width byte slicing (O(1) per access, unlike
    * a decoded UTF8 string whose per-char substring is a linear scan
    * that would make the fold O(npix²) per image). No UDF, no
    * interpreter, scan-parallel at any scale. Hash-gated: the oracle
    * recomputes every decoded value from the image generator's closed
    * form, so a decoder that misreads any header field or pixel stride
    * mismatches immediately. */
  def mmFeatureExtract(spark: SparkSession, dir: String): DataFrame =
    mmFeatureExtractFrame(bmpTable(spark, dir))

  /** Frame-based core of D2's columnar path (bmp = (doc_id, payload))
    * — lets the quarantine be pinned on crafted payloads, not just the
    * generator corpus. */
  def mmFeatureExtractFrame(bmp: DataFrame): DataFrame = {
    import bmp.sparkSession.implicits._
    bmp
      .filter(hex(substring($"payload", 1, 2)) === "424D") // magic
      .withColumn("width_px", leInt(19, 4))
      .withColumn("h_raw", leInt(23, 4)) // SIGNED: negative = top-down
      .withColumn("bpp", leInt(29, 2))
      .withColumn("data_off", leInt(11, 4))
      .withColumn("n_bytes", length($"payload"))
      // lattice height is |h| in either orientation; abs on the LONG
      // (an ANSI abs(Int.MinValue) would throw instead of letting the
      // quarantine drop the row). Whole-image channel means are
      // row-order independent, so the fold below serves both layouts.
      .withColumn("habs", abs($"h_raw".cast("long")))
      // same quarantine as the typed decodeBmp: only 24bpp images
      // whose declared |h| 4-byte-aligned rows actually fit inside the
      // payload decode — anything else (wrong depth, or a data offset
      // pointing past the bytes) would decode silently wrong, not
      // drop. Long arithmetic: crafted headers must quarantine, not
      // overflow.
      .withColumn("stride",
        expr("((cast(width_px as bigint) * 3 + 3) div 4) * 4"))
      // division form: `stride * habs` would overflow (ANSI: throw;
      // legacy: wrap past the check) for w ≈ h ≈ 2³¹ crafted headers —
      // a negative numerator (data_off past the payload) quarantines
      // via the <= comparison against a negative quotient. The divisor
      // is greatest(stride, 4): total even if Catalyst splits/reorders
      // the pushed-down conjuncts and evaluates it before width_px > 0
      // (a zero-width crafted header would otherwise throw
      // DIVIDE_BY_ZERO under ANSI instead of quarantining); for any
      // surviving row width_px ≥ 1 ⇒ stride ≥ 4, so the guard never
      // changes the decoded set
      .filter($"bpp" === 24 && $"width_px" > 0 && $"habs" > 0 &&
        $"data_off" >= 54 &&
        $"habs" <= expr("(cast(n_bytes as bigint) - data_off) div greatest(stride, 4L)"))
      // surviving rows have stride·|h| ≤ n_bytes < 2³¹ → int-safe
      .withColumn("height_px", $"habs".cast("int"))
      // decode exactly the declared lattice (padding + trailing bytes
      // ignored): pixel p = (p div w, p % w) reads its 3 bytes at
      // data_off + row·stride + col·3
      .withColumn("npix", $"width_px".cast("long") * $"height_px")
      // byte_at: graft's codegen'd bounds-checked byte read (registered
      // via GraftExtensions) — one array access per pixel byte, no
      // hex/conv string churn inside the fold
      .withColumn("means", expr(
        """transform(sequence(0, 2), ch ->
          |  round(aggregate(sequence(0, cast(npix as int) - 1),
          |                  0L, (acc, p) -> acc + cast(byte_at(payload,
          |                    data_off + (p div width_px) * cast(stride as int)
          |                    + (p % width_px) * 3 + ch) as bigint))
          |        / cast(npix as double), 6))""".stripMargin))
      .select($"doc_id", $"width_px", $"height_px", $"bpp", $"n_bytes",
        $"means".getItem(0).as("mean_b"), $"means".getItem(1).as("mean_g"),
        $"means".getItem(2).as("mean_r"))
  }

  /** D4 `mm_resize` — nearest-neighbor 2× downsample of the decoded
    * BMPs: output pixel (r, c) reads source pixel (2r, 2c), and the
    * per-channel means of the downsampled image are folded straight
    * off the binary payload at the computed source offsets — resize as
    * pure columnar byte arithmetic, no intermediate image ever
    * materialized (what a thumbnail/feature pass wants at scale: the
    * decode-transform-reduce pipeline fuses into the scan). Hash-gated:
    * the oracle recomputes the downsampled lattice means from the
    * generator's closed form, so a resize that samples the wrong
    * source pixel (stride/offset bug) diverges immediately. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    mmResizeFrame(bmpTable(spark, dir))

  /** Frame-based core of D4 (bmp = (doc_id, payload)). */
  def mmResizeFrame(bmp: DataFrame): DataFrame = {
    import bmp.sparkSession.implicits._
    bmp
      .filter(hex(substring($"payload", 1, 2)) === "424D")
      .withColumn("w", leInt(19, 4))
      .withColumn("h_raw", leInt(23, 4)) // SIGNED: negative = top-down
      .withColumn("bpp", leInt(29, 2))
      .withColumn("data_off", leInt(11, 4))
      .withColumn("habs", abs($"h_raw".cast("long")))
      // same quarantine as the typed decodeBmp (magic alone is not
      // validity): 24bpp, declared |h| 4-byte-aligned rows inside the
      // payload — a non-generator BMP must drop, not resize with the
      // wrong stride or read past the pixel block
      .withColumn("stride", expr("((cast(w as bigint) * 3 + 3) div 4) * 4"))
      // division form — same overflow-proof check as the decode path
      .filter($"bpp" === 24 && $"w" > 0 && $"habs" > 0 &&
        $"data_off" >= 54 &&
        $"habs" <= expr("(cast(length(payload) as bigint) - data_off) div stride"))
      .withColumn("h", $"habs".cast("int")) // int-safe post-filter
      .withColumn("out_w", expr("cast(w div 2 as int)"))
      .withColumn("out_h", expr("cast(h div 2 as int)"))
      // a 2x downsample of a 1-pixel-wide/high image is empty, not a
      // zero-length fold (sequence(0,-1) would count DOWN)
      .filter($"out_w" > 0 && $"out_h" > 0)
      // source pixel = IMAGE (2·(p div out_w), 2·(p % out_w)); image
      // row rᵢ lives at stored row rᵢ when top-down (h_raw < 0) and at
      // h−1−rᵢ in the standard bottom-up layout — a resize that reads
      // stored rows directly would sample the bottom of a bottom-up
      // image and diverge from the closed-form oracle
      .withColumn("means", expr(
        """transform(sequence(0, 2), ch ->
          |  round(aggregate(sequence(0, out_w * out_h - 1), 0L,
          |    (acc, p) -> acc + cast(byte_at(payload,
          |      data_off + (if(h_raw < 0, (p div out_w) * 2,
          |                     h - 1 - (p div out_w) * 2)) * cast(stride as int)
          |      + (p % out_w) * 2 * 3 + ch) as bigint))
          |  / cast(out_w * out_h as double), 6))""".stripMargin))
      .select($"doc_id", $"out_w", $"out_h",
        $"means".getItem(0).as("mean_b"), $"means".getItem(1).as("mean_g"),
        $"means".getItem(2).as("mean_r"))
  }

  /** Oracle: means over the even-lattice source pixels of the
    * generator's closed form. */
  val mmResizeSql: String =
    """WITH img AS (
      |  SELECT doc_id,
      |         CAST(3 + doc_id % 8 AS INT) AS w,
      |         CAST(2 + doc_id % 6 AS INT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT doc_id, w, h, w // 2 AS out_w, h // 2 AS out_h, t.p AS p
      |  FROM img, unnest(generate_series(0, (w // 2) * (h // 2) - 1)) AS t(p))
      |SELECT doc_id, CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
      |       round(SUM((doc_id * 7 + ((p // out_w) * 2) * 31 + ((p % out_w) * 2) * 13 + 0 * 101) % 256)
      |             / CAST(out_w * out_h AS DOUBLE), 6) AS mean_b,
      |       round(SUM((doc_id * 7 + ((p // out_w) * 2) * 31 + ((p % out_w) * 2) * 13 + 1 * 101) % 256)
      |             / CAST(out_w * out_h AS DOUBLE), 6) AS mean_g,
      |       round(SUM((doc_id * 7 + ((p // out_w) * 2) * 31 + ((p % out_w) * 2) * 13 + 2 * 101) % 256)
      |             / CAST(out_w * out_h AS DOUBLE), 6) AS mean_r
      |FROM px GROUP BY doc_id, out_w, out_h""".stripMargin

  /** D5 `mm_frame_sample` — fixed-size frame extraction + temporal
    * sampling over the video-kind payloads: the payload is treated as
    * `frameBytes`-sized frames (trailing partial frame dropped), every
    * `step`-th frame is kept, and each kept frame ships only its index
    * and content digest — the frame-sampling shape of a video pipeline,
    * where the sampled frames feed a decoder/embedder downstream and
    * the shuffle carries digests, never frame bytes. Per-row explode,
    * no shuffle. Hash-gated: the corpus is ASCII, so the oracle's
    * VARCHAR substring sees the identical bytes Spark's binary
    * substring does and the digests must agree exactly. */
  def mmFrameSample(spark: SparkSession, dir: String,
                    frameBytes: Int = 64, step: Int = 2): DataFrame = {
    import spark.implicits._
    mmTable(spark, dir)
      .filter($"kind" === "video")
      .withColumn("n_frames", expr(s"cast(length(payload) div $frameBytes as int)"))
      .filter($"n_frames" >= 1)
      .select($"doc_id", $"n_frames", $"payload",
        explode(expr(s"sequence(0, n_frames - 1, $step)")).as("frame_idx"))
      .select($"doc_id", $"n_frames", $"frame_idx".cast("int").as("frame_idx"),
        md5(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_md5"))
  }

  def mmFrameSampleSql(frameBytes: Int = 64, step: Int = 2): String =
    s"""WITH vid AS (
       |  SELECT doc_id, text, CAST(length(text) // $frameBytes AS INT) AS n_frames
       |  FROM documents WHERE doc_id % 3 = 2),
       |fr AS (
       |  SELECT doc_id, text, n_frames, t.f AS frame_idx
       |  FROM vid, unnest(generate_series(0, n_frames - 1, $step)) AS t(f)
       |  WHERE n_frames >= 1)
       |SELECT doc_id, n_frames, CAST(frame_idx AS INT) AS frame_idx,
       |       md5(substring(text, frame_idx * $frameBytes + 1, $frameBytes)) AS frame_md5
       |FROM fr""".stripMargin

  /** Oracle: the generator's closed form — header fields from the
    * doc_id formulas, channel means as exact integer sums over the
    * pixel lattice. Anything the decoder misparses diverges. */
  val mmFeatureExtractSql: String =
    """WITH img AS (
      |  SELECT doc_id,
      |         CAST(3 + doc_id % 8 AS INT) AS w,
      |         CAST(2 + doc_id % 6 AS INT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT doc_id, w, h, t.p AS p
      |  FROM img, unnest(generate_series(0, w * h - 1)) AS t(p))
      |SELECT doc_id, w AS width_px, h AS height_px, CAST(24 AS INT) AS bpp,
      |       CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INT) AS n_bytes,
      |       round(SUM((doc_id * 7 + (p // w) * 31 + (p % w) * 13 + 0 * 101) % 256)
      |             / CAST(w * h AS DOUBLE), 6) AS mean_b,
      |       round(SUM((doc_id * 7 + (p // w) * 31 + (p % w) * 13 + 1 * 101) % 256)
      |             / CAST(w * h AS DOUBLE), 6) AS mean_g,
      |       round(SUM((doc_id * 7 + (p // w) * 31 + (p % w) * 13 + 2 * 101) % 256)
      |             / CAST(w * h AS DOUBLE), 6) AS mean_r
      |FROM px GROUP BY doc_id, w, h""".stripMargin
}
