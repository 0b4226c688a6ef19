package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 D1-D2): media payloads as
  * opaque `binary` columns with typed metadata, and a batched
  * decode→feature pipeline whose decode step is STUBBED (no media libs
  * in this environment) while every Spark-side piece — schema,
  * partitioning, batching, output shape — is real.
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

  /** One decoded media item (input to the feature stage). */
  final case class MmItem(doc_id: Long, kind: String, payload: Array[Byte])
  /** Extracted features per item. */
  final case class MmFeatures(doc_id: Long, kind: String, n_bytes: Int,
                              features: Array[Float], feat_norm: Double)

  /** STUB decoder: a real implementation would decode image/audio/video
    * bytes (libjpeg/ffmpeg/...) and run a feature extractor; none of
    * those libs exist in this environment, so features are a
    * deterministic byte-histogram projection — the contract (fixed-dim
    * float vector per item) and everything around it is real. */
  private def decodeAndFeaturize(batch: Seq[MmItem]): Seq[MmFeatures] =
    batch.map { it =>
      val hist = new Array[Float](8)
      var i = 0
      while (i < it.payload.length) {
        hist((it.payload(i) & 0xff) % 8) += 1f
        i += 1
      }
      val n = math.max(it.payload.length, 1).toFloat
      val feats = hist.map(_ / n)
      MmFeatures(it.doc_id, it.kind, it.payload.length, feats,
        math.sqrt(feats.map(f => f.toDouble * f.toDouble).sum))
    }

  /** D2's typed decode→feature pipeline — what downstream vector
    * consumers (e.g. Similarity ops) compose with. `mapPartitions` +
    * `grouped(batchSize)` is the Scala analogue of arrow-batched decode
    * UDFs: items stream through in decoder-sized batches (real decoders
    * amortize model/codec init per batch), one task per partition, no
    * shuffle, output is a typed Dataset whose schema downstream ops
    * consume as columns. */
  def mmFeatures(spark: SparkSession, dir: String, batchSize: Int = 64): Dataset[MmFeatures] = {
    import spark.implicits._
    val items: Dataset[MmItem] =
      mmTable(spark, dir).select($"doc_id", $"kind", $"payload").as[MmItem]
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeAndFeaturize)
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

  /** D2 `mm_feature_extract` — the gate-facing form of [[mmFeatures]]. */
  def mmFeatureExtract(spark: SparkSession, dir: String, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    // Flatten the feature vector to scalar columns for the gate output:
    // the driver's rows-only check sorts result columns with pandas,
    // which cannot hash an array cell. Downstream Spark consumers that
    // want the vector use `mmFeatures` directly.
    val cols = Seq($"doc_id", $"kind", $"n_bytes") ++
      (0 until 8).map(i => round($"features".getItem(i), 6).as(s"f$i")) :+
      round($"feat_norm", 6).as("feat_norm")
    mmFeatures(spark, dir, batchSize).toDF().select(cols: _*)
  }
}
