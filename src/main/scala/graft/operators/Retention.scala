package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AGE-BASED RETENTION — the GDPR/TTL loop a curation pipeline runs
  * on its serving indexes, end-to-end.
  *
  * Both index families already expose the exact forget path
  * ([[TextAnalysis.bm25Delete]], [[Similarity.ivfDelete]] — tombstone
  * + commit row) and the physical reclaim
  * ([[TextAnalysis.bm25Vacuum]], [[Similarity.ivfCompact]] — under
  * the writer lease and the read-pin retention gate). What a
  * deployment schedules is the COMPOSITION: select the expired ids
  * from a metadata frame, tombstone them, then opportunistically
  * reclaim — deferring, not failing, when a reader pin or another
  * maintainer holds the index. Every step is idempotent and
  * re-drivable, so the cycle can run from cron unsupervised: a
  * deferred reclaim simply happens on the next tick (the reference's
  * re-drivable batch posture, arxiv_etl.py:42-58).
  */
object Retention {

  /** Tombstone every doc whose `tsCol` in `meta` is strictly older
    * than `cutoff` from a raw BM25 index. `meta` is the corpus's
    * metadata table (doc_id + timestamp — the pipeline's own landed
    * table, not the index); unindexed and already-deleted ids are
    * no-ops by [[TextAnalysis.bm25Delete]]'s idempotence. */
  def bm25DeleteOlderThan(spark: SparkSession, path: String,
                          meta: DataFrame, tsCol: String,
                          cutoff: Column): Unit =
    TextAnalysis.bm25Delete(spark, path,
      meta.filter(col(tsCol) < cutoff).select(col("doc_id")))

  /** Tombstone every vector whose `tsCol` in `meta` is strictly older
    * than `cutoff` from a persisted IVF index. */
  def ivfDeleteOlderThan(spark: SparkSession, path: String,
                         meta: DataFrame, tsCol: String,
                         cutoff: Column): Unit =
    Similarity.ivfDelete(spark, path,
      meta.filter(col(tsCol) < cutoff).select(col("doc_id").as("vec_id")))

  /** One scheduled maintenance tick for a raw BM25 index: expire by
    * age, then attempt the physical reclaim. Returns whether the
    * vacuum ran — `false` means it was DEFERRED because a reader pin
    * or another maintainer's lease is live, which is the normal
    * outcome to retry next tick, never an error. The tombstones are
    * already committed either way: expired docs stop being served
    * immediately; only the disk reclaim waits. */
  def bm25RetentionCycle(spark: SparkSession, path: String,
                         meta: DataFrame, tsCol: String, cutoff: Column,
                         maxFilesPerBucket: Int = 1): Boolean = {
    bm25DeleteOlderThan(spark, path, meta, tsCol, cutoff)
    try { TextAnalysis.bm25Vacuum(spark, path, maxFilesPerBucket); true }
    catch {
      case _: graft.sources.Lake.PinnedSnapshotException => false
      case _: graft.sources.Lake.ConcurrentMaintenanceException => false
    }
  }

  /** One scheduled maintenance tick for a persisted IVF index —
    * [[bm25RetentionCycle]]'s shape: expire by age, then attempt
    * compaction, deferring (not failing) under a pin or lease. */
  def ivfRetentionCycle(spark: SparkSession, path: String,
                        meta: DataFrame, tsCol: String, cutoff: Column,
                        maxFilesPerCell: Int = 1): Boolean = {
    ivfDeleteOlderThan(spark, path, meta, tsCol, cutoff)
    try { Similarity.ivfCompact(spark, path, maxFilesPerCell); true }
    catch {
      case _: graft.sources.Lake.PinnedSnapshotException => false
      case _: graft.sources.Lake.ConcurrentMaintenanceException => false
    }
  }
}
