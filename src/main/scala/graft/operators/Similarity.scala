package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2 C5-C7):
  * cosine near-dup pairs, brute-force ANN (the correctness baseline),
  * and LSH-bucketed ANN (the scale path).
  *
  * Vector math is pure higher-order functions (`zip_with` +
  * `aggregate`) over `array<float>` — no UDF, no driver collect. Norms
  * are computed once per row before any join so the pair stage only
  * multiplies and divides.
  */
object Similarity {
  import graft.functions.VectorExpressions.{dotF, hyperplane}

  /** Codegen'd sequential-fold dot product (double accumulation) —
    * see [[graft.functions.VectorExpressions.DotProductFloat]]. */
  private def dot(a: String, b: String): Column = dotF(col(a), col(b))

  private def l2norm(a: String): Column = sqrt(dotF(col(a), col(a)))

  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"), l2norm("embedding").as("norm"))

  /** C5 `embedding_dedup` — embedding-cosine near-dup pairs ≥ threshold.
    * Brute-force all-pairs (id1 < id2) — the CORRECTNESS baseline; the
    * scale path for the same semantics is C7's LSH bucketing (candidate
    * pairs ∝ bucket collisions, not n²). Output is pair ids only: the
    * threshold (0.4002) sits in an empirically verified empty gap of
    * the cosine distribution, so float noise between engines cannot
    * flip membership. */
  def embeddingDedup(spark: SparkSession, dir: String, threshold: Double = 0.4002): DataFrame = {
    import spark.implicits._
    val e = withNorm(spark, dir)
    val a = e.select($"vec_id".as("id1"), $"embedding".as("va"), $"norm".as("na"))
    val b = e.select($"vec_id".as("id2"), $"embedding".as("vb"), $"norm".as("nb"))
    a.crossJoin(b)
      .filter($"id1" < $"id2")
      .withColumn("cosine", dot("va", "vb") / ($"na" * $"nb"))
      .filter($"cosine" >= threshold)
      .select($"id1", $"id2")
  }

  def embeddingDedupSql(threshold: Double = 0.4002): String =
    s"""SELECT a.vec_id AS id1, b.vec_id AS id2
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |  AND list_cosine_similarity(a.embedding, b.embedding) >= $threshold""".stripMargin

  /** C6 `ann_bruteforce` — exact cosine top-k neighbors for a bounded
    * query set (vec_id < 20). The query side is tiny and explicitly
    * `broadcast()` so the corpus never shuffles: each corpus partition
    * scores its rows against all queries, and the global top-k per
    * query reduces through TakeOrdered-style window pruning. Ranks are
    * tie-broken by neighbor id. Output ids+rank only (float-noise-proof
    * given random-data cosine gaps ≫ engine ulp differences). */
  def annBruteforce(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 20): DataFrame = {
    import spark.implicits._
    val e = withNorm(spark, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("vq"), $"norm".as("nq"))
    val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("vc"), $"norm".as("nc"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    broadcast(q).crossJoin(c)
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cosine", dot("vq", "vc") / ($"nq" * $"nc"))
      .withColumn("rank_nn", row_number().over(w))
      .filter($"rank_nn" <= k)
      .select($"query_id", $"neighbor_id", $"rank_nn")
  }

  def annBruteforceSql(k: Int = 5, nQueries: Int = 20): String =
    s"""SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank_nn
       |FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         row_number() OVER (
       |           PARTITION BY a.vec_id
       |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
       |  FROM embeddings a, embeddings b
       |  WHERE a.vec_id < $nQueries AND a.vec_id <> b.vec_id)
       |WHERE rn <= $k""".stripMargin

  /** C7b `ann_ivf` — IVF (inverted-file) coarse-quantizer ANN: assign
    * every vector to its nearest of `nlist` centroids (one Lloyd
    * refinement over deterministic seed centroids), build the inverted
    * lists, then answer each query by scanning only its `nprobe`
    * nearest lists. Candidates ∝ probed-list sizes (~nprobe/nlist of
    * the corpus), not n² — the standard billion-vector ANN layout; at
    * cluster scale the inverted lists are the partitioning keys so a
    * probe touches only those partitions.
    *
    * Rows-only oracle (centroid geometry is implementation-specific);
    * the spec asserts the IVF invariants: neighbors come only from
    * probed cells and ranks are within k. */
  def annIvf(spark: SparkSession, dir: String, nlist: Int = 16, nprobe: Int = 2,
             k: Int = 5, nQueries: Int = 50): DataFrame = {
    import spark.implicits._
    val e = withNorm(spark, dir).persist()
    // deterministic seed centroids; one Lloyd step: assign → per-cell mean
    val seeds = e.filter($"vec_id" < nlist)
      .select($"vec_id".cast("int").as("cid"), $"embedding".as("cvec"), $"norm".as("cnorm"))
    def nearestCell(vecs: DataFrame, cents: DataFrame, outPrefix: String, n: Int): DataFrame = {
      val scored = vecs.crossJoin(broadcast(cents))
        .withColumn("csim", dot("embedding", "cvec") / ($"norm" * $"cnorm"))
      if (n == 1) {
        // single nearest centroid: max_by hash-aggregate — no sort, no
        // window shuffle-and-order over corpus × centroids; ties break
        // to the lowest cell id like the window's (csim desc, cid asc)
        scored
          .groupBy($"vec_id")
          .agg(max_by(
            struct($"embedding", $"norm", $"cid"),
            struct($"csim", -$"cid")).as("best"))
          .select($"vec_id", $"best.embedding".as("embedding"),
            $"best.norm".as("norm"), $"best.cid".as(s"${outPrefix}cid"),
            lit(1).as(s"${outPrefix}rank"))
      } else {
        val w = Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cid")
        scored
          .withColumn("crank", row_number().over(w))
          .filter($"crank" <= n)
          .select($"vec_id", $"embedding", $"norm", $"cid".as(s"${outPrefix}cid"),
            $"crank".as(s"${outPrefix}rank"))
      }
    }
    val assigned0 = nearestCell(e, seeds, "a", 1)
    val centroids = assigned0
      .select($"acid".as("cid"), posexplode($"embedding"))
      .groupBy($"cid", $"pos")
      .agg(avg($"col".cast("double")).as("m"))
      .groupBy($"cid")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
      .select($"cid", expr("transform(pm, x -> cast(x.m as float))").as("cvec"))
      .withColumn("cnorm", sqrt(dotF(col("cvec"), col("cvec"))))
    val lists = nearestCell(e, centroids, "l", 1)
      .select($"lcid".as("cell"), $"vec_id".as("neighbor_id"),
        $"embedding".as("vc"), $"norm".as("nc"))
    val probes = nearestCell(e.filter($"vec_id" < nQueries), centroids, "p", nprobe)
      .select($"pcid".as("cell"), $"vec_id".as("query_id"),
        $"embedding".as("vq"), $"norm".as("nq"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    probes.join(lists, Seq("cell"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cosine", dot("vq", "vc") / ($"nq" * $"nc"))
      .withColumn("rank_nn", row_number().over(w))
      .filter($"rank_nn" <= k)
      .select($"query_id", $"neighbor_id", $"cell", $"rank_nn", $"cosine")
  }

  /** C16 `centroid_per_label` — mean embedding per label, emitted one
    * row per (label, dim): posexplode the vectors and average per
    * (label, pos) — a pure two-phase hash aggregate (map-side partial
    * sums), the distributed form of "class centroids" every
    * embedding-space analysis starts with. Output is flat (label, pos,
    * c_mean) rather than re-assembled arrays: array cells can't be
    * hash-compared by the gate, and downstream Spark consumers can
    * `collect_list` over pos when they need the vector back.
    * c_mean rounded to 4dp: double partial-sum association differs
    * across engines/partitionings at ~1e-13; the boundary-flip risk at
    * 1e-4 is measure-zero. */
  def centroidPerLabel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"label", posexplode($"embedding"))
      .groupBy($"label", $"pos")
      .agg(round(avg($"col".cast("double")), 4).as("c_mean"),
        count(lit(1)).as("n_vecs"))
  }

  val centroidPerLabelSql: String =
    """SELECT label, CAST(i - 1 AS INT) AS pos,
      |       round(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 4) AS c_mean,
      |       COUNT(*) AS n_vecs
      |FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
      |GROUP BY 1, 2""".stripMargin

  /** C17 `knn_classify` — k-NN label prediction: for each query vector
    * (vec_id < nQueries), take the k nearest labeled corpus vectors by
    * cosine (corpus = the rest) and vote; ties break to the smaller
    * label. The canonical application layer over ANN — swap the
    * brute-force neighbor stage for C7/C7b buckets at scale, the vote
    * aggregation is identical. Query side broadcast; corpus never
    * shuffles before the per-query top-k. */
  def knnClassify(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 50): DataFrame = {
    import spark.implicits._
    val e = withNorm(spark, dir)
      .join(Tables.embeddings(spark, dir).select($"vec_id", $"label"), Seq("vec_id"))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("vq"), $"norm".as("nq"))
    val c = e.filter($"vec_id" >= nQueries)
      .select($"vec_id".as("neighbor_id"), $"label", $"embedding".as("vc"), $"norm".as("nc"))
    val wNn = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    val wVote = Window.partitionBy($"query_id").orderBy($"votes".desc, $"label")
    broadcast(q).crossJoin(c)
      .withColumn("cosine", dot("vq", "vc") / ($"nq" * $"nc"))
      .withColumn("rank_nn", row_number().over(wNn))
      .filter($"rank_nn" <= k)
      .groupBy($"query_id", $"label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vote_rank", row_number().over(wVote))
      .filter($"vote_rank" === 1)
      .select($"query_id", $"label".as("pred_label"), $"votes")
  }

  def knnClassifySql(k: Int = 5, nQueries: Int = 50): String =
    s"""WITH nn AS (
       |  SELECT query_id, label
       |  FROM (
       |    SELECT a.vec_id AS query_id, b.label,
       |           row_number() OVER (
       |             PARTITION BY a.vec_id
       |             ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
       |    FROM embeddings a, embeddings b
       |    WHERE a.vec_id < $nQueries AND b.vec_id >= $nQueries)
       |  WHERE rn <= $k),
       |votes AS (
       |  SELECT query_id, label, COUNT(*) AS votes FROM nn GROUP BY 1, 2)
       |SELECT query_id, label AS pred_label, votes
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY votes DESC, label) AS vr FROM votes)
       |WHERE vr = 1""".stripMargin

  /** C7 `ann_lsh` — random-hyperplane LSH approximate neighbors: 6
    * sign-bits from deterministic pseudo-random hyperplanes (weights
    * derived from xxhash64 — reproducible on any cluster with no
    * broadcast of plane matrices) → 64 buckets; candidates only within
    * a bucket. Output: per candidate pair in the same bucket, ranked by
    * cosine per query.
    *
    * Scale: this is the ANN shape for 100 TB — bucket id is the shuffle
    * key; recall tunes with planes/probes, compute ∝ bucket sizes.
    * Rows-only oracle (hash-specific); spec checks bucket partitioning
    * invariants + self-recall of planted twins. */
  def annLsh(spark: SparkSession, dir: String, planes: Int = 6, k: Int = 5): DataFrame = {
    import spark.implicits._
    val dims = 64
    // plane weights are deterministic (hash-derived) and computed once
    // driver-side — they ride into the plan as literals, so bucket
    // assignment is `planes` codegen'd dot products per row.
    val bucketCol = (0 until planes).map { p =>
      when(dotF(col("embedding"), typedLit(hyperplane(p, dims))) > 0d, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    val e = withNorm(spark, dir).withColumn("bucket", bucketCol)
    val a = e.select($"bucket", $"vec_id".as("query_id"), $"embedding".as("vq"), $"norm".as("nq"))
    val b = e.select($"bucket", $"vec_id".as("neighbor_id"), $"embedding".as("vc"), $"norm".as("nc"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    a.join(b, Seq("bucket"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cosine", dot("vq", "vc") / ($"nq" * $"nc"))
      .withColumn("rank_nn", row_number().over(w))
      .filter($"rank_nn" <= k)
      .select($"query_id", $"neighbor_id", $"bucket", $"rank_nn", $"cosine")
  }
}
