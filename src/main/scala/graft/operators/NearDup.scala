package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection family over `documents` (SURVEY.md §2
  * C2-C4, C11) — the core of a pre-training dedup pipeline.
  *
  * Every operator here runs against documents ∪ a planted re-crawl
  * (ids offset by 1,000,000, same or truncated text) so the detector
  * provably finds the known duplicates at any SF — the self-test corpus
  * a dedup pipeline ships with.
  *
  * Scale design (the whole point of MinHash/SimHash): candidate pairs
  * come only from hash-bucket collisions — the shuffle is
  * O(docs × bands), and pair generation is quadratic only WITHIN a
  * bucket, never globally. Oversized buckets (degenerate content) are
  * capped and dropped; `id1 < id2` halves pair work everywhere.
  *
  * CACHING CONTRACT: operators here persist() multi-consumer
  * intermediates (signature/band tables feed two join sides — without
  * the cache the whole signature compute runs twice). Those caches are
  * still referenced by the RETURNED plan, so they cannot be released
  * inside the operator; after the caller's terminal action, release
  * them with `df.sparkSession.catalog.clearCache()` (what Verify/Bench
  * do) or rely on Spark's LRU block eviction. dedupCluster is the
  * exception: its loop materializes each generation eagerly, so it
  * unpersists superseded frames itself and leaks nothing.
  */
object NearDup {

  private val BigOffset = 1000000L

  /** documents ∪ exact re-crawl (planted dups, ids + 1e6). */
  private def corpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    Tables.fanout(docs.unionAll(
      docs.select(($"doc_id" + BigOffset).as("doc_id"), $"text")))
  }

  /** doc_id + distinct word-3-gram shingles (docs with ≥3 tokens). */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .filter(size($"toks") >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
      .select($"doc_id", $"shingles")
  }

  /** C2 `minhash_lsh_dedup` — MinHash signatures + LSH banding.
    * k=16 minhashes (xxhash64 seeded per slot, min over shingles),
    * 4 bands × 4 rows; docs sharing any band-signature bucket become
    * candidate pairs; est_jaccard = matching signature fraction.
    *
    * Scale: signature compute is per-row (higher-order fns, no UDF);
    * the only shuffle is the band-bucket self-join, proportional to
    * collisions. Buckets larger than `bucketCap` are dropped (degenerate
    * boilerplate would otherwise go quadratic) — exactly what
    * production LSH dedup does. Rows-only oracle (no portable SQL for
    * seeded xxhash64); the planted twins must all surface, which the
    * spec asserts. */
  def minhashLshDedup(spark: SparkSession, dir: String, bucketCap: Int = 1000): DataFrame = {
    import spark.implicits._
    val sigs = shingled(spark, dir)
      .withColumn("sig", graft.functions.VectorExpressions.minhashSig($"shingles", 16))
      .select($"doc_id", $"sig")
    // persist: the band table feeds three consumers (bucket sizing +
    // both join sides) — without it the shingling+signature lineage
    // recomputes per consumer. At cluster scale this is the
    // "materialize the signature table" step of any LSH pipeline.
    val bands = sigs
      .select($"doc_id", $"sig", posexplode(expr(
        """transform(sequence(0, 3),
          |  b -> xxhash64(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3], b))""".stripMargin)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_sig")
      .persist()
    val smallBuckets = bands
      .groupBy($"band_idx", $"band_sig")
      .agg(count(lit(1)).as("bucket_n"))
      .filter($"bucket_n" > 1 && $"bucket_n" <= bucketCap)
      .select($"band_idx", $"band_sig")
    val bucketed = bands.join(smallBuckets, Seq("band_idx", "band_sig"))
    val a = bucketed.select($"band_idx", $"band_sig", $"doc_id".as("id1"), $"sig".as("sig1"))
    val b = bucketed.select($"band_idx", $"band_sig", $"doc_id".as("id2"), $"sig".as("sig2"))
    a.join(b, Seq("band_idx", "band_sig"))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2",
        expr("aggregate(zip_with(sig1, sig2, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v) / 16.0")
          .as("est_jaccard"))
      .distinct()
  }

  /** C3 `simhash_dedup` — 64-bit SimHash fingerprints + hamming-band
    * candidate join. Each bit is the sign of the token-weight sum on
    * that bit position; near-identical docs differ in few bits. Bands:
    * 4 × 16-bit slices — a pair within hamming distance 3 of each other
    * is guaranteed to collide on at least one band slice (pigeonhole).
    * Same bucket-join scale shape as C2; rows-only oracle, spec asserts
    * the planted twins surface at hamming 0. */
  def simhashDedup(spark: SparkSession, dir: String, maxHamming: Int = 8,
                   bucketCap: Int = 1000): DataFrame = {
    import spark.implicits._
    val fp = corpus(spark, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .filter(size($"toks") >= 1)
      .withColumn("simhash", graft.functions.VectorExpressions.simhash64($"toks"))
      .select($"doc_id", $"simhash")
    val bands = fp.select($"doc_id", $"simhash",
        posexplode(expr(
          "transform(sequence(0, 3), b -> (simhash >> (16 * b)) & 65535)")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
      .persist()
    val smallBuckets = bands
      .groupBy($"band_idx", $"band_val")
      .agg(count(lit(1)).as("bucket_n"))
      .filter($"bucket_n" > 1 && $"bucket_n" <= bucketCap)
      .select($"band_idx", $"band_val")
    val bucketed = bands.join(smallBuckets, Seq("band_idx", "band_val"))
    val a = bucketed.select($"band_idx", $"band_val", $"doc_id".as("id1"), $"simhash".as("h1"))
    val b = bucketed.select($"band_idx", $"band_val", $"doc_id".as("id2"), $"simhash".as("h2"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2", bit_count($"h1".bitwiseXOR($"h2")).as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }

  /** C4 `ngram_jaccard_dedup` — exact n-gram Jaccard ≥ threshold via
    * PREFIX FILTERING (the AllPairs/PPJoin family): sort each doc's
    * shingle hashes in one global order and index only the first
    * |A| − ⌈τ·|A|⌉ + 1 of them — any pair with J ≥ τ has overlap
    * ≥ ⌈τ·|A|⌉, so it MUST collide inside both prefixes (pigeonhole).
    * Candidates come from the prefix-postings self-join (a τ-dependent
    * fraction of the full index), then verify exactly with one
    * `array_intersect` per candidate pair.
    *
    * Scale: shuffle volume ∝ prefix postings (τ=0.5 → half the index,
    * and candidate pairs shrink quadratically); the exact verify is
    * per-candidate, no global pass. Hot boilerplate shingles remain the
    * skew risk of any set-similarity join — cap document frequency
    * symmetrically on both engine and oracle if the corpus needs it.
    * Jaccard = one int division → hash-exact. 64-bit shingle-hash
    * collisions are ~n²·2⁻⁶⁴, immaterial even at 10⁹ shingles. */
  def ngramJaccardDedup(spark: SparkSession, dir: String,
                        threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    // persist: the hashed-set table feeds prefix postings + both
    // verification joins.
    val hashed = shingled(spark, dir)
      .select($"doc_id",
        expr("array_sort(transform(shingles, s -> xxhash64(s)))").as("sh_sorted"))
      .withColumn("n_sh", size($"sh_sorted"))
      .persist()
    val prefixes = hashed
      .select($"doc_id", explode(expr(
        s"slice(sh_sorted, 1, size(sh_sorted) - cast(ceil($threshold * size(sh_sorted)) as int) + 1)"))
        .as("sh"))
    val cand = prefixes.select($"doc_id".as("id1"), $"sh")
      .join(prefixes.select($"doc_id".as("id2"), $"sh"), Seq("sh"))
      .filter($"id1" < $"id2")
      // pack the pair into one long (ids < 2^31) for a one-word dedup key
      .select((shiftleft($"id1", 32) + $"id2").as("pair"))
      .distinct()
    // broadcast the per-doc set table into the verification joins: it
    // is ~kB-per-doc while candidates carry full arrays through any
    // shuffle — at lake scale swap broadcast for a co-bucketed join.
    cand
      .select(shiftright($"pair", 32).as("id1"),
        ($"pair".bitwiseAND(lit(0xffffffffL))).as("id2"))
      .join(broadcast(hashed.select($"doc_id".as("id1"), $"sh_sorted".as("sa"), $"n_sh".as("n1"))), Seq("id1"))
      .join(broadcast(hashed.select($"doc_id".as("id2"), $"sh_sorted".as("sb"), $"n_sh".as("n2"))), Seq("id2"))
      .withColumn("n_inter", size(array_intersect($"sa", $"sb")).cast("long"))
      .withColumn("jaccard",
        $"n_inter".cast("double") / ($"n1" + $"n2" - $"n_inter").cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"id1", $"id2", $"n_inter", $"jaccard")
  }

  def ngramJaccardDedupSql(threshold: Double = 0.5): String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + $BigOffset, text FROM documents),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM corpus),
       |shingles AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(len(l) - 2), i -> l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS sh
       |  FROM toks WHERE len(l) >= 3),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
       |  FROM shingles a JOIN shingles b USING (sh)
       |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id1, id2, n_inter,
       |       CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON s1.doc_id = id1
       |JOIN sizes s2 ON s2.doc_id = id2
       |WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= $threshold""".stripMargin

  /** C14 `dedup_cluster` — transitive closure of near-dup pairs into
    * clusters with one keeper per cluster: the step that turns pairwise
    * detections into an actual dedup decision (pairs A~B, B~C must keep
    * ONE of {A,B,C}). Label propagation over the pair graph: every node
    * starts labeled with its own id, then repeatedly takes the min
    * label across its neighbors until fixpoint — cluster id = min doc
    * id reachable; keeper = the node equal to its cluster id.
    *
    * Scale: each iteration is one join + one partial-agg groupBy
    * (both keyed on the node), iterations ∝ graph diameter — near-dup
    * graphs are overwhelmingly tiny cliques, so 2-3 rounds converge;
    * billion-edge/long-chain graphs switch to the large-star/small-star
    * contraction of Kiveris et al. The driver-side loop only checks a
    * convergence count per round; labels never leave the cluster.
    * Oracle: recursive CTE over the identical edge set. */
  def dedupCluster(spark: SparkSession, dir: String, threshold: Double = 0.5,
                   maxIters: Int = 10): DataFrame = {
    import spark.implicits._
    val edges = ngramJaccardDedup(spark, dir, threshold)
      .select($"id1", $"id2").persist()
    val bi = edges.unionAll(edges.select($"id2".as("id1"), $"id1".as("id2")))
      .toDF("n", "nbr").persist()
    var labels = bi.select($"n").distinct()
      .withColumn("label", $"n").persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = bi
        .join(labels.select($"n".as("nbr"), $"label".as("nbr_label")), Seq("nbr"))
        .groupBy($"n").agg(min($"nbr_label").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("n"))
        .select($"n", least($"label", $"nbr_min").as("label"))
        .persist()
      val changed = next.join(labels.select($"n", $"label".as("old")), Seq("n"))
        .filter($"label" =!= $"old").count()
      // `changed` materialized `next`, so the superseded generation (and
      // its lineage back through the join) is dead weight — release it
      // now or every iteration leaks one cached table.
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    // The final labels are materialized (by the last convergence count),
    // so the upstream caches are no longer needed by the returned plan.
    edges.unpersist()
    bi.unpersist()
    labels
      .select($"n".as("doc_id"), $"label".as("cluster_id"))
      .withColumn("is_keeper", ($"doc_id" === $"cluster_id").cast("boolean"))
  }

  def dedupClusterSql(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (${ngramJaccardDedupSql(threshold)}),
       |bi AS (SELECT id1 AS n, id2 AS nbr FROM pairs
       |       UNION SELECT id2, id1 FROM pairs),
       |reach(n, m) AS (
       |  SELECT DISTINCT n, n FROM bi
       |  UNION
       |  SELECT r.n, b.nbr FROM reach r JOIN bi b ON r.m = b.n)
       |SELECT n AS doc_id, MIN(m) AS cluster_id,
       |       n = MIN(m) AS is_keeper
       |FROM reach GROUP BY n""".stripMargin

  /** C11 `doc_fingerprint` — winnowing (rolling-hash) fingerprints:
    * hash every char 8-gram, keep the minimum of each sliding window of
    * 4 hashes, distinct. Guarantees any shared substring ≥ 11 chars
    * yields a shared fingerprint (the winnowing theorem), with density
    * 2/(w+1). Per-row higher-order fns only — scan-speed at any scale;
    * rows-only oracle (seeded-hash specific), spec asserts twin docs
    * share their full fingerprint set. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .filter(length($"text") >= 11)
      .withColumn("grams", expr(
        "transform(sequence(1, length(text) - 7), i -> xxhash64(substring(text, i, 8)))"))
      .withColumn("fingerprints", expr(
        """array_distinct(transform(sequence(0, size(grams) - 4),
          |  w -> array_min(slice(grams, w + 1, 4))))""".stripMargin))
      .select($"doc_id",
        size($"fingerprints").as("n_fingerprints"),
        hash($"fingerprints").as("fp_set_hash"))
  }
}
