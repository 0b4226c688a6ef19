package graft

/** Typed runtime configuration — the reference keeps every tunable in
  * one config.yaml (lookback months, batch sizes, retry budget:
  * config.yaml via arxiv_etl.py); this is that surface for the Spark
  * engine. One flat file feeds the registry entry points (and any
  * pipeline built on the library), so retuning a df cap or a probe
  * width is a config edit + rerun, not a redeploy.
  *
  * Fields default to the library's built-in values; the checked-in
  * `graft.conf` mirrors them, so the gate runs identically with or
  * without the file. The parser is a strict flat `key: value` subset
  * of YAML (comments `#`, blank lines, `=` also accepted) — no
  * external dependency, and an unknown or malformed key fails LOUDLY
  * (a typo that silently falls back to a default is how a production
  * retune silently doesn't happen).
  */
final case class GraftConfig(
    k: Int = 10,                 // retrieval top-k (BM25 / hybrid)
    dfCap: Int = 100,            // posting df cap (boilerplate cutoff)
    qMod: Int = 20,              // self-test panel stride
    nQueries: Int = 50,          // bounded serving-panel size
    nBuckets: Int = 16,          // BM25 index token-hash buckets
    nlist: Int = 16,             // IVF cells
    nprobe: Int = 2,             // IVF probe width (single-stage)
    shortlist: Int = 32,         // IVF rerank shortlist
    gapMinutes: Int = 30,        // sessionization inactivity gap
    wLex: Int = 2,               // hybrid_serve lexical RRF weight
    wSem: Int = 1,               // hybrid_serve semantic RRF weight
    dedupBucketCap: Int = 1000,  // LSH bucket cap (minhash/simhash blocking)
    maxHamming: Int = 8,         // simhash near-dup Hamming radius
    jaccardThreshold: Double = 0.5, // ngram/cross dedup similarity floor
    dedupDfCap: Int = 100,       // dedup posting df cap (hot-shingle cutoff)
    semDedupCellCap: Int = 2000, // semdedup per-cell pair-join cap (skew guard)
    semDedupDropFrac: Double = 0.5, // semdedup_budget: fraction of dup pairs to admit
    boilerplatePct: Int = 30,    // per-source boilerplate line threshold (% of the source's docs)
    bpeRounds: Int = 16,         // BPE merge-training rounds (≤ 26: control-char sentinels skip whitespace)
    sinkMaxAttempts: Int = 3,    // UpsertSink retry budget
    sinkInitialDelayMs: Long = 50, // UpsertSink first backoff
    catalogDir: String = "",     // durable index catalog root ("" = session-local)
    fleetManifest: String = "",  // MaintenanceMain's fleet file ("" = pass as arg)
    sweepMinReclaim: Double = 0.0, // retention sweep's rewrite ε-gate
    sweepMaxReclaims: Int = Int.MaxValue) // rewrite budget per sweep tick

object GraftConfig {

  /** Parse config text; unknown keys and unparseable values throw. */
  def parse(text: String): GraftConfig =
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .foldLeft(GraftConfig()) { (c, line) =>
        val (key, value) = line.takeWhile(_ != '#').split("[:=]", 2) match {
          case Array(k, v) => (k.trim, v.trim)
          case _ => throw new IllegalArgumentException(
            s"graft config: malformed line '$line' (want key: value)")
        }
        def i = value.toInt
        key match {
          case "k"                  => c.copy(k = i)
          case "dfCap"              => c.copy(dfCap = i)
          case "qMod"               => c.copy(qMod = i)
          case "nQueries"           => c.copy(nQueries = i)
          case "nBuckets"           => c.copy(nBuckets = i)
          case "nlist"              => c.copy(nlist = i)
          case "nprobe"             => c.copy(nprobe = i)
          case "shortlist"          => c.copy(shortlist = i)
          case "gapMinutes"         => c.copy(gapMinutes = i)
          case "wLex"               => c.copy(wLex = i)
          case "wSem"               => c.copy(wSem = i)
          case "dedupBucketCap"     => c.copy(dedupBucketCap = i)
          case "maxHamming"         => c.copy(maxHamming = i)
          case "jaccardThreshold"   => c.copy(jaccardThreshold = value.toDouble)
          case "dedupDfCap"         => c.copy(dedupDfCap = i)
          case "semDedupCellCap"    => c.copy(semDedupCellCap = i)
          case "semDedupDropFrac"   => c.copy(semDedupDropFrac = value.toDouble)
          case "boilerplatePct"     => c.copy(boilerplatePct = i)
          case "bpeRounds"          => c.copy(bpeRounds = i)
          case "sinkMaxAttempts"    => c.copy(sinkMaxAttempts = i)
          case "sinkInitialDelayMs" => c.copy(sinkInitialDelayMs = value.toLong)
          case "catalogDir"         => c.copy(catalogDir = value)
          case "fleetManifest"      => c.copy(fleetManifest = value)
          case "sweepMinReclaim"    => c.copy(sweepMinReclaim = value.toDouble)
          case "sweepMaxReclaims"   => c.copy(sweepMaxReclaims = i)
          case other => throw new IllegalArgumentException(
            s"graft config: unknown key '$other'")
        }
      }

  def load(path: String): GraftConfig =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** The ambient config the registry entry points read:
    * $GRAFT_CONF if set, else ./graft.conf if present, else the
    * built-in defaults. Resolved once per process. */
  lazy val ambient: GraftConfig =
    sys.env.get("GRAFT_CONF").map(load).getOrElse {
      val local = java.nio.file.Paths.get("graft.conf")
      if (java.nio.file.Files.exists(local)) parse(java.nio.file.Files.readString(local))
      else GraftConfig()
    }
}
