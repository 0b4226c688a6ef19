package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side registry of per-file min/max stats for
  * `file_id`-partitioned lakes (the manifest a lakehouse scan planner
  * consults — Delta/Iceberg file stats). Keyed by the lake's
  * normalized root path; values are O(files) metadata, never O(rows).
  * Register via [[graft.operators.Govern.registerLakeStats]]; once
  * registered, [[StatsPruneRule]] turns ordinary filtered scans of the
  * path into partition-pruned scans automatically.
  *
  * Staleness contract: the rule prunes BY EXCLUSION (it skips only
  * files the registered stats PROVE disjoint from the predicate), so a
  * file appended to the lake after registration — absent from the
  * stats — is simply never excluded and its rows always survive.
  * Registration freshness therefore affects pruning EFFECTIVENESS,
  * never correctness. */
object StatsPruneRegistry {
  /** Per-column min/max, typed. Strings order by UTF8String binary
    * comparison (UTF-8 bytes = Unicode code points), the ordering the
    * parquet reader's own min/max stats use — NOT java.lang.String's
    * UTF-16 order, which disagrees on supplementary characters. */
  sealed trait ColBounds
  final case class LongBounds(mn: Long, mx: Long) extends ColBounds
  final case class StrBounds(mn: String, mx: String) extends ColBounds

  final case class FileStats(fileId: Int, bounds: Map[String, ColBounds])

  private val reg = scala.collection.concurrent.TrieMap[String, Seq[FileStats]]()

  /** Canonical key: URI authority + path (via hadoop Path, the same
    * parser the FileIndex uses), so "/tmp/lake", "file:/tmp/lake" and
    * "file:///tmp/lake" all key identically while distinct
    * filesystems ("hdfs://nn:8020/lake" vs "s3a://bucket/lake") stay
    * distinct. A naive scheme-strip left "///tmp/lake" unmatched —
    * a silent no-prune no-op. */
  private[graft] def normalize(path: String): String = {
    val uri = new org.apache.hadoop.fs.Path(path).toUri
    Option(uri.getAuthority).getOrElse("") +
      Option(uri.getPath).getOrElse("").replaceAll("/+$", "")
  }

  def register(path: String, stats: Seq[FileStats]): Unit =
    reg.put(normalize(path), stats)

  def unregister(path: String): Unit = reg.remove(normalize(path))

  def lookup(rootPaths: Seq[String]): Option[Seq[FileStats]] =
    rootPaths match {
      case Seq(only) => reg.get(normalize(only))
      case _ => None // multi-root scans: stats keyed per lake, skip
    }
}

/** Optimizer rule (registered via [[GraftExtensions]]): data-skipping
  * over a [[StatsPruneRegistry]]-registered lake WITHOUT the reader
  * having to know about `file_id`. F15's `stats_prune` emits the
  * pruning DECISION as a query; this rule is the same decision applied
  * inside Catalyst: a `Filter` directly over a registered parquet
  * relation gets the provably-disjoint file set injected as a
  * `NOT file_id IN (...)` conjunct, which the normal partition-pruning
  * machinery (FileSourceStrategy's partitionKeyFilters) then turns
  * into skipped directories — the pruned files are never opened.
  *
  * Predicate coverage: the condition is parsed into a DISJUNCTION OF
  * BOXES (DNF over per-column ranges) —
  *   - leaf comparisons `c <op> lit` (both operand orders, strict and
  *     inclusive) over integral AND string columns; string endpoints
  *     compare with UTF8String binary order;
  *   - `c IN (...)` / post-OptimizeIn `InSet` become one POINT BOX per
  *     value (exact disjunctive pruning, strictly stronger than the
  *     r8 envelope) while small, the [min,max] envelope beyond that;
  *   - `AND` intersects box sets pairwise; an unparseable conjunct is
  *     dropped (widens — sound);
  *   - `OR` unions box sets; an unparseable DISJUNCT poisons its whole
  *     disjunction (anything could match it — sound), never the
  *     conjuncts around it.
  * A file is excluded only when its per-column [min, max] stats are
  * disjoint from EVERY box on some constrained column of that box; a
  * column with no registered bound never prunes. Box counts cap at
  * [[StatsPruneRule.MaxBoxes]]; past the cap the parse degrades
  * soundly (drop the larger AND side / give up on the OR).
  *
  * Soundness of the injection itself: exclusion, not inclusion — files
  * ABSENT from the registry (appended after registration) are never
  * named, so they always survive; see the registry's staleness
  * contract. The rule is idempotent: the injected conjunct references
  * `file_id`, and any predicate already referencing `file_id` is left
  * untouched (that also leaves [[graft.operators.Govern.prunedScan]]'s
  * explicit survivor filter alone).
  *
  * Scale: the stats are O(files) driver metadata and the disjoint-set
  * computation is a driver-side scan of that list at plan time —
  * exactly the planning work a lakehouse driver does per query. */
object StatsPruneRule extends Rule[LogicalPlan] {

  /** DNF width cap: a parse that would exceed this many boxes degrades
    * soundly instead of exploding plan time. */
  private val MaxBoxes = 64
  /** IN-lists up to this many values expand to exact point boxes;
    * larger lists collapse to their [min, max] envelope. */
  private val MaxInPoints = 32

  // ---- typed bound values ------------------------------------------------
  private sealed trait BVal
  private final case class LongV(v: Long) extends BVal
  private final case class StrV(v: UTF8String) extends BVal

  /** None = incomparable (mixed types — stale registration or a cast
    * the parser missed); every consumer treats that as "cannot
    * prune", the sound default. */
  private def cmp(a: BVal, b: BVal): Option[Int] = (a, b) match {
    case (LongV(x), LongV(y)) => Some(java.lang.Long.compare(x, y))
    case (StrV(x), StrV(y)) => Some(x.compareTo(y))
    case _ => None
  }

  /** One column's constraint: [lo, hi] with per-endpoint strictness;
    * None = unbounded on that side. */
  private final case class Rng(lo: Option[BVal], loStrict: Boolean,
                               hi: Option[BVal], hiStrict: Boolean)
  /** A box: conjunction of per-column ranges. */
  private type Box = Map[String, Rng]

  private def litVal(e: Expression): Option[BVal] = e match {
    case Literal(v: Int, IntegerType) => Some(LongV(v.toLong))
    case Literal(v: Long, LongType) => Some(LongV(v))
    case Literal(v: Short, ShortType) => Some(LongV(v.toLong))
    case Literal(v: Byte, ByteType) => Some(LongV(v.toLong))
    case Literal(s: UTF8String, StringType) => Some(StrV(s))
    case _ => None
  }

  private def rawVal(v: Any): Option[BVal] = v match {
    case x: Int => Some(LongV(x.toLong))
    case x: Long => Some(LongV(x))
    case x: Short => Some(LongV(x.toLong))
    case x: Byte => Some(LongV(x.toLong))
    case s: UTF8String => Some(StrV(s))
    case s: String => Some(StrV(UTF8String.fromString(s)))
    case _ => None
  }

  private def boxOf(c: String, r: Rng): Box = Map(c -> r)
  private def geR(v: BVal, strict: Boolean) = Rng(Some(v), strict, None, hiStrict = false)
  private def leR(v: BVal, strict: Boolean) = Rng(None, loStrict = false, Some(v), strict)
  private def eqR(v: BVal) = Rng(Some(v), loStrict = false, Some(v), hiStrict = false)

  /** Intersect two ranges; None = provably empty. A mixed-type pair
    * widens to unbounded on that side (sound). */
  private def intersectRng(a: Rng, b: Rng): Option[Rng] = {
    def tightLo(x: (Option[BVal], Boolean), y: (Option[BVal], Boolean)) =
      (x._1, y._1) match {
        case (None, _) => y
        case (_, None) => x
        case (Some(xv), Some(yv)) => cmp(xv, yv) match {
          case Some(c) if c > 0 => x
          case Some(c) if c < 0 => y
          case Some(_) => (x._1, x._2 || y._2)
          case None => (None, false) // incomparable: widen, sound
        }
      }
    def tightHi(x: (Option[BVal], Boolean), y: (Option[BVal], Boolean)) =
      (x._1, y._1) match {
        case (None, _) => y
        case (_, None) => x
        case (Some(xv), Some(yv)) => cmp(xv, yv) match {
          case Some(c) if c < 0 => x
          case Some(c) if c > 0 => y
          case Some(_) => (x._1, x._2 || y._2)
          case None => (None, false)
        }
      }
    val (lo, ls) = tightLo((a.lo, a.loStrict), (b.lo, b.loStrict))
    val (hi, hs) = tightHi((a.hi, a.hiStrict), (b.hi, b.hiStrict))
    val empty = (for (l <- lo; h <- hi; c <- cmp(l, h))
      yield c > 0 || (c == 0 && (ls || hs))).getOrElse(false)
    if (empty) None else Some(Rng(lo, ls, hi, hs))
  }

  /** Intersect two boxes; None = provably empty conjunction. */
  private def intersectBox(a: Box, b: Box): Option[Box] = {
    val cols = a.keySet ++ b.keySet
    val out = Map.newBuilder[String, Rng]
    var empty = false
    cols.foreach { c =>
      (a.get(c), b.get(c)) match {
        case (Some(x), Some(y)) => intersectRng(x, y) match {
          case Some(r) => out += c -> r
          case None => empty = true
        }
        case (Some(x), None) => out += c -> x
        case (None, Some(y)) => out += c -> y
        case _ =>
      }
    }
    if (empty) None else Some(out.result())
  }

  /** Parse a predicate into Some(boxes) = the rows satisfying it are
    * contained in the union of the boxes; None = no information. */
  private def boxes(cond: Expression): Option[Seq[Box]] = cond match {
    case And(l, r) => (boxes(l), boxes(r)) match {
      case (Some(a), Some(b)) =>
        if (a.length.toLong * b.length > MaxBoxes)
          Some(if (a.length <= b.length) a else b) // drop a conjunct: widens, sound
        else Some(for (x <- a; y <- b; z <- intersectBox(x, y)) yield z)
      case (Some(a), None) => Some(a)
      case (None, Some(b)) => Some(b)
      case _ => None
    }
    case Or(l, r) => (boxes(l), boxes(r)) match {
      // an unparseable disjunct could match anything: the whole
      // disjunction must stop pruning, not just that branch
      case (Some(a), Some(b)) if a.length + b.length <= MaxBoxes => Some(a ++ b)
      case _ => None
    }
    case GreaterThanOrEqual(a: AttributeReference, l) => litVal(l).map(v => Seq(boxOf(a.name, geR(v, strict = false))))
    case GreaterThan(a: AttributeReference, l)        => litVal(l).map(v => Seq(boxOf(a.name, geR(v, strict = true))))
    case LessThanOrEqual(a: AttributeReference, l)    => litVal(l).map(v => Seq(boxOf(a.name, leR(v, strict = false))))
    case LessThan(a: AttributeReference, l)           => litVal(l).map(v => Seq(boxOf(a.name, leR(v, strict = true))))
    case EqualTo(a: AttributeReference, l)            => litVal(l).map(v => Seq(boxOf(a.name, eqR(v))))
    case GreaterThanOrEqual(l, a: AttributeReference) => litVal(l).map(v => Seq(boxOf(a.name, leR(v, strict = false))))
    case GreaterThan(l, a: AttributeReference)        => litVal(l).map(v => Seq(boxOf(a.name, leR(v, strict = true))))
    case LessThanOrEqual(l, a: AttributeReference)    => litVal(l).map(v => Seq(boxOf(a.name, geR(v, strict = false))))
    case LessThan(l, a: AttributeReference)           => litVal(l).map(v => Seq(boxOf(a.name, geR(v, strict = true))))
    case EqualTo(l, a: AttributeReference)            => litVal(l).map(v => Seq(boxOf(a.name, eqR(v))))
    case In(a: AttributeReference, list) if list.nonEmpty =>
      val vs = list.map(litVal)
      if (vs.exists(_.isEmpty)) None else pointsOrEnvelope(a.name, vs.flatten)
    case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
      val vs = hset.toSeq.map(rawVal)
      if (vs.exists(_.isEmpty)) None else pointsOrEnvelope(a.name, vs.flatten)
    case _ => None
  }

  /** IN-list values as exact point boxes (true OR-of-boxes pruning)
    * while small; the [min, max] envelope beyond [[MaxInPoints]]. */
  private def pointsOrEnvelope(col: String, vs: Seq[BVal]): Option[Seq[Box]] = {
    if (vs.size <= MaxInPoints) Some(vs.map(v => boxOf(col, eqR(v))))
    else {
      var mn = vs.head
      var mx = vs.head
      vs.tail.foreach { v =>
        cmp(v, mn) match { case Some(c) if c < 0 => mn = v case Some(_) => case None => return None }
        cmp(v, mx) match { case Some(c) if c > 0 => mx = v case Some(_) => case None => return None }
      }
      Some(Seq(boxOf(col, Rng(Some(mn), loStrict = false, Some(mx), hiStrict = false))))
    }
  }

  private def boundVals(b: StatsPruneRegistry.ColBounds): (BVal, BVal) = b match {
    case StatsPruneRegistry.LongBounds(mn, mx) => (LongV(mn), LongV(mx))
    case StatsPruneRegistry.StrBounds(mn, mx) =>
      (StrV(UTF8String.fromString(mn)), StrV(UTF8String.fromString(mx)))
  }

  /** Can any value inside the file's [mn, mx] satisfy `r`? Mixed types
    * or a missing comparison answer true (cannot prune). */
  private def rngOverlaps(r: Rng, b: StatsPruneRegistry.ColBounds): Boolean = {
    val (mn, mx) = boundVals(b)
    val loOk = r.lo.forall(l => cmp(l, mx) match {
      case Some(c) => c < 0 || (c == 0 && !r.loStrict)
      case None => true
    })
    val hiOk = r.hi.forall(h => cmp(h, mn) match {
      case Some(c) => c > 0 || (c == 0 && !r.hiStrict)
      case None => true
    })
    loOk && hiOk
  }

  /** Could the file hold a row inside this box? A column without a
    * registered bound cannot prune. */
  private def boxOverlapsFile(box: Box, s: StatsPruneRegistry.FileStats): Boolean =
    box.forall { case (c, r) => s.bounds.get(c).forall(b => rngOverlaps(r, b)) }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      val statsOpt = lr.relation match {
        case fs: HadoopFsRelation =>
          StatsPruneRegistry.lookup(fs.location.rootPaths.map(_.toString))
        case _ => None
      }
      val fileIdAttr = lr.output.find(_.name == "file_id")
      if (statsOpt.isEmpty || fileIdAttr.isEmpty ||
          cond.references.exists(_.name == "file_id")) f
      else boxes(cond) match {
        case None => f
        case Some(bxs) =>
          // EXCLUSION: name only files provably disjoint from every
          // box; anything the registry doesn't know about survives
          val pruned = statsOpt.get.filterNot(s => bxs.exists(boxOverlapsFile(_, s)))
          if (pruned.isEmpty) f
          else {
            val skip: Expression =
              Not(In(fileIdAttr.get, pruned.map(s => Literal(s.fileId))))
            Filter(And(skip, cond), lr)
          }
      }
  }
}
