package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Driver-side registry of per-file min/max stats for
  * `file_id`-partitioned lakes (the manifest a lakehouse scan planner
  * consults — Delta/Iceberg file stats). Keyed by the lake's
  * normalized root path; values are O(files) metadata, never O(rows).
  * Register via [[graft.operators.Govern.registerLakeStats]]; once
  * registered, [[StatsPruneRule]] turns ordinary filtered scans of the
  * path into partition-pruned scans automatically. */
object StatsPruneRegistry {
  final case class FileStats(fileId: Int, bounds: Map[String, (Long, Long)])

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
  * relation gets the survivor set injected as a `file_id IN (...)`
  * conjunct, which the normal partition-pruning machinery
  * (FileSourceStrategy's partitionKeyFilters) then turns into skipped
  * directories — the pruned files are never opened.
  *
  * Soundness: only conjuncts of the user predicate that are direct
  * integral bounds on a stats'd column (`c >= lit`, `c <= lit`,
  * `c = lit`, either operand order, plus the strict forms) contribute;
  * a file is dropped only when its [min, max] box is disjoint from the
  * constraint box on SOME constrained column, in which case no row of
  * that file can satisfy the conjunction. Unparseable conjuncts prune
  * nothing. The rule is idempotent: the injected conjunct references
  * `file_id`, and any predicate already referencing `file_id` is left
  * untouched (that also leaves [[graft.operators.Govern.prunedScan]]'s
  * explicit survivor filter alone).
  *
  * Scale: the stats are O(files) driver metadata and the survivor
  * computation is a driver-side scan of that list at plan time —
  * exactly the planning work a lakehouse driver does per query. */
object StatsPruneRule extends Rule[LogicalPlan] {

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    case _ => None
  }

  /** (column, lo, hi) ranges from the parseable conjuncts. */
  private def constraints(cond: Expression): Map[String, (Long, Long)] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val ranges = split(cond).flatMap {
      case GreaterThanOrEqual(a: AttributeReference, l) => litLong(l).map(v => a.name -> (v, Long.MaxValue))
      case LessThanOrEqual(a: AttributeReference, l)    => litLong(l).map(v => a.name -> (Long.MinValue, v))
      case GreaterThan(a: AttributeReference, l)        => litLong(l).map(v => a.name -> (v + 1, Long.MaxValue))
      case LessThan(a: AttributeReference, l)           => litLong(l).map(v => a.name -> (Long.MinValue, v - 1))
      case EqualTo(a: AttributeReference, l)            => litLong(l).map(v => a.name -> (v, v))
      case GreaterThanOrEqual(l, a: AttributeReference) => litLong(l).map(v => a.name -> (Long.MinValue, v))
      case LessThanOrEqual(l, a: AttributeReference)    => litLong(l).map(v => a.name -> (v, Long.MaxValue))
      case GreaterThan(l, a: AttributeReference)        => litLong(l).map(v => a.name -> (Long.MinValue, v - 1))
      case LessThan(l, a: AttributeReference)           => litLong(l).map(v => a.name -> (v + 1, Long.MaxValue))
      case EqualTo(l, a: AttributeReference)            => litLong(l).map(v => a.name -> (v, v))
      // IN-lists prune on their value ENVELOPE [min, max] — a sound
      // superset of the exact membership test (both In and its
      // post-OptimizeIn InSet form can appear in this batch)
      case In(a: AttributeReference, list) if list.nonEmpty =>
        val vs = list.map(litLong)
        if (vs.forall(_.isDefined)) Some(a.name -> (vs.flatten.min, vs.flatten.max))
        else None
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        val vs = hset.toSeq.map {
          case v: Int => Some(v.toLong)
          case v: Long => Some(v)
          case v: Short => Some(v.toLong)
          case v: Byte => Some(v.toLong)
          case _ => None
        }
        if (vs.forall(_.isDefined)) Some(a.name -> (vs.flatten.min, vs.flatten.max))
        else None
      case _ => None
    }
    ranges.groupBy(_._1).map { case (c, rs) =>
      c -> (rs.map(_._2._1).max, rs.map(_._2._2).min)
    }
  }

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
      else {
        val cons = constraints(cond)
        if (cons.isEmpty) f
        else {
          val stats = statsOpt.get
          val survivors = stats.filter { s =>
            cons.forall { case (c, (lo, hi)) =>
              s.bounds.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
            }
          }
          if (survivors.size == stats.size) f
          else {
            val skip: Expression =
              if (survivors.isEmpty) Literal.FalseLiteral
              else In(fileIdAttr.get, survivors.map(s => Literal(s.fileId)))
            Filter(And(skip, cond), lr)
          }
        }
      }
  }
}
