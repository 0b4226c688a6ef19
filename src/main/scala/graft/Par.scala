package graft

/** Overlap INDEPENDENT Spark actions from the driver (optimization
  * guide §2.6: the scheduler happily runs several jobs at once inside
  * one application — actions are only sequential because driver code
  * calls them sequentially). Used by the index write protocols, whose
  * sidecar writes target disjoint directories and share an eagerly
  * materialized input: running them sequentially leaves the cluster
  * idle in each job's tail and pays every job's fixed scheduling
  * latency serially. The commit row still lands strictly LAST —
  * callers order `Par.jobs(sidecars…)` before the commit write, so
  * the crash-safety protocol (torn writes invisible) is unchanged.
  *
  * Semantics: blocks until every body finishes; if any body throws,
  * the first recorded failure is rethrown after all complete (no
  * commit can follow a failed sidecar). Bodies must be independent —
  * they run on plain driver threads with FIFO scheduling, which is
  * exactly the back-fill behaviour the guide describes.
  */
object Par {
  def jobs(bodies: (() => Unit)*): Unit = {
    if (bodies.lengthCompare(2) < 0) { bodies.foreach(_.apply()); return }
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = bodies.map { b =>
      val t = new Thread(() =>
        try b() catch { case e: Throwable => err.compareAndSet(null, e) })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    val e = err.get()
    if (e != null) throw e
  }
}
