package graft.ops

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Submit INDEPENDENT Spark actions concurrently from driver threads —
  * the guide's §2.6 back-fill pattern: a multi-write build (index base +
  * side tables, keys + sigs of one delta) never fills the scheduler with
  * any single small job, so the second job's tasks run on the executor
  * slots the first's tail leaves idle. FIFO scheduling (the default)
  * gives the earlier job priority and the later ones the leftovers —
  * exactly the overlap wanted, no fairness config needed.
  *
  * Only for actions with NO ordering dependency whose outputs nothing
  * references until a later commit point (e.g. parquet dirs installed by
  * a manifest swap or generation stamp AFTER all writes return):
  * `run` awaits every thunk fully (no fail-fast — no write is still in
  * flight when the caller proceeds) and rethrows the first failure, so a
  * crash can never reach the caller's commit with half the writes
  * missing any differently than the sequential form could.
  *
  * Job attribution (r15 ADVICE): each worker thread installs a CLONE of
  * the CALLER's Spark local properties (job group, description, pool)
  * around its thunk — jobs submitted from the pool are attributed, and
  * cancellable via `cancelJobGroup`/`StreamingQuery.stop()`, exactly as
  * the caller's own jobs would be, never as whatever context existed at
  * pool-creation time. A cached pool (threads retire after idle) keeps
  * concurrent callers from serializing on a fixed-width pool; the
  * per-call width stays bounded by [[MaxJobs]].
  */
object ConcurrentJobs {
  /** Widest legal call: overlap is for paired/tripled independent writes,
    * not a fan-out mechanism — more in flight fight for executors (§2.6:
    * "2-3 jobs in flight is plenty"). */
  val MaxJobs = 3

  // daemon threads, cached: width follows the calls in flight (two
  // concurrent builders overlap independently instead of queuing on a
  // shared fixed(3)); idle threads retire after 60s
  private lazy val ec: ExecutionContext =
    ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-parallel-job-${n.incrementAndGet()}")
            t.setDaemon(true); t
          }
        }))

  def run(thunks: (() => Unit)*): Unit = {
    require(thunks.size <= MaxJobs,
      s"ConcurrentJobs.run is sized for paired/tripled writes " +
        s"(MaxJobs = $MaxJobs), got ${thunks.size}")
    if (thunks.size == 1) { thunks.head(); return }
    val bridge = org.apache.spark.sql.graft.GraftColumnsBridge
    // the caller's thread-local job context, snapshotted ONCE here; each
    // worker installs its own clone (thunks may setJobDescription freely
    // without cross-talk) and clears to an empty context afterwards so a
    // reused pool thread never leaks this caller's group onto the next
    val sc = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)
    val props = sc.map(bridge.cloneLocalProperties)
    val fs = thunks.map(t => Future {
      (sc, props) match {
        case (Some(c), Some(p)) =>
          bridge.setLocalProperties(c, p.clone().asInstanceOf[java.util.Properties])
          try t()
          finally bridge.setLocalProperties(c, new java.util.Properties())
        case _ => t()
      }
    }(ec))
    val results = fs.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    results.foreach(_.get)
  }
}
