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
  */
object ConcurrentJobs {
  // daemon threads; bounded by the widest call site (3 writes), shared
  // across all index builders in the JVM
  private lazy val ec: ExecutionContext =
    ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(3,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-parallel-job-${n.incrementAndGet()}")
            t.setDaemon(true); t
          }
        }))

  def run(thunks: (() => Unit)*): Unit = {
    require(thunks.size <= 3,
      s"ConcurrentJobs.run is sized for paired/tripled writes, got ${thunks.size}")
    if (thunks.size == 1) { thunks.head(); return }
    val fs = thunks.map(t => Future(t())(ec))
    val results = fs.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    results.foreach(_.get)
  }
}
