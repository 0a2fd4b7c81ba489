package graft.operators

import java.util.concurrent.{Executors, ThreadFactory}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Shared daemon pool for the refresh families' concurrent driver-job
  * submission (guide §2.6 — actions are only sequential because the
  * driver calls them sequentially). One lazy pool for the whole JVM:
  * the pre-r15 code built a fresh 2-thread pool per refresh call,
  * trivially costly but noisy, and every call site re-implemented the
  * await/first-failure logic. Cached (not fixed-size) so concurrent
  * refreshes of DIFFERENT states never deadlock on pool slots; threads
  * are daemons so a hung Spark action cannot block JVM exit. */
private[graft] object Par {
  private lazy val pool = Executors.newCachedThreadPool(new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-refresh-par-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  })
  private lazy val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)

  /** Run the bodies concurrently, await ALL (a still-running leg must
    * not outlive the call — awaiting just one would leak a running
    * Spark job), then rethrow the FIRST failure if any. */
  def all[T](bodies: Seq[() => T],
             timeout: FiniteDuration = 3600.seconds): Seq[T] = {
    val fs = bodies.map { b =>
      Future(b())(ec)
        .map(Right(_): Either[Throwable, T])(ec)
        .recover { case e => Left(e) }(ec)
    }
    val rs = Await.result(Future.sequence(fs)(
      scala.collection.BuildFrom.buildFromIterableOps, ec), timeout)
    rs.collectFirst { case Left(e) => throw e }
    rs.map(_.toOption.get)
  }

  /** Two-legged [[all]] — the common stage/commit pair shape. */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    val rs = all[Any](Seq(() => a, () => b))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }

  /** Three-legged [[all]] — commit, commit, stage-the-next-phase. */
  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val rs = all[Any](Seq(() => a, () => b, () => c))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B], rs(2).asInstanceOf[C])
  }
}
