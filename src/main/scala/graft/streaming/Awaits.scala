package graft.streaming

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** Await ALL of a set of concurrent commit jobs before propagating any
  * failure (r17, ADVICE): `Await.result(Future.sequence(...))` fails
  * FAST — when one job throws, sibling futures keep running as orphaned
  * Spark jobs while the batch fails, and a stream restart replaying the
  * same batch then overwrites batchId-deterministic directories
  * CONCURRENTLY with the orphaned attempt's in-flight writer (risking
  * duplicate/mixed part files in the artifact stores). Lifting every
  * future to `Try` makes the sequence infallible, so the await returns
  * only after every job has finished — then the first failure (in
  * submission order) is rethrown and the batch fails with no sibling
  * still writing.
  */
private[graft] object Awaits {

  def all(futures: Seq[Future[_]])(implicit ec: ExecutionContext): Unit = {
    val settled = Await.result(
      Future.sequence(futures.map(_.transform(Success(_)))), Duration.Inf)
    settled.collectFirst { case Failure(e) => e }.foreach(throw _)
  }
}
