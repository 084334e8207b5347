package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** r17 driver fast path for connectedComponents (size-gated min-root
  * union-find): label-for-label equality with the distributed
  * propagation loop on adversarial graphs, both path selections, and the
  * empty input. */
class CcDriverSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private def check(pairs: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val fast = labelsOf(Dedup.connectedComponents(df))
    val loop = labelsOf(Dedup.connectedComponentsWithRounds(df)._1)
    assert(fast == loop, s"driver fast path diverged on $pairs")
    // and the bound really selects the path: forcing the loop via a zero
    // bound must give the same labels again
    assert(labelsOf(Dedup.connectedComponents(df, driverMaxEdges = 0L)) == loop)
  }

  test("fast path equals the distributed loop on adversarial graphs") {
    check(Seq.empty[(Long, Long)])                        // empty graph
    check(Seq((5L, 5L)))                                  // self-loop only
    check((0L until 20L).map(i => (i, i + 1)))            // long chain
    check((1L to 10L).map(i => (0L, i)))                  // star at the min
    check((1L to 10L).map(i => (100L, 100L + i)))         // star above other ids
    check(Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L))) // merge + disjoint
    val rnd = new scala.util.Random(20260818L)
    check(Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)))
    // reversed/duplicated edges collapse identically
    check(Seq((2L, 1L), (1L, 2L), (2L, 1L), (9L, 2L)))
  }

  test("vertex set is exactly the pair endpoints, labels are component minima") {
    import spark.implicits._
    val df = Seq((7L, 3L), (3L, 9L), (20L, 21L)).toDF("a", "b")
    val got = labelsOf(Dedup.connectedComponents(df))
    assert(got == Seq((3L, 3L), (7L, 3L), (9L, 3L), (20L, 20L), (21L, 20L)))
  }
}
