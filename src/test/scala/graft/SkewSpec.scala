package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted equi-join must be result-identical to the plain join on a
  * deliberately skewed dataset (one key holds half the rows). */
class SkewSpec extends SparkSpec {

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    val big = ((1 to 5000).map(i => (if (i % 2 == 0) 7L else i.toLong % 100, i)) )
      .toDF("k", "payload")
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedEquiJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt column does not leak into the result") {
    import spark.implicits._
    val big = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "w")
    val out = Skew.saltedEquiJoin(big, small, "k", salts = 4)
    assert(out.columns.toSeq == Seq("k", "v", "w"))
    assert(out.count() == 2)
  }
}
