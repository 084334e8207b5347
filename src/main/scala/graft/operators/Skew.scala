package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB design note in SURVEY.md:
  * a handful of keys holding a large share of rows turn a shuffle join
  * into a straggler). `saltedEquiJoin` spreads each hot key over `salts`
  * sub-partitions: the big side gets a uniform pseudo-random salt, the
  * small side is replicated once per salt value, and the join key becomes
  * (key, salt). Results are identical to the plain equi-join; AQE's skew
  * handling does this adaptively, this operator is the explicit form for
  * when the skew is known up front.
  */
object Skew {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt", pmod(hash(col(key), rand(42)), lit(salts)))
    val saltValues = array((0 until salts).map(lit): _*)
    val smallS = small.withColumn("__salt", explode(saltValues))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
