package graft.operators

import graft.{QueryDef, Tables}
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

  val defs: Seq[QueryDef] = Seq(
    // The explicit hot-key mitigation as a driver-checked row: `events`
    // genuinely concentrates on 5 event types (~20% of the table EACH),
    // the worst case for a keyed shuffle join. The salted join spreads
    // every hot key over 8 sub-partitions (big side salted, small side
    // replicated per salt) and the results are provably identical to the
    // plain equi-join — which is exactly what the oracle computes.
    QueryDef(
      "sj1_salted_join",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val dim = events.select("event_type").distinct()
          .withColumn("w", length(col("event_type")).cast("long"))
        saltedEquiJoin(events, dim, "event_type", salts = 8)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      },
      Some("""WITH dim AS (SELECT DISTINCT event_type,
             |    CAST(length(event_type) AS BIGINT) w FROM events)
             |SELECT e.event_type, count(*) AS n, CAST(sum(w) AS BIGINT) AS sw
             |FROM events e JOIN dim USING (event_type)
             |GROUP BY 1""".stripMargin)))
}
