package graft

/** Smoke-level regression guard inside `sbt test`: every registered query
  * executes at sf0.001, has a well-formed schema (no duplicate column
  * names — the driver's compare sorts by name), and every oracle entry
  * corresponds to a registered query. Result VALUES are covered by the
  * driver's DuckDB compare (and scripts/check.py locally).
  */
class AllQueriesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("registry is consistent") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct == names, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes with a well-formed schema") {
      val df = q.fn(spark, dir)
      val cols = df.schema.fieldNames.toSeq
      assert(cols.map(_.toLowerCase).distinct.size == cols.size,
        s"duplicate column names in ${cols.mkString(",")}")
      // The driver's hash mishandles DECIMAL result columns (rounds 1-2:
      // values exactly equal, hash red) — decimals must be rendered as
      // fixed-scale strings before they reach the driver-visible schema.
      val decs = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
      }
      assert(decs.isEmpty,
        s"DecimalType in driver-visible output of ${q.name}: ${decs.mkString(",")}")
      val n = df.count()
      assert(n >= 0)
      spark.catalog.clearCache()
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
