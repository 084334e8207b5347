package graft.dev

import org.apache.spark.sql.types._

/** How much of a streaming gate's driver-gap time is Derby database
  * creation + DDL? Times N fresh creates (the per-gate-run cost) and a
  * second connect to an existing db (the steady-state cost). */
object DerbyProbe16 {
  def main(args: Array[String]): Unit = {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_id", LongType),
      StructField("user_id", LongType)))
    (1 to 3).foreach { i =>
      val base = java.nio.file.Files.createTempDirectory(s"graft-derbyprobe$i").toString
      val t0 = System.nanoTime()
      val ix = new graft.index.DerbyStatsIndex(s"$base/db", schema)
      ix.initialize(schema)
      val t1 = System.nanoTime()
      ix.close()
      graft.index.DerbyStatsIndex.shutdownDatabase(s"$base/db")
      val t2 = System.nanoTime()
      println(f"[derbyprobe] create+init ${(t1 - t0) / 1e9}%.3fs  close+shutdown ${(t2 - t1) / 1e9}%.3fs")
    }
  }
}
