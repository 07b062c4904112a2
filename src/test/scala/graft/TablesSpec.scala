package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader-level invariants for the driver-generated tables. */
class TablesSpec extends SparkSpec {

  test("events.ts normalizes to epoch-nanos Long regardless of session timezone") {
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      val utc = Tables.events(spark, dir)
      assert(utc.schema("ts").dataType == LongType)
      val utcRange = utc.agg(min(col("ts")), max(col("ts")), count(lit(1))).head()
      // a caller session left at a non-UTC zone must see the SAME epoch
      // values — events() pins UTC around the NTZ cast (ADVICE r7: an
      // unpinned session would shift every ts by the zone offset)
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = Tables.events(spark, dir)
        .agg(min(col("ts")), max(col("ts")), count(lit(1))).head()
      assert(ny == utcRange, s"timezone-dependent ts normalization: $ny != $utcRange")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
