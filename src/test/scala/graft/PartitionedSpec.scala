package graft

import org.apache.spark.sql.functions._

import graft.sources.Partitioned

class PartitionedSpec extends SparkSpec {

  test("writeByKey + filtered scan prunes to the selected directories") {
    import spark.implicits._
    val df = (1 to 120).map(i => (i.toLong, s"2024-${"%02d".format(i % 12 + 1)}", i * 2.0))
      .toDF("id", "month", "v")
    val path = Scratch.sub("partspec")
    Partitioned.writeByKey(df, path, "month")

    val slice = Partitioned.scan(spark, path)
      .filter(col("month").isin("2024-03", "2024-07"))
    assert(Partitioned.prunedPartitionCount(slice) == 2)
    // pruning must not change results
    assert(slice.count() == df.filter(col("month").isin("2024-03", "2024-07")).count())

    // an unfiltered scan has no partition filter to prune with
    assert(Partitioned.prunedPartitionCount(Partitioned.scan(spark, path)) == -1)

    // a row filter on a NON-partition column must not claim pruning
    val rowFiltered = Partitioned.scan(spark, path).filter(col("v") > 100)
    assert(Partitioned.prunedPartitionCount(rowFiltered) == -1)
  }

  test("compact collapses the file count and preserves every row") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"k${i % 3}", i * 1.0)).toDF("id", "k", "v")
    val frag = Scratch.sub("compact_frag")
    val dst = Scratch.sub("compact_dst")
    df.repartition(16).write.mode("overwrite").partitionBy("k").parquet(frag)
    Partitioned.compact(spark, frag, dst, "k")
    assert(Partitioned.fileCount(frag) >= 16)
    assert(Partitioned.fileCount(dst) <= 3) // one file per key directory
    val a = Partitioned.scan(spark, frag).collect().map(_.toString).sorted
    val b = Partitioned.scan(spark, dst).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
