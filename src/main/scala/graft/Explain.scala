package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named queries
  * (`runMain graft.Explain <sfDir> <query> [query…]`) — the feedback loop
  * for shuffle/pushdown/codegen auditing.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (n, fn) =>
        println(s"\n===== $n =====")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
