package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: SparkEntry.entry must return rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_COLS=" + df.columns.mkString(","))
    println("ENTRY_ROWS=" + df.count())
    df.show(3, truncate = false)
    spark.stop()
  }
}
