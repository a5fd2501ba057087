package graft

import graft.core._
import graft.dataset.GraftDataset
import graft.pipeline.{ops, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — flagship entry + per-operator queries with DuckDB oracles.
  * See /root/repo/SURVEY.md §7 and Verify/Bench.
  */
object SparkEntry {

  /** Deterministic row order used by every order-sensitive feature on the events
    * table: event time, tie-broken by event id.
    */
  private val eventOrder = Seq("ts", "event_id")

  private def events(spark: SparkSession, dir: String): GraftDataset = {
    val df = spark.read.parquet(s"$dir/events.parquet")
    val schema = FeatureSchema(
      ColumnSpec.numeric("event_id", ColRole.Identifier),
      ColumnSpec.datetime("ts", ColRole.TimeInfo),
      ColumnSpec.nominal("user_id", ColRole.Identifier),
      ColumnSpec.nominal("event_type"),
      ColumnSpec.numeric("value"))
    GraftDataset(df.select("event_id", "ts", "user_id", "event_type", "value"), schema, eventOrder)
  }

  /** Flagship: windowed feature synthesis over the events table at sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val ds = events(spark, "/root/testdata/sf0.001")
    Pipeline(ds)
      .withLagged("value", lags = Seq(1), overColumnsCombinations = Seq(Seq("user_id")), fillValue = Some(0))
      .withCount(overColumnsCombinations = Seq(Seq("user_id")), cumulative = Cum.Inclusive)
      .withArithmeticAggregation("value", Seq(ops.Agg.Sum, ops.Agg.Mean),
        overColumnsCombinations = Seq(Seq("user_id")), cumulative = Cum.Inclusive)
      .withCount(overColumnsCombinations = Seq(Seq("user_id")),
        timeWindows = Seq("2d"), indexColumnName = Some("ts"))
      .toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** Equivalent ANSI SQL runnable by DuckDB on the same parquet tables. */
  def oracleSql: Map[String, String] = Queries.oracles
}
