package graft

import graft.core._
import graft.dataset.GraftDataset
import graft.selection._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Goldens from feature_selection/tests/test_feature_selector.py:84-143. */
class FeatureSelectorSpec extends SparkTestBase {

  private lazy val ds: GraftDataset = {
    val schema = StructType(Seq(
      StructField(Idx, IntegerType),
      StructField("x_1", IntegerType), StructField("x2", IntegerType),
      StructField("x3", BooleanType), StructField("x4", IntegerType),
      StructField("z1", StringType), StructField("z2", StringType),
      StructField("y", BooleanType)))
    val rows = Seq(
      Row(0, 0, 10, false, 2, "a", "hello", false),
      Row(1, 0, 9, true, 4, "b", "world", true),
      Row(2, 0, 8, false, 6, "b", "foo", false),
      Row(3, 0, 7, true, 8, "c", "bar", true))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    GraftDataset(df, FeatureSchema(
      ColumnSpec.numeric("x_1"), ColumnSpec.numeric("x2"),
      ColumnSpec.boolean("x3"), ColumnSpec.numeric("x4"),
      ColumnSpec.nominal("z1"), ColumnSpec.text("z2"),
      ColumnSpec.boolean("y", ColRole.Label)), Seq(Idx))
  }

  test("correlation golden (zero variance → 0, perfect predictor → 1)") {
    val r = FeatureSelector.getReport(ds, Seq("x_1", "x2", "x3", "x4"), SelectionMethod.Correlation).toMap
    assert(valueEq(r("x_1"), 0.0), r)
    assert(valueEq(r("x2"), 0.447214), r)
    assert(valueEq(r("x3"), 1.0), r)
    assert(valueEq(r("x4"), 0.447214), r)
  }

  test("t-test golden (exact separation → Inf)") {
    val r = FeatureSelector.getReport(ds, Seq("x_1", "x2", "x3", "x4"), SelectionMethod.TTest).toMap
    assert(valueEq(r("x_1"), 0.0), r)
    assert(valueEq(r("x2"), 0.707107), r)
    assert(r("x3") == Double.PositiveInfinity, r)
    assert(valueEq(r("x4"), 0.707107), r)
  }

  test("chi-squared golden") {
    val r = FeatureSelector.getReport(ds, Seq("x3", "z1"), SelectionMethod.ChiSquared).toMap
    assert(valueEq(r("x3"), 4.0), r)
    assert(valueEq(r("z1"), 2.0), r)
  }

  test("selectFeatures ranks stat desc then name asc; validates args") {
    val report = SelectionReport(SelectionMethod.Correlation,
      Seq("b" -> 1.0, "a" -> 1.0, "c" -> 0.5))
    assert(FeatureSelector.selectFeatures(report, topK = Some(2)) == Seq("a", "b"))
    assert(FeatureSelector.selectFeatures(report, frac = Some(0.67)) == Seq("a", "b"))
    assertThrows[IllegalArgumentException](FeatureSelector.selectFeatures(report))
    assertThrows[IllegalArgumentException](FeatureSelector.selectFeatures(report, topK = Some(0)))
    assertThrows[IllegalArgumentException](FeatureSelector.selectFeatures(report, frac = Some(1.5)))
  }

  test("chi-squared job count does not scale with feature count (one melted pass)") {
    def jobsFor(features: Seq[String]): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        FeatureSelector.getReport(ds, features, SelectionMethod.ChiSquared)
        Thread.sleep(300) // listener bus drain
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val one = jobsFor(Seq("x3"))
    val two = jobsFor(Seq("x3", "z1"))
    assert(two == one, s"expected the melted pass to cost $one job(s) regardless of features, got $two")
  }

  test("t-test with a single-class label yields 0 instead of throwing") {
    val oneClass = GraftDataset(ds.df.where(org.apache.spark.sql.functions.col("y") === true),
      ds.schema, Seq(Idx))
    val r = FeatureSelector.getReport(oneClass, Seq("x2", "x4"), SelectionMethod.TTest).toMap
    assert(r == Map("x2" -> 0.0, "x4" -> 0.0), r)
  }

  test("type gates") {
    assertThrows[IllegalArgumentException] {
      FeatureSelector.getReport(ds, Seq("z2"), SelectionMethod.Correlation)
    }
    assertThrows[IllegalArgumentException] {
      FeatureSelector.getReport(ds, Seq("x_1"), SelectionMethod.ChiSquared)
    }
  }
}
