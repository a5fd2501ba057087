package graft

import graft.core._
import graft.pipeline.FeatureExec
import graft.transformers._
import org.apache.spark.sql.DataFrame

/** Goldens from test_numeric_transformers.py / test_comparison_transformers.py /
  * test_datetime_transformers.py.
  */
class ScalarSpec extends SparkTestBase {
  private val NaN = Double.NaN
  private val Inf = Double.PositiveInfinity
  private val NegInf = Double.NegativeInfinity

  private def ctx = AggContext(Nil, Seq(Idx), None)
  private def run(ts: FeatureTransformer*): DataFrame =
    FeatureExec.applyTransformers(basicFrame, ctx, ts)

  private val num = ColumnSpec.numeric("NUMERIC_FEATURE")
  private val num2 = ColumnSpec.numeric("NUMERIC_FEATURE_2")
  private val bool = ColumnSpec.boolean("BOOL_FEATURE")
  private val date = ColumnSpec.datetime("DATE_FEATURE")

  test("polynomial / log / goniometric / scaling golden") {
    val df = run(
      PolynomialTransformer(num, 2), PolynomialTransformer(num2, 3),
      LogTransformer(num), LogTransformer(num, 10),
      SinTransformer(num), CosTransformer(num),
      StandardScaler(num), MinMaxScaler(num))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_pow_2" -> Seq(0, 1, 4, 9, 16, 25),
      "NUMERIC_FEATURE_2_pow_3" -> Seq(0, -1, -8, -27, -64, -125),
      "NUMERIC_FEATURE_ln" -> Seq(NegInf, 0.0, 0.69314718, 1.09861229, 1.38629436, 1.60943791),
      "NUMERIC_FEATURE_log10" -> Seq(NegInf, 0.0, 0.30103, 0.47712125, 0.60205999, 0.69897),
      "NUMERIC_FEATURE_sin" -> Seq(0.0, 0.84147098, 0.90929743, 0.14112001, -0.7568025, -0.95892427),
      "NUMERIC_FEATURE_cos" -> Seq(1.0, 0.54030231, -0.41614684, -0.9899925, -0.65364362, 0.28366219),
      "NUMERIC_FEATURE_standard_scaled" -> Seq(-1.336306, -0.801784, -0.267261, 0.267261, 0.801784, 1.336306),
      "NUMERIC_FEATURE_minmax_scaled" -> Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)))
  }

  test("arithmetic incl. division and bool coercion golden") {
    val df = run(
      AddTransformer(num, num2), SubtractTransformer(num2, num),
      MultiplyTransformer(num2, num), DivideTransformer(num2, num),
      AddTransformer(num, bool), SubtractTransformer(num, bool),
      MultiplyTransformer(num, bool), DivideTransformer(num, bool))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_add_NUMERIC_FEATURE_2" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_2_subtract_NUMERIC_FEATURE" -> Seq(0, -2, -4, -6, -8, -10),
      "NUMERIC_FEATURE_2_multiply_NUMERIC_FEATURE" -> Seq(0, -1, -4, -9, -16, -25),
      "NUMERIC_FEATURE_2_divide_NUMERIC_FEATURE" -> Seq(NaN, -1.0, -1.0, -1.0, -1.0, -1.0),
      "NUMERIC_FEATURE_add_BOOL_FEATURE" -> Seq(1, 1, 3, 3, 5, 5),
      "NUMERIC_FEATURE_subtract_BOOL_FEATURE" -> Seq(-1, 1, 1, 3, 3, 5),
      "NUMERIC_FEATURE_multiply_BOOL_FEATURE" -> Seq(0, 0, 2, 0, 4, 0),
      "NUMERIC_FEATURE_divide_BOOL_FEATURE" -> Seq(0.0, Inf, 2.0, Inf, 4.0, Inf)))
  }

  test("IEEE division: zero divisor keeps its sign (x / -0.0 → ∓Inf)") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val df = Seq((1.0, 0.0), (1.0, -0.0), (-1.0, -0.0), (0.0, -0.0), (-2.0, 0.0))
      .toDF("l", "r")
      .select(graft.core.PolarsCompat.ieeeDiv(col("l"), col("r")).as("q"))
    assert(df.collect().map(_.getDouble(0)).map(d => if (d.isNaN) "NaN" else d.toString).toSeq ==
      Seq("Infinity", "-Infinity", "Infinity", "NaN", "-Infinity"))
  }

  test("comparisons golden (incl. lexicographic strings)") {
    val cat = ColumnSpec.ordinal("CATEGORICAL_FEATURE")
    val cat2 = ColumnSpec.nominal("CATEGORICAL_FEATURE_2")
    val df = run(
      EqualTransformer(num, num2), GreaterThanTransformer(cat, cat2),
      GreaterOrEqualTransformer(cat2, cat))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_equal_NUMERIC_FEATURE_2" -> Seq(true, false, false, false, false, false),
      "CATEGORICAL_FEATURE_greater_than_CATEGORICAL_FEATURE_2" -> Seq(false, false, false, true, true, true),
      "CATEGORICAL_FEATURE_2_greater_or_equal_CATEGORICAL_FEATURE" -> Seq(true, true, true, false, false, false)))
  }

  test("seasonal golden (ISO weekday, angular sin/cos)") {
    val df = run(
      DayOfWeekTransformer(date),
      HourOfDayTransformer(date),
      MonthOfYearTransformer(date),
      DayOfWeekTransformer(date, angular = true, gon = Some(GonTransformation.Sin)),
      DayOfWeekTransformer(date, angular = true, gon = Some(GonTransformation.Cos)))
    assertColumns(df, Map(
      "DATE_FEATURE_day_of_week" -> Seq(6, 7, 1, 2, 3, 4),
      "DATE_FEATURE_hour_of_day" -> Seq(0, 0, 0, 0, 0, 0),
      "DATE_FEATURE_month_of_year" -> Seq(1, 1, 1, 1, 1, 1),
      "DATE_FEATURE_day_of_week_angular_sin" -> Seq(-0.974928, -0.781831, 0.0, 0.781831, 0.974928, 0.433884),
      "DATE_FEATURE_day_of_week_angular_cos" -> Seq(-0.222521, 0.62349, 1.0, 0.62349, -0.222521, -0.900969)))
  }

  test("time diff truncation golden (25h 1s → 25h, 1d)") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import java.sql.Timestamp
    import java.time.Instant
    def t(s: String) = Timestamp.from(Instant.parse(s))
    val schema = StructType(Seq(
      StructField(Idx, IntegerType),
      StructField("DATE_FEATURE_2", TimestampType), StructField("DATE_FEATURE", TimestampType)))
    val rows = Seq(
      Row(0, t("2018-01-01T01:00:01Z"), t("2018-01-02T02:00:02Z")),
      Row(1, t("2018-01-02T02:00:02Z"), t("2018-01-03T03:00:03Z")),
      Row(2, t("2018-01-03T03:00:03Z"), t("2018-01-04T04:00:04Z")))
    val frame = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val d1 = ColumnSpec.datetime("DATE_FEATURE"); val d2 = ColumnSpec.datetime("DATE_FEATURE_2")
    val df = FeatureExec.applyTransformers(frame, ctx, Seq(
      TimeDiffTransformer(d1, d2, "s"), TimeDiffTransformer(d1, d2, "h"), TimeDiffTransformer(d1, d2, "d")))
    assertColumns(df, Map(
      "DATE_FEATURE_total_seconds_diff_DATE_FEATURE_2" -> Seq(90001, 90001, 90001),
      "DATE_FEATURE_total_hours_diff_DATE_FEATURE_2" -> Seq(25, 25, 25),
      "DATE_FEATURE_total_days_diff_DATE_FEATURE_2" -> Seq(1, 1, 1)))
  }
}
