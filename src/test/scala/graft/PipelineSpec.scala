package graft

import graft.core._
import graft.dataset.GraftDataset
import graft.pipeline.{ops, OptimizationLevel, Pipeline}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Pipeline-level goldens from pipeline/tests/test_pipeline.py, including the
  * mega-golden `test_basic_sample_with_all_transformers` (:204-441) — the reference's
  * de-facto conformance suite.
  */
class PipelineSpec extends SparkTestBase {
  private val NaN = Double.NaN
  private val NegInf = Double.NegativeInfinity

  private lazy val simpleDataset: GraftDataset = {
    val schema = StructType(Seq(StructField(Idx, IntegerType), StructField("NUMERIC_FEATURE", IntegerType)))
    val rows = (0 to 5).map(i => Row(i, i))
    GraftDataset(spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      FeatureSchema(ColumnSpec.numeric("NUMERIC_FEATURE")), Seq(Idx))
  }

  test("basic layering: pow2 of pow2 via new layer") {
    val p = Pipeline(simpleDataset)
      .withPolynomial(ColType.Numeric, Seq(2))
      .withNewLayer()
      .withPolynomial(ColType.Numeric, Seq(2))
    assertColumns(p.toDF(), Map(
      "NUMERIC_FEATURE_pow_2" -> Seq(0, 1, 4, 9, 16, 25),
      "NUMERIC_FEATURE_pow_2_pow_2" -> Seq(0, 1, 16, 81, 256, 625)))
  }

  test("pipeline is immutable") {
    val p = Pipeline(simpleDataset)
    val p2 = p.withPolynomial(ColType.Numeric, Seq(2))
    assert(!p.toDF().columns.contains("NUMERIC_FEATURE_pow_2"))
    assert(p2.toDF().columns.contains("NUMERIC_FEATURE_pow_2"))
  }

  test("auxiliary columns are dropped but usable by later layers") {
    val p = Pipeline(simpleDataset)
      .withPolynomial(ColType.Numeric, Seq(2), auxiliary = true)
      .withNewLayer()
      .withLog(ColType.Numeric, Seq(10))
    val df = p.toDF()
    assert(!df.columns.contains("NUMERIC_FEATURE_pow_2"))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_log10" -> Seq(NegInf, 0.0, 0.30103, 0.47712125, 0.60205999, 0.69897),
      "NUMERIC_FEATURE_pow_2_log10" -> Seq(NegInf, 0.0, 0.60205999, 0.95424251, 1.20411998, 1.39794001)))
  }

  test("optimization levels prune self-combos and commutative duplicates") {
    def newCols(level: OptimizationLevel): Set[String] = {
      val ds = basicDataset()
      val p = Pipeline(ds, level).withArithmetic(ColType.Numeric, ColType.Numeric,
        Seq(ops.Arithmetic.Add, ops.Arithmetic.Subtract))
      p.toDF().columns.toSet -- ds.df.columns.toSet
    }
    val none = newCols(OptimizationLevel.None)
    assert(none.size == 8)
    val skipSelf = newCols(OptimizationLevel.SkipSelf)
    assert(skipSelf == none -- Set(
      "NUMERIC_FEATURE_add_NUMERIC_FEATURE", "NUMERIC_FEATURE_2_add_NUMERIC_FEATURE_2",
      "NUMERIC_FEATURE_subtract_NUMERIC_FEATURE", "NUMERIC_FEATURE_2_subtract_NUMERIC_FEATURE_2"))
    val dedup = newCols(OptimizationLevel.DeduplicateCommutative)
    assert(dedup == skipSelf - "NUMERIC_FEATURE_2_add_NUMERIC_FEATURE")
  }

  test("invalid time-window entry keeps the unwrapped variant (pipeline.py:562-586)") {
    val ds = basicDataset()
    val cols = Pipeline(ds)
      .withCount(timeWindows = Seq(null, "2d"), indexColumnName = Some("DATE_FEATURE"))
      .toDF().columns.toSet -- ds.df.columns.toSet
    assert(cols == Set("count", "count_in_the_last_2d"), cols)
  }

  test("index / over columns must be present in schema") {
    val emptyDs = GraftDataset(basicFrame, FeatureSchema(Vector.empty), Seq(Idx))
    val p = Pipeline(emptyDs)
    assertThrows[NoSuchElementException] {
      p.withCount(timeWindows = Seq("1d"), indexColumnName = Some("GROUPING_FEATURE_NUM"))
    }
    assertThrows[NoSuchElementException] {
      p.withCount(overColumnsCombinations = Seq(Seq("GROUPING_FEATURE_NUM")))
    }
  }

  test("mega-golden: all transformers (test_pipeline.py:204-441)") {
    val ds = basicDataset(Map(
      "GROUPING_FEATURE_NUM" -> ColRole.Identifier,
      "GROUPING_FEATURE_CAT_2" -> ColRole.Identifier,
      "DATE_FEATURE" -> ColRole.TimeInfo))
    import ops._
    val catNomNotId =
      (ColType.Ordinal | ColType.Nominal) && !RoleSelector(Set(ColRole.Identifier))
    val p = Pipeline(ds)
      .withSeasonal(ColType.Datetime.asSelector && !ColRole.TimeInfo.asSelector, Seq(Seasonal.HourOfDay))
      .withSeasonal("DATE_FEATURE", Seq(Seasonal.HourOfDay))
      .withSeasonal("DATE_FEATURE", Seq(Seasonal.DayOfWeek))
      .withSeasonal("DATE_FEATURE", Seq(Seasonal.MonthOfYear))
      .withSeasonal("DATE_FEATURE", Seq(Seasonal.HourOfDay, Seasonal.DayOfWeek, Seasonal.MonthOfYear), periodic = true)
      .withTimeDiff("DATE_FEATURE", "DATE_FEATURE", unit = "s")
      .withTimeDiff("DATE_FEATURE", "DATE_FEATURE", unit = "h")
      .withTimeDiff("DATE_FEATURE", "DATE_FEATURE", unit = "d")
      .withPolynomial(ColType.Numeric, Seq(2, 3))
      .withLog("NUMERIC_FEATURE", Seq(math.E, 10))
      .withGoniometric("NUMERIC_FEATURE", Seq(Gon.Sin, Gon.Cos))
      .withScaling("NUMERIC_FEATURE", Seq(Scaling.Standard, Scaling.MinMax))
      .withArithmetic(ColType.Numeric, ColType.Numeric,
        Seq(Arithmetic.Add, Arithmetic.Subtract, Arithmetic.Multiply, Arithmetic.Divide))
      .withComparison(ColType.Numeric, ColType.Numeric,
        Seq(Comparison.Equal, Comparison.GreaterThan, Comparison.GreaterOrEqual))
      .withComparison(catNomNotId, catNomNotId,
        Seq(Comparison.Equal, Comparison.GreaterThan, Comparison.GreaterOrEqual))
      .withCount(overColumnsCombinations = Seq(Seq(), Seq("GROUPING_FEATURE_NUM"),
        Seq("GROUPING_FEATURE_NUM", "GROUPING_FEATURE_CAT_2")))
      .withCount(overColumnsCombinations = Seq(Seq("GROUPING_FEATURE_NUM")), cumulative = Cum.Inclusive)
      .withCount(overColumnsCombinations = Seq(Seq(), Seq("GROUPING_FEATURE_NUM")),
        timeWindows = Seq("2d", "2d1h"), indexColumnName = Some("DATE_FEATURE"))
      .withCount(overColumnsCombinations = Seq(Seq("GROUPING_FEATURE_NUM")),
        filteringCondition = Some(Cond.ofColumn("BOOL_FEATURE")))
      .withLagged(ColType.Numeric, Seq(1),
        overColumnsCombinations = Seq(Seq(), Seq("GROUPING_FEATURE_NUM"),
          Seq("GROUPING_FEATURE_NUM", "GROUPING_FEATURE_CAT_2")), fillValue = Some(0))
      .withLagged(catNomNotId, Seq(1, 2), fillValue = Some("missing"))
      .withFirstValue(
        (ColType.Numeric | ColType.Ordinal) && !RoleSelector(Set(ColRole.Identifier)),
        overColumnsCombinations = Seq(Seq(), Seq("GROUPING_FEATURE_NUM"),
          Seq("GROUPING_FEATURE_NUM", "GROUPING_FEATURE_CAT_2")))
      .withMode(ColType.Boolean, overColumnsCombinations = Seq(Seq(), Seq("GROUPING_FEATURE_NUM")))
      .withNumUnique(ColType.Boolean, overColumnsCombinations = Seq(Seq(), Seq("GROUPING_FEATURE_NUM"),
        Seq("GROUPING_FEATURE_NUM", "GROUPING_FEATURE_CAT_2")))
      .withEntityEntropy("TEXT_FEATURE", "TEXT_FEATURE_2")
      .withEntityEntropy("TEXT_FEATURE_2", "TEXT_FEATURE")
      .withPointwiseMutualInformation("GROUPING_FEATURE_NUM", "GROUPING_FEATURE_CAT_2")
      .withArithmeticAggregation(ColType.Numeric,
        Seq(Agg.Min, Agg.Max, Agg.Sum, Agg.Mean, Agg.Std, Agg.Zscore),
        overColumnsCombinations = Seq(Seq("GROUPING_FEATURE_NUM"),
          Seq("GROUPING_FEATURE_NUM", "GROUPING_FEATURE_CAT_2")))
      .withArithmeticAggregation("NUMERIC_FEATURE", Seq(Agg.Quantile), quantiles = Seq(0.25, 0.5, 0.75))
      .withArgmin("NUMERIC_FEATURE_2", "CATEGORICAL_FEATURE",
        overColumnsCombinations = Seq(Seq("GROUPING_FEATURE_NUM")))
      .withArgmax("NUMERIC_FEATURE", "CATEGORICAL_FEATURE",
        overColumnsCombinations = Seq(Seq("GROUPING_FEATURE_NUM")))
      .withTextSimilarity("TEXT_FEATURE", "TEXT_FEATURE_2",
        Seq(TextSim.DamerauLevenshtein, TextSim.Jaccard, TextSim.Jaro, TextSim.JaroWinkler),
        substrSize = 3, weight = 0.2)
      .withTextExtraction("TEXT_FEATURE_3",
        Seq(TextExtract.Length, TextExtract.EmailDomain, TextExtract.CharacterEntropy))
      .withTextCountMatches("TEXT_FEATURE_3", Seq("""\d""", """[A-Z]"""))

    val df = p.toDF()
    df.cache()

    val expected: Map[String, Seq[Any]] = Map(
      "DATE_FEATURE_hour_of_day" -> Seq(0, 0, 0, 0, 0, 0),
      "DATE_FEATURE_day_of_week" -> Seq(6, 7, 1, 2, 3, 4),
      "DATE_FEATURE_month_of_year" -> Seq(1, 1, 1, 1, 1, 1),
      "DATE_FEATURE_hour_of_day_angular_sin" -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      "DATE_FEATURE_hour_of_day_angular_cos" -> Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
      "DATE_FEATURE_day_of_week_angular_sin" -> Seq(-0.974928, -0.781831, 0.0, 0.781831, 0.974928, 0.433884),
      "DATE_FEATURE_day_of_week_angular_cos" -> Seq(-0.222521, 0.62349, 1.0, 0.62349, -0.222521, -0.900969),
      "DATE_FEATURE_month_of_year_angular_sin" -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      "DATE_FEATURE_month_of_year_angular_cos" -> Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
      "DATE_FEATURE_total_seconds_diff_DATE_FEATURE" -> Seq(0, 0, 0, 0, 0, 0),
      "DATE_FEATURE_total_hours_diff_DATE_FEATURE" -> Seq(0, 0, 0, 0, 0, 0),
      "DATE_FEATURE_total_days_diff_DATE_FEATURE" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_pow_2" -> Seq(0, 1, 4, 9, 16, 25),
      "NUMERIC_FEATURE_pow_3" -> Seq(0, 1, 8, 27, 64, 125),
      "NUMERIC_FEATURE_2_pow_2" -> Seq(0, 1, 4, 9, 16, 25),
      "NUMERIC_FEATURE_2_pow_3" -> Seq(0, -1, -8, -27, -64, -125),
      "NUMERIC_FEATURE_ln" -> Seq(NegInf, 0.0, 0.69314718, 1.09861229, 1.38629436, 1.60943791),
      "NUMERIC_FEATURE_log10" -> Seq(NegInf, 0.0, 0.30103, 0.47712125, 0.60205999, 0.69897),
      "NUMERIC_FEATURE_sin" -> Seq(0.0, 0.84147098, 0.90929743, 0.14112001, -0.7568025, -0.95892427),
      "NUMERIC_FEATURE_cos" -> Seq(1.0, 0.54030231, -0.41614684, -0.9899925, -0.65364362, 0.28366219),
      "NUMERIC_FEATURE_standard_scaled" -> Seq(-1.336306, -0.801784, -0.267261, 0.267261, 0.801784, 1.336306),
      "NUMERIC_FEATURE_minmax_scaled" -> Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
      "NUMERIC_FEATURE_add_NUMERIC_FEATURE" -> Seq(0, 2, 4, 6, 8, 10),
      "NUMERIC_FEATURE_add_NUMERIC_FEATURE_2" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_2_add_NUMERIC_FEATURE" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_2_add_NUMERIC_FEATURE_2" -> Seq(0, -2, -4, -6, -8, -10),
      "NUMERIC_FEATURE_subtract_NUMERIC_FEATURE" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_subtract_NUMERIC_FEATURE_2" -> Seq(0, 2, 4, 6, 8, 10),
      "NUMERIC_FEATURE_2_subtract_NUMERIC_FEATURE" -> Seq(0, -2, -4, -6, -8, -10),
      "NUMERIC_FEATURE_2_subtract_NUMERIC_FEATURE_2" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_multiply_NUMERIC_FEATURE" -> Seq(0, 1, 4, 9, 16, 25),
      "NUMERIC_FEATURE_multiply_NUMERIC_FEATURE_2" -> Seq(0, -1, -4, -9, -16, -25),
      "NUMERIC_FEATURE_2_multiply_NUMERIC_FEATURE" -> Seq(0, -1, -4, -9, -16, -25),
      "NUMERIC_FEATURE_2_multiply_NUMERIC_FEATURE_2" -> Seq(0, 1, 4, 9, 16, 25),
      "NUMERIC_FEATURE_divide_NUMERIC_FEATURE" -> Seq(NaN, 1.0, 1.0, 1.0, 1.0, 1.0),
      "NUMERIC_FEATURE_divide_NUMERIC_FEATURE_2" -> Seq(NaN, -1.0, -1.0, -1.0, -1.0, -1.0),
      "NUMERIC_FEATURE_2_divide_NUMERIC_FEATURE" -> Seq(NaN, -1.0, -1.0, -1.0, -1.0, -1.0),
      "NUMERIC_FEATURE_2_divide_NUMERIC_FEATURE_2" -> Seq(NaN, 1.0, 1.0, 1.0, 1.0, 1.0),
      "NUMERIC_FEATURE_equal_NUMERIC_FEATURE" -> Seq(true, true, true, true, true, true),
      "NUMERIC_FEATURE_equal_NUMERIC_FEATURE_2" -> Seq(true, false, false, false, false, false),
      "NUMERIC_FEATURE_2_equal_NUMERIC_FEATURE" -> Seq(true, false, false, false, false, false),
      "NUMERIC_FEATURE_2_equal_NUMERIC_FEATURE_2" -> Seq(true, true, true, true, true, true),
      "NUMERIC_FEATURE_greater_than_NUMERIC_FEATURE" -> Seq(false, false, false, false, false, false),
      "NUMERIC_FEATURE_greater_than_NUMERIC_FEATURE_2" -> Seq(false, true, true, true, true, true),
      "NUMERIC_FEATURE_2_greater_than_NUMERIC_FEATURE" -> Seq(false, false, false, false, false, false),
      "NUMERIC_FEATURE_2_greater_than_NUMERIC_FEATURE_2" -> Seq(false, false, false, false, false, false),
      "NUMERIC_FEATURE_greater_or_equal_NUMERIC_FEATURE" -> Seq(true, true, true, true, true, true),
      "NUMERIC_FEATURE_greater_or_equal_NUMERIC_FEATURE_2" -> Seq(true, true, true, true, true, true),
      "NUMERIC_FEATURE_2_greater_or_equal_NUMERIC_FEATURE" -> Seq(true, false, false, false, false, false),
      "NUMERIC_FEATURE_2_greater_or_equal_NUMERIC_FEATURE_2" -> Seq(true, true, true, true, true, true),
      "CATEGORICAL_FEATURE_equal_CATEGORICAL_FEATURE" -> Seq(true, true, true, true, true, true),
      "CATEGORICAL_FEATURE_equal_CATEGORICAL_FEATURE_2" -> Seq(false, false, false, false, false, false),
      "CATEGORICAL_FEATURE_2_equal_CATEGORICAL_FEATURE" -> Seq(false, false, false, false, false, false),
      "CATEGORICAL_FEATURE_2_equal_CATEGORICAL_FEATURE_2" -> Seq(true, true, true, true, true, true),
      "CATEGORICAL_FEATURE_greater_than_CATEGORICAL_FEATURE" -> Seq(false, false, false, false, false, false),
      "CATEGORICAL_FEATURE_greater_than_CATEGORICAL_FEATURE_2" -> Seq(false, false, false, true, true, true),
      "CATEGORICAL_FEATURE_2_greater_than_CATEGORICAL_FEATURE" -> Seq(true, true, true, false, false, false),
      "CATEGORICAL_FEATURE_2_greater_than_CATEGORICAL_FEATURE_2" -> Seq(false, false, false, false, false, false),
      "CATEGORICAL_FEATURE_greater_or_equal_CATEGORICAL_FEATURE" -> Seq(true, true, true, true, true, true),
      "CATEGORICAL_FEATURE_greater_or_equal_CATEGORICAL_FEATURE_2" -> Seq(false, false, false, true, true, true),
      "CATEGORICAL_FEATURE_2_greater_or_equal_CATEGORICAL_FEATURE" -> Seq(true, true, true, false, false, false),
      "CATEGORICAL_FEATURE_2_greater_or_equal_CATEGORICAL_FEATURE_2" -> Seq(true, true, true, true, true, true),
      "count" -> Seq(6, 6, 6, 6, 6, 6),
      "count_over_GROUPING_FEATURE_NUM" -> Seq(1, 3, 2, 3, 2, 3),
      "count_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(1, 2, 2, 1, 2, 2),
      "inclusive_cum_count_over_GROUPING_FEATURE_NUM" -> Seq(1, 1, 1, 2, 2, 3),
      "count_in_the_last_2d" -> Seq(1, 2, 2, 2, 2, 2),
      "count_in_the_last_2d1h" -> Seq(1, 2, 3, 3, 3, 3),
      "count_in_the_last_2d_over_GROUPING_FEATURE_NUM" -> Seq(1, 1, 1, 1, 1, 1),
      "count_in_the_last_2d1h_over_GROUPING_FEATURE_NUM" -> Seq(1, 1, 1, 2, 2, 2),
      "count_where_BOOL_FEATURE_over_GROUPING_FEATURE_NUM" -> Seq(1, 0, 2, 0, 2, 0),
      "NUMERIC_FEATURE_lagged_1" -> Seq(0, 0, 1, 2, 3, 4),
      "NUMERIC_FEATURE_2_lagged_1" -> Seq(0, 0, -1, -2, -3, -4),
      "NUMERIC_FEATURE_lagged_1_over_GROUPING_FEATURE_NUM" -> Seq(0, 0, 0, 1, 2, 3),
      "NUMERIC_FEATURE_lagged_1_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 0, 0, 0, 2, 1),
      "NUMERIC_FEATURE_2_lagged_1_over_GROUPING_FEATURE_NUM" -> Seq(0, 0, 0, -1, -2, -3),
      "NUMERIC_FEATURE_2_lagged_1_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 0, 0, 0, -2, -1),
      "CATEGORICAL_FEATURE_lagged_1" -> Seq("missing", "A", "B", "C", "D", "E"),
      "CATEGORICAL_FEATURE_lagged_2" -> Seq("missing", "missing", "A", "B", "C", "D"),
      "CATEGORICAL_FEATURE_2_lagged_1" -> Seq("missing", "F", "E", "D", "C", "B"),
      "CATEGORICAL_FEATURE_2_lagged_2" -> Seq("missing", "missing", "F", "E", "D", "C"),
      "CATEGORICAL_FEATURE_first_value" -> Seq("A", "A", "A", "A", "A", "A"),
      "NUMERIC_FEATURE_first_value" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_2_first_value" -> Seq(0, 0, 0, 0, 0, 0),
      "CATEGORICAL_FEATURE_first_value_over_GROUPING_FEATURE_NUM" -> Seq("A", "B", "C", "B", "C", "B"),
      "CATEGORICAL_FEATURE_first_value_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq("A", "B", "C", "D", "C", "B"),
      "NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM" -> Seq(0, 1, 2, 1, 2, 1),
      "NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 1, 2, 3, 2, 1),
      "NUMERIC_FEATURE_2_first_value_over_GROUPING_FEATURE_NUM" -> Seq(0, -1, -2, -1, -2, -1),
      "NUMERIC_FEATURE_2_first_value_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, -1, -2, -3, -2, -1),
      "BOOL_FEATURE_mode" -> Seq(true, true, true, true, true, true),
      "BOOL_FEATURE_mode_over_GROUPING_FEATURE_NUM" -> Seq(true, false, true, false, true, false),
      "BOOL_FEATURE_num_unique" -> Seq(2, 2, 2, 2, 2, 2),
      "BOOL_FEATURE_num_unique_over_GROUPING_FEATURE_NUM" -> Seq(1, 1, 1, 1, 1, 1),
      "BOOL_FEATURE_num_unique_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(1, 1, 1, 1, 1, 1),
      "TEXT_FEATURE_2_by_TEXT_FEATURE_entropy" -> Seq(2.584963, 2.584963, 2.584963, 2.584963, 2.584963, 2.584963),
      "TEXT_FEATURE_by_TEXT_FEATURE_2_entropy" -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      "GROUPING_FEATURE_NUM_GROUPING_FEATURE_CAT_2_pmi" -> Seq(0.584963, 1.0, 0.584963, -1.0, 0.584963, 1.0),
      "NUMERIC_FEATURE_min_over_GROUPING_FEATURE_NUM" -> Seq(0, 1, 2, 1, 2, 1),
      "NUMERIC_FEATURE_min_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 1, 2, 3, 2, 1),
      "NUMERIC_FEATURE_2_min_over_GROUPING_FEATURE_NUM" -> Seq(0, -5, -4, -5, -4, -5),
      "NUMERIC_FEATURE_2_min_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, -5, -4, -3, -4, -5),
      "NUMERIC_FEATURE_max_over_GROUPING_FEATURE_NUM" -> Seq(0, 5, 4, 5, 4, 5),
      "NUMERIC_FEATURE_max_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 5, 4, 3, 4, 5),
      "NUMERIC_FEATURE_2_max_over_GROUPING_FEATURE_NUM" -> Seq(0, -1, -2, -1, -2, -1),
      "NUMERIC_FEATURE_2_max_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, -1, -2, -3, -2, -1),
      "NUMERIC_FEATURE_sum_over_GROUPING_FEATURE_NUM" -> Seq(0, 9, 6, 9, 6, 9),
      "NUMERIC_FEATURE_sum_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 6, 6, 3, 6, 6),
      "NUMERIC_FEATURE_2_sum_over_GROUPING_FEATURE_NUM" -> Seq(0, -9, -6, -9, -6, -9),
      "NUMERIC_FEATURE_2_sum_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, -6, -6, -3, -6, -6),
      "NUMERIC_FEATURE_mean_over_GROUPING_FEATURE_NUM" -> Seq(0.0, 3.0, 3.0, 3.0, 3.0, 3.0),
      "NUMERIC_FEATURE_mean_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0.0, 3.0, 3.0, 3.0, 3.0, 3.0),
      "NUMERIC_FEATURE_2_mean_over_GROUPING_FEATURE_NUM" -> Seq(0.0, -3.0, -3.0, -3.0, -3.0, -3.0),
      "NUMERIC_FEATURE_2_mean_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0.0, -3.0, -3.0, -3.0, -3.0, -3.0),
      "NUMERIC_FEATURE_std_over_GROUPING_FEATURE_NUM" -> Seq(null, 2.0, 1.414214, 2.0, 1.414214, 2.0),
      "NUMERIC_FEATURE_std_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(null, 2.828427, 1.414214, null, 1.414214, 2.828427),
      "NUMERIC_FEATURE_2_std_over_GROUPING_FEATURE_NUM" -> Seq(null, 2.0, 1.414214, 2.0, 1.414214, 2.0),
      "NUMERIC_FEATURE_2_std_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(null, 2.828427, 1.414214, null, 1.414214, 2.828427),
      "NUMERIC_FEATURE_z_score_over_GROUPING_FEATURE_NUM" -> Seq(null, -1.0, -0.707107, 0.0, 0.707107, 1.0),
      "NUMERIC_FEATURE_z_score_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(null, -0.707107, -0.707107, null, 0.707107, 0.707107),
      "NUMERIC_FEATURE_2_z_score_over_GROUPING_FEATURE_NUM" -> Seq(null, 1.0, 0.707107, 0.0, -0.707107, -1.0),
      "NUMERIC_FEATURE_2_z_score_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(null, 0.707107, 0.707107, null, -0.707107, -0.707107),
      "NUMERIC_FEATURE_quantile_25" -> Seq(1.25, 1.25, 1.25, 1.25, 1.25, 1.25),
      "NUMERIC_FEATURE_median" -> Seq(2.5, 2.5, 2.5, 2.5, 2.5, 2.5),
      "NUMERIC_FEATURE_quantile_75" -> Seq(3.75, 3.75, 3.75, 3.75, 3.75, 3.75),
      "argmin_of_NUMERIC_FEATURE_2_by_CATEGORICAL_FEATURE_over_GROUPING_FEATURE_NUM" -> Seq("A", "F", "E", "F", "E", "F"),
      "argmax_of_NUMERIC_FEATURE_by_CATEGORICAL_FEATURE_over_GROUPING_FEATURE_NUM" -> Seq("A", "F", "E", "F", "E", "F"),
      "TEXT_FEATURE_damerau_levenshtein_text_similarity_TEXT_FEATURE_2" -> Seq(1.0, 0.142857, 0.714286, 0.5, 0.428571, 0.875),
      "TEXT_FEATURE_jaccard_text_similarity_TEXT_FEATURE_2" -> Seq(1.0, 0.25, 0.111111, 0.307692, 0.2, 0.375),
      "TEXT_FEATURE_jaro_text_similarity_TEXT_FEATURE_2" -> Seq(1.0, 0.428571, 0.809524, 0.690476, 0.809524, 0.958333),
      "TEXT_FEATURE_jaro_winkler_text_similarity_TEXT_FEATURE_2" -> Seq(1.0, 0.428571, 0.809524, 0.690476, 0.92381, 0.983333),
      "TEXT_FEATURE_3_length_chars" -> Seq(20, 10, 9, 14, 17, 0),
      "TEXT_FEATURE_3_email_domain" -> Seq("example.com", null, null, null, "co.gov.uk", null),
      "TEXT_FEATURE_3_character_entropy" -> Seq(3.64644, 2.84644, 1.58496, 3.52164, 3.49923, 0.0),
      "TEXT_FEATURE_3_count_digits" -> Seq(0, 3, 3, 2, 0, 0),
      "TEXT_FEATURE_3_count_uppercase" -> Seq(0, 4, 3, 0, 0, 0))

    // every expected column exists with expected values…
    assertColumns(df, expected)
    // …and no unexpected generated columns beyond the fixture + expected set
    val base = basicFrame.columns.toSet
    val extra = df.columns.toSet -- base -- expected.keySet
    assert(extra.isEmpty, s"unexpected generated columns: $extra")
    df.unpersist()
  }
}
