package graft

import graft.core._
import graft.pipeline.FeatureExec
import graft.transformers._
import org.apache.spark.sql.DataFrame

/** Goldens from test_over_wrapper.py / test_rolling_wrapper.py. */
class WrapperSpec extends SparkTestBase {
  private val NaN = Double.NaN

  private def ctx = AggContext(Nil, Seq(Idx), None)
  private def run(ts: FeatureTransformer*): DataFrame =
    FeatureExec.applyTransformers(basicFrame, ctx, ts)

  private val num = ColumnSpec.numeric("NUMERIC_FEATURE")
  private val bool = ColumnSpec.boolean("BOOL_FEATURE")
  private val grp = Seq("GROUPING_FEATURE_NUM")
  private val grp2 = Seq("GROUPING_FEATURE_NUM", "GROUPING_FEATURE_CAT_2")
  private val dateSpec = ColumnSpec.datetime("DATE_FEATURE")

  test("grouped count / cumulative count golden") {
    val df = run(
      OverWrapper(CountTransformer(), grp),
      OverWrapper(CountTransformer(), grp2),
      OverWrapper(CountTransformer(Cum.Inclusive), grp),
      OverWrapper(CountTransformer(Cum.Inclusive), grp2))
    assertColumns(df, Map(
      "count_over_GROUPING_FEATURE_NUM" -> Seq(1, 3, 2, 3, 2, 3),
      "count_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(1, 2, 2, 1, 2, 2),
      "inclusive_cum_count_over_GROUPING_FEATURE_NUM" -> Seq(1, 1, 1, 2, 2, 3),
      "inclusive_cum_count_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(1, 1, 1, 1, 2, 2)))
  }

  test("grouped lag / first value / mode / num_unique golden") {
    val df = run(
      OverWrapper(LaggedTransformer(num, 1), grp),
      OverWrapper(LaggedTransformer(num, 1), grp2),
      OverWrapper(FirstValueTransformer(num), grp),
      OverWrapper(FirstValueTransformer(num), grp2),
      OverWrapper(ModeTransformer(bool), grp),
      OverWrapper(NumUniqueTransformer(ColumnSpec.ordinal("GROUPING_FEATURE_NUM")), Seq("BOOL_FEATURE")))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_lagged_1_over_GROUPING_FEATURE_NUM" -> Seq(null, null, null, 1, 2, 3),
      "NUMERIC_FEATURE_lagged_1_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(null, null, null, null, 2, 1),
      "NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM" -> Seq(0, 1, 2, 1, 2, 1),
      "NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 1, 2, 3, 2, 1),
      "BOOL_FEATURE_mode_over_GROUPING_FEATURE_NUM" -> Seq(true, false, true, false, true, false),
      "GROUPING_FEATURE_NUM_num_unique_over_BOOL_FEATURE" -> Seq(2, 1, 2, 1, 2, 1)))
  }

  test("grouped arithmetic aggregations golden") {
    val df = run(
      OverWrapper(SumTransformer(num), grp), OverWrapper(SumTransformer(num), grp2),
      OverWrapper(MeanTransformer(num), grp),
      OverWrapper(StdTransformer(num), grp), OverWrapper(StdTransformer(num), grp2),
      OverWrapper(ZscoreTransformer(num), grp), OverWrapper(ZscoreTransformer(num), grp2))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_sum_over_GROUPING_FEATURE_NUM" -> Seq(0, 9, 6, 9, 6, 9),
      "NUMERIC_FEATURE_sum_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 6, 6, 3, 6, 6),
      "NUMERIC_FEATURE_mean_over_GROUPING_FEATURE_NUM" -> Seq(0.0, 3.0, 3.0, 3.0, 3.0, 3.0),
      "NUMERIC_FEATURE_std_over_GROUPING_FEATURE_NUM" -> Seq(null, 2.0, 1.414214, 2.0, 1.414214, 2.0),
      "NUMERIC_FEATURE_std_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(null, 2.828427, 1.414214, null, 1.414214, 2.828427),
      "NUMERIC_FEATURE_z_score_over_GROUPING_FEATURE_NUM" -> Seq(null, -1.0, -0.707107, 0.0, 0.707107, 1.0),
      "NUMERIC_FEATURE_z_score_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(null, -0.707107, -0.707107, null, 0.707107, 0.707107)))
  }

  test("grouped cumulative arithmetic aggregations golden") {
    val df = run(
      OverWrapper(SumTransformer(num, Cum.Inclusive), grp),
      OverWrapper(SumTransformer(num, Cum.Inclusive), grp2),
      OverWrapper(MeanTransformer(num, Cum.Inclusive), grp),
      OverWrapper(StdTransformer(num, Cum.Inclusive), grp),
      OverWrapper(StdTransformer(num, Cum.Inclusive), grp2),
      OverWrapper(ZscoreTransformer(num, Cum.Inclusive), grp),
      OverWrapper(ZscoreTransformer(num, Cum.Inclusive), grp2))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_inclusive_cum_sum_over_GROUPING_FEATURE_NUM" -> Seq(0, 1, 2, 4, 6, 9),
      "NUMERIC_FEATURE_inclusive_cum_sum_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0, 1, 2, 3, 6, 6),
      "NUMERIC_FEATURE_inclusive_cum_mean_over_GROUPING_FEATURE_NUM" -> Seq(0.0, 1.0, 2.0, 2.0, 3.0, 3.0),
      "NUMERIC_FEATURE_inclusive_cum_std_over_GROUPING_FEATURE_NUM" -> Seq(0.0, 0.0, 0.0, 1.0, 1.0, 2.236068),
      "NUMERIC_FEATURE_inclusive_cum_std_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(0.0, 0.0, 0.0, 0.0, 1.0, 2.0),
      "NUMERIC_FEATURE_inclusive_cum_z_score_over_GROUPING_FEATURE_NUM" -> Seq(NaN, NaN, NaN, 1.0, 1.0, 0.894427),
      "NUMERIC_FEATURE_inclusive_cum_z_score_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2" -> Seq(NaN, NaN, NaN, NaN, 1.0, 1.0)))
  }

  test("rolling golden (count, first value, mode, num_unique, arith)") {
    val df = run(
      RollingWrapper(CountTransformer(), dateSpec, "2d1h"),
      RollingWrapper(FirstValueTransformer(num), dateSpec, "2d1h"),
      RollingWrapper(ModeTransformer(ColumnSpec.ordinal("GROUPING_FEATURE_CAT_2")), dateSpec, "2d1h"),
      RollingWrapper(NumUniqueTransformer(ColumnSpec.nominal("GROUPING_FEATURE_NUM")), dateSpec, "2d1h"),
      RollingWrapper(SumTransformer(num), dateSpec, "2d1h"),
      RollingWrapper(MeanTransformer(num), dateSpec, "2d1h"),
      RollingWrapper(StdTransformer(num), dateSpec, "2d1h"),
      RollingWrapper(ZscoreTransformer(num), dateSpec, "2d1h"))
    assertColumns(df, Map(
      "count_in_the_last_2d1h" -> Seq(1, 2, 3, 3, 3, 3),
      "NUMERIC_FEATURE_first_value_in_the_last_2d1h" -> Seq(0, 0, 0, 1, 2, 3),
      "GROUPING_FEATURE_CAT_2_mode_in_the_last_2d1h" -> Seq("CONSONANT", "VOWEL", "CONSONANT", "CONSONANT", "CONSONANT", "CONSONANT"),
      "GROUPING_FEATURE_NUM_num_unique_in_the_last_2d1h" -> Seq(1, 2, 3, 2, 2, 2),
      "NUMERIC_FEATURE_sum_in_the_last_2d1h" -> Seq(0, 1, 3, 6, 9, 12),
      "NUMERIC_FEATURE_mean_in_the_last_2d1h" -> Seq(0.0, 0.5, 1.0, 2.0, 3.0, 4.0),
      "NUMERIC_FEATURE_std_in_the_last_2d1h" -> Seq(null, 0.707107, 1.0, 1.0, 1.0, 1.0),
      "NUMERIC_FEATURE_z_score_in_the_last_2d1h" -> Seq(null, 0.707107, 1.0, 1.0, 1.0, 1.0)))
  }

  test("rolling+over compositions golden (both wrap orders)") {
    val df = run(
      OverWrapper(RollingWrapper(FirstValueTransformer(num), dateSpec, "2d1h"), grp),
      RollingWrapper(OverWrapper(FirstValueTransformer(num), grp), dateSpec, "2d1h"))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_first_value_in_the_last_2d1h_over_GROUPING_FEATURE_NUM" -> Seq(0, 1, 2, 1, 2, 3),
      "NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM_in_the_last_2d1h" -> Seq(0, 1, 2, 1, 2, 3)))
  }

  test("rolling entropy / pmi / argmin / argmax (hand-computed oracles, 2d1h window)") {
    val df = run(
      RollingWrapper(EntityEntropyTransformer(
        ColumnSpec.text("TEXT_FEATURE"), ColumnSpec.nominal("GROUPING_FEATURE_NUM")), dateSpec, "2d1h"),
      RollingWrapper(PmiTransformer(
        ColumnSpec.nominal("GROUPING_FEATURE_NUM"), ColumnSpec.nominal("GROUPING_FEATURE_CAT_2")), dateSpec, "2d1h"),
      RollingWrapper(ArgMinTransformer(ColumnSpec.numeric("NUMERIC_FEATURE_2"),
        ColumnSpec.ordinal("CATEGORICAL_FEATURE")), dateSpec, "2d1h"),
      RollingWrapper(ArgMaxTransformer(ColumnSpec.numeric("NUMERIC_FEATURE"),
        ColumnSpec.ordinal("CATEGORICAL_FEATURE"), Cum.None,
        Some(Cond.ofColumn("BOOL_FEATURE"))), dateSpec, "2d1h"))
    assertColumns(df, Map(
      "GROUPING_FEATURE_NUM_by_TEXT_FEATURE_entropy_in_the_last_2d1h" ->
        Seq(0.0, 1.0, 1.584963, 0.918296, 0.918296, 0.918296),
      "GROUPING_FEATURE_NUM_GROUPING_FEATURE_CAT_2_pmi_in_the_last_2d1h" ->
        Seq(0.0, 1.0, 0.584963, -0.415037, 0.0, 0.584963),
      "argmin_of_NUMERIC_FEATURE_2_by_CATEGORICAL_FEATURE_in_the_last_2d1h" ->
        Seq("A", "B", "C", "D", "E", "F"),
      "argmax_of_NUMERIC_FEATURE_by_CATEGORICAL_FEATURE_where_BOOL_FEATURE_in_the_last_2d1h" ->
        Seq("A", "A", "C", "C", "E", "E")))
  }

  test("rolling count with both windows golden (2d excludes the open left edge)") {
    val df = run(
      RollingWrapper(CountTransformer(), dateSpec, "2d"),
      OverWrapper(RollingWrapper(CountTransformer(), dateSpec, "2d"), grp),
      OverWrapper(RollingWrapper(CountTransformer(), dateSpec, "2d1h"), grp))
    assertColumns(df, Map(
      "count_in_the_last_2d" -> Seq(1, 2, 2, 2, 2, 2),
      "count_in_the_last_2d_over_GROUPING_FEATURE_NUM" -> Seq(1, 1, 1, 1, 1, 1),
      "count_in_the_last_2d1h_over_GROUPING_FEATURE_NUM" -> Seq(1, 1, 1, 2, 2, 2)))
  }
}
