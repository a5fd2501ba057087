package graft

import graft.core._
import graft.pipeline.FeatureExec
import graft.transformers._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Golden parity with /root/reference/src/auto_featurs/transformers/tests/
  * test_aggregating_transformers.py — expected values copied verbatim.
  */
class AggregatingSpec extends SparkTestBase {
  private val NaN = Double.NaN
  private val Inf = Double.PositiveInfinity

  private def ctx = AggContext(Nil, Seq(Idx), None)
  private def run(ts: FeatureTransformer*): DataFrame =
    FeatureExec.applyTransformers(basicFrame, ctx, ts)

  private val geCond = Some(Cond("NUMERIC_FEATURE_GE_2", col("NUMERIC_FEATURE") >= 2))
  private val boolCond = Some(Cond("BOOL_FEATURE", col("BOOL_FEATURE")))
  private val num = ColumnSpec.numeric("NUMERIC_FEATURE")
  private val num2 = ColumnSpec.numeric("NUMERIC_FEATURE_2")
  private val cat = ColumnSpec.ordinal("CATEGORICAL_FEATURE")
  private val grp = ColumnSpec.ordinal("GROUPING_FEATURE_NUM")
  private val bool = ColumnSpec.boolean("BOOL_FEATURE")

  test("count names") {
    assert(CountTransformer().outputName == "count")
    assert(CountTransformer(Cum.Exclusive).outputName == "exclusive_cum_count")
    assert(CountTransformer(Cum.Inclusive).outputName == "inclusive_cum_count")
    assert(CountTransformer(Cum.None, geCond).outputName == "count_where_NUMERIC_FEATURE_GE_2")
    assert(CountTransformer(Cum.Exclusive, geCond).outputName == "exclusive_cum_count_where_NUMERIC_FEATURE_GE_2")
  }

  test("count golden") {
    val df = run(
      CountTransformer(),
      CountTransformer(Cum.Exclusive),
      CountTransformer(Cum.Inclusive),
      CountTransformer(Cum.None, geCond),
      CountTransformer(Cum.Exclusive, geCond),
      CountTransformer(Cum.Inclusive, geCond))
    assertColumns(df, Map(
      "count" -> Seq(6, 6, 6, 6, 6, 6),
      "exclusive_cum_count" -> Seq(0, 1, 2, 3, 4, 5),
      "inclusive_cum_count" -> Seq(1, 2, 3, 4, 5, 6),
      "count_where_NUMERIC_FEATURE_GE_2" -> Seq(4, 4, 4, 4, 4, 4),
      "exclusive_cum_count_where_NUMERIC_FEATURE_GE_2" -> Seq(0, 0, 0, 1, 2, 3),
      "inclusive_cum_count_where_NUMERIC_FEATURE_GE_2" -> Seq(0, 0, 1, 2, 3, 4)))
  }

  test("lagged golden") {
    val df = run(
      LaggedTransformer(cat, 1),
      LaggedTransformer(num, 1),
      LaggedTransformer(num, 2),
      LaggedTransformer(num2, 2, Some(0)))
    assertColumns(df, Map(
      "CATEGORICAL_FEATURE_lagged_1" -> Seq(null, "A", "B", "C", "D", "E"),
      "NUMERIC_FEATURE_lagged_1" -> Seq(null, 0, 1, 2, 3, 4),
      "NUMERIC_FEATURE_lagged_2" -> Seq(null, null, 0, 1, 2, 3),
      "NUMERIC_FEATURE_2_lagged_2" -> Seq(0, 0, 0, -1, -2, -3)))
  }

  test("first value golden") {
    val df = run(
      FirstValueTransformer(cat),
      FirstValueTransformer(num),
      FirstValueTransformer(num, Some(Cond("NOT_BOOL_FEATURE", !col("BOOL_FEATURE")))))
    assertColumns(df, Map(
      "CATEGORICAL_FEATURE_first_value" -> Seq("A", "A", "A", "A", "A", "A"),
      "NUMERIC_FEATURE_first_value" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_first_value_where_NOT_BOOL_FEATURE" -> Seq(1, 1, 1, 1, 1, 1)))
  }

  test("mode golden") {
    val df = run(
      ModeTransformer(grp),
      ModeTransformer(bool),
      ModeTransformer(grp, Cum.None, boolCond),
      ModeTransformer(grp, Cum.Inclusive, boolCond))
    assertColumns(df, Map(
      "GROUPING_FEATURE_NUM_mode" -> Seq("ODD", "ODD", "ODD", "ODD", "ODD", "ODD"),
      "BOOL_FEATURE_mode" -> Seq(true, true, true, true, true, true),
      "GROUPING_FEATURE_NUM_mode_where_BOOL_FEATURE" -> Seq("EVEN", "EVEN", "EVEN", "EVEN", "EVEN", "EVEN"),
      "GROUPING_FEATURE_NUM_inclusive_cum_mode_where_BOOL_FEATURE" -> Seq("ZERO", "ZERO", "EVEN", "EVEN", "EVEN", "EVEN")))
  }

  test("num unique golden") {
    val df = run(
      NumUniqueTransformer(grp),
      NumUniqueTransformer(num),
      NumUniqueTransformer(grp, Cum.None, boolCond),
      NumUniqueTransformer(grp, Cum.Inclusive, boolCond))
    assertColumns(df, Map(
      "GROUPING_FEATURE_NUM_num_unique" -> Seq(3, 3, 3, 3, 3, 3),
      "NUMERIC_FEATURE_num_unique" -> Seq(6, 6, 6, 6, 6, 6),
      "GROUPING_FEATURE_NUM_num_unique_where_BOOL_FEATURE" -> Seq(2, 2, 2, 2, 2, 2),
      "GROUPING_FEATURE_NUM_inclusive_cum_num_unique_where_BOOL_FEATURE" -> Seq(1, 1, 2, 2, 2, 2)))
  }

  test("num unique cumulative unfiltered (collect_set fast path)") {
    val df = run(
      NumUniqueTransformer(grp, Cum.Inclusive),
      NumUniqueTransformer(grp, Cum.Exclusive))
    assertColumns(df, Map(
      "GROUPING_FEATURE_NUM_inclusive_cum_num_unique" -> Seq(1, 2, 3, 3, 3, 3),
      "GROUPING_FEATURE_NUM_exclusive_cum_num_unique" -> Seq(0, 1, 2, 3, 3, 3)))
  }

  private lazy val entropyFrame: DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField(Idx, IntegerType), StructField("ID", StringType),
      StructField("LOC", StringType), StructField("BOOL", BooleanType)))
    val rows = Seq(
      Row(0, "1", "CZ", true), Row(1, "1", "CZ", true), Row(2, "1", "CZ", false),
      Row(3, "2", "CZ", true), Row(4, "2", "CZ", true), Row(5, "2", "SK", false),
      Row(6, "3", "CZ", true), Row(7, "3", "SK", true), Row(8, "3", "PL", false),
      Row(9, null, null, true))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("entity entropy golden") {
    val id = ColumnSpec.nominal("ID"); val loc = ColumnSpec.nominal("LOC")
    val df = FeatureExec.applyTransformers(entropyFrame, ctx, Seq(
      EntityEntropyTransformer(id, loc),
      EntityEntropyTransformer(id, loc, Cum.Inclusive)))
    assertColumns(df, Map(
      "LOC_by_ID_entropy" -> Seq(0.0, 0.0, 0.0, 0.918296, 0.918296, 0.918296, 1.584963, 1.584963, 1.584963, 0.0),
      "LOC_by_ID_inclusive_cum_entropy" -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.918296, 0.0, 1.0, 1.584963, 0.0)))
  }

  test("pmi golden") {
    val id = ColumnSpec.nominal("ID"); val loc = ColumnSpec.nominal("LOC")
    val bcond = Some(Cond("BOOL", col("BOOL")))
    val df = FeatureExec.applyTransformers(entropyFrame, ctx, Seq(
      PmiTransformer(id, loc),
      PmiTransformer(id, loc, Cum.Inclusive),
      PmiTransformer(id, loc, Cum.Inclusive, bcond)))
    assertColumns(df, Map(
      "ID_LOC_pmi" -> Seq(0.736966, 0.736966, 0.736966, 0.152003, 0.152003, 0.736966, -0.847997, 0.736966, 1.736966, 3.321928),
      "ID_LOC_inclusive_cum_pmi" -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.222392, 1.0, 1.584963, 3.321928),
      "ID_LOC_inclusive_cum_pmi_where_BOOL" -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, NaN, 0.0, 1.584963, NaN, 2.807355)))
  }

  test("basic arithmetic aggregations golden") {
    val df = run(
      MinTransformer(num), MaxTransformer(num), SumTransformer(num),
      MedianTransformer(num), MeanTransformer(num), StdTransformer(num), ZscoreTransformer(num))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_min" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_max" -> Seq(5, 5, 5, 5, 5, 5),
      "NUMERIC_FEATURE_sum" -> Seq(15, 15, 15, 15, 15, 15),
      "NUMERIC_FEATURE_median" -> Seq(2.5, 2.5, 2.5, 2.5, 2.5, 2.5),
      "NUMERIC_FEATURE_mean" -> Seq(2.5, 2.5, 2.5, 2.5, 2.5, 2.5),
      "NUMERIC_FEATURE_std" -> Seq(1.870829, 1.870829, 1.870829, 1.870829, 1.870829, 1.870829),
      "NUMERIC_FEATURE_z_score" -> Seq(-1.3363059905528512, -0.8017835943317106, -0.2672611981105702,
        0.2672611981105702, 0.8017835943317106, 1.3363059905528512)))
  }

  test("boolean arithmetic aggregations golden") {
    val df = run(
      MinTransformer(bool), MaxTransformer(bool), SumTransformer(bool),
      MedianTransformer(bool), MeanTransformer(bool), StdTransformer(bool), ZscoreTransformer(bool))
    assertColumns(df, Map(
      "BOOL_FEATURE_min" -> Seq(false, false, false, false, false, false),
      "BOOL_FEATURE_max" -> Seq(true, true, true, true, true, true),
      "BOOL_FEATURE_sum" -> Seq(3, 3, 3, 3, 3, 3),
      "BOOL_FEATURE_median" -> Seq(0.5, 0.5, 0.5, 0.5, 0.5, 0.5),
      "BOOL_FEATURE_mean" -> Seq(0.5, 0.5, 0.5, 0.5, 0.5, 0.5),
      "BOOL_FEATURE_std" -> Seq(0.547723, 0.547723, 0.547723, 0.547723, 0.547723, 0.547723),
      "BOOL_FEATURE_z_score" -> Seq(0.912871, -0.912871, 0.912871, -0.912871, 0.912871, -0.912871)))
  }

  test("exclusive cumulative arithmetic aggregations golden") {
    val df = run(
      MinTransformer(num, Cum.Exclusive), MaxTransformer(num, Cum.Exclusive),
      SumTransformer(num, Cum.Exclusive), MedianTransformer(num, Cum.Exclusive),
      MeanTransformer(num, Cum.Exclusive), StdTransformer(num, Cum.Exclusive),
      ZscoreTransformer(num, Cum.Exclusive))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_exclusive_cum_min" -> Seq(NaN, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_exclusive_cum_max" -> Seq(NaN, 0, 1, 2, 3, 4),
      "NUMERIC_FEATURE_exclusive_cum_sum" -> Seq(0, 0, 1, 3, 6, 10),
      "NUMERIC_FEATURE_exclusive_cum_median" -> Seq(null, 0.0, 0.5, 1.0, 1.5, 2.0),
      "NUMERIC_FEATURE_exclusive_cum_mean" -> Seq(NaN, 0.0, 0.5, 1.0, 1.5, 2.0),
      "NUMERIC_FEATURE_exclusive_cum_std" -> Seq(0.0, 0.0, 1.0, 1.802776, 2.692582, 3.674235),
      "NUMERIC_FEATURE_exclusive_cum_z_score" -> Seq(NaN, Inf, 1.5, 1.1094, 0.928477, 0.816497)))
  }

  test("inclusive cumulative arithmetic aggregations golden") {
    val df = run(
      MinTransformer(num, Cum.Inclusive), MaxTransformer(num, Cum.Inclusive),
      SumTransformer(num, Cum.Inclusive), MedianTransformer(num, Cum.Inclusive),
      MeanTransformer(num, Cum.Inclusive), StdTransformer(num, Cum.Inclusive),
      ZscoreTransformer(num, Cum.Inclusive))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_inclusive_cum_min" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_inclusive_cum_max" -> Seq(0, 1, 2, 3, 4, 5),
      "NUMERIC_FEATURE_inclusive_cum_sum" -> Seq(0, 1, 3, 6, 10, 15),
      "NUMERIC_FEATURE_inclusive_cum_median" -> Seq(0.0, 0.5, 1.0, 1.5, 2.0, 2.5),
      "NUMERIC_FEATURE_inclusive_cum_mean" -> Seq(0.0, 0.5, 1.0, 1.5, 2.0, 2.5),
      "NUMERIC_FEATURE_inclusive_cum_std" -> Seq(0.0, 0.5, 1.118034, 1.870829, 2.738613, 3.708099),
      "NUMERIC_FEATURE_inclusive_cum_z_score" -> Seq(NaN, 1.0, 0.8944271819998318, 0.8017835943317106,
        0.7302966866804473, 0.6741999067446689)))
  }

  test("filtered arithmetic aggregations golden") {
    val df = run(
      MinTransformer(num, Cum.None, boolCond), MaxTransformer(num, Cum.None, boolCond),
      SumTransformer(num, Cum.None, boolCond), MedianTransformer(num, Cum.None, boolCond),
      MeanTransformer(num, Cum.None, boolCond), StdTransformer(num, Cum.None, boolCond),
      ZscoreTransformer(num, Cum.None, boolCond))
    assertColumns(df, Map(
      "NUMERIC_FEATURE_min_where_BOOL_FEATURE" -> Seq(0, 0, 0, 0, 0, 0),
      "NUMERIC_FEATURE_max_where_BOOL_FEATURE" -> Seq(4, 4, 4, 4, 4, 4),
      "NUMERIC_FEATURE_sum_where_BOOL_FEATURE" -> Seq(6, 6, 6, 6, 6, 6),
      "NUMERIC_FEATURE_median_where_BOOL_FEATURE" -> Seq(2.0, 2.0, 2.0, 2.0, 2.0, 2.0),
      "NUMERIC_FEATURE_mean_where_BOOL_FEATURE" -> Seq(2.0, 2.0, 2.0, 2.0, 2.0, 2.0),
      "NUMERIC_FEATURE_std_where_BOOL_FEATURE" -> Seq(2.0, 2.0, 2.0, 2.0, 2.0, 2.0),
      "NUMERIC_FEATURE_z_score_where_BOOL_FEATURE" -> Seq(-1.0, -0.5, 0.0, 0.5, 1.0, 1.5)))
  }

  test("argmin golden") {
    val df = run(
      ArgMinTransformer(num2, cat, Cum.None, boolCond),
      ArgMinTransformer(num2, cat, Cum.Exclusive, boolCond),
      ArgMinTransformer(num2, cat, Cum.Inclusive, boolCond))
    assertColumns(df, Map(
      "argmin_of_NUMERIC_FEATURE_2_by_CATEGORICAL_FEATURE_where_BOOL_FEATURE" -> Seq("E", "E", "E", "E", "E", "E"),
      "exclusive_cum_argmin_of_NUMERIC_FEATURE_2_by_CATEGORICAL_FEATURE_where_BOOL_FEATURE" -> Seq(null, "A", "A", "C", "C", "E"),
      "inclusive_cum_argmin_of_NUMERIC_FEATURE_2_by_CATEGORICAL_FEATURE_where_BOOL_FEATURE" -> Seq("A", "A", "C", "C", "E", "E")))
  }

  test("argmax golden") {
    val df = run(
      ArgMaxTransformer(num, cat, Cum.None, boolCond),
      ArgMaxTransformer(num, cat, Cum.Exclusive, boolCond),
      ArgMaxTransformer(num, cat, Cum.Inclusive, boolCond))
    assertColumns(df, Map(
      "argmax_of_NUMERIC_FEATURE_by_CATEGORICAL_FEATURE_where_BOOL_FEATURE" -> Seq("E", "E", "E", "E", "E", "E"),
      "exclusive_cum_argmax_of_NUMERIC_FEATURE_by_CATEGORICAL_FEATURE_where_BOOL_FEATURE" -> Seq(null, "A", "A", "C", "C", "E"),
      "inclusive_cum_argmax_of_NUMERIC_FEATURE_by_CATEGORICAL_FEATURE_where_BOOL_FEATURE" -> Seq("A", "A", "C", "C", "E", "E")))
  }
}
