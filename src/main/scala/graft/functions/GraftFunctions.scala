package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the custom kernels: every graft expression is callable from
  * `spark.sql(...)` as `graft_*`.
  *
  * Two registration paths, same function table:
  *  - cluster deployment: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (applied at session build on driver AND executors' session clones)
  *  - an existing session (notebooks, tests): `graftsql.registerAll(spark)`
  */
object graftsql {

  private def one(name: String, build: Expression => Expression) =
    (name, (args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      build(args.head)
    })

  private def two(name: String, build: (Expression, Expression) => Expression) =
    (name, (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      build(args(0), args(1))
    })

  /** Name → builder for every injectable expression. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    one("graft_simhash64", SimHash64),
    one("graft_fingerprint", RollingFingerprint),
    one("graft_char_entropy", CharacterEntropy),
    one("graft_nfc", NfcNormalize),
    two("graft_damerau_levenshtein_sim", DamerauLevenshteinSimilarity),
    two("graft_jaro_sim", JaroSimilarity),
    two("graft_jaro_winkler_sim", JaroWinklerSimilarity(_, _, 0.1)),
    two("graft_jaccard2_sim", NgramJaccardSimilarity(_, _, 2)))

  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), builder)
    }

  private[functions] def info(name: String) =
    new ExpressionInfo("graft.functions.graftsql", name)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graftsql.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), graftsql.info(name), builder))
    }
}
