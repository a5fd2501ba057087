package graft

import graft.core._
import graft.pipeline.Validator
import graft.transformers._
import org.scalatest.funsuite.AnyFunSuite

/** Ported from pipeline/tests/test_validator.py: static input-type validation and the
  * time-window/index-column gate. Pure Scala — no Spark session.
  */
class ValidatorSpec extends AnyFunSuite {
  private val num = ColumnSpec.numeric("n")
  private val txt = ColumnSpec.text("t")
  private val dt = ColumnSpec.datetime("d")

  test("time windows require an index column; index must be datetime") {
    Validator.validateTimeWindowIndexColumn(Nil, None)
    Validator.validateTimeWindowIndexColumn(Seq(Some("2d")), Some(dt))
    val e1 = intercept[IllegalArgumentException] {
      Validator.validateTimeWindowIndexColumn(Seq(Some("2d")), None)
    }
    assert(e1.getMessage.contains("Time window specified without index column"))
    val e2 = intercept[IllegalArgumentException] {
      Validator.validateTimeWindowIndexColumn(Seq(Some("2d")), Some(num))
    }
    assert(e2.getMessage.contains("only DATETIME columns are supported"))
  }

  test("positional type validation rejects mismatched inputs with a clear message") {
    // polynomial over TEXT: invalid
    val e = intercept[IllegalArgumentException] {
      Validator.validateTransformer(PolynomialTransformer(txt, 2), Seq(txt))
    }
    assert(e.getMessage.contains("has type") && e.getMessage.contains("expected one of"))
    // arity mismatch
    val e2 = intercept[IllegalArgumentException] {
      Validator.validateTransformer(AddTransformer(num, num), Seq(num))
    }
    assert(e2.getMessage.contains("expected 2 input columns"))
    // valid cases pass silently
    Validator.validateTransformer(PolynomialTransformer(num, 2), Seq(num))
    Validator.validateTransformer(AddTransformer(num, ColumnSpec.boolean("b")),
      Seq(num, ColumnSpec.boolean("b")))
  }

  test("wrappers and count are exempt from positional validation (validator.py:24)") {
    Validator.validateTransformer(CountTransformer(), Nil)
    Validator.validateTransformer(OverWrapper(CountTransformer(), Seq("g")), Nil)
    Validator.validateTransformer(RollingWrapper(CountTransformer(), dt, "2d"), Nil)
  }

  test("entropy/PMI/argmin type gates from the reference") {
    // entropy excludes NUMERIC and DATETIME inputs
    intercept[IllegalArgumentException] {
      Validator.validateTransformer(EntityEntropyTransformer(num, txt), Seq(num, txt))
    }
    // argmin value column must not be NOMINAL/TEXT, but ORDINAL is allowed
    intercept[IllegalArgumentException] {
      Validator.validateTransformer(ArgMinTransformer(txt, num), Seq(txt, num))
    }
    Validator.validateTransformer(
      ArgMinTransformer(ColumnSpec.ordinal("o"), txt), Seq(ColumnSpec.ordinal("o"), txt))
  }
}
