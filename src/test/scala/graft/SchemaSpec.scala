package graft

import graft.core._
import graft.core.selectors._
import graft.pipeline.{Optimizer, OptimizationLevel}
import org.scalatest.funsuite.AnyFunSuite

/** Meta-level units ported from base/tests/test_schema.py,
  * test_column_specification.py, pipeline/tests/test_optimizer.py, utils/tests.
  * Pure Scala — no Spark session.
  */
class SchemaSpec extends AnyFunSuite {
  private val num = ColumnSpec.numeric("n")
  private val num2 = ColumnSpec.numeric("n2")
  private val label = ColumnSpec.boolean("y", ColRole.Label)
  private val txt = ColumnSpec.text("t")
  private val idCol = ColumnSpec.nominal("id", ColRole.Identifier)
  private val schema = FeatureSchema(num, num2, label, txt, idCol)

  test("selection by name / type / role / spec / seq") {
    assert(schema.select("n") == Vector(num))
    assert(schema.select(ColType.Numeric) == Vector(num, num2))
    assert(schema.select(ColRole.Label) == Vector(label))
    assert(schema.select(num2) == Vector(num2))
    assert(schema.select(Seq("t", "n")) == Vector(txt, num))
    assertThrows[NoSuchElementException](schema.select("missing"))
    assertThrows[IllegalArgumentException](schema.select(ColumnSpec.numeric("ghost")))
  }

  test("set selection resolves sorted by name (reference schema.py:119-122)") {
    assert(schema.select(Set("t", "n2", "n")) == Vector(num, num2, txt))
    assert(schema.select(Seq("t", "n2", "n")) == Vector(txt, num2, num)) // seq keeps order
  }

  test("selector boolean algebra") {
    val sel = (ColType.Numeric.asSelector || ColType.Text.asSelector) &&
      !RoleSelector(Set(ColRole.Label))
    assert(schema.select(sel: ColumnSelector) == Vector(num, num2, txt))
    assert(schema.select(nameContains("2")) == Vector(num2))
    assert(schema.select(nameStartsWith("n")) == Vector(num, num2))
    assert(schema.select(nameEndsWith("d")) == Vector(idCol))
    assert(schema.select(nameMatches("^n\\d$")) == Vector(num2))
    assert(TypeSelector.exclude(ColType.Numeric, ColType.Datetime).types ==
      Set(ColType.Boolean, ColType.Nominal, ColType.Ordinal, ColType.Text))
  }

  test("schema add / drop / label") {
    val s2 = schema ++ FeatureSchema(ColumnSpec.numeric("extra"))
    assert(s2.numColumns == 6 && s2.columnNames.last == "extra")
    assert(schema.labelColumn == label)
    assertThrows[IllegalStateException](FeatureSchema(num).labelColumn)
    val dropped = schema.drop(Seq(num2, label))
    assert(dropped.columnNames == Vector("n", "t", "id"))
    // drop removes only the first occurrence of a duplicated spec
    val dup = FeatureSchema(num, num)
    assert(dup.drop(Seq(num)).columns == Vector(num))
  }

  test("optimizer: skip-self and commutative dedup preserve order") {
    val combos = Seq(Seq(num, num), Seq(num, num2), Seq(num2, num), Seq(num2, num2))
    val lvl0 = new Optimizer(OptimizationLevel.None)
    assert(lvl0.optimizeInputCombos(commutative = true, combos) == combos)
    val lvl1 = new Optimizer(OptimizationLevel.SkipSelf)
    assert(lvl1.optimizeInputCombos(commutative = true, combos) ==
      Seq(Seq(num, num2), Seq(num2, num)))
    val lvl2 = new Optimizer(OptimizationLevel.DeduplicateCommutative)
    assert(lvl2.optimizeInputCombos(commutative = true, combos) == Seq(Seq(num, num2)))
    assert(lvl2.optimizeInputCombos(commutative = false, combos) ==
      Seq(Seq(num, num2), Seq(num2, num)))
  }

  test("optimizer: output-name dedup against schema and pending layer") {
    import graft.transformers.PolynomialTransformer
    val t1 = PolynomialTransformer(num, 2)
    val t1Again = PolynomialTransformer(num, 2)
    val t2 = PolynomialTransformer(num2, 2)
    val opt = new Optimizer(OptimizationLevel.None)
    assert(opt.deduplicateAgainstLayers(schema, Seq(t1, t1Again, t2)) == Vector(t1, t2))
    val withExisting = schema ++ FeatureSchema(t1.outputSpec)
    assert(opt.deduplicateAgainstLayers(withExisting, Seq(t1, t2)) == Vector(t2))
  }

  test("duration grammar parse/format roundtrip (reference utils.py:55-79)") {
    assert(Durations.parseSeconds("2d") == 172800L)
    assert(Durations.parseSeconds("2d1h") == 176400L)
    assert(Durations.parseSeconds("1y2mo3d4h5m6s") ==
      365L * 86400 + 2 * 30 * 86400 + 3 * 86400 + 4 * 3600 + 5 * 60 + 6)
    assert(Durations.format(176400L) == "2d1h")
    assert(Durations.format(0L) == "0s")
    assert(Durations.format(Durations.parseSeconds("1y2mo3d4h5m6s")) == "1y2mo3d4h5m6s")
    assertThrows[IllegalArgumentException](Durations.parseSeconds("nope"))
  }

  test("name formatting for log bases") {
    assert(Fmt.num(10.0) == "10")
    assert(Fmt.num(2.5) == "2.5")
  }
}
