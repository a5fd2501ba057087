package graft.core

/** Logical column metadata — the semantic type/role overlay our engine keeps on top of
  * Spark's physical `StructType`.
  *
  * Mirrors the reference's data model (see
  * /root/reference/src/auto_featurs/base/column_specification.py:14-67): six semantic
  * column types and four roles; roles drive selection (e.g. "all NUMERIC FEATUREs"),
  * types drive transformer validation.
  */
sealed trait ColType extends ColumnSelector {
  def matches(spec: ColumnSpec): Boolean = spec.colType == this
  def |(other: ColType): TypeSelector = TypeSelector(Set(this, other))
  def asSelector: TypeSelector = TypeSelector(Set(this))
}
object ColType {
  case object Numeric extends ColType
  case object Boolean extends ColType
  case object Nominal extends ColType
  case object Ordinal extends ColType
  case object Text extends ColType
  case object Datetime extends ColType
  val all: Set[ColType] = Set(Numeric, Boolean, Nominal, Ordinal, Text, Datetime)
}

sealed trait ColRole extends ColumnSelector {
  def matches(spec: ColumnSpec): Boolean = spec.role == this
  def asSelector: RoleSelector = RoleSelector(Set(this))
}
object ColRole {
  case object Label extends ColRole
  case object Identifier extends ColRole
  case object TimeInfo extends ColRole
  case object Feature extends ColRole
  val all: Set[ColRole] = Set(Label, Identifier, TimeInfo, Feature)
}

final case class ColumnSpec(name: String, colType: ColType, role: ColRole = ColRole.Feature)

object ColumnSpec {
  def numeric(name: String, role: ColRole = ColRole.Feature): ColumnSpec = ColumnSpec(name, ColType.Numeric, role)
  def boolean(name: String, role: ColRole = ColRole.Feature): ColumnSpec = ColumnSpec(name, ColType.Boolean, role)
  def nominal(name: String, role: ColRole = ColRole.Feature): ColumnSpec = ColumnSpec(name, ColType.Nominal, role)
  def ordinal(name: String, role: ColRole = ColRole.Feature): ColumnSpec = ColumnSpec(name, ColType.Ordinal, role)
  def text(name: String, role: ColRole = ColRole.Feature): ColumnSpec = ColumnSpec(name, ColType.Text, role)
  def datetime(name: String, role: ColRole = ColRole.Feature): ColumnSpec = ColumnSpec(name, ColType.Datetime, role)
}

/** Boolean predicate algebra over column specs (reference:
  * base/column_specification.py:141-256). Resolved at plan-build time against the
  * logical schema — never touches Catalyst.
  */
trait ColumnSelector { self =>
  def matches(spec: ColumnSpec): Boolean
  def &&(other: ColumnSelector): ColumnSelector = new ColumnSelector {
    def matches(s: ColumnSpec): Boolean = self.matches(s) && other.matches(s)
  }
  def ||(other: ColumnSelector): ColumnSelector = new ColumnSelector {
    def matches(s: ColumnSpec): Boolean = self.matches(s) || other.matches(s)
  }
  def unary_! : ColumnSelector = new ColumnSelector {
    def matches(s: ColumnSpec): Boolean = !self.matches(s)
  }
}

final case class TypeSelector(types: Set[ColType]) extends ColumnSelector {
  def matches(spec: ColumnSpec): Boolean = types.contains(spec.colType)
  def |(t: ColType): TypeSelector = TypeSelector(types + t)
}
object TypeSelector {
  val any: TypeSelector = TypeSelector(ColType.all)
  val none: TypeSelector = TypeSelector(Set.empty)
  def exclude(ts: ColType*): TypeSelector = TypeSelector(ColType.all -- ts)
}

final case class RoleSelector(roles: Set[ColRole]) extends ColumnSelector {
  def matches(spec: ColumnSpec): Boolean = roles.contains(spec.role)
}
object RoleSelector {
  val any: RoleSelector = RoleSelector(ColRole.all)
  def exclude(rs: ColRole*): RoleSelector = RoleSelector(ColRole.all -- rs)
}

object selectors {
  def nameContains(v: String): ColumnSelector = (s: ColumnSpec) => s.name.contains(v)
  def nameStartsWith(v: String): ColumnSelector = (s: ColumnSpec) => s.name.startsWith(v)
  def nameEndsWith(v: String): ColumnSelector = (s: ColumnSpec) => s.name.endsWith(v)
  def nameMatches(regex: String): ColumnSelector = {
    val p = regex.r
    (s: ColumnSpec) => p.findFirstIn(s.name).isDefined
  }
}

/** A selection of columns — the union input type of every `with*` builder method
  * (reference: base/schema.py:15-21). Constructed implicitly from names, types, roles,
  * specs, selectors, or sequences thereof.
  */
sealed trait ColumnSelection
object ColumnSelection {
  final case class ByName(name: String) extends ColumnSelection
  final case class BySpec(spec: ColumnSpec) extends ColumnSelection
  final case class ByType(t: ColType) extends ColumnSelection
  final case class ByRole(r: ColRole) extends ColumnSelection
  final case class BySelector(sel: ColumnSelector) extends ColumnSelection
  final case class Many(items: Seq[ColumnSelection]) extends ColumnSelection
  /** Unordered selection: resolves like [[Many]] but sorted by column name for
    * determinism — reference schema.py:119-122 sorts `set` subsets the same way.
    */
  final case class ManySet(items: Set[ColumnSelection]) extends ColumnSelection

  import scala.language.implicitConversions
  implicit def fromName(n: String): ColumnSelection = ByName(n)
  implicit def fromSpec(s: ColumnSpec): ColumnSelection = BySpec(s)
  implicit def fromType(t: ColType): ColumnSelection = ByType(t)
  implicit def fromRole(r: ColRole): ColumnSelection = ByRole(r)
  implicit def fromSelector(s: ColumnSelector): ColumnSelection = BySelector(s)
  implicit def fromNames(ns: Seq[String]): ColumnSelection = Many(ns.map(ByName))
  implicit def fromNameSet(ns: Set[String]): ColumnSelection =
    ManySet(ns.map(n => ByName(n): ColumnSelection))
  implicit def fromTypes(ts: Seq[ColType]): ColumnSelection = Many(ts.map(ByType))
  implicit def fromSpecs(ss: Seq[ColumnSpec])(implicit d: DummyImplicit): ColumnSelection =
    Many(ss.map(BySpec))
}

/** Ordered logical schema (reference: base/schema.py:25-130). */
final case class FeatureSchema(columns: Vector[ColumnSpec]) {
  def ++(other: FeatureSchema): FeatureSchema = FeatureSchema(columns ++ other.columns)
  def columnNames: Vector[String] = columns.map(_.name)
  def numColumns: Int = columns.size

  def labelColumn: ColumnSpec =
    columns.find(_.role == ColRole.Label)
      .getOrElse(throw new IllegalStateException("No label column found in schema."))

  def drop(toDrop: Iterable[ColumnSpec]): FeatureSchema = {
    // reference semantics: remove the FIRST occurrence of each spec (schema.py:72-76)
    var cols = columns
    toDrop.foreach { c =>
      val i = cols.indexOf(c)
      if (i >= 0) cols = cols.patch(i, Nil, 1)
    }
    FeatureSchema(cols)
  }

  def byName(name: String): ColumnSpec =
    columns.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"""Column "$name" not found in schema."""))

  def select(selection: ColumnSelection): Vector[ColumnSpec] = selection match {
    case ColumnSelection.ByName(n)     => Vector(byName(n))
    case ColumnSelection.BySpec(s)     =>
      if (!columns.contains(s))
        throw new IllegalArgumentException(s"The following columns in subset not found in schema: ${s.name}")
      Vector(s)
    case ColumnSelection.ByType(t)     => columns.filter(_.colType == t)
    case ColumnSelection.ByRole(r)     => columns.filter(_.role == r)
    case ColumnSelection.BySelector(p) => columns.filter(p.matches)
    case ColumnSelection.Many(items)   => items.toVector.flatMap(select)
    case ColumnSelection.ManySet(items) =>
      items.toVector.flatMap(select).sortBy(_.name)
  }
}

object FeatureSchema {
  def apply(cols: ColumnSpec*): FeatureSchema = FeatureSchema(cols.toVector)
  def of(cols: Seq[ColumnSpec]): FeatureSchema = FeatureSchema(cols.toVector)
}
