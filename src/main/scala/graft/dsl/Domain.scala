package graft.dsl

import org.apache.spark.sql.Column

/** The domain pattern language — a Scala ADT mirror of the reference's
  * 7 binding constructors (faconne `parse_domain.cljc:34-124`; SURVEY.md §1.2,
  * §2 O6-O14). A Domain describes the *shape of the input* and where
  * variables bind inside it. Lowering (graft.plan.DomainLowering) turns a
  * Domain into a flat "bindings DataFrame": one column per bound variable,
  * one row per binding tuple (the flattened cross product of all nested
  * iterations — `SELECT vars FROM t LATERAL VIEW explode(...)`).
  *
  * Unlike the reference (a macro compiler over dynamically-typed Clojure
  * values), this is schema-driven: the lowering inspects the Spark DataType
  * at each step and picks struct-field access vs map lookup vs array explode.
  */
sealed trait Domain

object Domain {

  /** Bind the current value to `name` (reference `[:leaf lvalue]`,
    * `parse_domain.cljc:47-50`). */
  final case class Leaf(name: String) extends Domain

  /** Bind the whole current value to `name` AND keep descending
    * (reference `[:as lvalue]`, `parse_domain.cljc:95-103`). */
  final case class As(name: String, inner: Domain) extends Domain

  /** Vector pattern (reference `[:vector n]`, `parse_domain.cljc:61-72`).
    *  - one element pattern  = "for each element" (explode);
    *  - n element patterns   = consume the array n-at-a-time, binding n
    *    consecutive elements per chunk; a partial tail chunk yields nulls
    *    (reference `test/core.clj:101`).
    * At the ROOT of a transform, a 1-pattern Vec consumes the DataFrame's
    * own rows (no explode) — UNLESS the input is a single array-typed
    * `value` column, in which case each row's array is the collection
    * (exploded/chunked per row, per-row results merging through the
    * range), mirroring the reference's vector-at-root semantics. */
  final case class Vec(elems: Seq[Domain]) extends Domain
  object Vec { def apply(d: Domain): Vec = Vec(Seq(d)) }

  /** Set pattern — exactly one element pattern (reference `[:set]`,
    * `parse_domain.cljc:74-79`). Arrays model sets; uniqueness is a data
    * property, not enforced on read. */
  final case class SetOf(elem: Domain) extends Domain

  /** Map/struct pattern with one or more entries (reference map grammar,
    * `parse_domain.cljc:81-124`). Multiple [[KAll]] entries over the same
    * map are independent iterations of the SAME collection — i.e. the
    * implicit self cross-join (reference O14, `README.md:344-357`). */
  final case class Entries(entries: Seq[(DKey, Domain)]) extends Domain

  /** Map-key position inside an [[Entries]] pattern. */
  sealed trait DKey
  /** Literal/static field name: struct field access or map point lookup
    * (reference keyword key, `parse_domain.cljc:121-123`). Missing map key
    * binds null (faconne's nil), so lowering uses `try_element_at`. */
  final case class KField(name: String) extends DKey
  /** Computed key expression — `(:literal expr)` in the reference
    * (`parse_domain.cljc:111-119`): `element_at(m, expr)`. The expression
    * may reference earlier-bound variables. */
  final case class KExpr(key: Column) extends DKey
  /** Iterate ALL entries, binding the key itself to a (sub)pattern
    * (reference symbol key, `parse_domain.cljc:105-109`). */
  final case class KAll(keyPattern: Domain) extends DKey

  // ---- convenience constructors -------------------------------------

  /** `{:keys [a b ...]}` — project struct fields, binding each under its
    * own name (reference `parse_domain.cljc:83-93`). */
  def keys(names: String*): Domain =
    Entries(names.map(n => (KField(n): DKey) -> (Leaf(n): Domain)))

  /** `{k v}` — iterate all map entries binding key and value. */
  def mapAll(keyName: String, valuePattern: Domain): Domain =
    Entries(Seq((KAll(Leaf(keyName)): DKey) -> valuePattern))

  /** Rows-of-a-table domain: for each row, bind the named columns. */
  def rows(names: String*): Domain = Vec(keys(names: _*))
}
