package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dsl.Domain
import graft.dsl.Domain._
import graft.dsl.Range._

/** Port of the reference's signature test technique,
  * `gen-structure-from-domain` (`test/faconne/test/core.clj:7-32,44-48`):
  * interpret an ARBITRARY domain pattern as a random-data generator, run
  * the engine, and compare against an independent driver-side
  * interpreter of the same domain — so novel Domain shapes (deep KAll
  * nesting, chunking under maps, As over composites, sibling-KAll
  * cross-joins, null values at every position) are covered by
  * construction, not only where a hand-written test exists.
  *
  * Three generic properties per generated (domain, data) trial:
  *  1. the flat bindings relation equals the interpreter's binding
  *     tuples as a multiset (O5-O15 generically);
  *  2. RMap+RList over two primitive bindings equals the interpreter's
  *     group-by (O16/O18 + collect determinism);
  *  3. RMap+RStruct(count/sum aggregates) equals the interpreter's
  *     grouped reduction (O18-O23 single-shuffle path).
  * A where-conjunct over an Int binding is mixed in at random (O15:
  * placement is an optimization, never a semantics change).
  */
class DomainGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val params =
    SCTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1)

  // ---- generator: Domain + matching schema + matching random data ----

  /** A domain pattern together with the DataType it consumes and a
    * generator of values of that type (values in Spark-native form:
    * Row / Map / Seq / Int / String / null). */
  private case class GenD(domain: Domain, dt: DataType, gen: Gen[Any])

  private val keyAlphabet = Seq("a", "b", "c", "d", "e")

  private def withNull(g: Gen[Any]): Gen[Any] =
    Gen.frequency(9 -> g, 1 -> Gen.const(null: Any))

  private val genLeaf: Gen[GenD] =
    Gen.const(GenD(Leaf("x"), IntegerType,
      withNull(Gen.choose(0, 100).map(i => i: Any))))

  private def genVec1(depth: Int): Gen[GenD] =
    genD(depth - 1).flatMap { inner =>
      Gen.const(GenD(Vec(Seq(inner.domain)),
        ArrayType(inner.dt, containsNull = true),
        withNull(Gen.choose(0, 4).flatMap(n =>
          Gen.listOfN(n, inner.gen).map(l => l: Any)))))
    }

  private def genVecK: Gen[GenD] =
    Gen.choose(2, 3).map { k =>
      GenD(Vec(Seq.fill(k)(Leaf("x"))),
        ArrayType(IntegerType, containsNull = true),
        withNull(Gen.choose(0, 7).flatMap(n =>
          Gen.listOfN(n, withNull(Gen.choose(0, 100).map(i => i: Any)))
            .map(l => l: Any))))
    }

  private def genSetOf(depth: Int): Gen[GenD] =
    genD(depth - 1).map { inner =>
      GenD(SetOf(inner.domain), ArrayType(inner.dt, containsNull = true),
        withNull(Gen.choose(0, 4).flatMap(n =>
          Gen.listOfN(n, inner.gen).map(l => l: Any))))
    }

  private def genStruct(depth: Int): Gen[GenD] =
    for {
      n <- Gen.choose(1, 3)
      subs <- Gen.listOfN(n, genD(depth - 1))
      extra <- Gen.oneOf(true, false) // schema field the domain ignores
    } yield {
      val names = subs.indices.map(i => s"f$i")
      val fields = names.zip(subs).map { case (f, s) =>
        StructField(f, s.dt, nullable = true) } ++
        (if (extra) Seq(StructField("unused", IntegerType)) else Nil)
      val rowGen = Gen.sequence[List[Any], Any](
        subs.map(_.gen) ++
          (if (extra) List(Gen.const(0: Any)) else Nil))
        .map(vs => Row(vs: _*): Any)
      GenD(
        Entries(names.zip(subs).map { case (f, s) =>
          (KField(f): DKey) -> s.domain }),
        StructType(fields), withNull(rowGen))
    }

  private def genMapNode(depth: Int): Gen[GenD] =
    for {
      tv <- genD(depth - 1) // one value template, shared by all entries
      nAll <- Gen.choose(0, 2)
      nLook <- Gen.choose(if (nAll == 0) 1 else 0, 2)
      lookKinds <- Gen.listOfN(nLook, Gen.zip(
        Gen.oneOf(keyAlphabet), Gen.oneOf(true, false)))
    } yield {
      val allEntries: Seq[(DKey, Domain)] =
        Seq.fill(nAll)((KAll(Leaf("x")): DKey) -> tv.domain)
      val lookEntries: Seq[(DKey, Domain)] = lookKinds.map { case (k, lit0) =>
        (if (lit0) KExpr(lit(k)) else KField(k): DKey) -> tv.domain
      }
      val mapGen: Gen[Any] = Gen.choose(0, 4).flatMap { n =>
        Gen.listOfN(n, Gen.zip(Gen.oneOf(keyAlphabet), withNull(tv.gen)))
          .map(kvs => kvs.toMap: Any)
      }
      GenD(Entries(allEntries ++ lookEntries),
        MapType(StringType, tv.dt, valueContainsNull = true),
        withNull(mapGen))
    }

  private def genAs(depth: Int): Gen[GenD] =
    genD(depth - 1).map(inner =>
      GenD(As("x", inner.domain), inner.dt, inner.gen))

  /** Map with a STRUCT-typed key — the reference's key-destructuring
    * form (`parse_domain.cljc:297-305`) over a composite key: the KAll
    * key pattern either binds the whole struct (Leaf) or destructures
    * its fields (Entries of KField), exercising the lowering's
    * map-key explode over non-primitive key types generically. */
  private def genMapStructKey(depth: Int): Gen[GenD] =
    for {
      tv <- genD(depth - 1)
      destructure <- Gen.oneOf(true, false)
    } yield {
      val keyDt = StructType(Seq(
        StructField("ka", StringType, nullable = false),
        StructField("kb", IntegerType, nullable = false)))
      val kp: Domain =
        if (destructure)
          Entries(Seq((KField("ka"): DKey) -> Leaf("x"),
                      (KField("kb"): DKey) -> Leaf("x")))
        else Leaf("x")
      val keyGen = Gen.zip(Gen.oneOf(keyAlphabet), Gen.choose(0, 3))
        .map { case (a, b) => Row(a, b) }
      val mapGen: Gen[Any] = Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(keyGen, withNull(tv.gen)))
          .map(kvs => kvs.toMap: Any))
      GenD(Entries(Seq((KAll(kp): DKey) -> tv.domain)),
        MapType(keyDt, tv.dt, valueContainsNull = true),
        withNull(mapGen))
    }

  private def genD(depth: Int): Gen[GenD] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      2 -> genLeaf,
      2 -> Gen.lzy(genVec1(depth)),
      1 -> genVecK,
      1 -> Gen.lzy(genSetOf(depth)),
      2 -> Gen.lzy(genStruct(depth)),
      2 -> Gen.lzy(genMapNode(depth)),
      1 -> Gen.lzy(genMapStructKey(depth)),
      1 -> Gen.lzy(genAs(depth)))

  /** Assign globally-unique binding names (the generator reuses the
    * placeholder "x"; sibling-KAll entries share a whole template). */
  private def uniquify(d: Domain): Domain = {
    var n = 0
    def fresh(): String = { n += 1; s"v$n" }
    def go(d: Domain): Domain = d match {
      case Leaf(_) => Leaf(fresh())
      case As(_, i) => As(fresh(), go(i))
      case Vec(ps) => Vec(ps.map(go))
      case SetOf(p) => SetOf(go(p))
      case Entries(es) => Entries(es.map {
        case (KAll(kp), sub) => (KAll(go(kp)): DKey) -> go(sub)
        case (k, sub) => k -> go(sub)
      })
    }
    go(d)
  }

  // ---- driver-side interpreter of the SAME domain semantics ----------

  private def litKey(c: org.apache.spark.sql.Column): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpr(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, StringType) =>
        v.toString
      case other => fail(s"generator emitted non-literal KExpr: $other")
    }

  /** Binding tuples of `d` against one value — mirrors
    * DomainLowering.step: explode kills rows on null/empty collections,
    * lookups of missing/null produce null binds, entries cross-product,
    * a partial tail chunk binds nulls. */
  private def walk(value: Any, dt: DataType, d: Domain)
      : List[Map[String, Any]] = d match {
    case Leaf(n) => List(Map(n -> value))
    case As(n, inner) => walk(value, dt, inner).map(_ + (n -> value))
    case SetOf(p) => walk(value, dt, Vec(Seq(p)))
    case Vec(ps) =>
      val et = dt.asInstanceOf[ArrayType].elementType
      if (value == null) Nil
      else {
        val arr = value.asInstanceOf[Seq[Any]]
        ps match {
          case Seq(p) => arr.toList.flatMap(e => walk(e, et, p))
          case _ =>
            val k = ps.size
            if (arr.isEmpty) Nil
            else (0 until math.ceil(arr.size.toDouble / k).toInt).toList
              .flatMap { ci =>
                ps.zipWithIndex.foldLeft(List(Map.empty[String, Any])) {
                  case (acc, (p, j)) =>
                    val idx = ci * k + j
                    val ev = if (idx < arr.size) arr(idx) else null
                    for (m <- acc; m2 <- walk(ev, et, p)) yield m ++ m2
                }
              }
        }
      }
    case Entries(es) =>
      es.foldLeft(List(Map.empty[String, Any])) { case (acc, (key, sub)) =>
        val entryResults: List[Map[String, Any]] = key match {
          case KField(f) => dt match {
            case MapType(_, vt, _) =>
              val mv = if (value == null) null
                else value.asInstanceOf[Map[String, Any]].getOrElse(f, null)
              walk(mv, vt, sub)
            case st: StructType =>
              val i = st.fieldIndex(f)
              val fv = if (value == null) null
                else value.asInstanceOf[Row].get(i)
              walk(fv, st(i).dataType, sub)
            case other => fail(s"KField over $other")
          }
          case KExpr(c) => dt match {
            case MapType(_, vt, _) =>
              val mv = if (value == null) null
                else value.asInstanceOf[Map[String, Any]]
                  .getOrElse(litKey(c), null)
              walk(mv, vt, sub)
            case other => fail(s"KExpr over $other")
          }
          case KAll(kp) => dt match {
            case MapType(kt, vt, _) =>
              // key type is generic (struct-keyed maps!) — a
              // Map[String, _] cast here would make the compiler
              // insert a checkcast on the key local and crash
              if (value == null) Nil
              else value.asInstanceOf[Map[Any, Any]].toList.flatMap {
                case (k, v) =>
                  for (km <- walk(k, kt, kp); vm <- walk(v, vt, sub))
                    yield km ++ vm
              }
            case other => fail(s"KAll over $other")
          }
        }
        for (m <- acc; m2 <- entryResults) yield m ++ m2
      }
  }

  // ---- canonical normalization (Spark row objects vs generated) ------

  private def norm(v: Any): Any = v match {
    case null => null
    case r: Row => r.toSeq.map(norm).toList
    case m: scala.collection.Map[_, _] =>
      m.toList.map { case (k, v2) => (norm(k), norm(v2)) }
        .sortBy(_._1.toString)
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case other => other
  }

  private def multiset[A](xs: Seq[A]): Map[A, Int] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size }

  private def cmp(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Int, y: Int) => x < y
    case (x: String, y: String) => x < y
    case _ => fail(s"unorderable $a / $b")
  }

  // ---- the property ---------------------------------------------------

  private case class Trial(domain: Domain, dt: DataType, rows: List[Any],
                           whereKind: Int) // 0 none, 1 int-even, 2 string

  private val genTrial: Gen[Trial] = for {
    gd <- genD(3)
    nRows <- Gen.choose(1, 2)
    rows <- Gen.listOfN(nRows, withNull(gd.gen))
    whereKind <- Gen.choose(0, 2)
  } yield Trial(uniquify(gd.domain), gd.dt, rows, whereKind)

  private def bindingNames(d: Domain): List[String] = d match {
    case Leaf(n) => List(n)
    case As(n, i) => n :: bindingNames(i)
    case Vec(ps) => ps.toList.flatMap(bindingNames)
    case SetOf(p) => bindingNames(p)
    case Entries(es) => es.toList.flatMap {
      case (KAll(kp), sub) => bindingNames(kp) ++ bindingNames(sub)
      case (_, sub) => bindingNames(sub)
    }
  }

  /** Binding name -> the DataType it binds (mirror of the walk). */
  private def bindingTypes(d: Domain, dt: DataType)
      : List[(String, DataType)] = d match {
    case Leaf(n) => List(n -> dt)
    case As(n, i) => (n -> dt) :: bindingTypes(i, dt)
    case SetOf(p) => bindingTypes(Vec(Seq(p)), dt)
    case Vec(ps) =>
      val et = dt.asInstanceOf[ArrayType].elementType
      ps.toList.flatMap(p => bindingTypes(p, et))
    case Entries(es) => es.toList.flatMap {
      case (KAll(kp), sub) =>
        val mt = dt.asInstanceOf[MapType]
        bindingTypes(kp, mt.keyType) ++ bindingTypes(sub, mt.valueType)
      case (KField(f), sub) => dt match {
        case mt: MapType => bindingTypes(sub, mt.valueType)
        case st: StructType => bindingTypes(sub, st(st.fieldIndex(f)).dataType)
        case other => fail(s"KField over $other")
      }
      case (KExpr(_), sub) =>
        bindingTypes(sub, dt.asInstanceOf[MapType].valueType)
    }
  }

  test("generated domains: bindings equal the interpreter (20 trials)") {
    val prop = Prop.forAll(genTrial) { t =>
      val schema = StructType(Seq(StructField("value", t.dt, nullable = true)))
      val df = spark.createDataFrame(
        java.util.Arrays.asList(t.rows.map(Row(_)): _*), schema)

      val types = bindingTypes(t.domain, t.dt)
      val intBinds = types.collect { case (n, IntegerType) => n }
      val strBinds = types.collect { case (n, StringType) => n }
      val where = t.whereKind match {
        case 1 if intBinds.nonEmpty =>
          Seq(pmod(col(intBinds.head), lit(2)) === 0)
        case 2 if strBinds.nonEmpty => Seq(col(strBinds.head) > "b")
        case _ => Nil
      }

      // interpreter: per input row, then where applied at the end (the
      // engine applies it earliest — placement must not change results)
      val interp0 = t.rows.flatMap(v => walk(v, t.dt, t.domain))
      val interp =
        if (where.isEmpty) interp0
        else if (t.whereKind == 1) interp0.filter { m =>
          m(intBinds.head) match {
            case i: Int => i % 2 == 0
            case _ => false // SQL: null % 2 = null, filtered
          }
        }
        else interp0.filter { m =>
          m(strBinds.head) match {
            case s: String => s > "b" // SQL: null > 'b' = null, filtered
            case _ => false
          }
        }
      val interpNorm = multiset(interp.map(m =>
        m.map { case (k, v) => k -> norm(v) }))

      val b = Transform(t.domain, RRows(Nil), where).bindings(df)
      val names = b.columns.toList
      val got = multiset(b.collect().toSeq.map(r =>
        names.zipWithIndex.map { case (n, i) => n -> norm(r.get(i)) }.toMap))

      val pass = got == interpNorm
      if (!pass) {
        info(s"DOMAIN: ${t.domain}")
        info(s"DATA:   ${t.rows}")
        info(s"WHERE:  $where")
        info(s"engine: $got")
        info(s"interp: $interpNorm")
      }
      pass
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("generated domains: RMap+RList and RMap+RStruct aggregates equal the interpreter") {
    val prop = Prop.forAll(genTrial) { t =>
      val types = bindingTypes(t.domain, t.dt)
      val prims = types.collect {
        case (n, IntegerType) => n
        case (n, StringType) => n
      }
      if (prims.size < 2) true // nothing to group on; domain prop covers it
      else {
        val k = prims.head
        val intAfter = types.collect { case (n, IntegerType) => n }
          .filterNot(_ == k)
        val v = if (intAfter.nonEmpty) intAfter.head else prims(1)
        val vIsInt = types.toMap.apply(v) == IntegerType

        val schema =
          StructType(Seq(StructField("value", t.dt, nullable = true)))
        val df = spark.createDataFrame(
          java.util.Arrays.asList(t.rows.map(Row(_)): _*), schema)
        val tuples = t.rows.flatMap(x => walk(x, t.dt, t.domain))
        val grouped = tuples.groupBy(m => norm(m(k)))

        // RList: per-group non-null values, sorted (collect_list drops
        // nulls; sort_array ascending)
        val gotList = Transform(t.domain,
            RMap(col(k), RList(col(v), sorted = true)))
          .apply(df).collect().toSeq
          .map(r => norm(r.get(0)) ->
            (if (r.isNullAt(1)) Nil
             else r.getSeq[Any](1).map(norm).toList)).toMap
        val expList = grouped.map { case (gk, ms) =>
          gk -> ms.map(_(v)).filter(_ != null).map(norm)
            .sortWith(cmp).toList
        }

        // RStruct aggregates: count skips nulls; sum null when all null
        val okAgg =
          if (!vIsInt) true
          else {
            val gotAgg = Transform(t.domain,
                RMap(col(k), RStruct(Seq(
                  "n" -> RAgg(count(col(v))),
                  "s" -> RAgg(sum(col(v)))))))
              .apply(df).collect().toSeq
              .map(r => norm(r.get(0)) ->
                ((r.getLong(1),
                  if (r.isNullAt(2)) null else r.getLong(2)): Any)).toMap
            val expAgg = grouped.map { case (gk, ms) =>
              val vs = ms.map(_(v)).filter(_ != null).map(_.asInstanceOf[Int])
              gk -> ((vs.size.toLong,
                if (vs.isEmpty) null
                else vs.map(_.toLong).sum: Any): Any)
            }
            gotAgg == expAgg
          }

        val pass = gotList == expList && okAgg
        if (!pass) {
          info(s"DOMAIN: ${t.domain}  k=$k v=$v")
          info(s"DATA:   ${t.rows}")
          info(s"list engine: $gotList")
          info(s"list interp: $expList")
        }
        pass
      }
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }
}
