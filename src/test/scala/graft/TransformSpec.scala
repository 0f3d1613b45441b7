package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dsl.Domain._
import graft.dsl.Range._

/** Golden ports of the reference's unit tests (the de-facto conformance
  * suite — SURVEY.md §5): each test cites the reference fixture it
  * re-expresses. */
class TransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("map inversion {k1 {k2 v}} -> {k2 {k1 v}} (test/core.clj:123-131)") {
    val in = Seq(
      Map("a" -> Map("x" -> 1, "y" -> 2), "b" -> Map("x" -> 3))).toDF("value")
    val out = Transform(
      Entries(Seq((KAll(Leaf("k1")): DKey) ->
        Entries(Seq((KAll(Leaf("k2")): DKey) -> Leaf("v"))))),
      RMap(col("k2"), RMap(col("k1"), RScalar(col("v")))))
      .nested(in)
    val got = out.collect()(0).getAs[Map[String, Map[String, Int]]](0)
    assert(got == Map("x" -> Map("a" -> 1, "b" -> 3), "y" -> Map("a" -> 2)))
  }

  test("self cross-product sums of all ordered pairs (test/core.clj:82-91,307-312)") {
    val in = Seq(Map("a" -> 1, "b" -> 2, "c" -> 3)).toDF("value")
    val out = Transform(
      Entries(Seq(
        (KAll(Leaf("k1")): DKey) -> Leaf("v1"),
        (KAll(Leaf("k2")): DKey) -> Leaf("v2"))),
      RList(col("v1") + col("v2"), sorted = true))
      .nested(in)
    val got = out.collect()(0).getSeq[Int](0)
    assert(got == Seq(2, 3, 3, 4, 4, 4, 5, 5, 6))
  }

  test("vector chunking with partial tail binds null (test/core.clj:101,164-212)") {
    val in = Seq(Seq(1, 2, 3, 4, 5)).toDF("value")
    val out = Transform(
      Vec(Seq(Leaf("a"), Leaf("b"))),
      RRows(Seq("a" -> col("a"), "b" -> col("b"))))
      .apply(in)
      .orderBy(col("a"))
      .collect()
      .map(r => (r.get(0), r.get(1)))
    assert(out.toSeq == Seq((1, 2), (3, 4), (5, null)))
  }

  test("root-level chunking under a declared order (compile.cljc:81-98)") {
    // the reference chunks the TOP-LEVEL vector too; tables are unordered
    // so the sequence view is declared via rootOrder. Tail binds nulls.
    val in = Seq((3, "c"), (1, "a"), (2, "b"), (5, "e"), (4, "d"))
      .toDF("id", "s")
    val out = Transform(
      Vec(Seq(
        Entries(Seq((KField("s"): DKey) -> Leaf("s1"))),
        Entries(Seq((KField("s"): DKey) -> Leaf("s2"))),
        Entries(Seq((KField("s"): DKey) -> Leaf("s3"))))),
      RRows(Seq("s1" -> col("s1"), "s2" -> col("s2"), "s3" -> col("s3"))),
      rootOrder = Seq("id"))
      .apply(in).orderBy("s1").collect()
      .map(r => (r.get(0), r.get(1), r.get(2)))
    assert(out.toSeq == Seq(("a", "b", "c"), ("d", "e", null)))
  }

  test("root-level chunking without an order still throws") {
    val in = Seq((1, "a")).toDF("id", "s")
    val ex = intercept[IllegalArgumentException] {
      Transform(
        Vec(Seq(Entries(Seq((KField("s"): DKey) -> Leaf("s1"))),
                Entries(Seq((KField("s"): DKey) -> Leaf("s2"))))),
        RRows(Seq("s1" -> col("s1"), "s2" -> col("s2"))))
        .apply(in)
    }
    assert(ex.getMessage.contains("rootOrder"))
  }

  test("literal key projection leaves siblings untraversed (README.md:329-343)") {
    val in = Seq(Map("a" -> Seq(1, 2, 3), "b" -> Seq(9))).toDF("value")
    val out = Transform(
      Entries(Seq((KField("a"): DKey) -> Vec(Leaf("x")))),
      RList(col("x"), sorted = true))
      .nested(in)
    assert(out.collect()(0).getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("missing literal key binds null like faconne nil (README.md:339)") {
    val in = Seq(Map("a" -> 1)).toDF("value")
    val out = Transform(
      Entries(Seq((KField("zzz"): DKey) -> Leaf("x"))),
      RRows(Seq("x" -> col("x"))))
      .apply(in).collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }

  test("conditional output collection per tuple (issue #3, test/core.clj:444-450)") {
    val in = Seq(1, 2, 3, 4).toDF("value")
    val out = Transform(
      Vec(Leaf("x")),
      RMap(when(pmod(col("x"), lit(2)) === 0, "even").otherwise("odd"),
        RList(when(pmod(col("x"), lit(2)) === 0, col("x") * 2)
          .otherwise(col("x") + 1), sorted = true)))
      .nested(in)
    val got = out.collect()(0).getAs[Map[String, Seq[Int]]](0)
    assert(got == Map("even" -> Seq(4, 8), "odd" -> Seq(2, 4)))
  }

  test(":as binds whole value while descending (parse_domain.cljc:95-103)") {
    val in = Seq((1, "x"), (2, "y")).toDF("n", "s")
    val out = Transform(
      Vec(As("whole", keys("n", "s"))),
      RRows(Seq("n" -> col("n"), "s" -> col("s"),
                "wn" -> col("whole").getField("n"))))
      .apply(in).orderBy("n").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "x", 1), (2, "y", 2)))
  }

  test("where clauses prune early and compose conjunctively (README.md:275-312)") {
    val in = Seq(
      Map("a" -> Seq(1, 2, 3, 4), "b" -> Seq(10, 20))).toDF("value")
    val out = Transform(
      Entries(Seq((KAll(Leaf("k")): DKey) -> Vec(Leaf("x")))),
      RList(col("x"), sorted = true),
      where = Seq(col("k") === "a", col("x") > 2))
      .nested(in)
    assert(out.collect()(0).getSeq[Int](0) == Seq(3, 4))
  }

  test("multi-granularity struct: simple agg + nested map at one level (README.md:41-43)") {
    val in = Seq(
      ("north", "math", "ann", 90.0), ("north", "math", "bob", 80.0),
      ("north", "cs", "ann", 70.0), ("south", "math", "cat", 60.0))
      .toDF("campus", "course", "student", "grade")
    val out = Transform(
      rows("campus", "course", "student", "grade"),
      RMap(col("campus"), RStruct(Seq(
        "n_students" -> RAgg(countDistinct(col("student"))),
        "by_course" -> RMap(col("course"), RAgg(avg(col("grade"))))))))
      .apply(in).orderBy("campus").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("north", "south"))
    assert(out(0).getLong(1) == 2)
    assert(out(0).getAs[Map[String, Double]](2) ==
      Map("math" -> 85.0, "cs" -> 70.0))
    assert(out(1).getLong(1) == 1)
  }

  test("set traversal + inversion (classes fixture, README.md:159-187)") {
    // {category {course #{student}}} -> {student (sorted) [course]}
    val in = Seq(
      Map("stem" -> Map(101 -> Seq("ann", "bob"), 102 -> Seq("ann")),
          "arts" -> Map(201 -> Seq("cat")))).toDF("value")
    val out = Transform(
      Entries(Seq((KAll(Leaf("cat")): DKey) ->
        Entries(Seq((KAll(Leaf("course")): DKey) -> SetOf(Leaf("student")))))),
      RMap(col("student"), RList(col("course"), sorted = true)))
      .nested(in)
    val got = out.collect()(0).getAs[Map[String, Seq[Int]]](0)
    assert(got == Map("ann" -> Seq(101, 102), "bob" -> Seq(101),
                      "cat" -> Seq(201)))
  }

  test("sibling vector patterns cross (franchise fixture, README.md:251-295)") {
    // two arrays under one struct: each manager × each employee
    val in = Seq(
      ("acme", Seq("ma", "mb"), Seq("e1", "e2", "e3")))
      .toDF("franchise", "managers", "employees")
    val out = Transform(
      Vec(Entries(Seq(
        (KField("franchise"): DKey) -> Leaf("f"),
        (KField("managers"): DKey)  -> Vec(Leaf("m")),
        (KField("employees"): DKey) -> Vec(Leaf("e"))))),
      RRows(Seq("f" -> col("f"), "m" -> col("m"), "e" -> col("e"))))
      .apply(in).collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(out == (for { m <- Set("ma", "mb"); e <- Set("e1", "e2", "e3") }
      yield (m, e)))
  }

  test("map-key destructuring {{:keys [a b]} v} (test/core.clj:297-305)") {
    val in = Seq(Map((1, 2) -> 10, (3, 4) -> 20)).toDF("value")
    val out = Transform(
      Entries(Seq((KAll(keys("_1", "_2")): DKey) -> Leaf("v"))),
      RRows(Seq("a" -> col("_1"), "b" -> col("_2"), "v" -> col("v"))))
      .apply(in).orderBy("a").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((1, 2, 10), (3, 4, 20)))
  }

  test("computed literal key references earlier bindings (test/core.clj:280-288)") {
    // {k {(:literal k-derived) v}}: the inner lookup key is computed from
    // the outer binding at runtime
    val in = Seq(Map(
      "x" -> Map("x!" -> 1, "y!" -> 9),
      "y" -> Map("y!" -> 2))).toDF("value")
    val out = Transform(
      Entries(Seq((KAll(Leaf("k")): DKey) ->
        Entries(Seq((KExpr(concat(col("k"), lit("!"))): DKey) -> Leaf("v"))))),
      RMap(col("k"), RScalar(col("v"))))
      .nested(in)
    val got = out.collect()(0).getAs[Map[String, Int]](0)
    assert(got == Map("x" -> 1, "y" -> 2))
  }

  test("record-stores end-to-end restructuring (test/core.clj:315-349)") {
    // [{:store :stock [{:artist :title :quantity}]}] ->
    //   {artist {title total-quantity}} summed across stores
    val in = Seq(
      ("downtown", Seq(("miles", "kob", 3), ("nina", "baltimore", 2))),
      ("uptown",   Seq(("miles", "kob", 1), ("miles", "sketches", 5))))
      .toDF("store", "stock")
    val out = Transform(
      Vec(Entries(Seq(
        (KField("stock"): DKey) -> Vec(Entries(Seq(
          (KField("_1"): DKey) -> Leaf("artist"),
          (KField("_2"): DKey) -> Leaf("title"),
          (KField("_3"): DKey) -> Leaf("qty"))))))),
      RMap(col("artist"), RMap(col("title"), RAgg(sum(col("qty"))))))
      .nested(in)
    val got = out.collect()(0).getAs[Map[String, Map[String, Long]]](0)
    assert(got == Map(
      "miles" -> Map("kob" -> 4L, "sketches" -> 5L),
      "nina" -> Map("baltimore" -> 2L)))
  }

  test("store-data un-nesting goldens, both ranges (README.md:91-127)") {
    val storeData = Map(
      "Gas Station" -> Map(
        1 -> Seq("Hot Dog", "Nachos", "Cola"),
        2 -> Seq("Hot Dog", "Toothpaste", "Deoderant")),
      "Grocer" -> Map(
        1 -> Seq("Celery", "Onion", "Carrot"),
        2 -> Seq("Orange", "Apple"),
        3 -> Seq("Salmon")))
    val in = Seq(storeData).toDF("value")
    val domain = Entries(Seq((KAll(Leaf("store")): DKey) ->
      Entries(Seq((KAll(Leaf("aisle")): DKey) -> Vec(Leaf("product"))))))

    // {store #{product}}
    val sets = Transform(domain, RMap(col("store"), RSet(col("product"))))
      .nested(in).collect()(0)
      .getAs[Map[String, scala.collection.Seq[String]]](0)
      .map { case (k, v) => k -> v.toSet }
    assert(sets == Map(
      "Gas Station" -> Set("Nachos", "Toothpaste", "Cola", "Deoderant",
                           "Hot Dog"),
      "Grocer" -> Set("Carrot", "Onion", "Celery", "Salmon", "Orange",
                      "Apple")))

    // {store [{:aisle aisle :product product}]} — compare as multisets
    // (reference order = traversal order; Spark order is partition-dep.)
    val lists = Transform(domain,
      RMap(col("store"),
        RList(struct(col("aisle"), col("product")))))
      .nested(in).collect()(0)
      .getAs[Map[String, scala.collection.Seq[org.apache.spark.sql.Row]]](0)
      .map { case (k, v) =>
        k -> v.map(r => (r.getInt(0), r.getString(1))).groupBy(identity)
          .view.mapValues(_.size).toMap }
    assert(lists("Gas Station") == Seq(
      1 -> "Hot Dog", 1 -> "Nachos", 1 -> "Cola",
      2 -> "Hot Dog", 2 -> "Toothpaste", 2 -> "Deoderant")
      .groupBy(identity).view.mapValues(_.size).toMap)
    assert(lists("Grocer")((3, "Salmon")) == 1)
  }

  test("event-data conditional-key nesting golden (README.md:130-152)") {
    val events = Seq(
      ("2018-08-10", "add-user", false, Seq("steve")),
      ("2018-08-10", "add-user", true, Seq("george")),
      ("2018-08-10", "remove-user", false, Seq("janice")),
      ("2018-08-11", "add-user", true, Seq("jocelyn")),
      ("2018-08-11", "remove-user", false, Seq("steve")))
      .toDF("day", "type", "handled", "data")
    val out = Transform(
      rows("day", "type", "handled", "data"),
      RMap(col("day"),
        RMap(when(col("handled"), "handled").otherwise("unhandled"),
          RMap(col("type"),
            // colliding list values concatenate (deep-merge `into`)
            RAgg(flatten(collect_list(col("data"))))))))
      .nested(events).collect()(0)
      .getAs[Map[String, Map[String, Map[String, scala.collection.Seq[String]]]]](0)
      .map { case (d, hm) => d -> hm.map { case (h, tm) =>
        h -> tm.map { case (t, xs) => t -> xs.toList }.toMap }.toMap }
    assert(out == Map(
      "2018-08-10" -> Map(
        "unhandled" -> Map("add-user" -> List("steve"),
                           "remove-user" -> List("janice")),
        "handled" -> Map("add-user" -> List("george"))),
      "2018-08-11" -> Map(
        "handled" -> Map("add-user" -> List("jocelyn")),
        "unhandled" -> Map("remove-user" -> List("steve")))))
  }

  test("classes reducing golden: count ^:expand (README.md:159-187)") {
    val classes = Map(
      "math" -> Map(2062 -> Seq("John", "Mary", "Paul", "Susan"),
                    4001 -> Seq("Mary", "Tone", "Mike")),
      "history" -> Map(6000 -> Seq("John", "Paul", "Susan", "Tone"),
                       3052 -> Seq("Tone", "Mike", "Susan")))
    val in = Seq(classes).toDF("value")
    val domain = Entries(Seq((KAll(Leaf("category")): DKey) ->
      Entries(Seq((KAll(Leaf("course")): DKey) -> SetOf(Leaf("student"))))))
    // {student (count ^:expand #{course-number})}
    val out = Transform(domain,
      RMap(col("student"), RAgg(countDistinct(col("course")))))
      .nested(in).collect()(0).getAs[Map[String, Long]](0)
    assert(out == Map("Susan" -> 3L, "Mary" -> 2L, "John" -> 2L,
                      "Paul" -> 2L, "Tone" -> 3L, "Mike" -> 2L))
  }

  test("mapping+merging golden: computed keys and values (README.md:231-245)") {
    val in = Seq(Map(
      "First Baseman" -> Seq(("Steve", "White")),
      "first baseman" -> Seq(("Mark", "Smith")),
      "second Baseman" -> Seq(("George", "Brown"))))
      .toDF("value")
    val out = Transform(
      Entries(Seq((KAll(Leaf("position")): DKey) ->
        Vec(Entries(Seq(
          (KField("_1"): DKey) -> Leaf("f"),
          (KField("_2"): DKey) -> Leaf("l")))))),
      RMap(regexp_replace(lower(col("position")), " ", "-"),
        RList(concat(col("l"), lit(", "), col("f")), sorted = true)))
      .nested(in).collect()(0)
      .getAs[Map[String, scala.collection.Seq[String]]](0)
      .map { case (k, v) => k -> v.toList }
    assert(out == Map(
      "first-baseman" -> List("Smith, Mark", "White, Steve"),
      "second-baseman" -> List("Brown, George")))
  }

  private def studentData = Seq(
    ("john", 97, "math", "east"), ("john", 90, "english", "east"),
    ("john", 70, "history", "east"), ("dave", 80, "math", "east"),
    ("dave", 100, "english", "east"), ("mary", 90, "math", "west"),
    ("mary", 92, "english", "west"), ("mary", 94, "history", "west"))
    .toDF("student", "grade", "course", "campus")

  private val flagshipRange =
    RMap(col("campus"), RStruct(Seq(
      "number_students" -> RAgg(countDistinct(col("student"))),
      "avg_grade_per_course" -> RMap(col("course"), RAgg(avg(col("grade")))),
      "student_grades" ->
        RMap(col("student"), RMap(col("course"), RScalar(col("grade")))))))

  test("flagship student-data golden (README.md:22-64)") {
    val organized = Transform(
      rows("student", "grade", "course", "campus"), flagshipRange)
      .nested(studentData)
    val east = organized
      .select(element_at(col("value"), "east").as("e"))
      .select(col("e.number_students"),
        element_at(col("e.avg_grade_per_course"), "math"),
        element_at(col("e.avg_grade_per_course"), "history"),
        element_at(element_at(col("e.student_grades"), "john"), "math"),
        element_at(element_at(col("e.student_grades"), "dave"), "english"))
      .collect()(0)
    assert(east.getLong(0) == 2)            // number-students east
    assert(east.getDouble(1) == 88.5)       // 177/2 as double
    assert(east.getDouble(2) == 70.0)
    assert(east.getInt(3) == 97)
    assert(east.getInt(4) == 100)
  }

  test("inverse transform round-trips to the flat relation (README.md:66-69)") {
    val organized = Transform(
      rows("student", "grade", "course", "campus"), flagshipRange)
      .nested(studentData)
    val back = Transform(
      Entries(Seq((KAll(Leaf("campus")): DKey) ->
        Entries(Seq((KField("student_grades"): DKey) ->
          Entries(Seq((KAll(Leaf("student")): DKey) ->
            Entries(Seq((KAll(Leaf("course")): DKey) -> Leaf("grade"))))))))),
      RRows(Seq("student" -> col("student"), "grade" -> col("grade"),
                "course" -> col("course"), "campus" -> col("campus"))))
      .apply(organized)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    val original = studentData.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    assert(back == original)
  }

  test("for-each with where mirrors the congratulations demo (README.md:71-85)") {
    val organized = Transform(
      rows("student", "grade", "course", "campus"), flagshipRange)
      .nested(studentData)
    val acc = spark.sparkContext.collectionAccumulator[String]("msgs")
    Transform(
      Entries(Seq((KAll(Leaf("campus")): DKey) ->
        Entries(Seq((KField("student_grades"): DKey) ->
          Entries(Seq((KAll(Leaf("student")): DKey) ->
            Entries(Seq((KAll(Leaf("course")): DKey) -> Leaf("grade"))))))))),
      RRows(Seq("student" -> col("student"), "campus" -> col("campus"))),
      where = Seq(col("grade") >= 95))
      // forEach visits the raw bindings frame (the reference's for-each
      // has no range analysis) — address columns by name
      .forEach(organized)(r =>
        acc.add(s"${r.getAs[String]("student")}@${r.getAs[String]("campus")}"))
    assert(acc.value.toArray.toSet == Set("john@east", "dave@east"))
  }

  test("one-scan multigrain keeps source columns intact under aliased keys") {
    // outer key ALIASED to the same name as a source column: the inner
    // map key must still read the ORIGINAL column values (the one-scan
    // lowering materializes grouping keys under fresh names)
    val in = Seq(("A", 1), ("a", 2), ("B", 3)).toDF("k", "v")
    val out = Transform(
      rows("k", "v"),
      RMap(lower(col("k")).as("k"),
        RStruct(Seq(
          "n" -> RAgg(count(lit(1))),
          "m" -> RMap(col("k"), RAgg(sum(col("v"))))))))
      .apply(in).orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    // group "a" must contain BOTH original-case inner keys
    assert(out(0).getAs[Map[String, Long]](2) == Map("A" -> 1L, "a" -> 2L))
    assert(out(1).getAs[Map[String, Long]](2) == Map("B" -> 3L))
  }

  test("binding names never shadow same-named source columns") {
    // binding "a" FIRST (from field b), then reading field a: the second
    // read must see the ORIGINAL column, not the freshly-bound value
    val in = Seq((10, 20)).toDF("a", "b")
    val out = Transform(
      Vec(Entries(Seq(
        (KField("b"): DKey) -> Leaf("a"),
        (KField("a"): DKey) -> Leaf("c")))),
      RRows(Seq("a" -> col("a"), "c" -> col("c"))))
      .apply(in).collect()(0)
    assert((out.getInt(0), out.getInt(1)) == (20, 10))
  }

  test("null grouping keys: dropped from nested maps, merged in joins") {
    val in = Seq((Some("x"), 1), (Option.empty[String], 2), (Some("x"), 3))
      .toDF("k", "v")
    // nested surface: MapType cannot hold a null key — null group dropped
    val nested = Transform(rows("k", "v"),
      RMap(col("k"), RAgg(sum(col("v")))))
      .nested(in).collect()(0).getAs[Map[String, Long]](0)
    assert(nested == Map("x" -> 4L))
    // relational surface preserves the null-key group as a row
    val rel = Transform(rows("k", "v"),
      RMap(col("k"), RStruct(Seq(
        "s" -> RAgg(sum(col("v"))),
        "m" -> RMap(col("v") % 2, RAgg(count(lit(1))))))))
      .apply(in).collect()
    assert(rel.length == 2) // "x" row AND the null-key row, merged whole
    val nullRow = rel.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 2L && !nullRow.isNullAt(2))
  }

  test("explain surface exposes the lowered plan (core.cljc:35-43)") {
    val plan = Transform(
      rows("student", "grade", "course", "campus"), flagshipRange)
      .explain(studentData)
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"))
  }

  test("forEach visits every binding tuple (core.cljc:30-33)") {
    val in = Seq(Seq(1, 2, 3)).toDF("value")
    val acc = spark.sparkContext.longAccumulator("sum")
    Transform(Vec(Leaf("x")), RRows(Seq("x" -> col("x"))))
      .forEach(in)(r => acc.add(r.getInt(0)))
    assert(acc.value == 6)
  }

  test("sibling struct-field explodes + scalar binding above stacked " +
       "Generates lowers to a valid plan") {
    // regression (surfaced by DomainGenSpec's unseeded trials): the
    // final select's value.getField(...) expressions sitting above TWO
    // stacked Generates trigger Spark 4.1's NestedColumnAliasing
    // rewrite (_extract_* pushdown), which loses an attribute across
    // the second Generate (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND:
    // "Could not find _extract_f2"). KField-over-struct extraction now
    // materializes to a reserved column at extraction time, so no
    // nested-field access survives above any Generate.
    // exact generated shape incl. the UNREAD 4th field — nested-schema
    // pruning of the untouched field is part of the optimizer trigger
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("f0",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType))),
      org.apache.spark.sql.types.StructField("f1",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)),
      org.apache.spark.sql.types.StructField("f2",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("unused",
        org.apache.spark.sql.types.IntegerType)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("value", st)))
    val in = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(Seq(Seq.empty[Int], Seq(96, 50, 18, 12)),
          Seq(11), 13, 0))),
      schema)
    val b = Transform(
      Entries(Seq(
        (KField("f0"): DKey) -> SetOf(Vec(Leaf("v1"))),
        (KField("f1"): DKey) -> Vec(Seq(Leaf("v2"), Leaf("v3"))),
        (KField("f2"): DKey) -> Leaf("v4"))),
      RRows(Nil))
    val rows = b.bindings(in).collect()
      .map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getInt(3))).toSet
    assert(rows == Set((96, 11, -1, 13), (50, 11, -1, 13),
      (18, 11, -1, 13), (12, 11, -1, 13)))
  }

  test("same-name root binding beside a sibling explode over an " +
       "aggregated input lowers to a valid plan") {
    // regression: binding a field under ITS OWN name (k) next to a
    // SetOf/Vec explode, with an upstream groupBy, used to put a
    // same-name alias of the grouping key below the Generate — which
    // Spark 4.1's RemoveRedundantAliases/ColumnPruning interplay
    // mis-pruned (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). The env-based
    // lowering keeps user-named aliases in one select ABOVE every
    // Generate; this pins both the execution and the alias placement.
    val in = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "v")
      .groupBy("k").agg(collect_set(col("v")).as("vs"))
    val b = Transform(
      Vec(Entries(Seq(
        (KField("k"): DKey) -> Leaf("k"),
        (KField("vs"): DKey) -> SetOf(Leaf("x"))))),
      RMap(col("k"), RAgg(sum(col("x")))))
    val got = b.apply(in).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 30L, 2L -> 30L))
    // no user-named alias below the Generate in the optimized plan
    val opt = b.bindings(in).queryExecution.optimizedPlan
    val gens = opt.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(gens.nonEmpty)
    gens.foreach(g => g.child.foreach {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.foreach(e =>
          assert(!e.name.matches("k|x"), s"user alias below Generate: $e"))
      case _ => ()
    })
  }
}
