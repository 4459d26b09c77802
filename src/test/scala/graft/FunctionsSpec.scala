package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HammingDistance, SortedIntersectCount}

/** Native Catalyst expression: correctness, nulls, SQL registration, and
  * codegen (the expression must not fall back to interpreted eval). */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("hamming_distance: values, nulls, SQL form, codegen plan") {
    HammingDistance.register(spark)
    val df = Seq(
      (1L, 0L, 0L),
      (2L, 5L, 3L),            // 101 ^ 011 = 110 -> 2
      (3L, -1L, 0L),           // all 64 bits
      (4L, 1387056862L, 835280505L)) // cross-checked with DuckDB: 15
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("hd_input")
    val out = spark.sql("SELECT id, hamming_distance(a, b) AS hd FROM hd_input")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 2, 3L -> 64, 4L -> 15))
    // nulls propagate (BinaryExpression null-intolerant default)
    val nulls = Seq((java.lang.Long.valueOf(5L), null: java.lang.Long))
      .toDF("a", "b")
    assert(nulls.selectExpr("hamming_distance(a, b)").head().isNullAt(0))
    // whole-stage codegen: over a real scan (a local relation collapses to
    // LocalTableScan) the expression stays inside a WholeStageCodegen stage
    val plan = graft.core.Tables.events(spark, sf0001)
      .selectExpr("hamming_distance(event_id, user_id) AS hd")
      .queryExecution.executedPlan.toString
    // "*(1) Project [hammingdistance(...)]" — the * prefix is the
    // WholeStageCodegen marker in the simple plan string
    assert(plan.contains("*(1) Project [hammingdistance"), plan)
  }

  test("sorted_intersect_count: equals array_intersect size, nulls, codegen") {
    SortedIntersectCount.register(spark)
    // randomized cross-check against the built-in on sorted distinct arrays
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      def arr() = (0 until rnd.nextInt(20))
        .map(_ => s"w${rnd.nextInt(30)}").distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.selectExpr(
        "sorted_intersect_count(a, b) AS fast",
        "size(array_intersect(a, b)) AS ref")
      .filter("fast <> ref").count()
    assert(diff == 0L)
    // empty and null handling
    val edge = Seq((Seq.empty[String], Seq("x"))).toDF("a", "b")
    assert(edge.selectExpr("sorted_intersect_count(a, b)").head().getInt(0) == 0)
    val nulls = Seq((null: Seq[String], Seq("x"))).toDF("a", "b")
    assert(nulls.selectExpr("sorted_intersect_count(a, b)").head().isNullAt(0))
    // stays inside whole-stage codegen over a real scan
    val plan = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("split(trim(text), '\\\\s+') AS toks")
      .selectExpr("sorted_intersect_count(toks, toks) AS n")
      .queryExecution.executedPlan.toString
    // the * prefix marks the WholeStageCodegen stage containing the project
    assert(plan.contains("sortedintersectcount"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("sortedintersectcount") && l.trim.startsWith("*")), plan)
  }

  test("GraftExtensions injects both native functions at session build") {
    import org.apache.spark.sql.SparkSession
    val orig = spark
    // a fresh session over the SAME SparkContext, built with extensions —
    // the spark.sql.extensions / withExtensions distribution path
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.core.GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig)
      assert(s2.sql("SELECT hamming_distance(5L, 3L)").head().getInt(0) == 2)
      assert(s2.sql(
        "SELECT sorted_intersect_count(array('a','b'), array('b','c'))")
        .head().getInt(0) == 1)
      assert(s2.sql(
        "SELECT fdot(array(cast(1.5 as float), cast(-2.0 as float)), " +
          "array(cast(2.0 as float), cast(0.5 as float)))")
        .head().getDouble(0) == 2.0)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("fdot is bit-identical to the interpreted aggregate(zip_with) " +
      "fold and stays inside whole-stage codegen (round 14)") {
    graft.functions.VectorFold.register(spark)
    // md5-derived pseudo-random float vectors — adversarial magnitudes
    // (mixed signs, wide exponent range) so any fold-order or
    // rounding difference would surface in the strict equality
    val vecs = spark.range(0, 200)
      .selectExpr(
        """transform(sequence(0, 63), j -> cast(
          |  (cast(conv(substring(md5(cast(concat(id, '_', j) as binary)),
          |     1, 8), 16, 10) as bigint) - 2147483648.0) / 16777216.0
          |  as float)) AS a""".stripMargin,
        """transform(sequence(0, 63), j -> cast(
          |  (cast(conv(substring(md5(cast(concat(id, '_q', j) as binary)),
          |     1, 8), 16, 10) as bigint) - 2147483648.0) / 1048576.0
          |  as float)) AS b""".stripMargin)
    val rows = vecs.selectExpr(
      "fdot(a, b) AS native",
      """aggregate(zip_with(a, b, (x, y) ->
        |  cast(x as double) * cast(y as double)), 0D,
        |  (acc, x) -> acc + x) AS interpreted""".stripMargin,
      "fdot(a, a) AS nrm2",
      """aggregate(transform(a, x -> cast(x as double) * cast(x as double)),
        |  0D, (acc, x) -> acc + x) AS nrm2i""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
    // codegen pin over MATERIALIZED vectors — in the test frame the
    // vectors are built by transform() lambdas, which are themselves
    // non-codegen and would drag the shared projection out of
    // WholeStageCodegen; in the real queries the vectors come off
    // parquet scans, which this models
    val mat = vecs.localCheckpoint(true)
    val plan = mat.selectExpr("fdot(a, b) AS d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("floatdot") || plan.contains("fdot"), plan)
    assert(plan.linesIterator.exists(l =>
      (l.contains("floatdot") || l.contains("fdot")) &&
        l.trim.startsWith("*")), plan)
  }

  test("fsq is bit-identical to the interpreted squared-distance fold " +
      "(zero and subspace offsets) and stays in codegen (round 14)") {
    graft.functions.VectorFold.register(spark)
    val vecs = spark.range(0, 200)
      .selectExpr(
        """transform(sequence(0, 63), j -> cast(
          |  (cast(conv(substring(md5(cast(concat(id, '_', j) as binary)),
          |     1, 8), 16, 10) as bigint) - 2147483648.0) / 16777216.0
          |  as float)) AS a""".stripMargin,
        """transform(sequence(0, 63), j -> cast(
          |  (cast(conv(substring(md5(cast(concat(id, '_q', j) as binary)),
          |     1, 8), 16, 10) as bigint) - 2147483648.0) / 1048576.0
          |  as float)) AS b""".stripMargin,
        // an 8-dim double reference row (the PQ sub-centroid shape)
        """transform(sequence(0, 7), j -> cast(
          |  (cast(conv(substring(md5(cast(concat(id, '_c', j) as binary)),
          |     1, 8), 16, 10) as bigint) - 2147483648.0) / 33554432.0
          |  as double)) AS c""".stripMargin)
    val rows = vecs.selectExpr(
      "fsq(a, b, 0) AS native",
      """aggregate(zip_with(a, b, (x, y) ->
        |  (cast(x as double) - cast(y as double))
        |  * (cast(x as double) - cast(y as double))), 0D,
        |  (acc, x) -> acc + x) AS interpreted""".stripMargin,
      // subspace offset 24 vs the slice-based interpreted form
      "fsq(a, c, 24) AS nativeSub",
      """aggregate(zip_with(slice(a, 25, 8), c, (x, y) ->
        |  (cast(x as double) - y) * (cast(x as double) - y)), 0D,
        |  (acc, x) -> acc + x) AS interpretedSub""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
    val mat = vecs.localCheckpoint(true)
    val plan = mat.selectExpr("fsq(a, b, 0) AS d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("floatsqdist") || plan.contains("fsq"), plan)
    assert(plan.linesIterator.exists(l =>
      (l.contains("floatsqdist") || l.contains("fsq")) &&
        l.trim.startsWith("*")), plan)
  }
}
