package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the AnalyticsOps module that the oracle hash can't pin on
  * its own: the CUSUM window rewrite equals the direct max(0,·) recurrence,
  * target encoding really excludes the row's own fold, Pearson r matches a
  * from-scratch recompute, and basket pairs match a brute-force count. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("evt_ewma equals a direct per-user Scala fold") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "unix_millis(CAST(ts AS TIMESTAMP)) AS ems",
        "event_id", "value")
      .as[(Long, Long, Long, Double)].collect()
    val expected = events.groupBy(_._1).map { case (uid, evs) =>
      val vs = evs.sortBy(e => (e._2, e._3)).map(_._4)
      uid -> vs.tail.foldLeft(vs.head)((acc, x) => 0.25 * x + 0.75 * acc)
    }
    val got = q("evt_ewma").select("user_id", "ewma_value")
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (uid, e) =>
      assert(got(uid) == e, s"user $uid: got ${got(uid)} want $e")
    }
  }

  test("evt_cusum window rewrite equals the direct max(0,.) recurrence") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "unix_millis(CAST(ts AS TIMESTAMP)) AS ems",
        "event_id", "value")
      .as[(Long, Long, Long, Double)].collect()
    // exact decimal recurrence in micro-units (value has <= 2 decimals)
    val expected = events.groupBy(_._1).map { case (uid, evs) =>
      val devs = evs.sortBy(e => (e._2, e._3))
        .map(e => math.round(e._4 * 1e6) - 50000000L)
      var s = 0L; var alarms = 0L; var mx = 0L
      devs.foreach { d =>
        s = math.max(0L, s + d)
        if (s > 100000000L) alarms += 1
        mx = math.max(mx, s)
      }
      uid -> ((alarms, mx / 1e6))
    }
    val got = q("evt_cusum").select("user_id", "n_alarms", "max_cusum")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (uid, (al, mx)) =>
      assert(got(uid)._1 == al, s"user $uid alarms: got ${got(uid)._1} want $al")
      assert(math.abs(got(uid)._2 - mx) < 1e-6, s"user $uid max")
    }
  }

  test("ml_target_encoding excludes the row's own fold (leakage guard)") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "event_id % 5 AS fold",
        "CASE WHEN value > 75.0 THEN 1L ELSE 0L END AS y")
      .as[(String, Long, Long)].collect()
    val gn = e.length.toDouble
    val gpos = e.map(_._3).sum.toDouble
    val enc = q("ml_target_encoding")
      .select("event_type", "fold", "n_other", "encoded")
      .as[(String, Long, Long, Double)].collect()
    enc.foreach { case (et, fold, nOther, encoded) =>
      val others = e.filter(r => r._1 == et && r._2 != fold)
      assert(others.length.toLong == nOther, s"($et,$fold) n_other")
      val want = (others.map(_._3).sum.toDouble + 10.0 * (gpos / gn)) /
        (others.length.toDouble + 10.0)
      assert(encoded == want, s"($et,$fold): got $encoded want $want")
    }
  }

  test("ml_correlation matches a from-scratch recompute and |r| <= 1") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .as[(Double, Double, Double, Double)].collect()
    def cents(x: Double) = math.floor(x * 100.0 + 0.5).toLong
    val cols = Map(
      "l_quantity" -> li.map(r => cents(r._1)),
      "l_extendedprice" -> li.map(r => cents(r._2)),
      "l_discount" -> li.map(r => cents(r._3)),
      "l_tax" -> li.map(r => cents(r._4)))
    def corr(a: Array[Long], b: Array[Long]): Double = {
      val n = a.length.toDouble
      val sx = a.sum.toDouble; val sy = b.sum.toDouble
      val sxx = a.map(v => v * v).sum.toDouble
      val syy = b.map(v => v * v).sum.toDouble
      val sxy = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val got = q("ml_correlation").select("col_x", "col_y", "pearson_r")
      .as[(String, String, Double)].collect()
    assert(got.length == 6)
    got.foreach { case (cx, cy, r) =>
      assert(math.abs(r) <= 1.0)
      val want = corr(cols(cx), cols(cy))
      assert(math.abs(r - want) < 1e-12, s"($cx,$cy): got $r want $want")
    }
  }

  test("rel_market_basket support/lift match a brute-force recount") {
    val io = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = io.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0L) + 1
    }
    val itemN = io.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nOrders = byOrder.size.toDouble
    val got = q("rel_market_basket")
      .select("p1", "p2", "support", "n1", "n2", "lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (p1, p2, s, n1, n2, lift) =>
      assert(support((p1, p2)) == s, s"($p1,$p2) support")
      assert(itemN(p1) == n1 && itemN(p2) == n2)
      val want = (s.toDouble * nOrders) / (n1.toDouble * n2.toDouble)
      assert(lift == want, s"($p1,$p2) lift")
      assert(s >= 2)
    }
  }

  test("evt_throttle greedy cooldown matches a direct walk") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "unix_millis(CAST(ts AS TIMESTAMP)) AS ems",
        "event_id")
      .as[(Long, Long, Long)].collect()
    val expected = events.groupBy(_._1).map { case (uid, evs) =>
      val ts = evs.sortBy(e => (e._2, e._3)).map(_._2)
      var lastKept = ts.head; var kept = 1L
      ts.tail.foreach { t =>
        if (t - lastKept >= 43200000L) { lastKept = t; kept += 1 }
      }
      uid -> ((kept, lastKept))
    }
    val got = q("evt_throttle")
      .select("user_id", "n_kept", "last_kept_ems")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (uid, want) =>
      assert(got(uid) == want, s"user $uid: got ${got(uid)} want $want")
    }
    // the cooldown must actually drop events somewhere, or the operator
    // degenerates to a count
    assert(expected.exists { case (_, (k, _)) => k < events.count(_._1 == 1) } ||
      expected.values.map(_._1).sum < events.length)
  }

  test("evt_attribution credits the nearest prior non-purchase event") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "unix_millis(CAST(ts AS TIMESTAMP)) AS ems",
        "event_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect()
    val credits = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.collect { case ((_, _, _, "purchase", v), i) =>
        val ch = sorted.take(i).reverse.find(_._4 != "purchase")
          .map(_._4).getOrElse("none")
        (ch, v)
      }
    }
    val wantN = credits.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = q("evt_attribution").select("channel", "n_purchases")
      .as[(String, Long)].collect().toMap
    assert(got == wantN)
  }

  test("dq_profile completeness and dq_constraints statuses are coherent") {
    val prof = q("dq_profile").collect()
    assert(prof.length == 5)
    prof.foreach { r =>
      val n = r.getAs[Long]("n_rows"); val nn = r.getAs[Long]("n_null")
      assert(r.getAs[Double]("completeness") == (n - nn).toDouble / n)
      assert(r.getAs[Long]("n_distinct") <= n)
    }
    val checks = q("dq_constraints").collect()
    assert(checks.length == 5)
    checks.foreach { r =>
      val v = r.getAs[Long]("violations")
      val st = r.getAs[String]("status")
      assert(if (v == 0) st == "pass" else st == "fail")
    }
  }

  test("evt_trend_slope matches a from-scratch OLS on exact integers") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "unix_millis(CAST(ts AS TIMESTAMP)) AS ems",
        "value")
      .as[(Long, Long, Double)].collect()
    val expected = events.groupBy(_._1).map { case (uid, evs) =>
      val xs = evs.map(e => BigInt(e._2 / 60000L - 28401120L))
      val ys = evs.map(e => BigInt(math.rint(e._3 * 1e6).toLong))
      val n = BigInt(evs.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val den = (n * sxx - sx * sx) * 1000000
      val slope = if (den == 0) None
        else Some((n * sxy - sx * sy).toDouble / den.toDouble)
      uid -> slope
    }
    val got = q("evt_trend_slope").select("user_id", "slope")
      .as[(Long, Option[Double])].collect().toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (uid, s) =>
      assert(got(uid) == s, s"user $uid: got ${got(uid)} want $s")
    }
  }

  test("evt_gapfill_locf fills every interior gap hour with the prior value") {
    // hand corpus: user 1 has events in hours 0, 3 (two in-hour rows: the
    // later (ems, event_id) must win), and 5 -> 6 grid hours, 3 gaps
    val rows = Seq(
      (1L, 0L * 3600000L + 10, 100L, 1.5),
      (1L, 3L * 3600000L + 20, 101L, 2.0),
      (1L, 3L * 3600000L + 20, 102L, 7.0), // same ems, higher id wins
      (1L, 5L * 3600000L + 30, 103L, 4.0))
      .toDF("user_id", "ems", "event_id", "value")
      .selectExpr("user_id", "CAST(timestamp_micros(ems * 1000) AS TIMESTAMP) AS ts",
        "event_id", "value", "'c' AS event_type", "'{}' AS props")
    val dir = java.nio.file.Files.createTempDirectory("gapfill_").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("evt_gapfill_locf")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_hours") == 6L)
    assert(r.getAs[Long]("n_gap_hours") == 3L)
    // filled series: 1.5, 1.5, 1.5, 7.0 (id tie-break), 7.0, 4.0
    assert(math.abs(r.getAs[Double]("sum_filled") - 22.5) < 1e-9)
    assert(r.getAs[Double]("last_filled") == 4.0)
  }

  test("ml_feature_auc equals the brute-force pairwise-comparison AUC") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "value").as[(String, Double)].collect()
    val types = rows.map(_._1).distinct.sorted
    val got = q("ml_feature_auc").collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Double]("auc")))).toMap
    types.foreach { t =>
      val pos = rows.filter(_._1 == t).map(_._2)
      val neg = rows.filter(_._1 != t).map(_._2)
      // brute force: wins + half-ties over all pos × neg pairs, in
      // doubled integers (2·wins + ties), then ONE double division —
      // the same arithmetic shape the query promises
      var num2 = 0L
      for (p <- pos; n <- neg)
        num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
      val want = num2.toDouble / (2L * pos.length * neg.length).toDouble
      val (n1, n0, auc) = got(t)
      assert(n1 == pos.length && n0 == neg.length)
      assert(auc == want, s"$t: got $auc want $want")
    }
  }

  test("evt_brown_forecast equals a direct per-user Scala fold") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "unix_millis(CAST(ts AS TIMESTAMP)) AS ems",
        "event_id", "value")
      .as[(Long, Long, Long, Double)].collect()
    val expected = events.groupBy(_._1).map { case (uid, evs) =>
      val vs = evs.sortBy(e => (e._2, e._3)).map(_._4)
      var s1 = vs.head; var s2 = vs.head
      vs.tail.foreach { x =>
        val s2n = 0.0625 * x + 0.1875 * s1 + 0.75 * s2
        val s1n = 0.25 * x + 0.75 * s1
        s1 = s1n; s2 = s2n
      }
      // textbook identity: the expanded s2 recurrence == alpha*s1' +
      // (1-alpha)*s2 applied to the updated s1 — spot-check it too
      uid -> ((2.0 * s1 - s2, (s1 - s2) / 3.0))
    }
    val got = q("evt_brown_forecast")
      .select("user_id", "level", "trend", "forecast_1")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (uid, (l, b)) =>
      assert(got(uid) == ((l, b, l + b)), s"user $uid")
    }
  }

  test("dq_benford digits cover 1-9 and millionths are consistent") {
    val rows = q("dq_benford").collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val total = rows.map(_.getAs[Long]("cnt")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("obs_millionths") ==
        r.getAs[Long]("cnt") * 1000000L / total)
      assert(r.getAs[Long]("abs_dev_millionths") ==
        math.abs(r.getAs[Long]("obs_millionths") - r.getAs[Long]("exp_millionths")))
    }
  }
}
