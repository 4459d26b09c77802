package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ml.{Drift, TrainingPipeline => TP}
import graft.serving.Scoring

/** ML surface: drift detectors against the oracle-checked query results,
  * the spark.ml training pipeline end-to-end, and batch scoring with
  * per-item error isolation. */
class MlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf0001)
    .withColumn("is_ref", unix_millis($"ts".cast("timestamp")) < 1705363200000L)

  test("KsAggregator matches the window-SQL KS query") {
    val fromAgg = Drift.ksStatistic(events, "value", "is_ref")
    val fromQuery = SparkEntry.queries("drift_ks_statistic")(spark, sf0001)
      .head().getAs[Double]("ks_stat")
    assert(math.abs(fromAgg - fromQuery) < 1e-12)
  }

  test("KLL sketch KS: exact below capacity, bounded error under compaction") {
    import graft.ml.Drift
    def exact(ref: Seq[Double], cur: Seq[Double]): Double = {
      val agg = new Drift.KsAggregator()
      val b = (ref.map((_, true)) ++ cur.map((_, false)))
        .foldLeft(agg.zero)(agg.reduce)
      agg.finish(b)
    }
    def sketched(ref: Seq[Double], cur: Seq[Double], k: Int): Double = {
      val r = ref.foldLeft(Drift.KllSketch.empty(k))(_.add(_))
      val c = cur.foldLeft(Drift.KllSketch.empty(k))(_.add(_))
      Drift.ksFromSketches(r, c)
    }
    val rnd = new scala.util.Random(42)
    // property: n <= k -> no compaction -> sketch is EXACT
    (1 to 25).foreach { trial =>
      val nRef = 1 + rnd.nextInt(200)
      val nCur = 1 + rnd.nextInt(200)
      val ref = Seq.fill(nRef)(rnd.nextGaussian())
      val cur = Seq.fill(nCur)(rnd.nextGaussian() + trial * 0.1)
      assert(sketched(ref, cur, k = 200) == exact(ref, cur),
        s"trial $trial: exactness below capacity")
    }
    // property: compacting sketches stay within a loose rank-error band
    (1 to 5).foreach { trial =>
      val ref = Seq.fill(5000)(rnd.nextGaussian())
      val cur = Seq.fill(5000)(rnd.nextGaussian() + trial * 0.2)
      val d = math.abs(sketched(ref, cur, k = 256) - exact(ref, cur))
      assert(d <= 0.1, s"trial $trial: sketch error $d")
    }
    // merge path (the distributed combine) preserves the bound
    val ref = Seq.fill(4000)(rnd.nextGaussian())
    val cur = Seq.fill(4000)(rnd.nextGaussian() + 0.5)
    val (r1, r2) = ref.splitAt(1500)
    val (c1, c2) = cur.splitAt(2500)
    val rs = r1.foldLeft(Drift.KllSketch.empty(256))(_.add(_))
      .merge(r2.foldLeft(Drift.KllSketch.empty(256))(_.add(_)))
    val cs = c1.foldLeft(Drift.KllSketch.empty(256))(_.add(_))
      .merge(c2.foldLeft(Drift.KllSketch.empty(256))(_.add(_)))
    assert(rs.n == 4000 && cs.n == 4000)
    assert(rs.weightedItems.map(_._2).sum == 4000) // weight conservation
    val dm = math.abs(Drift.ksFromSketches(rs, cs) - exact(ref, cur))
    assert(dm <= 0.1, s"merged sketch error $dm")
    // the Spark aggregation path (typed column over a partitioned dataset)
    val df = (ref.map((_, true)) ++ cur.map((_, false))).toDF("v", "is_ref")
      .repartition(8)
    val viaSpark = df.as[(Double, Boolean)]
      .select(new Drift.KsSketchAggregator(256).toColumn).head()
    assert(math.abs(viaSpark - exact(ref, cur)) <= 0.1)
  }

  test("psi helper is finite and small on an undrifted split") {
    val p = Drift.psi(events, "value", "is_ref")
    assert(p >= 0.0 && p < 0.25, s"psi=$p")
  }

  test("chiSquare helper returns stat and dof") {
    val (stat, dof) = Drift.chiSquare(events, "event_type", "is_ref")
    assert(stat >= 0.0 && dof == 4L)
  }

  private lazy val featureDf = {
    val e = events
      .withColumn("hour", expr("(unix_millis(cast(ts as timestamp)) div 3600000) % 24"))
      .withColumn("label", ($"event_type" === "error").cast("double"))
      .select($"event_id", $"user_id", $"value", $"hour".cast("double"), $"label")
    TP.withBalancedWeight(e, "label")
  }

  test("training pipeline: split, fit, evaluate (LR + RF)") {
    val (train, test0) = TP.stratifiedSplit(featureDf, "event_id")
    assert(math.abs(test0.count().toDouble / featureDf.count() - 0.2) < 0.05)
    for (m <- Seq("logistic_regression", "random_forest")) {
      val model = TP.makePipeline(m, Seq("value", "hour")).fit(train)
      val metrics = TP.evaluate(model, test0)
      assert(metrics("auc") > 0.4, s"$m auc=${metrics("auc")}")
      assert(metrics.keySet == Set("auc", "precision", "recall", "f1", "accuracy"))
    }
  }

  test("quality ops: median imputation fills nulls; IQR filter keeps positives") {
    val withNulls = featureDf.withColumn("value",
      when($"event_id" % 10 === 0, lit(null)).otherwise($"value"))
    val filled = TP.imputeMedians(withNulls, Seq("value"))
    assert(filled.filter($"value".isNull).count() == 0)
    val filtered = TP.iqrFilter(featureDf, "value", "label")
    // every positive-label row survives (fraud-preservation guard)
    assert(filtered.filter($"label" === 1.0).count() ==
      featureDf.filter($"label" === 1.0).count())
  }

  test("batch scoring: cap, interpretation bands, per-item error isolation") {
    val (train, _) = TP.stratifiedSplit(featureDf, "event_id")
    val model = TP.makePipeline("logistic_regression", Seq("value", "hour"))
      .fit(train)
    val features = featureDf.limit(50)
      .select($"event_id".as("card_id"), $"value", $"hour")
    val requests = features.select($"card_id")
      .unionByName(Seq(999999999L).toDF("card_id")) // unknown entity
    val out = Scoring.scoreFraudBatch(requests, features, model, Seq("card_id"))
    assert(out.count() == 51)
    val bad = out.filter(!$"ok")
    assert(bad.count() == 1 &&
      bad.head().getAs[String]("error") == "features_missing")
    val lvls = out.select($"risk_level").distinct().as[String].collect().toSet
    assert(lvls.subsetOf(Set("low", "medium", "high", "critical")))
  }
}
