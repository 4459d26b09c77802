package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{TrainingPipeline => TP}
import graft.operators.FeatureBuilders
import graft.model.TransactionEvent
import graft.serving.Scoring
import graft.store._

/** End-to-end pipeline (the reference's full integration test shape,
  * test_stream_processor.py:317-419): synthetic transactions -> per-event
  * feature computation -> online store materialization -> model training
  * on the feature history -> batch scoring with rule interpretation. */
class EndToEndSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("doc query counts match SparkEntry.queries (round-7 verdict #8)") {
    // every query must carry an oracle, and the documented counts must
    // track the registry so they cannot drift again (r6 found 118/119/120)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
    val n = SparkEntry.queries.size
    val stated = Seq("README.md" -> raw"driver contract: (\d+) queries".r,
        "README.md" -> raw"All (\d+) declared queries".r,
        "ARCHITECTURE.md" -> raw"All (\d+) queries".r)
      .flatMap { case (f, re) =>
        val text = new String(Files.readAllBytes(java.nio.file.Paths.get(f)))
        re.findAllMatchIn(text).map(m => (f, m.group(1).toInt))
      }
    assert(stated.nonEmpty)
    stated.foreach { case (f, c) =>
      assert(c == n, s"$f states $c queries, SparkEntry has $n")
    }
  }

  test("ARCHITECTURE.md round-record line matches bench_latest.json " +
      "(round-12 verdict #3)") {
    // the r11 verdict found the bench narrative stale under the
    // count-only stamp: the query count was bumped but "suite-worst /
    // sum of medians" stayed round-10's. Bench now auto-stamps ONE
    // Round-record line from each full run; this pin proves the stamped
    // numbers are the committed bench artifact's, so at least one number
    // MUST move each round and dead prose can't carry authority.
    val arch = new String(Files.readAllBytes(
      java.nio.file.Paths.get("ARCHITECTURE.md")))
    val re = raw"Round-record \(auto-stamped by Bench\): (\d+) queries, " +
      raw"sum of medians ([\d.]+) s, worst (\S+) ([\d.]+) s\."
    val m = re.r.findFirstMatchIn(arch)
      .getOrElse(fail("ARCHITECTURE.md has no Round-record line"))
    val bl = java.nio.file.Paths.get("bench_latest.json")
    assert(Files.exists(bl), "bench_latest.json missing (tracked artifact)")
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(new String(Files.readAllBytes(bl)))
    val qs = (j \ "queries").asInstanceOf[org.json4s.JObject].obj
      .map { case (k, v) => k -> v.values.toString.toDouble }
    assert(m.group(1).toInt == qs.size,
      s"record states ${m.group(1)} queries, bench_latest has ${qs.size}")
    // Locale.ROOT mirrors the Bench stamp (round-12 advice): a
    // comma-decimal default locale must not fail the pin spuriously
    def fmt(p: String, v: Double): String =
      String.format(java.util.Locale.ROOT, p, v.asInstanceOf[AnyRef])
    val total = qs.map(_._2).sum
    assert(m.group(2) == fmt("%.1f", total),
      s"record total ${m.group(2)} vs bench_latest ${fmt("%.1f", total)}")
    val (wName, wMed) = qs.maxBy(_._2)
    assert(m.group(3) == wName,
      s"record worst ${m.group(3)} vs bench_latest $wName")
    assert(m.group(4) == fmt("%.2f", wMed),
      s"record worst time ${m.group(4)} vs bench_latest ${fmt("%.2f", wMed)}")
    // observatory shape pin (round-12 verdict #2): isolated re-runs must
    // cover the worst 5 by MEDIAN plus every query whose worst RUN
    // crossed the per-query bar — max-spike crossings (r12 residual
    // 18.0 s) escaped the median-only column
    val iso = (j \ "isolated_worst5").asInstanceOf[org.json4s.JObject].obj
      .map(_._1).toSet
    val worst5 = qs.sortBy(-_._2).take(5).map(_._1)
    worst5.foreach(n => assert(iso.contains(n),
      s"worst-by-median $n missing from isolated_worst5"))
    val spreadObj = (j \ "spread").asInstanceOf[org.json4s.JObject].obj
    spreadObj.foreach { case (name, v) =>
      val mx = (v \ "max").values.toString.toDouble
      if (mx > 12.5)
        assert(iso.contains(name),
          s"$name max ${mx}s crossed the bar but is not in isolated_worst5")
    }
  }

  private def syntheticTxns(n: Int): Seq[TransactionEvent] = {
    val base = 1704067200000L
    (0 until n).map { i =>
      val fraud = i % 17 == 0
      TransactionEvent(
        txn_id = s"t$i",
        card_id = s"card_${i % 25}",
        user_id = s"user_${i % 40}",
        amount = if (fraud) 3.0 else 20.0 + (i % 50) * 3.0,
        currency = "USD",
        mcc = if (fraud) "6011" else "5411",
        device_id = s"dev_${i % 10}",
        ip_address = if (fraud) s"tor_exit_$i" else "10.0.0.1",
        geo_country = Some(if (fraud) "RU" else "US"),
        geo_city = None, geo_lat = None, geo_lon = None,
        timestamp = base + i * 30000L,
        processing_time = None,
        is_fraud = fraud)
    }
  }

  test("generate -> features -> store -> train -> score, end to end") {
    val events = syntheticTxns(400).toDS()
    // 1. per-event wide feature rows (the streaming path's batch twin)
    val feats = FeatureBuilders.transactionFeatures(events)
      .withColumn("computation_timestamp", col("feature_timestamp"))

    // 2. materialize into the online store (latest row per card wins)
    val store = new OnlineStore(spark,
      Files.createTempDirectory("graft_e2e_").toString)
    val view = Registry.transactionFeatures.copy(entities = Seq(
      Entity("card", "entity_id")))
    store.upsert(view, feats, batchId = 0L)
    val online = store.online(view)
    assert(online.count() == 25) // one latest row per card

    // 3. train on the feature history with the fraud label
    val trainCols = Seq("txn_count_5m", "amount_avg_5m", "high_risk_txn_ratio",
      "small_amount_ratio", "velocity_score")
    val history = store.history(view)
      .withColumn("label", col("actual_fraud").cast("double"))
      .na.fill(0.0, trainCols)
    val model = TP.makePipeline("logistic_regression", trainCols)
      .fit(TP.withBalancedWeight(history, "label"))

    // 4. score a batch of requests against the online store
    val requests = (0 until 25).map(i => s"card_$i").toDF("entity_id")
    val featureCols = online.select(
      (Seq("entity_id") ++ trainCols).map(col): _*)
    val scored = Scoring.scoreFraudBatch(requests, featureCols, model,
      Seq("entity_id"))
    assert(scored.count() == 25)
    assert(scored.filter(!$"ok").count() == 0)
    val rows = scored.select($"entity_id", $"score", $"risk_level",
      $"recommended_action").collect()
    assert(rows.forall { r =>
      val s = r.getAs[Double]("score"); s >= 0.0 && s <= 1.0 })
    assert(rows.forall(r => Set("low", "medium", "high", "critical")
      .contains(r.getAs[String]("risk_level"))))
    // fraud-pattern cards (high-risk mcc, tor ip, small amounts) should
    // score above the clean majority on average
    val labeled = scored.join(
      history.groupBy($"entity_id")
        .agg(max($"label").as("had_fraud")), Seq("entity_id"))
    val avgFraud = labeled.filter($"had_fraud" === 1.0)
      .agg(avg($"score")).head().getDouble(0)
    val avgClean = labeled.filter($"had_fraud" === 0.0)
      .agg(avg($"score")).head().getDouble(0)
    assert(avgFraud > avgClean,
      s"fraud cards avg=$avgFraud vs clean avg=$avgClean")
  }
}
