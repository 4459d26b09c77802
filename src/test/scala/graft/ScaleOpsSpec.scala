package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.{ApproxOps, SkewedAggregate}
import graft.sources.KafkaConfig

/** Scale-path operators: salted aggregation equals direct aggregation,
  * sketches stay within their error bounds, Kafka option surface. */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("salted two-phase aggregation equals direct groupBy on skewed data") {
    // hot key: 90% of rows on one key (the reference's hot-card shape)
    val df = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }.toDF("k", "v")
    val direct = df.groupBy($"k").agg(
      count(lit(1)).as("count"), sum($"v").as("sum_v"),
      min($"v").as("min_v"), max($"v").as("max_v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = SkewedAggregate.saltedAgg(df, Seq("k"), salts = 8, Seq(
      SkewedAggregate.Agg("count", ""), SkewedAggregate.Agg("sum", "v"),
      SkewedAggregate.Agg("min", "v"), SkewedAggregate.Agg("max", "v")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == direct)
  }

  test("skew guard salts hot-key data, stays plain on uniform, same results") {
    val skewed = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }.toDF("k", "v")
    val uniform = (1 to 2000).map(i => (s"k${i % 500}", i.toDouble))
      .toDF("k", "v")
    val aggs = Seq(SkewedAggregate.Agg("count", ""),
      SkewedAggregate.Agg("sum", "v"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // results identical on both data shapes regardless of chosen strategy
    assert(asMap(SkewedAggregate.aggWithSkewGuard(skewed, Seq("k"), aggs)) ==
      asMap(SkewedAggregate.plainAgg(skewed, Seq("k"), aggs)))
    assert(asMap(SkewedAggregate.aggWithSkewGuard(uniform, Seq("k"), aggs)) ==
      asMap(SkewedAggregate.plainAgg(uniform, Seq("k"), aggs)))
    // the probe's decision: hot key >= threshold -> salted plan (an extra
    // shuffle stage on (k, salt)); uniform -> single-shuffle plain plan
    def nExchanges(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    assert(nExchanges(SkewedAggregate.aggWithSkewGuard(skewed, Seq("k"), aggs)) >
      nExchanges(SkewedAggregate.aggWithSkewGuard(uniform, Seq("k"), aggs)))
  }

  test("approx distinct within rsd of exact; approx quantiles near exact") {
    val e = Tables.events(spark, sf0001)
    val exact = e.select(countDistinct($"event_id")).head().getLong(0)
    val approx = e.select(ApproxOps.approxDistinct($"event_id"))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
    val Array(q) = e.select(ApproxOps.approxQuantiles($"value", Seq(0.5)))
      .head().getSeq[Double](0).toArray
    val exactQ = e.stat.approxQuantile("value", Array(0.5), 0.0).head
    assert(math.abs(q - exactQ) / math.max(exactQ, 1.0) < 0.05)
  }

  test("bloom prune: no false negatives, real pruning, exact composed result") {
    import graft.operators.BloomPrune
    val members = (1 to 100).map(i => s"m$i")
    val words = BloomPrune.build(members)
    val probe = (members ++ (1 to 2000).map(i => s"x$i")).toDF("k")
    val kept = probe.filter(BloomPrune.mightContain(words, $"k"))
      .as[String].collect().toSet
    // every member passes (no false negatives — the correctness invariant)
    assert(members.forall(kept.contains))
    // the filter actually prunes (fp rate for 100 keys in 4096 bits ~ 0.03%)
    assert(kept.size < 200)
    // composed with the exact join, the result is the exact semi-join
    val dim = members.toDF("k")
    val composed = probe.filter(BloomPrune.mightContain(words, $"k"))
      .join(dim, Seq("k"), "left_semi").as[String].collect().toSet
    assert(composed == members.toSet)
  }

  test("k-means quantizer: deterministic fit, full coverage, balanced probes") {
    import graft.operators.KMeansQuantizer
    val emb = Tables.embeddings(spark, sf0001)
    val c1 = KMeansQuantizer.fit(emb, k = 4, iters = 2)
    val c2 = KMeansQuantizer.fit(emb, k = 4, iters = 2)
    // bit-identical across runs — the property spark.ml KMeans cannot give
    assert(c1 == c2)
    assert(c1.size <= 4 && c1.nonEmpty)
    val n = emb.count()
    val assigned = emb.select(
      KMeansQuantizer.assignCell(col("embedding"), c1).as("cell"))
    // every vector lands in exactly one live cell
    assert(assigned.filter(col("cell").isNull).count() == 0)
    assert(assigned.count() == n)
    val probed = emb.select(
      KMeansQuantizer.probeCells(col("embedding"), c1, 2).as("cells"))
      .select(size(col("cells")).as("np"))
    assert(probed.filter(col("np") =!= 2).count() == 0)
  }

  test("k-means|| seeding: deterministic, k distinct spread seeds, O(rounds) scans") {
    import graft.operators.KMeansQuantizer
    val emb = Tables.embeddings(spark, sf0001)
    val s1 = KMeansQuantizer.kmeansParSeeds(emb, k = 4)
    val s2 = KMeansQuantizer.kmeansParSeeds(emb, k = 4)
    assert(s1 == s2) // hash-sampled, not RNG-sampled
    assert(s1.size == 4 && s1.map(_._1) == Seq(0L, 1L, 2L, 3L))
    // seeds are distinct vectors (farthest-point reduction can't repeat)
    assert(s1.map(_._2).distinct.size == 4)
    // and usable: Lloyd converges to full coverage like the id-seeded fit
    val cent = KMeansQuantizer.fitWithSeeds(emb, s1, iters = 2)
    val assigned = emb.select(
      KMeansQuantizer.assignCell(col("embedding"), cent).as("cell"))
    assert(assigned.filter(col("cell").isNull).count() == 0)
  }

  test("kafka option surface mirrors the reference configuration") {
    val src = KafkaConfig.source("b:9092", Seq("txn.events", "click.events"))
    assert(src("subscribe") == "txn.events,click.events")
    assert(src("startingOffsets") == "latest")
    val snk = KafkaConfig.sink("b:9092", "features.out")
    assert(snk("kafka.acks") == "all" && snk("kafka.linger.ms") == "10")
    assert(KafkaConfig.dlqTopic("txn.events") == "txn.events.dlq")
  }

  test("PQ family: rerank never loses to raw ADC; recalls and candidates bounded") {
    // rerank hits >= ADC hits is a THEOREM, not a tuning outcome: the
    // exact rerank ranks adc50 (a superset of adcTop), and any brute
    // top-10 member inside adc50 exact-ranks above every non-member, so
    // |brute10 ∩ rerank10| >= |brute10 ∩ adcTop10|. Pin it per query.
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("emb_pq_adc_recall", "emb_ivfadc_recall",
        "emb_ivfadc_residual")) {
      val rows = graft.queries.Embeddings.queries(name)(spark, dir).collect()
      assert(rows.length == 20, s"$name query count")
      rows.foreach { r =>
        val nHits = r.getAs[Long]("n_hits")
        val rrHits = r.getAs[Long]("rerank_n_hits")
        val rec = r.getAs[Double]("recall_at_10")
        assert(rrHits >= nHits, s"$name rerank lost hits: $r")
        assert(rec >= 0.0 && rec <= 1.0, s"$name recall bounds: $r")
      }
      if (name != "emb_pq_adc_recall")
        rows.foreach { r =>
          val nc = r.getAs[Long]("n_candidates")
          assert(nc > 0 && nc < 500, s"$name candidate bounds: $r")
        }
    }
  }
}
