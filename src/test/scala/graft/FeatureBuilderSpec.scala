package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{ClickEvent, TransactionEvent}
import graft.operators.FeatureBuilders

/** The canonical reference fixtures against the FULL wide-feature-row
  * builders (test_stream_processor.py:78-127 and :145-214 expectations). */
class FeatureBuilderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def txn(id: String, ems: Long, amount: Double, mcc: String,
                  country: String, device: String = "dev_1",
                  ip: String = "1.2.3.4") =
    TransactionEvent(id, "card_1", "user_1", amount, "USD", mcc, device, ip,
      Some(country), None, None, None, ems, None)

  test("3-event transaction fixture produces the documented feature values") {
    val base = 1704067200000L
    val events = Seq(
      txn("t1", base + 1000, 50.0, "5411", "US"),
      txn("t2", base + 2000, 150.0, "6011", "CA"),
      txn("t3", base + 3000, 25.0, "5812", "US", ip = "tor_exit_9"))
    val feats = FeatureBuilders.transactionFeatures(events.toDS())
      .orderBy($"feature_timestamp").collect()
    val last = feats.last
    assert(last.getAs[Int]("txn_count_5m") == 3)
    assert(last.getAs[Int]("unique_countries_5m") == 2)
    assert(last.getAs[Double]("high_risk_txn_ratio") > 0.0)
    assert(last.getAs[Double]("amount_sum_5m") == 225.0)
    assert(last.getAs[Double]("amount_max_5m") == 150.0)
    assert(last.getAs[Double]("amount_min_5m") == 25.0)
    assert(last.getAs[Boolean]("is_suspicious_ip"))
    assert(!last.getAs[Boolean]("has_high_risk_mcc") ||
      last.getAs[Double]("high_risk_txn_ratio") > 0.3)
    assert(last.getAs[Double]("device_reuse_ratio") == 1.0) // same device
    assert(last.getAs[Double]("time_since_last_txn_min") == 1000 / 60000.0)
    // per-event emission: one feature row per input event
    assert(feats.length == 3)
    assert(feats.head.getAs[Int]("txn_count_5m") == 1)
  }

  private def click(id: String, ems: Long, page: String, action: String,
                    cat: Option[String]) =
    ClickEvent(id, "user_1", "s1", s"/p/$id", page, None, cat, action, None,
      "dev_1", None, "1.2.3.4", Some(5000L), Some(0.5), ems, None)

  test("4-event session funnel fixture produces the documented feature values") {
    val base = 1704067200000L
    val events = Seq(
      click("c1", base + 1000, "HOME", "VIEW", None),
      click("c2", base + 2000, "CATEGORY", "CLICK", Some("electronics")),
      click("c3", base + 3000, "PRODUCT", "ADD_TO_CART", Some("electronics")),
      click("c4", base + 4000, "CART", "PURCHASE", Some("electronics")))
    val feats = FeatureBuilders.clickstreamFeatures(events.toDS())
      .orderBy($"feature_timestamp").collect()
    val last = feats.last
    assert(last.getAs[Int]("pages_per_session") == 4)
    assert(last.getAs[Int]("unique_categories_session") == 1)
    assert(last.getAs[Int]("cart_adds_session") == 1)
    assert(last.getAs[Int]("purchases_session") == 1)
    assert(last.getAs[Double]("conversion_rate_session") == 1.0)
    assert(last.getAs[Double]("cart_abandonment_rate") == 0.0)
    assert(last.getAs[Int]("unique_pages_5m") == 4)
    assert(last.getAs[Double]("click_rate_5m") == 0.25)
    assert(last.getAs[Double]("engagement_score") > 0.0)
  }
}
