package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 verdict #6: the interval-join amortization claim ("wall is
  * per-trigger fixed overhead, nearly independent of data size") was
  * extrapolated from sf0.01 -> sf0.1 (10x). This probe tests it at 100x:
  * a deterministic synthetic events corpus at 100 k (the r4/sf0.1 shape)
  * and at 10 M rows (100x), same 30-day span, users scaled with the data
  * (ScaleCheck's growth model — per-key density constant), run through
  * the REAL `intervalJoinStream` pipeline at FIXED nChunks = 4,
  * median-of-3 warm runs each. If the claim holds, wall at 100x stays
  * within a small multiple of 1x (per-row work is real but tiny next to
  * the per-trigger state-store/watermark/planning cost), NOT 100x.
  * Numbers land in ARCHITECTURE.md. Run:
  * `sbt "runMain graft.tools.IntervalJoin100x"`.
  */
object IntervalJoin100x {

  /** ScaleCheck.synthEvents with the driver events table's full column
    * set (props included) so `Tables.events` + the replay staging treat
    * the synthetic dir exactly like testdata. */
  private def synthEvents(spark: SparkSession, n: Long): DataFrame = {
    val span = 30L * 24 * 3600 * 1000
    val users = math.max(n / 2000L, 1L)
    spark.range(0, n)
      .withColumn("h",
        conv(substring(md5(col("id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long"))
      .select(
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id") * (span / n))
          .as("ts"),
        pmod(col("h"), lit(users)).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (pmod(col("h"), lit(3L)) + 1).cast("int")).as("event_type"),
        (pmod(col("h"), lit(100000L)) / 100.0).as("value"),
        lit("{}").as("props"))
  }

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // no shuffle-partition conf: runToMemory pins state partitions itself
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_ivj100x_")
    def stage(n: Long): String = {
      val dir = s"$base/n$n"
      synthEvents(spark, n).coalesce(8)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val chunks = 4
    // (n, stateParts): the 1x corpus at the verify-scale 8 state
    // partitions, the 100x corpus at 8 (same knob — isolates amortization)
    // AND at 32 (the knob SIZED to the corpus, local[32]'s full width —
    // what a deployment does; state partitioning is a capacity setting,
    // not a semantics setting)
    val combos = Seq((100000L, "8"), (10000000L, "8"), (10000000L, "32"))
    val dirs = combos.map(_._1).distinct.map(n => n -> stage(n)).toMap
    // warm-up: JIT + codegen + replay staging for every combo
    combos.foreach { case (n, p) =>
      graft.streaming.StreamingPipelines
        .intervalJoinStream(spark, dirs(n), chunks, p).count()
    }
    val meds = combos.map { case (n, p) =>
      val ts = (1 to 3).map(_ => timed(
        graft.streaming.StreamingPipelines
          .intervalJoinStream(spark, dirs(n), chunks, p).count())).sorted
      println(f"[ivj100x] n=$n%10d parts=$p%3s chunks=$chunks " +
        f"median=${ts(1)}%7.2fs (min=${ts.head}%.2f max=${ts.last}%.2f)")
      ((n, p), ts(1))
    }.toMap
    val amort = meds((10000000L, "8")) / meds((100000L, "8"))
    val sized = meds((10000000L, "32")) / meds((100000L, "8"))
    println(f"[ivj100x] 100x data => ${amort}%.2fx wall at fixed parts, " +
      f"${sized}%.2fx with parts sized 8->32")
    spark.stop()
  }
}
