package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding candidates) into
  * dedup GROUPS, so a training pipeline can keep one canonical document
  * per cluster.
  *
  * Min-label propagation: every node starts labeled with its own id and
  * repeatedly takes the minimum label among itself and its neighbors
  * until a fixpoint — the label is then the smallest node id in the
  * component (a deterministic canonical representative, which is exactly
  * the "keep the first/smallest doc" dedup rule). Each round is one
  * shuffle-join of the edge list against the label table, so the plan is
  * fully parallel; rounds ∝ graph diameter, and dedup graphs are
  * near-clique clusters with tiny diameters. For adversarial
  * long-diameter graphs swap in the large-star/small-star contraction
  * (O(log n) rounds, same join shape).
  */
object ConnectedComponents {

  /** edges: two columns (src, dst), undirected. Returns (id, comp) for
    * every node appearing in an edge, comp = min node id reachable.
    * Throws if the fixpoint is not reached within maxIter rounds (rounds
    * ∝ diameter; a dedup graph hitting 100 means the input is not a
    * near-dup graph and silent partial labels would corrupt the dedup) —
    * raise maxIter or switch to large-star/small-star for such graphs.
    *
    * Each round ends in an EAGER localCheckpoint: iterative DataFrame
    * algorithms grow their logical plan every round (persist caches data
    * but not the plan), and by ~20 rounds analysis/explain of the nested
    * plan OOMs the driver — checkpointing truncates the lineage so every
    * round plans against a flat scan. The label table is O(|nodes in
    * edges|), far smaller than the corpus. */
  def components(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    // An eager localCheckpoint pins its RDD blocks in the block manager;
    // ContextCleaner only releases them on GC of the frame, so a long loop
    // would accumulate one label table per round. Pull the checkpointed
    // RDD out of the frame's OWN plan (the LogicalRDD leaf) and release
    // the PREVIOUS round's explicitly once the next round is materialized
    // — exact attribution, safe under concurrent queries on the shared
    // context (a global getPersistentRDDs set-diff would not be).
    def checkpointTracked(df: DataFrame)
        : (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val out = df.localCheckpoint(true)
      val rdd = out.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
      (out, rdd)
    }
    def release(rdd: Option[org.apache.spark.rdd.RDD[_]]): Unit =
      rdd.foreach(_.unpersist(blocking = false))
    val (sym, symIds) = checkpointTracked(
      edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    var (labels, labelIds) = checkpointTracked(
      sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")))
    var it = 0
    var done = sym.isEmpty
    while (!done && it < maxIter) {
      // convergence flag is computed inside the update row (new < old)
      // rather than by re-joining against the previous labels — one fewer
      // shuffle join per round, and the count lands on checkpointed data
      val newComp = least(col("comp"), coalesce(col("ncomp"), col("comp")))
      val (upd, updIds) = checkpointTracked(labels
        .join(
          sym.join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
            .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
            .withColumnRenamed("src", "id"),
          Seq("id"), "left")
        .select(col("id"), newComp.as("comp"),
          (newComp < col("comp")).as("chg")))
      done = upd.filter(col("chg")).isEmpty
      release(labelIds)
      labels = upd.drop("chg")
      labelIds = updIds
      it += 1
    }
    release(symIds)
    require(done, s"connected components did not converge in $maxIter rounds" +
      " — graph diameter exceeds the bound; raise maxIter or use a" +
      " contraction algorithm (large-star/small-star)")
    labels
  }
}
