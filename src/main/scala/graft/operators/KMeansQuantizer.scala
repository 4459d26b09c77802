package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd-iteration k-means for IVF coarse quantization —
  * the trained upgrade over the label-derived centroids in
  * `emb_ivf_recall` (the round-2 backlog item: a trained quantizer
  * balances cells on unlabeled corpora, but spark.ml KMeans is
  * RNG-seeded AND execution-order dependent in its float reductions, so
  * it cannot be oracle-checked; this one can).
  *
  * Determinism comes from three choices, each mirrored exactly in SQL:
  *  - seeding by the k smallest vec_ids (no RNG; the iterations, not the
  *    seeds, produce cell quality);
  *  - assignment by squared-L2 computed as a SEQUENTIAL fold over
  *    dimensions (identical op order both engines), ties on distance
  *    broken by cell id;
  *  - centroid updates accumulated as 1e-6-quantized integers (exact
  *    integer sums, independent of partitioning/parallelism) with one
  *    final double division.
  *
  * Scale shape (the part worth copying at 100 TB): centroids are
  * COLLECTED each round (k × dim doubles — bytes) and re-broadcast as
  * literal expressions, so assignment is a pure map — no crossJoin row
  * explosion, no per-vector window shuffle; the update is a groupBy on
  * (cell, pos) with k×dim groups and map-side partial sums. Each Lloyd
  * round is therefore one scan + one tiny shuffle, the textbook
  * distributed k-means plan.
  */
object KMeansQuantizer {

  /** Squared-L2 distance from `emb` (array&lt;float&gt; column) to a literal
    * centroid, as a sequential fold (matches the DuckDB list_reduce). */
  def dist2To(emb: Column, cv: Seq[Double]): Column =
    aggregate(
      zip_with(emb, array(cv.map(lit): _*),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest-centroid cell id for `emb`: least over (dist2, cell) structs
    * — struct ordering gives the distance-then-cell-id tie-break. The
    * cast re-names the struct fields (aliases inside least() resolve to
    * positional col1/col2). */
  def assignCell(emb: Column, centroids: Seq[(Long, Seq[Double])]): Column =
    centroids match {
      // least() needs >= 2 args; a single surviving cell (k = 1, or a
      // degenerate corpus collapsing every vector onto one seed) is a
      // constant assignment, not an error
      case Seq((cell, _)) => lit(cell)
      case cs => least(cs.map { case (cell, cv) =>
        struct(dist2To(emb, cv).as("d2"), lit(cell).as("cell"))
      }: _*).cast("struct<d2:double,cell:bigint>").getField("cell")
    }

  /** The `n` nearest cells (multi-probe list): sorted (dist2, cell)
    * structs, first n cells. Pure expression — no shuffle. */
  def probeCells(emb: Column, centroids: Seq[(Long, Seq[Double])],
                 n: Int): Column =
    slice(array_sort(array(centroids.map { case (cell, cv) =>
      struct(dist2To(emb, cv).as("d2"), lit(cell).as("cell"))
    }: _*)), 1, n).cast("array<struct<d2:double,cell:bigint>>")
      .getField("cell")

  /** Minimum distance from `emb` to any of the given seed vectors. */
  private def minDistTo(emb: Column, seeds: Seq[Seq[Double]]): Column =
    seeds.map(dist2To(emb, _)) match {
      case Seq(one) => one
      case ds => ds.reduce((a, b) => least(a, b))
    }

  /** Deterministic farthest-point-traversal seeding — the k-means++
    * -quality spread WITHOUT its RNG (the round-2 backlog's "determinism
    * story for D² sampling"): seed 0 is the smallest vec_id's vector;
    * each next seed is the vector MAXIMIZING its distance to the chosen
    * set (ties on vec_id). Classic 2-approximation of the optimal
    * k-center cover, fully reproducible, and each step is one scan + a
    * top-1 (TakeOrdered — no global sort). Cells are numbered by
    * selection order 0..k-1. */
  def farthestPointSeeds(emb: DataFrame, k: Int): Seq[(Long, Seq[Double])] = {
    def vecOf(df: DataFrame): Seq[Double] =
      df.select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
    val first = vecOf(emb.orderBy(col("vec_id")).limit(1))
    val seeds = scala.collection.mutable.ArrayBuffer(first)
    for (_ <- 1 until k) {
      val next = vecOf(
        emb.select(col("vec_id"), col("embedding"),
          minDistTo(col("embedding"), seeds.toSeq).as("md"))
          .orderBy(col("md").desc, col("vec_id")).limit(1))
      seeds += next
    }
    seeds.toSeq.zipWithIndex.map { case (v, i) => i.toLong -> v }
  }

  /** Runs `iters` Lloyd rounds over `emb` (columns vec_id, embedding)
    * from the k smallest vec_ids as seeds — by RANK, not value, so a
    * corpus whose ids are sparse or non-zero-based still yields exactly
    * k seed cells (cell ids are the chosen vec_ids). */
  def fit(emb: DataFrame, k: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    val seeds = emb
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy(col("vec_id")).limit(k)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .toSeq.sortBy(_._1)
    require(seeds.size == k,
      s"k-means fit asked for $k seed cells but the corpus has only " +
        s"${seeds.size} vectors — a degenerate quantizer carries no signal")
    fitWithSeeds(emb, seeds, iters)
  }

  /** Lloyd rounds from explicit seed centroids (cell id -> vector).
    * Returns the centroids sorted by cell id; cells that lose all members
    * drop out (deterministically, both engines). */
  def fitWithSeeds(emb: DataFrame, seeds: Seq[(Long, Seq[Double])],
                   iters: Int): Seq[(Long, Seq[Double])] = {
    var cent: Seq[(Long, Seq[Double])] = seeds
    for (_ <- 1 to iters) {
      // The assignment is pinned BEFORE the posexplode: columns above a
      // Generate are evaluated per OUTPUT row, so an un-pinned cell
      // expression would re-run the k×dim distance fold 64× per vector
      // (measured 15× slower). The pin is released as soon as the round's
      // 512-row aggregate is collected.
      val stage = emb.select(
        assignCell(col("embedding"), cent).as("cell"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))")
          .as("qa")).persist()
      val perDim =
        try stage
          .select(col("cell"), posexplode(col("qa")).as(Seq("pos", "q")))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
          .collect()
        finally stage.unpersist(blocking = false)
      cent = perDim
        .map(r => (r.getLong(0), r.getInt(1),
          // same op order as the SQL SUM(...)/1000000.0/COUNT(*)
          r.getLong(2).toDouble / 1000000.0 / r.getLong(3).toDouble))
        .groupBy(_._1).toSeq
        .map { case (cell, dims) =>
          cell -> dims.sortBy(_._2).map(_._3).toSeq
        }
        .sortBy(_._1)
    }
    cent
  }
}
