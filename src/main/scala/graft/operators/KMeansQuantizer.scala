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
    * centroid, as a sequential fold (matches the DuckDB list_reduce).
    * Round 14: the fold runs through the native codegen
    * [[graft.functions.FloatSqDist]] (`fsq`) — bit-identical to the
    * interpreted `aggregate(zip_with(...))` form it replaces (same
    * ascending subtract-square-add sequence; FunctionsSpec pins raw-bit
    * equality), but inside whole-stage codegen instead of per-element
    * interpretation. Callers must have run `VectorFold.register` on the
    * session (every Embeddings entry point and ScaleCheck do). */
  def dist2To(emb: Column, cv: Seq[Double]): Column =
    graft.functions.VectorFold.fsq(emb, array(cv.map(lit): _*), lit(0))

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

  /** Squared-L2 between subspace `s` of `emb` — the 1-based slice
    * [s*sub+1, s*sub+sub] — and a literal sub-dimensional centroid, the
    * same sequential fold as [[dist2To]]. The product-quantization
    * sub-distance primitive. */
  def dist2SubTo(emb: Column, s: Int, sub: Int, cv: Seq[Double]): Column =
    // fsq's offset operand replaces the per-code slice() array copy with
    // an index shift inside the generated loop — same fold, fewer allocs
    graft.functions.VectorFold.fsq(emb, array(cv.map(lit): _*),
      lit(s * sub))

  /** PQ code of subspace `s`: argmin over that subspace's codebook
    * entries (distance, then code-id tie-break — same struct-least
    * idiom as [[assignCell]]). Pure expression, broadcast codebook. */
  def pqCode(emb: Column, s: Int, sub: Int, cb: Seq[Seq[Double]]): Column =
    cb match {
      case Seq(_) => lit(0L)
      case cs => least(cs.zipWithIndex.map { case (cv, c) =>
        struct(dist2SubTo(emb, s, sub, cv).as("d2"), lit(c.toLong).as("code"))
      }: _*).cast("struct<d2:double,code:bigint>").getField("code")
    }

  /** Minimum distance from `emb` to any of the given seed vectors. */
  private def minDistTo(emb: Column, seeds: Seq[Seq[Double]]): Column =
    seeds.map(dist2To(emb, _)) match {
      case Seq(one) => one
      case ds => ds.reduce((a, b) => least(a, b))
    }

  /** Deterministic k-means‖ (Bahmani et al., VLDB'12) oversampling
    * seeding — the D²-quality spread in O(rounds) passes instead of the
    * k sequential scans of a farthest-point traversal (the round-3 scale
    * finding: k driver round-trips do not survive k in the thousands).
    * Each round is ONE scan: compute every vector's min squared distance
    * to the current candidate set (candidates broadcast as literals),
    * quantize to 1e-6 integers and SUM — an exact, partitioning-
    * independent potential φ — then keep the vectors whose md5-uniform
    * u(vec_id, round) falls below ℓ·d²/φ (expected ℓ picks per round,
    * zero RNG: the hash replaces the coin, so both engines draw the same
    * sample). Candidates have d² = 0, so rounds never resample them.
    * The ~1+ℓ·rounds survivors reduce ON THE DRIVER by farthest-point
    * traversal (ties on vec_id) to exactly k seeds, numbered 0..k-1 by
    * selection order.
    *
    * Every arithmetic step (sequential distance fold, 1e-6 floor
    * quantization, double division 16·dq/φ, strict < compare) is
    * mirrored operation-for-operation in the DuckDB oracle, which is
    * what makes an oversampling SAMPLER oracle-checkable at all. */
  def kmeansParSeeds(emb: DataFrame, k: Int, rounds: Int = 4,
                     ell: Int = 16): Seq[(Long, Seq[Double])] = {
    def vecsOf(df: DataFrame): Seq[(Long, Seq[Double])] =
      df.select(col("vec_id").cast("long"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
        .toSeq.sortBy(_._1)
    var cands = vecsOf(emb.orderBy(col("vec_id")).limit(1))
    for (r <- 1 to rounds) {
      val dq = floor(minDistTo(col("embedding"), cands.map(_._2)) * 1e6)
        .cast("long")
      val staged = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"), dq.as("dq"))
      val phiq = staged.agg(sum(col("dq"))).head().getLong(0)
      val u = conv(substring(md5(concat(col("vec_id").cast("string"),
        lit(s"_$r")).cast("binary")), 1, 8), 16, 10).cast("long") /
        lit(4294967296.0)
      val p = (lit(ell.toDouble) * col("dq")) / lit(phiq.toDouble)
      cands = (cands ++ vecsOf(staged.filter(u < p))).sortBy(_._1)
    }
    require(cands.size >= k,
      s"k-means|| sampled ${cands.size} candidates < k=$k — raise ell/rounds")
    // driver-side farthest-point reduction over the tiny candidate set
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val first = cands.minBy(_._1)
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    for (_ <- 1 until k) {
      val next = cands
        .filterNot(c => chosen.exists(_._1 == c._1))
        .map(c => (c, chosen.map(s => d2(c._2, s._2)).min))
        .maxBy { case (c, d) => (d, -c._1) }._1
      chosen += next
    }
    chosen.toSeq.zipWithIndex.map { case ((_, v), i) => i.toLong -> v }
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
