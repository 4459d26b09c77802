package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k (the correctness baseline), random-hyperplane
  * LSH bucketing (the approximate scale path), and per-label centroids.
  *
  * Cross-engine determinism: dot products fold sequentially in double
  * (identical order both engines); centroid accumulation quantizes floats
  * to 1e-6 integers so the cross-row sum is exact integer arithmetic
  * independent of partitioning.
  *
  * Scale notes: brute-force kNN is O(|Q|x|N|) with the query side
  * broadcast — right for small query batches; the LSH path buckets the
  * corpus in one scan (no shuffle beyond the bucket groupBy) and at
  * 100 TB the candidate join on bucket id replaces the cross product,
  * |bucket| bounding the per-query cost (IVF-style). A per-query top-k
  * via window row_number keeps only k rows past the shuffle.
  */
object Embeddings extends QueryModule {

  /** Sequential-fold cosine between two float vectors, in double. */
  private val cosExpr =
    """aggregate(zip_with(qv, embedding, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, x) -> acc + x)
      | / (sqrt(aggregate(transform(qv, x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x))
      |    * sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x)))"""
      .stripMargin.replaceAll("\n", "")

  // ------------------------------------------------------- brute-force kNN
  /** Top-10 cosine neighbours for each query vector (vec_id < 5), exact
    * brute force with the query side broadcast; ranked per query via
    * window row_number (only k rows survive the shuffle). */
  private def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(expr(cosExpr), 6))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"), col("label"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val knnBruteSql =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
      |), scored AS (
      |  SELECT q.query_id, e.vec_id, e.label,
      |    ROUND(
      |      list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |        i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)
      |      / (SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |           i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))), (acc, x) -> acc + x))
      |         * SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)))
      |    , 6) AS cos
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
      |), ranked AS (
      |  SELECT query_id, vec_id AS neighbor_id, cos, label,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id, cos, label
      |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Spark-side zip_with needs the same fold; DuckDB side uses ranges. */

  // --------------------------------------------------- centroids per label
  /** Per-label centroid norm + count. Floats are quantized to 1e-6 before
    * the cross-row sum (exact integer arithmetic -> partitioning-
    * independent); the per-dimension means then fold in ascending
    * dimension order. */
  private def centroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))"))
          .as(Seq("pos", "q")))
    val perDim = emb.groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .withColumn("mean_dim", col("sq") / 1000000.0 / col("n"))
    perDim.groupBy(col("label"))
      .agg(
        max(col("n")).as("n_vectors"),
        sqrt(expr(
          "aggregate(transform(array_sort(collect_list(struct(pos, mean_dim))), s -> s.mean_dim * s.mean_dim), 0D, (acc, x) -> acc + x)"))
          .as("centroid_norm"))
      .orderBy(col("label"))
  }

  private val centroidsSql =
    """WITH q AS (
      |  SELECT label, vec_id, i AS pos,
      |    CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1000000.0) AS BIGINT) AS qv
      |  FROM embeddings, (SELECT unnest(range(64)) AS i)
      |), per_dim AS (
      |  SELECT label, pos, SUM(qv) / 1000000.0 / count(*) AS mean_dim,
      |    count(*) AS n
      |  FROM q GROUP BY label, pos
      |)
      |SELECT label, CAST(MAX(n) AS BIGINT) AS n_vectors,
      |  SQRT(list_reduce(list_prepend(0.0,
      |    list_transform(list(mean_dim ORDER BY pos), m -> m * m)), (acc, x) -> acc + x))
      |    AS centroid_norm
      |FROM per_dim GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------- LSH bucketing (ANN)
  /** Random-hyperplane LSH: 8 deterministic integer hyperplanes ->
    * 8-bit bucket signature per vector; per-bucket occupancy. At scale the
    * ANN query joins candidates on bucket id instead of cross-joining the
    * corpus. */
  private val bucketExpr =
    """aggregate(sequence(0, 7), 0L, (acc, j) -> acc +
      |  CASE WHEN aggregate(sequence(1, 64), 0D, (a, i) ->
      |         a + cast(element_at(embedding, i) as double)
      |           * cast(((7*j + 3) * i + 11*j + 5) % 97 - 48 as double)) > 0D
      |       THEN cast(pow(2, j) as bigint) ELSE 0L END)"""
      .stripMargin.replaceAll("\n", "")

  private def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("bucket", expr(bucketExpr))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"),
           min(col("vec_id")).as("min_vec_id"),
           countDistinct(col("label")).as("n_labels"))
      .orderBy(col("bucket"))

  private val lshBucketsSql =
    """WITH b AS (
      |  SELECT vec_id, label,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(8), j ->
      |      CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
      |             CAST(embedding[i] AS DOUBLE)
      |               * CAST(((7*j + 3) * i + 11*j + 5) % 97 - 48 AS DOUBLE))), (acc, x) -> acc + x) > 0
      |           THEN CAST(power(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (acc, x) -> acc + x) AS bucket
      |  FROM embeddings)
      |SELECT bucket, count(*) AS n_vectors, MIN(vec_id) AS min_vec_id,
      |  COUNT(DISTINCT label) AS n_labels
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------------------------- embedding-cosine near-dup
  /** Embedding near-duplicate detection: candidate pairs from the same LSH
    * bucket, scored by exact cosine, ranked — the embedding-space dedup
    * pass of a training pipeline (production would apply a threshold like
    * cos >= 0.95; this corpus has no planted dups, max pairwise cos ~0.51,
    * so the query reports the top candidates instead of an empty set).
    * The bucket join bounds candidate generation (never all-pairs). */
  private def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    // session-lifetime cache, deliberate: both join sides + the estimate
    // need the bucketed table, and at most a few thousand rows are pinned
    val b = Tables.embeddings(spark, dir)
      .withColumn("bucket", expr(bucketExpr))
      .persist()
    val pairs = b.select(col("bucket"), col("vec_id").as("id_a"),
        col("embedding").as("qv"))
      .join(b.select(col("bucket"), col("vec_id").as("id_b"),
        col("embedding")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
    pairs
      .withColumn("cos", round(expr(cosExpr), 6))
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  private val cosineNearDupSql =
    """WITH b AS (
      |  SELECT vec_id, embedding,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(8), j ->
      |      CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
      |             CAST(embedding[i] AS DOUBLE)
      |               * CAST(((7*j + 3) * i + 11*j + 5) % 97 - 48 AS DOUBLE))), (acc, x) -> acc + x) > 0
      |           THEN CAST(power(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (acc, x) -> acc + x) AS bucket
      |  FROM embeddings
      |), pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS qv,
      |         b.embedding AS ev
      |  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      |SELECT id_a, id_b,
      |  ROUND(
      |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |      i -> CAST(qv[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE))), (acc, x) -> acc + x)
      |    / (SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))), (acc, x) -> acc + x))
      |       * SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |         i -> CAST(ev[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE))), (acc, x) -> acc + x)))
      |  , 6) AS cos
      |FROM pairs
      |ORDER BY cos DESC, id_a, id_b LIMIT 50""".stripMargin

  // ---------------------------------------------------- ANN recall metric
  /** Approximate-NN quality gate: top-10 within the query's LSH bucket vs
    * exact brute-force top-10, recall@10 per query. This is how the scale
    * path is tuned (more hyperplanes / multi-probe until recall clears the
    * product bar) — the measurement itself is part of the engine. */
  private def annRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", expr(bucketExpr)).persist()
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket").as("q_bucket"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(expr(cosExpr), 6))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val brute = scored.withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id"))
    val inBucket = scored.filter(col("bucket") === col("q_bucket"))
    val lsh = inBucket.withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id"))
    val hits = brute.join(lsh, Seq("query_id", "vec_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    val cand = inBucket.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_candidates"))
    q.select(col("query_id"))
      .join(cand, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) / 10.0).as("recall_at_10"))
      .orderBy(col("query_id"))
  }

  private val annRecallSql = {
    val cosFrag =
      """ROUND(
        |      list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |        i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)
        |      / (SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |           i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))), (acc, x) -> acc + x))
        |         * SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)))
        |    , 6)""".stripMargin
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(8), j ->
       |      CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
       |             CAST(embedding[i] AS DOUBLE)
       |               * CAST(((7*j + 3) * i + 11*j + 5) % 97 - 48 AS DOUBLE))), (acc, x) -> acc + x) > 0
       |           THEN CAST(power(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
       |      (acc, x) -> acc + x) AS bucket
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, bucket AS q_bucket
       |  FROM b WHERE vec_id < 20
       |), scored AS (
       |  SELECT q.query_id, q.q_bucket, e.vec_id, e.bucket,
       |    $cosFrag AS cos
       |  FROM b e CROSS JOIN q WHERE e.vec_id <> q.query_id
       |), brute AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
       |    FROM scored) WHERE rn <= 10
       |), lsh AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
       |    FROM scored WHERE bucket = q_bucket) WHERE rn <= 10
       |), hits AS (
       |  SELECT b.query_id, count(*) AS n_hits
       |  FROM brute b JOIN lsh l ON b.query_id = l.query_id AND b.vec_id = l.vec_id
       |  GROUP BY b.query_id
       |), cand AS (
       |  SELECT query_id, count(*) AS n_candidates FROM scored
       |  WHERE bucket = q_bucket GROUP BY query_id
       |)
       |SELECT q.query_id,
       |  COALESCE(c.n_candidates, 0) AS n_candidates,
       |  COALESCE(h.n_hits, 0) AS n_hits,
       |  COALESCE(h.n_hits, 0) / 10.0 AS recall_at_10
       |FROM q LEFT JOIN cand c ON q.query_id = c.query_id
       |LEFT JOIN hits h ON q.query_id = h.query_id
       |ORDER BY q.query_id""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_knn_bruteforce" -> (knnBrute _),
    "emb_centroids" -> (centroids _),
    "emb_lsh_buckets" -> (lshBuckets _),
    "dedup_embedding_cosine" -> (cosineNearDup _),
    "emb_ann_recall" -> (annRecall _))

  override def oracles: Map[String, String] = Map(
    "emb_knn_bruteforce" -> knnBruteSql,
    "emb_centroids" -> centroidsSql,
    "emb_lsh_buckets" -> lshBucketsSql,
    "dedup_embedding_cosine" -> cosineNearDupSql,
    "emb_ann_recall" -> annRecallSql)
}
