package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training surface (SURVEY.md M1-M8): dataset preparation with quality
  * ops, model factory (logistic_regression / random_forest / gbt standing
  * in for the reference's xgboost/lightgbm — training/models.py:44-92),
  * k-fold cross-validation on AUC, and evaluation.
  *
  * The whole pipeline is a spark.ml `Pipeline` fit over the offline
  * feature table — set-oriented end to end, no driver loops; on a cluster
  * the same code trains on the full history table.
  */
object TrainingPipeline {

  /** Median imputation for numeric columns (M2; approxQuantile is the
    * sketch path the reference approximates with pandas median,
    * datasets.py:151-169). */
  def imputeMedians(df: DataFrame, cols: Seq[String]): DataFrame = {
    val medians = cols.zip(
      df.stat.approxQuantile(cols.toArray, Array(0.5), 0.001).map(_.head))
    df.na.fill(medians.toMap)
  }

  /** IQR outlier filter with fraud-preservation guard (M3,
    * datasets.py:171-214): rows outside fence are dropped unless positive. */
  def iqrFilter(df: DataFrame, valueCol: String, labelCol: String,
                k: Double = 1.5): DataFrame = {
    val Array(q1, q3) =
      df.stat.approxQuantile(valueCol, Array(0.25, 0.75), 0.001)
    val iqr = q3 - q1
    df.filter(
      col(valueCol).between(q1 - k * iqr, q3 + k * iqr) || col(labelCol) === 1.0)
  }

  /** Deterministic stratified split by content hash (M4): (train, test). */
  def stratifiedSplit(df: DataFrame, idCol: String,
                      testFolds: Set[Int] = Set(0), folds: Int = 5)
      : (DataFrame, DataFrame) = {
    val fold = pmod(
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long"), lit(folds.toLong)).cast("int")
    val tagged = df.withColumn("_fold", fold)
    (tagged.filter(!col("_fold").isInCollection(testFolds)).drop("_fold"),
     tagged.filter(col("_fold").isInCollection(testFolds)).drop("_fold"))
  }

  /** Model factory (M6). Class imbalance handled via weightCol for LR
    * (the reference's scale_pos_weight analogue). */
  def makePipeline(model: String, features: Seq[String]): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("rawFeatures")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("rawFeatures").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val clf = model match {
      case "logistic_regression" =>
        new LogisticRegression().setLabelCol("label").setWeightCol("weight")
          .setMaxIter(50)
      case "random_forest" =>
        new RandomForestClassifier().setLabelCol("label").setNumTrees(50)
          .setSeed(42)
      case "gbt" => // stands in for xgboost/lightgbm (models.py:44-92)
        new GBTClassifier().setLabelCol("label").setMaxIter(20).setSeed(42)
      case other => throw new IllegalArgumentException(s"unknown model $other")
    }
    new Pipeline().setStages(Array(assembler, scaler, clf))
  }

  /** Balanced class weights (models.py class_weight='balanced'). */
  def withBalancedWeight(df: DataFrame, labelCol: String): DataFrame = {
    val pos = df.filter(col(labelCol) === 1.0).count().toDouble
    val n = df.count().toDouble
    val posW = if (pos > 0) n / (2.0 * pos) else 1.0
    val negW = if (n - pos > 0) n / (2.0 * (n - pos)) else 1.0
    df.withColumn("weight",
      when(col(labelCol) === 1.0, posW).otherwise(negW))
  }

  /** k-fold CV on areaUnderROC (M7, k=5, training/config.py:60). */
  def crossValidate(pipeline: Pipeline, df: DataFrame, k: Int = 5): Double = {
    val cv = new CrossValidator()
      .setEstimator(pipeline)
      .setEvaluator(new BinaryClassificationEvaluator().setLabelCol("label"))
      .setEstimatorParamMaps(new ParamGridBuilder().build())
      .setNumFolds(k).setSeed(42)
    cv.fit(df).avgMetrics.head
  }

  /** Evaluation (M8): AUC + thresholded precision/recall/F1/accuracy at
    * the reference's 0.3 operating point (inference/config.py:51). */
  def evaluate(model: PipelineModel, test: DataFrame,
               threshold: Double = 0.3): Map[String, Double] = {
    val scored = model.transform(test)
      .withColumn("score", vectorElement(col("probability"), 1))
      .withColumn("pred", (col("score") > threshold).cast("double"))
    val auc = new BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol("probability").evaluate(scored)
    val agg = scored.agg(
      sum(when(col("pred") === 1.0 && col("label") === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 1.0 && col("label") === 0.0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0.0 && col("label") === 1.0, 1L).otherwise(0L)).as("fn"),
      count(lit(1)).as("n"),
      sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("correct"))
      .head()
    val (tp, fp, fn) = (agg.getAs[Long]("tp").toDouble,
      agg.getAs[Long]("fp").toDouble, agg.getAs[Long]("fn").toDouble)
    val precision = if (tp + fp > 0) tp / (tp + fp) else 0.0
    val recall = if (tp + fn > 0) tp / (tp + fn) else 0.0
    Map(
      "auc" -> auc,
      "precision" -> precision,
      "recall" -> recall,
      "f1" -> (if (precision + recall > 0)
                 2 * precision * recall / (precision + recall) else 0.0),
      "accuracy" -> agg.getAs[Long]("correct").toDouble / agg.getAs[Long]("n"))
  }

  /** Element i of an ML vector column (probability of the positive class).
    * `vector_to_array` is the vectorized built-in — no Scala UDF boundary. */
  def vectorElement(c: org.apache.spark.sql.Column, i: Int) =
    element_at(org.apache.spark.ml.functions.vector_to_array(c), i + 1)
}
