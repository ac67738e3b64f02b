package graft.ml

import org.apache.spark.ml.{Pipeline => MlPipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{PolynomialExpansion, StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.DataFrame
import graft.model.Schemas

/** The reference ML task-group (SURVEY §2.6, M1-M12) on spark.ml.
  * Reference cites: dags/include/utils.py:39-252, dags/etl_elt_wine.py:318-404.
  *
  * Divergences (documented in SURVEY §2.6): M6 HistGradientBoosting →
  * GBTRegressor (different histogram/split internals, metric-level parity
  * only); M12 MLflow → a lineage DataFrame (zero-egress build). M7 was a
  * ridge stand-in through round 10; round 11 ships the EXACT evidence-
  * maximization BayesianRidge ([[graft.ml.BayesianRidge]], tol=1e-6 as
  * the reference calls it) in the grid slot.
  */
object WinePipelines {

  /** The reference predicts ALCOHOL from the other 10 physico-chemical
    * features (utils.py:55-69: X = df.drop("alcohol"), y = df["alcohol"]) —
    * quality is not even in the feature projection. */
  val labelCol = "alcohol"
  val featureCols: Array[String] =
    Schemas.wineFeatures.filterNot(_ == labelCol).toArray

  /** M1 (utils.py:70-72): seeded 70/30 split. Different RNG than sklearn —
    * sizes/disjointness verified, not membership (caveat in SURVEY §5). */
  def split(df: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(0.7, 0.3), seed)
    (train, test)
  }

  /** M2 (utils.py:69): feature/label separation — assemble the 11 feature
    * columns into a vector; the label stays a column. */
  def assembler: VectorAssembler = new VectorAssembler()
    .setInputCols(featureCols)
    .setOutputCol("features_raw")

  /** One model candidate: name, parameter description, fitted stages. */
  final case class Candidate(name: String, params: Map[String, String],
                             pipeline: MlPipeline)

  private def scaler = new StandardScaler()          // M3 (utils.py:94)
    .setInputCol("features_raw").setOutputCol("features_std")
    .setWithMean(true).setWithStd(true)

  private def poly(degree: Int) = new PolynomialExpansion() // M4 (utils.py:95)
    .setInputCol("features_std").setOutputCol("features")
    .setDegree(degree)

  /** M8+M9 (utils.py:93-132): the 7-candidate model grid —
    * 2 linear (poly degree 2/3) + 4 GBT (stepSize × minInstancesPerNode)
    * + 1 exact BayesianRidge (utils.py:116, tol=1e-6). */
  def modelGrid: Seq[Candidate] = {
    val lrs = Seq(2, 3).map { d =>
      Candidate(s"linear_poly$d", Map("degree" -> d.toString),
        new MlPipeline().setStages(Array(assembler, scaler, poly(d),
          new LinearRegression().setLabelCol(labelCol).setFeaturesCol("features"))))
    }
    // the reference HGB pipeline includes PolynomialFeatures(2)
    // (utils.py:101-106) — mirror it ahead of the GBT stage
    val gbts = for {
      step <- Seq(0.1, 0.05)
      minInst <- Seq(20, 25)
    } yield Candidate(s"gbt_s${step}_m$minInst",
      Map("stepSize" -> step.toString, "minInstancesPerNode" -> minInst.toString),
      new MlPipeline().setStages(Array(assembler, scaler, poly(2),
        new GBTRegressor().setLabelCol(labelCol).setFeaturesCol("features")
          .setStepSize(step).setMinInstancesPerNode(minInst).setSeed(42L))))
    val ridge = Candidate("ridge", Map("algo" -> "bayesian_ridge",
        "tol" -> "1e-6"),
      new MlPipeline().setStages(Array(assembler, scaler, poly(2),
        new graft.ml.BayesianRidgeRegressor().setLabelCol(labelCol)
          .setFeaturesCol("features"))))
    lrs ++ gbts :+ ridge
  }

  /** M10 (utils.py:135-144): seeded random model-subset selection, size
    * random >= 1, without replacement. */
  def chooseCandidates(all: Seq[Candidate], seed: Long): Seq[Candidate] = {
    val rnd = new scala.util.Random(seed)
    val k = 1 + rnd.nextInt(all.size)
    rnd.shuffle(all.toList).take(k).sortBy(_.name)
  }

  /** M11 (utils.py:224-233): R² on train and test. */
  def r2(model: PipelineModel, df: DataFrame): Double =
    new RegressionEvaluator().setLabelCol(labelCol)
      .setPredictionCol("prediction").setMetricName("r2")
      .evaluate(model.transform(df))

  final case class RunMetrics(model: String, params: String,
                              r2Train: Double, r2Test: Double)

  /** Fit + evaluate candidates; emit the lineage/metrics table (M12 —
    * replaces MLflow tracking with a queryable DataFrame sink). */
  def trainAndEvaluate(df: DataFrame, candidates: Seq[Candidate]): DataFrame = {
    val (train, test) = split(df)
    val spark = df.sparkSession
    import spark.implicits._
    candidates.map { c =>
      val m = c.pipeline.fit(train)
      RunMetrics(c.name,
        c.params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","),
        math.rint(r2(m, train) * 1e6) / 1e6,     // F5 rounding (utils.py:231)
        math.rint(r2(m, test) * 1e6) / 1e6)
    }.toDF()
  }
}
