package graft

import graft.ml.WinePipelines
import graft.ops.WineOps

/** M1-M12 (SURVEY §2.6): metric-level verification — implementations
  * differ from sklearn internally (documented divergences), so we assert
  * split properties and R² sanity, not coefficient equality. */
class WinePipelinesSpec extends SparkSpec {

  lazy val wine = WineOps.extract(spark).cache()

  test("M1: 70/30 split is disjoint, exhaustive, seeded-deterministic") {
    val (train, test) = WinePipelines.split(wine, 42L)
    val (nTrain, nTest) = (train.count(), test.count())
    assert(nTrain + nTest === 4898L)
    assert(math.abs(nTest.toDouble / 4898 - 0.30) < 0.03)
    assert(train.select("id").intersect(test.select("id")).count() === 0)
    val (train2, _) = WinePipelines.split(wine, 42L)
    assert(train2.count() === nTrain) // same seed → same split
  }

  test("M8-M9: the grid holds the reference's 7 candidates") {
    val names = WinePipelines.modelGrid.map(_.name)
    assert(names.size === 7)
    assert(names.count(_.startsWith("linear")) === 2)
    assert(names.count(_.startsWith("gbt")) === 4)
    assert(names.count(_ == "ridge") === 1)
  }

  test("M10: seeded choice is deterministic, size within [1, 7]") {
    val a = WinePipelines.chooseCandidates(WinePipelines.modelGrid, 42L)
    val b = WinePipelines.chooseCandidates(WinePipelines.modelGrid, 42L)
    assert(a.map(_.name) === b.map(_.name))
    assert(a.nonEmpty && a.size <= 7)
  }

  test("M3-M5, M11: linear pipeline predicts alcohol plausibly (R² ≈ 0.9)") {
    val candidates = WinePipelines.modelGrid.filter(_.name == "linear_poly2")
    val metrics = WinePipelines.trainAndEvaluate(wine, candidates).collect()
    assert(metrics.length === 1)
    val r2Train = metrics.head.getDouble(2)
    val r2Test = metrics.head.getDouble(3)
    // the reference task (alcohol ~ 10 physico-chemical features,
    // utils.py:55-69) is strongly determined — sklearn reaches ~0.9 too
    assert(r2Train > 0.7 && r2Train < 0.99, s"r2Train=$r2Train")
    assert(r2Test > 0.6 && r2Test < 0.99, s"r2Test=$r2Test")
  }

  test("M7: the EXACT BayesianRidge grid candidate trains on wine data " +
      "and scores in the linear family's band") {
    val candidates = WinePipelines.modelGrid.filter(_.name == "ridge")
    val metrics = WinePipelines.trainAndEvaluate(wine, candidates).collect()
    assert(metrics.length === 1)
    val (r2Train, r2Test) =
      (metrics.head.getDouble(2), metrics.head.getDouble(3))
    // same task as linear_poly2 with evidence-tuned regularization:
    // the fit must land in the same strongly-determined band
    assert(r2Train > 0.7 && r2Train < 0.99, s"r2Train=$r2Train")
    assert(r2Test > 0.6 && r2Test < 0.99, s"r2Test=$r2Test")
  }
}
