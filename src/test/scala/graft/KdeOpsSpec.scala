package graft

import graft.ops.KdeOps

/** X10: the single-pass KernelSum aggregator must reproduce the cross-join
  * KDE exactly (both round to 6), and densities must behave like a density. */
class KdeOpsSpec extends SparkSpec {

  import spark.implicits._

  val grid = (0 until 14).map(_ * 25.0)

  test("single-pass aggregator KDE == cross-join KDE") {
    val a = KdeOps.kdeByClass("event_type", "value", grid)(env.events)
      .orderBy("event_type", "x")
      .as[(String, Double, Double)].collect().toSeq
    val b = KdeOps.kdeByClassSinglePass("event_type", "value", grid)(env.events)
      .orderBy("event_type", "x")
      .as[(String, Double, Double)].collect().toSeq
    assert(a.size === b.size)
    a.zip(b).foreach { case ((c1, x1, d1), (c2, x2, d2)) =>
      assert(c1 === c2 && x1 === x2)
      assert(math.abs(d1 - d2) <= 1e-6, s"density mismatch at ($c1,$x1): $d1 vs $d2")
    }
  }

  test("KDE output is a plausible density: non-negative, mass near data") {
    val out = KdeOps.kdeByClass("event_type", "value", grid)(env.events)
      .as[(String, Double, Double)].collect()
    assert(out.forall(_._3 >= 0.0))
    // trapezoid integral over the grid should be within (0, 1.2]
    val byClass = out.groupBy(_._1)
    byClass.foreach { case (_, pts) =>
      val s = pts.sortBy(_._2)
      val integral = s.sliding(2).map {
        case Array((_, x1, d1), (_, x2, d2)) => (x2 - x1) * (d1 + d2) / 2
      }.sum
      assert(integral > 0.5 && integral <= 1.2, s"integral $integral")
    }
  }
}
