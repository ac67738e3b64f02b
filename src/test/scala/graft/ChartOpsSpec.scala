package graft

import graft.ops.{ChartOps, KdeOps}
import graft.ops.MultimodalOps.MediaCodec

/** S10 chart leaf: deterministic pure-JVM rendering of the KDE table,
  * round-tripped through the repo's own PNG codec. */
class ChartOpsSpec extends SparkSpec {

  import spark.implicits._

  test("S10: renderLineChart draws axes and series pixels; output is " +
      "byte-deterministic") {
    val series = Seq(
      "a" -> Seq((0.0, 0.0), (1.0, 1.0), (2.0, 0.5)),
      "b" -> Seq((0.0, 1.0), (2.0, 0.0)))
    val img = ChartOps.renderLineChart(series, width = 200, height = 100,
      margin = 20)
    assert(img.width === 200 && img.height === 100)
    def bgrAt(x: Int, y: Int) = {
      val i = (y * img.width + x) * 3
      (img.bgr(i) & 0xff, img.bgr(i + 1) & 0xff, img.bgr(i + 2) & 0xff)
    }
    assert(bgrAt(0, 0) === ((255, 255, 255)), "background must be white")
    assert(bgrAt(20, 50) === ((0, 0, 0)), "y axis must be black")
    assert(bgrAt(100, 80) === ((0, 0, 0)), "x axis must be black")
    // series 'a' (first sorted label) draws in tab10 blue (31,119,180):
    // its first point is the origin of the plot area, one pixel above is
    // on the rising segment... assert by scanning for the color instead
    val bytes = img.bgr.grouped(3).map(c =>
      (c(0) & 0xff, c(1) & 0xff, c(2) & 0xff)).toSet
    assert(bytes.contains((180, 119, 31)), "tab10 blue series missing")
    assert(bytes.contains((14, 127, 255)), "tab10 orange series missing")
    // determinism: a second render is byte-identical
    val again = ChartOps.renderLineChart(series, width = 200, height = 100,
      margin = 20)
    assert(java.util.Arrays.equals(img.bgr, again.bgr))
  }

  test("S10: renderKdePng over the real KDE aggregate round-trips through " +
      "the PNG codec with correct dimensions") {
    val src = env.lineitem.select($"l_returnflag".as("quality"),
      $"l_quantity".as("alcohol"))
    val grid = (2 to 50).map(_.toDouble)
    val kde = KdeOps.kdeByClass("quality", "alcohol", grid)(src)
    val png = ChartOps.renderKdePng(kde, "quality", width = 320, height = 240)
    val img = MediaCodec.decodePng(png)
    assert(img.width === 320 && img.height === 240)
    // at least one non-white, non-black pixel (a curve was drawn)
    val colored = img.bgr.grouped(3).exists { c =>
      val t = (c(0) & 0xff, c(1) & 0xff, c(2) & 0xff)
      t != ((255, 255, 255)) && t != ((0, 0, 0))
    }
    assert(colored, "expected at least one curve pixel")
    // deterministic bytes
    assert(java.util.Arrays.equals(png,
      ChartOps.renderKdePng(kde, "quality", width = 320, height = 240)))
  }

  test("S10: renderKdePng refuses a fact-table-sized input") {
    val fact = env.lineitem.select($"l_returnflag".as("k"),
      $"l_quantity".as("x"), $"l_extendedprice".as("density"))
    intercept[IllegalArgumentException] {
      ChartOps.renderKdePng(fact, "k", maxRows = 100)
    }
  }
}
