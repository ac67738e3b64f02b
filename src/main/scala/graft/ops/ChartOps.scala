package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import MultimodalOps.MediaCodec
import MultimodalOps.MediaCodec.Image

/** S10's chart-rendering LEAF — the one reference capability the engine
  * previously declared out-of-engine (dags/include/utils.py:306-318
  * renders per-class KDE curves via matplotlib): a deterministic pure-JVM
  * polyline rasterizer over the repo's own PNG encoder
  * (MultimodalOps.MediaCodec, zlib+CRC), so a user replicating the
  * downstream chart DAG end-to-end no longer brings their own plotter.
  *
  * Scale posture: rendering is a DRIVER-SIDE leaf over an
  * already-aggregated frame (the x10_kde table is |grid| × |classes| rows
  * — KB-scale by construction); the distributed work lives in KdeOps.
  * renderKdePng refuses frames that are obviously not chart aggregates
  * rather than silently collecting a fact table.
  */
object ChartOps {

  /** The matplotlib "tab10" categorical cycle (public, the default every
    * reference chart uses), as (r, g, b). */
  private val palette: IndexedSeq[(Int, Int, Int)] = IndexedSeq(
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207))

  /** Rasterize per-series polylines onto a white canvas with black axes.
    * Series draw in sorted-label order through the tab10 cycle; points
    * sort by x within a series — byte-identical output for equal input. */
  def renderLineChart(series: Seq[(String, Seq[(Double, Double)])],
                      width: Int = 640, height: Int = 480,
                      margin: Int = 40): Image = {
    val data = series.filter(_._2.nonEmpty)
    require(data.nonEmpty, "renderLineChart: no data points")
    require(width > 2 * margin && height > 2 * margin,
      s"renderLineChart: canvas ${width}x$height too small for margin $margin")
    val pts = data.flatMap(_._2)
    val (xmin, xmax) = (pts.map(_._1).min, pts.map(_._1).max)
    // y axis anchors at 0 (densities/counts read from a zero baseline)
    val ymin = math.min(0.0, pts.map(_._2).min)
    val ymaxR = pts.map(_._2).max
    val ymax = if (ymaxR > ymin) ymaxR else ymin + 1.0
    val xspan = if (xmax > xmin) xmax - xmin else 1.0
    val bgr = Array.fill(width * height * 3)(0xff.toByte)
    def put(x: Int, y: Int, c: (Int, Int, Int)): Unit =
      if (x >= 0 && x < width && y >= 0 && y < height) {
        val i = (y * width + x) * 3
        bgr(i) = c._3.toByte; bgr(i + 1) = c._2.toByte; bgr(i + 2) = c._1.toByte
      }
    def px(x: Double): Int =
      margin + math.round((x - xmin) / xspan * (width - 2 * margin)).toInt
    def py(y: Double): Int = height - margin -
      math.round((y - ymin) / (ymax - ymin) * (height - 2 * margin)).toInt
    def line(x0: Int, y0: Int, x1: Int, y1: Int, c: (Int, Int, Int)): Unit = {
      // Bresenham — integer-exact, no float accumulation
      var cx = x0; var cy = y0
      val dx = math.abs(x1 - x0); val sx = if (x0 < x1) 1 else -1
      val dy = -math.abs(y1 - y0); val sy = if (y0 < y1) 1 else -1
      var err = dx + dy
      var cont = true
      while (cont) {
        put(cx, cy, c)
        if (cx == x1 && cy == y1) cont = false
        else {
          val e2 = 2 * err
          if (e2 >= dy) { err += dy; cx += sx }
          if (e2 <= dx) { err += dx; cy += sy }
        }
      }
    }
    line(margin, height - margin, width - margin, height - margin, (0, 0, 0))
    line(margin, margin, margin, height - margin, (0, 0, 0))
    data.sortBy(_._1).zipWithIndex.foreach { case ((_, ps), i) =>
      val c = palette(i % palette.size)
      val sorted = ps.sortBy(_._1)
      if (sorted.size == 1) put(px(sorted.head._1), py(sorted.head._2), c)
      else sorted.sliding(2).foreach {
        case Seq((xa, ya), (xb, yb)) => line(px(xa), py(ya), px(xb), py(yb), c)
        case _ => ()
      }
    }
    Image(width, height, bgr)
  }

  /** X10/S10: render a kdeByClass-shaped table (class, x, density) to PNG
    * bytes — the reference's per-class KDE chart as a deterministic
    * artifact. Collects AT MOST maxRows + 1 rows and refuses anything
    * bigger: charts render aggregates, never fact tables. */
  def renderKdePng(kde: DataFrame, classCol: String, xCol: String = "x",
                   yCol: String = "density", width: Int = 640,
                   height: Int = 480, maxRows: Int = 100000): Array[Byte] = {
    val rows = kde.select(col(classCol).cast("string").as("k"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      // null class labels / grid points have no place on a chart — drop
      // them here rather than NPE inside the sort/accessor path
      .filter(col("k").isNotNull && col("x").isNotNull && col("y").isNotNull)
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"renderKdePng: more than $maxRows rows — charts render AGGREGATES; " +
        "aggregate (e.g. KdeOps.kdeByClass) before rendering")
    val series = rows.groupBy(_.getString(0)).toSeq
      .map { case (k, rs) =>
        (k, rs.toSeq.map(r => (r.getDouble(1), r.getDouble(2))))
      }
    MediaCodec.encodePng(renderLineChart(series, width, height))
  }
}
