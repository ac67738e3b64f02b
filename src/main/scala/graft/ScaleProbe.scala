package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-plan fact-table scale-up probe: replicates lineitem/orders/customer
  * N× with remapped keys (dims stay fixed — dimensions grow slower than
  * facts in a real warehouse) and times representative heavy shapes.
  * This is the methodology behind the scale tables in ROUND_NOTES.md:
  * it answers "does the per-row work scale linearly once the fixed
  * planning/shuffle-setup constants amortize?" without needing a larger
  * generated dataset.
  *
  * Usage: scripts/run.sh graft.ScaleProbe [sfDir] [factors...]
  * e.g.   SPARK_GRAFT_CPUS=32 scripts/run.sh graft.ScaleProbe \
  *          /root/testdata/sf0.1 1 10 30
  */
object ScaleProbe {

  /** Replicate df `factor`× in-plan, striding each key column so the
    * copies don't collide (keeps join fan-outs realistic). */
  def scaled(df: DataFrame, factor: Int, keyStrides: Map[String, Long]): DataFrame =
    if (factor == 1) df
    else {
      val rep = df.withColumn("__i", explode(sequence(lit(0L), lit(factor - 1L))))
      keyStrides.foldLeft(rep) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + col("__i") * stride)
      }.drop("__i")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 10, 30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val env = Env(spark, sfDir)
    env.lineitem.limit(100).count() // warm session

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))

    def q7(li: DataFrame, ord: DataFrame, cust: DataFrame): Long = {
      val n1 = env.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = env.nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(env.supplier), col("s_suppkey") === col("l_suppkey"))
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .select(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"), volume.as("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(round(sum("volume"), 4).as("revenue")).count()
    }
    def q9(li: DataFrame, ord: DataFrame): Long =
      li.join(broadcast(env.part.filter(col("p_name").like("%widget%"))),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(env.supplier), col("s_suppkey") === col("l_suppkey"))
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(env.nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
          (volume - lit(0.1) * col("p_retailprice") * col("l_quantity")).as("amount"))
        .groupBy("nation", "o_year").agg(round(sum("amount"), 4).as("sum_profit"))
        .count()
    def q13(ord: DataFrame, cust: DataFrame): Long =
      cust.join(ord.filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist")).count()
    // pre-aggregated formulation (what x48 ships): facts collapse to one
    // row per customer before the outer join
    def q13b(ord: DataFrame, cust: DataFrame): Long = {
      val perCust = ord.filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      cust.join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist")).count()
    }
    def q19(li: DataFrame): Long =
      li.join(broadcast(env.part), col("p_partkey") === col("l_partkey"))
        .filter((col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 40) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 50))
        .agg(round(sum(volume), 4).as("revenue")).count()

    // Skew probe: a join where one hot customer owns ~half the fact rows.
    // AQE's skew-join splitting (on by default) carves the hot partition
    // into parallel splits; RelOps.saltedJoin is the manual fallback.
    // Run once at the largest factor.
    def qskew(f: Int): Unit = {
      val hotOrd = scaled(env.orders, f,
          Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
        .withColumn("o_custkey",
          when(col("o_orderkey") % 2 === 0, lit(0L)).otherwise(col("o_custkey")))
      val cust = scaled(env.customer, f, Map("c_custkey" -> 10000000L))
      def agg(j: DataFrame): Long =
        j.groupBy("c_nationkey").agg(round(sum("o_totalprice"), 4).as("s")).count()
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        time(s"skew_join_aqe ${f}x")(agg(hotOrd.join(cust,
          col("o_custkey") === col("c_custkey"))))
        time(s"skew_join_salted ${f}x")(agg(ops.RelOps.saltedJoin(
          hotOrd, cust.withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey", salt = 16)))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }

    for (f <- factors) {
      val li = scaled(env.lineitem, f, Map("l_orderkey" -> 1000000000L))
      val ord = scaled(env.orders, f,
        Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
      val cust = scaled(env.customer, f, Map("c_custkey" -> 10000000L))
      time(s"q7_volume_shipping ${f}x")(q7(li, ord, cust))
      time(s"q9_product_profit ${f}x")(q9(li, ord))
      time(s"q13_cust_distribution ${f}x")(q13(ord, cust))
      time(s"q13b_preagg ${f}x")(q13b(ord, cust))
      time(s"q19_disjunctive ${f}x")(q19(li))
    }
    qskew(factors.max)
    spark.stop()
  }
}
