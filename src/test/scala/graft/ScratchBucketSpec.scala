package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode

/** Exploratory: validate partitioned+bucketed catalog mechanics on 4.1.2
  * before building the versioned-bucketed snapshot layout. DELETED once
  * the findings are folded into SnapshotStore + its spec. */
class ScratchBucketSpec extends SparkSpec {

  import spark.implicits._

  test("partitionBy + bucketBy saveAsTable: create, append, prune, no-shuffle join") {
    val dir = java.nio.file.Files.createTempDirectory("scratch_bkt_").toString
    val t = "scratch_bkt_t1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val d1 = Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 2)).toDF("id", "s", "cell")
      .withColumn("commit_v", lit(1L))
    d1.write.mode(SaveMode.Overwrite)
      .partitionBy("commit_v")
      .bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t1")
      .saveAsTable(t)
    val d2 = Seq((4L, "d", 0), (5L, "e", 3)).toDF("id", "s", "cell")
      .withColumn("commit_v", lit(2L))
    d2.write.mode(SaveMode.Append)
      .partitionBy("commit_v")
      .bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t1")
      .saveAsTable(t)
    // read with partition filter
    val v1 = spark.table(t).filter(col("commit_v").isin(1L))
    assert(v1.count() === 3)
    val all = spark.table(t).filter(col("commit_v").isin(1L, 2L))
    assert(all.count() === 5)
    // partition pruning: v1 read must open only commit_v=1 files
    assert(v1.inputFiles.forall(_.contains("commit_v=1")),
      v1.inputFiles.mkString("\n"))
    // no-shuffle join on the bucket key vs another bucketed table
    val t2 = "scratch_bkt_t2"
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    Seq((0, "x"), (1, "y"), (2, "z"), (3, "w")).toDF("cell", "tag")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t2").saveAsTable(t2)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = all.drop("commit_v").join(spark.table(t2), Seq("cell"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(j.count() === 5)
    }
    println("=== FINDING 1 OK: partitioned+bucketed saveAsTable append + prune + no-shuffle join")
  }

  test("DDL-created external bucketed table + recoverPartitions reads files written by saveAsTable") {
    val dir = java.nio.file.Files.createTempDirectory("scratch_bkt2_").toString
    val t = "scratch_bkt_t3"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val d1 = Seq((1L, 0), (2L, 1)).toDF("id", "cell")
      .withColumn("commit_v", lit(1L))
    d1.write.mode(SaveMode.Overwrite)
      .partitionBy("commit_v").bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t3").saveAsTable(t)
    // simulate a fresh session: drop the registration, re-register via DDL
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(
      s"""CREATE TABLE $t (id BIGINT, cell INT, commit_v BIGINT)
         |USING PARQUET
         |PARTITIONED BY (commit_v)
         |CLUSTERED BY (cell) SORTED BY (cell) INTO 4 BUCKETS
         |LOCATION '$dir/t3'""".stripMargin)
    spark.catalog.recoverPartitions(t)
    assert(spark.table(t).count() === 2)
    // append AFTER re-registration still works and keeps the layout
    val d2 = Seq((3L, 2)).toDF("id", "cell").withColumn("commit_v", lit(2L))
    d2.write.mode(SaveMode.Append)
      .partitionBy("commit_v").bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t3").saveAsTable(t)
    assert(spark.table(t).count() === 3)
    // bucketing only engages for bucket-key joins/aggs — assert on one
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val agg = spark.table(t).filter(col("commit_v").isin(1L, 2L))
        .groupBy("cell").count()
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), p)
      assert(!p.contains("Exchange"), s"bucket-key agg must not shuffle:\n$p")
    }
    println("=== FINDING 2 OK: DDL re-registration + recoverPartitions + append")
  }

  test("empty append writes nothing; filter to missing partition yields empty; raw dir delete + drop partition") {
    val dir = java.nio.file.Files.createTempDirectory("scratch_bkt3_").toString
    val t = "scratch_bkt_t4"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val d1 = Seq((1L, 0)).toDF("id", "cell").withColumn("commit_v", lit(1L))
    d1.write.mode(SaveMode.Overwrite)
      .partitionBy("commit_v").bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t4").saveAsTable(t)
    // empty batch append
    val empty = Seq.empty[(Long, Int)].toDF("id", "cell")
      .withColumn("commit_v", lit(2L))
    empty.write.mode(SaveMode.Append)
      .partitionBy("commit_v").bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t4").saveAsTable(t)
    assert(spark.table(t).filter(col("commit_v") === 2L).count() === 0)
    assert(spark.table(t).filter(col("commit_v").isin(1L, 2L)).count() === 1)
    // retry-safety: write partition 3, then simulate crash cleanup:
    // drop catalog partition + raw-delete the dir, rewrite
    val d3 = Seq((9L, 1)).toDF("id", "cell").withColumn("commit_v", lit(3L))
    d3.write.mode(SaveMode.Append)
      .partitionBy("commit_v").bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t4").saveAsTable(t)
    spark.sql(s"ALTER TABLE $t DROP IF EXISTS PARTITION (commit_v=3)")
    val pdir = new java.io.File(s"$dir/t4/commit_v=3")
    if (pdir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(pdir)
    assert(spark.table(t).filter(col("commit_v") === 3L).count() === 0)
    val d3b = Seq((10L, 1)).toDF("id", "cell").withColumn("commit_v", lit(3L))
    d3b.write.mode(SaveMode.Append)
      .partitionBy("commit_v").bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$dir/t4").saveAsTable(t)
    assert(spark.table(t).filter(col("commit_v") === 3L)
      .select("id").as[Long].collect().toSeq === Seq(10L))
    println("=== FINDING 3 OK: empty append, drop-partition retry cycle")
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
