package graft

import java.nio.file.Files

class DriftGuardSpec extends SparkSpec {

  test("real testdata passes the drift probe") {
    DriftGuard.check(spark, sfDir)
  }

  test("a 1000x-compressed timeline (round-9 failure mode) trips the probe") {
    // simulate the exact incident: micros treated as millis lands every
    // event in January 1970 — the probe must refuse to let a run proceed
    val dir = Files.createTempDirectory("drift_sim_").toString
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.range(100)
      .select(col("id").as("event_id"),
        timestamp_micros(col("id") * 1000000L).as("ts"), // 1970-01-01 + id s
        col("id").as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      DriftGuard.checkEvents(Env(spark, dir))
    }
    assert(e.getMessage.contains("testdata drift"))
  }

  test("a truncated drop (wrong volume for its sf name) trips the probe") {
    val dir = Files.createTempDirectory("drift_sf0.01_vol_").toString
    import org.apache.spark.sql.functions._
    // dir name claims sf0.01 (~60k lineitem rows); write 10
    spark.range(10).select(col("id").as("l_orderkey"))
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val e = intercept[IllegalArgumentException] {
      DriftGuard.checkVolume(Env(spark, dir))
    }
    assert(e.getMessage.contains("testdata drift"))
  }

  test("an embedding-dimensionality change trips the probe") {
    val dir = Files.createTempDirectory("drift_dim_").toString
    import org.apache.spark.sql.functions._
    spark.range(10)
      .select(col("id").as("vec_id"),
        array_repeat(lit(0.5f), 32).as("embedding"), // 32-dim, expected 64
        lit(0).as("label"))
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      DriftGuard.checkEmbeddings(Env(spark, dir))
    }
    assert(e.getMessage.contains("testdata drift"))
  }
}
