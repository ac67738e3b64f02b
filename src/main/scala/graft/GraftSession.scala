package graft

import org.apache.spark.sql.SparkSession

/** One source of truth for engine session configuration. Verify, Bench,
  * and user code build sessions here so the scale posture (AQE, shuffle
  * partitioning, timezone, nanos handling) is uniform.
  */
object GraftSession {

  /** Tuned builder. `shufflePartitions` should track the actual
    * parallelism: cores locally, ~2-3× total executor cores on a cluster
    * (AQE coalesces downward at runtime). */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long + convert
      // (see Env.events). Set here so driver-created sessions match.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
