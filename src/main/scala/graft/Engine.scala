package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local test harness runs `local[32]` on one JVM; the configuration is
  * nonetheless written for a multi-executor cluster: AQE enabled (runtime
  * shuffle coalescing + skew-join splitting), shuffle partitions sized to
  * the local core count (on a real cluster this is overridden per-job or
  * left to AQE), UTC session time so results are timezone-stable.
  */
object Engine {
  def session(appName: String = "graft", cpus: Int = defaultCpus): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); set once at construction
      // (a mid-session toggle could race concurrently-planned reads)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(4)
}
