package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Skew probe for the exact-substring dedup pair: runs doc_dedup_substr
  * (and doc_dup_spans) end-to-end over a corpus dir — typically a
  * ScaleUp megaPermille corpus where one boilerplate 8-gram appears in a
  * large doc fraction — and reports per-task timing spread alongside wall
  * time. The number that matters is `skew_x` = max task time / mean task
  * time: a single-reducer formulation (the per-gram sort window this
  * operator deliberately avoids) sends the mega-gram's entire occurrence
  * list to one task and the ratio explodes with the planted fraction; the
  * aggregate+join formulation keeps it flat because the map-side partial
  * combine collapses each partition's mega-gram slice to one row and AQE
  * splits the join-back skew.
  *
  * Usage: runMain graft.tools.SubstrBench <sfDir> [queryName]
  */
object SubstrBench {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/sf0.01mega"
    val query = if (args.length > 1) args(1) else "doc_dedup_substr"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tasks = new AtomicInteger(0)
    val sumMs = new AtomicLong(0L)
    val maxMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        tasks.incrementAndGet()
        sumMs.addAndGet(d)
        maxMs.updateAndGet(m => math.max(m, d)): Unit
      }
    })

    val out = java.nio.file.Files
      .createTempDirectory("graft_substrbench").toString
    val t0 = System.nanoTime()
    // write (not count): forces the full plan including the final sort
    SparkEntry.queries(query)(spark, dir)
      .write.mode("overwrite").parquet(s"$out/result.parquet")
    val wallSec = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(s"$out/result.parquet").count()

    val n = tasks.get()
    val mean = if (n == 0) 0.0 else sumMs.get().toDouble / n
    val skew = if (mean == 0.0) 0.0 else maxMs.get() / mean
    println(f"""{"dir":"$dir","query":"$query","rows":$rows,""" +
      f""""wall_sec":$wallSec%.2f,"tasks":$n,""" +
      f""""max_task_sec":${maxMs.get() / 1e3}%.2f,""" +
      f""""mean_task_sec":${mean / 1e3}%.3f,"skew_x":$skew%.1f}""")
    spark.stop()
  }
}
