package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 optimization harness (dev-only, not driver contract).
  *
  * Modes:
  *   plans <outDir> <suffix> [names]  — write explain("formatted") for each
  *                                      query to <outDir>/<name>_<suffix>.txt
  *   prof  [names]                    — per-build and per-query timings,
  *                                      n iters each (SPARK_GRAFT_ITERS),
  *                                      timing fn(..).count() exactly like
  *                                      Bench so numbers are comparable
  *
  * Uses the same session shape as Bench (master local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus) so measurements match the driver's.
  */
object R15Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    args.headOption.getOrElse("prof") match {
      case "plans" =>
        val outDir = args(1)
        val suffix = args(2)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        val names =
          if (args.length > 3) args(3).split(",").toSeq
          else graft.SparkEntry.queries.keys.toSeq.sorted
        names.foreach { n =>
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
            txt.getBytes("UTF-8"))
        }
        println(s"R15PLANS wrote ${names.length} plans to $outDir")

      case "prof" =>
        // untimed warmup, mirroring Bench
        try {
          graft.SparkEntry.queries("q6_filter_agg")(spark, sfDir).count()
          val warmDir = "/root/testdata/sf0.001"
          if (warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
            graft.operators.Ingestion.buildCanonical(spark, warmDir)
            graft.operators.Curation.buildTfIndex(spark, warmDir)
            graft.operators.Dedup.buildCandidates(spark, warmDir)
            graft.operators.Dedup.buildFingerprints(spark, warmDir)
            graft.operators.Similarity.buildIndex(spark, warmDir)
            graft.operators.Curation.buildClusters(spark, warmDir)
            graft.operators.Similarity.buildPca(spark, warmDir)
            graft.operators.Similarity.buildPq(spark, warmDir)
            graft.operators.TextAnalysis.buildBpeMerges(spark, warmDir)
          }
        } catch { case _: Throwable => () }
        val builds = Seq(
          "canon:lineagg" -> (() =>
            graft.ingest.RawSynth.lineAggCached(spark, sfDir).count(): Unit),
          "canon:jsonhdr" -> (() =>
            graft.ingest.HeaderNormalizer.fromJson(
              graft.ingest.RawSynth.jsonRaw(spark, sfDir)).count(): Unit),
          "canon:xmlhdr" -> (() =>
            graft.ingest.HeaderNormalizer.fromXml(
              graft.ingest.RawSynth.xmlRaw(spark, sfDir)).count(): Unit),
          "canon:csvhdr" -> (() =>
            graft.ingest.HeaderNormalizer.fromCsv(
              graft.ingest.RawSynth.csvRaw(spark, sfDir)).count(): Unit),
          "canon:headers" -> (() =>
            graft.operators.Ingestion.allHeaders(spark, sfDir).count(): Unit),
          "canon:survivors" -> (() =>
            graft.operators.Ingestion.survivors(spark, sfDir).count(): Unit),
          "canon:lines" -> (() =>
            graft.operators.Ingestion.allLines(spark, sfDir).count(): Unit),
          "build:tf_index" -> (() =>
            graft.operators.Curation.buildTfIndex(spark, sfDir): Unit),
          "lsh:shingles" -> (() =>
            graft.operators.Dedup.hashedShingles(spark, sfDir).count(): Unit),
          "lsh:candidates" -> (() =>
            graft.operators.Dedup.lshCandidates(spark, sfDir).count(): Unit),
          "lsh:containment" -> (() =>
            graft.operators.Dedup.containmentCandidatesCached(spark, sfDir).count(): Unit),
          "build:fingerprints" -> (() =>
            graft.operators.Dedup.buildFingerprints(spark, sfDir): Unit),
          "ivf:fit" -> (() =>
            graft.operators.Similarity.centroids(spark, sfDir).count(): Unit),
          "ivf:assign" -> (() =>
            graft.operators.Similarity.ivfAssigned(spark, sfDir).count(): Unit),
          "pq:codebook" -> (() =>
            graft.operators.Similarity.pqCodebook(spark, sfDir).count(): Unit),
          "pq:codes" -> (() =>
            graft.operators.Similarity.pqCodes(spark, sfDir).count(): Unit),
          "cc:edges" -> (() =>
            graft.operators.Curation.nearDupEdges(spark, sfDir).count(): Unit),
          "cc:minlabel" -> (() =>
            graft.operators.Curation.clusterLabels(spark, sfDir).count(): Unit),
          "cc:bigstar" -> (() =>
            graft.operators.Curation.bigStarCached(spark, sfDir).count(): Unit),
          "build:pca" -> (() =>
            graft.operators.Similarity.buildPca(spark, sfDir): Unit),
          "build:bpe_merges" -> (() =>
            graft.operators.TextAnalysis.buildBpeMerges(spark, sfDir): Unit))
        builds.foreach { case (k, f) =>
          println(f"R15PROF $k%-24s ${timed(f())}%8.3f s")
        }
        val names =
          if (args.length > 1) args(1).split(",").toSeq
          else Seq.empty
        names.foreach { n =>
          val fn = graft.SparkEntry.queries(n)
          val runs = (1 to iters).map(_ => timed(fn(spark, sfDir).count()))
          println(f"R15PROF $n%-24s ${runs.sorted.apply(runs.length / 2)}%8.3f s  " +
            runs.map(r => f"$r%.3f").mkString("[", ", ", "]"))
        }
    }
    spark.stop()
  }
}
