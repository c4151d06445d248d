package graft

/** Dev scratchpad: ad-hoc recall / parity / timing measurements. Not part
  * of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // stage-by-stage cost of the canonical build chain
    t("json_raw")(ingest.RawSynth.jsonRaw(spark, sf).count())
    t("csv_raw")(ingest.RawSynth.csvRaw(spark, sf).count())
    t("xml_raw")(ingest.RawSynth.xmlRaw(spark, sf).count())
    t("json_headers")(ingest.HeaderNormalizer.fromJson(
      ingest.RawSynth.jsonRaw(spark, sf)).count())
    t("csv_headers")(ingest.HeaderNormalizer.fromCsv(
      ingest.RawSynth.csvRaw(spark, sf)).count())
    t("xml_headers")(ingest.HeaderNormalizer.fromXml(
      ingest.RawSynth.xmlRaw(spark, sf)).count())
    val hdrs = ingest.HeaderNormalizer.fromJson(ingest.RawSynth.jsonRaw(spark, sf))
      .unionByName(ingest.HeaderNormalizer.fromXml(ingest.RawSynth.xmlRaw(spark, sf)),
        allowMissingColumns = true)
      .unionByName(ingest.HeaderNormalizer.fromCsv(ingest.RawSynth.csvRaw(spark, sf)),
        allowMissingColumns = true)
    t("hdr_union_nopersist")(hdrs.count())
    t("survivors_nopersist")(ingest.Canonicalizer.survivors(hdrs).count())
    val p = hdrs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("hdr_union_persist")(p.count())
    t("survivors_on_persisted")(ingest.Canonicalizer.survivors(p).count())
    t("full_build")(operators.Ingestion.buildCanonical(spark, sf))
    spark.stop()
  }
}
