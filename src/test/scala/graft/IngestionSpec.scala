package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the ingestion/canonical pipeline (SURVEY §2.A):
  * every engineered defect class in RawSynth must surface through the
  * matching quality mechanism, exactly as the reference's anomaly matrix
  * does (sql/03/06).
  */
class IngestionSpec extends SparkSpec {
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("missing source ids fall back to the payload hash as canonical key") {
    // %97 orders omit the txn id; survivorship key = sha256 payload hash
    val fallback = run("canon_header")
      .filter(col("source_txn_id").rlike("^[0-9a-f]{64}$"))
    assert(fallback.count() > 0)
  }

  test("amount and timestamp defects surface as MISSING_REQUIRED / NEGATIVE_AMOUNT") {
    val codes = run("anomaly_header").select("anomaly_code").distinct()
      .collect().map(_.getString(0)).toSet
    assert(codes.contains("MISSING_REQUIRED")) // %101 "N/A" amounts
    assert(codes.contains("NEGATIVE_AMOUNT"))  // %89 negated amounts
    assert(codes.contains("DUPLICATE_TXN"))    // paired orderkeys
  }

  test("negative line quantities surface as NEGATIVE_QTY at the line grain") {
    val lineCodes = run("anomaly_line").select("anomaly_code").distinct()
      .collect().map(_.getString(0)).toSet
    assert(lineCodes.contains("NEGATIVE_QTY")) // lineitem %113
    val bad = run("anomaly_line").filter(col("line_number").isNull)
    assert(bad.count() == 0) // line anomalies always carry a line number
  }

  test("truncated payloads fail parsing and reach the load audit") {
    val audit = run("ing_load_audit")
    val withErrors = audit.filter(col("errors_seen") > 0)
    assert(withErrors.count() > 0) // %103 truncation
    val statuses = audit.select("load_status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses.contains("PARTIALLY_LOADED"))
    // parsed = loaded + errors, per file
    assert(audit.filter(col("rows_parsed") =!=
      col("rows_loaded") + col("errors_seen")).count() == 0)
  }

  test("survivorship keeps exactly one row per canonical key, latest wins") {
    val h = run("canon_header")
    assert(h.groupBy("canonical_txn_id").count().filter(col("count") > 1)
      .count() == 0)
    // every duplicated key reports dup_cnt > 1 on its survivor
    assert(h.filter(col("dup_cnt") > 1).count() > 0)
  }

  test("merge_upsert labels actions consistently with key overlap") {
    val m = run("merge_upsert").collect()
    val actions = m.groupBy(_.getAs[String]("merge_action")).map {
      case (k, v) => k -> v.length
    }
    assert(actions.keySet == Set("updated", "inserted", "retained"))
    // updated rows carry the source version
    m.filter(_.getAs[String]("merge_action") == "updated")
      .foreach(r => assert(r.getAs[String]("version") == "v2"))
    m.filter(_.getAs[String]("merge_action") == "retained")
      .foreach(r => assert(r.getAs[String]("version") == "v1"))
  }

  test("XML branch parses fields and surfaces the engineered defect matrix") {
    val x = run("ing_xml_normalize")
    // %103: truncated documents are structurally corrupt — and ONLY those
    assert(x.filter(!col("parse_ok") && col("src_row_number") % 103 =!= 0)
      .count() == 0)
    assert(x.filter(!col("parse_ok")).count() ==
      x.filter(col("src_row_number") % 103 === 0).count())
    // %97: id attribute omitted → null source_txn_id (hash-fallback key)
    assert(x.filter(col("parse_ok") && col("source_txn_id").isNull &&
      col("src_row_number") % 97 =!= 0).count() == 0)
    // %101: "N/A" amount survives parse but try_casts to null
    assert(x.filter(col("parse_ok") && col("total_amount").isNull &&
      col("src_row_number") % 101 =!= 0).count() == 0)
    // clean rows parse completely
    assert(x.filter(col("parse_ok") && col("src_row_number") % 97 =!= 0 &&
      col("src_row_number") % 101 =!= 0)
      .filter(col("source_txn_id").isNull || col("txn_timestamp").isNull ||
        col("total_amount").isNull || col("currency").isNull ||
        col("account_id").isNull || col("merchant").isNull)
      .count() == 0)
    // lowercase raw currencies were uppercased
    assert(x.filter(col("currency") =!= upper(col("currency"))).count() == 0)
  }

  test("canonical model integrates all three source systems") {
    val srcs = run("canon_header").select("source_system").distinct()
      .collect().map(_.getString(0)).toSet
    assert(srcs == Set("JSON", "XML", "CSV"))
    // cross-source survivorship: some surviving keys report dup_cnt > 1
    // with duplicates arriving through different formats (pair spans mod-3)
    val lineSrcs = run("canon_lines").selectExpr(
      "get_json_object(attributes, '$.source_format') AS f")
      .distinct().collect().map(_.getString(0)).toSet
    assert(lineSrcs == Set("JSON", "XML", "CSV"))
  }

  test("attributes retains the raw payload on the canonical header grain") {
    val h = run("canon_header").selectExpr("source_system",
      "get_json_object(attributes, '$.source_format') AS fmt",
      "get_json_object(attributes, '$.raw_payload') AS raw",
      "get_json_object(attributes, '$.csv_payload') AS craw")
    // source_format matches the branch; the raw payload rides along
    assert(h.filter(col("source_system") =!= col("fmt")).count() == 0)
    assert(h.filter(col("source_system") =!= "CSV" && col("raw").isNull)
      .count() == 0)
    assert(h.filter(col("source_system") === "CSV" && col("craw").isNull)
      .count() == 0)
  }

  test("typed canonical Datasets expose the same grains as the DataFrames") {
    val txns = operators.Ingestion.canTxn(spark, sf)
    assert(txns.count() == run("canon_header").count())
    val v = txns.filter(_.is_valid).head()
    assert(v.canonical_txn_id.length == 64 && v.anomaly_codes.isEmpty)
    assert(operators.Ingestion.canTxnLines(spark, sf).count() ==
      run("canon_lines").count())
    val an = operators.Ingestion.canTxnAnomalies(spark, sf)
    assert(an.count() ==
      run("anomaly_header").count() + run("anomaly_line").count())
    // header-grain anomalies carry no line number; line-grain always do
    assert(an.filter(_.line_number.isEmpty).count() ==
      run("anomaly_header").count())
  }

  test("canonical ids are deterministic across independent runs") {
    val a = run("canon_header").select("canonical_txn_id").collect().map(_.getString(0))
    val b = run("canon_header").select("canonical_txn_id").collect().map(_.getString(0))
    assert(a.sameElements(b))
  }

  test("file-based ingestion parses identically to the in-memory raw batches") {
    import java.nio.file.{Files, Paths}
    // write the synthesized JSON payloads out as real JSONL client files
    val raw = ingest.RawSynth.jsonRaw(spark, sf)
      .select("src_file", "src_row_number", "payload")
      .collect()
    val dir = Files.createTempDirectory("graft_files")
    raw.groupBy(_.getString(0)).foreach { case (srcFile, rows) =>
      val name = srcFile.replace('/', '_')
      val lines = rows.sortBy(_.getLong(1))
        .map(r => Option(r.getString(2)).getOrElse("")).mkString("\n")
      Files.write(Paths.get(dir.toString, name), lines.getBytes("UTF-8"))
      ()
    }
    // the real-file staging rows must carry exactly the contract schema
    // emptyLines mirrors (names + types; nullability differs benignly —
    // file metadata is non-null by construction) — the drift guard for
    // the empty-directory path
    assert(sources.FileIngest.jsonLines(spark, dir.toString).schema
      .map(f => (f.name, f.dataType))
      == sources.FileIngest.stagingSchema.map(f => (f.name, f.dataType)))
    val fromFiles = ingest.HeaderNormalizer.fromJson(
      sources.FileIngest.jsonLines(spark, dir.toString))
    val inMemory = ingest.HeaderNormalizer.fromJson(
      ingest.RawSynth.jsonRaw(spark, sf))
    // compare every parsed business field (file/row/ts provenance differs
    // by construction: files carry their own positions and mtimes)
    val cols = Seq("client_id", "source_txn_id", "txn_timestamp", "currency",
      "total_amount", "customer_id", "account_id", "merchant",
      "payload_hash", "parse_ok")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.head, cols.tail: _*).collect()
        .map(_.toString).sorted.toSeq
    assert(key(fromFiles) == key(inMemory) && fromFiles.count() > 0)
  }

  test("incremental ingest skips already-loaded files (COPY re-run semantics)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_ledger")
    Files.write(Paths.get(dir.toString, "client_1_a.jsonl"),
      "{\"transaction_id\":\"T1\"}\n{\"transaction_id\":\"T2\"}".getBytes("UTF-8"))
    Files.write(Paths.get(dir.toString, "client_1_b.jsonl"),
      "{\"transaction_id\":\"T3\"}".getBytes("UTF-8"))
    val ledger = new java.io.File(dir.toFile, "_loaded_ledger")

    // first run: everything is new
    val first = sources.FileIngest.incremental(spark, dir.toString, "JSON", ledger)
    assert(first.rows.count() == 3 && first.newFiles.size == 2 &&
      first.skippedFiles.isEmpty)
    sources.FileIngest.commitLoaded(ledger, first.newFiles)

    // re-run over the same directory: 0 new rows, every file skipped, and
    // the audit records the skips
    val second = sources.FileIngest.incremental(spark, dir.toString, "JSON", ledger)
    assert(second.rows.count() == 0 && second.newFiles.isEmpty &&
      second.skippedFiles.sorted == first.newFiles.sorted)
    val audit = sources.LoadAudit.auditWithSkips(
      ingest.HeaderNormalizer.fromJson(second.rows),
      second.skippedFiles.map(_ -> "JSON")).collect()
    assert(audit.length == 2 &&
      audit.forall(_.getAs[String]("load_status") == "SKIPPED_ALREADY_LOADED"))

    // a file landing later is picked up without re-reading the old ones
    Files.write(Paths.get(dir.toString, "client_1_c.jsonl"),
      "{\"transaction_id\":\"T4\"}".getBytes("UTF-8"))
    val third = sources.FileIngest.incremental(spark, dir.toString, "JSON", ledger)
    assert(third.rows.count() == 1 &&
      third.newFiles == Seq("client_1_c.jsonl") &&
      third.skippedFiles.size == 2)
  }

  test("Views registers the SQL surface: canonical model and operators query via spark.sql") {
    Views.register(spark, sf)
    // canonical model through SQL == the typed Dataset surface
    val viaSql = spark.sql(
      "SELECT count(*) AS n, count(DISTINCT canonical_txn_id) AS k FROM graft_can_txn")
      .collect()(0)
    val ds = operators.Ingestion.canTxn(spark, sf)
    assert(viaSql.getAs[Long]("n") == ds.count())
    assert(viaSql.getAs[Long]("k") ==
      ds.select("canonical_txn_id").distinct().count())
    // cross-view SQL join: headers x their line items
    val joined = spark.sql(
      """SELECT count(*) AS n FROM graft_can_txn h
        |JOIN graft_can_txn_line l ON h.canonical_txn_id = l.canonical_txn_id"""
        .stripMargin).collect()(0).getAs[Long]("n")
    assert(joined > 0)
    // any operator result on demand
    Views.registerQuery(spark, sf, "q1_agg")
    val opRows = spark.sql("SELECT * FROM graft_q1_agg").collect().map(_.toString)
    assert(opRows.sameElements(SparkEntry.queries("q1_agg")(spark, sf)
      .collect().map(_.toString)))
  }
}
