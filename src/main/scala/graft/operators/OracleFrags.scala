package graft.operators

/** DuckDB CTE fragments that rebuild RawSynth's payloads byte-for-byte and
  * re-derive the canonical pipeline, so the driver's oracle hash-compares
  * the whole ingestion surface. Keep in lockstep with graft.ingest.RawSynth /
  * HeaderNormalizer / Canonicalizer — any change there changes payload
  * hashes here.
  *
  * DuckDB has no XML parser, but it doesn't need one: the XML payloads are
  * deterministic string concats, so `xml_raw` rebuilds the same bytes (for
  * sha2 payload hashes and `attributes`) while `xhdr` derives the expected
  * parsed fields straight from `orders` ground truth.
  */
object OracleFrags {

  /** JSON string literal: null → unquoted null, else quoted (payload values
    * contain no quotes/backslashes/control chars, so no escaping needed).
    */
  private def jstr(x: String): String =
    s"CASE WHEN $x IS NULL THEN 'null' ELSE '\"' || $x || '\"' END"

  /** Line-grain `attributes` (LineFlattener: to_json of the normalized
    * post-cast snapshot, ignoreNullFields=false → explicit nulls, struct
    * order), rebuilt over lines_base's own canonical columns.
    */
  private val lineAttrs: String = Seq(
    s"""'{"raw_line":{"line_number":' || ${jstr("cast(line_number AS varchar)")}""",
    s"""',"line_txn_id":' || ${jstr("line_txn_id")}""",
    s"""',"item_id":' || ${jstr("item_id")}""",
    s"""',"description":' || ${jstr("description")}""",
    s"""',"quantity":' || ${jstr("cast(quantity AS varchar)")}""",
    s"""',"unit_price":' || ${jstr("cast(unit_price AS varchar)")}""",
    s"""',"line_amount":' || ${jstr("cast(line_amount AS varchar)")}""",
    """'},"source_format":"' || source_system || '"}'""").mkString(" || ")

  /** lpos/ljson/lxml → json_raw/xml_raw, l1 → csv_raw,
    * jhdr/xhdr/chdr → hdr → canon → surv.
    */
  val synthCtes: String =
    """lpos AS (
      |  SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS pos,
      |    l_orderkey % 2 = 0 AS v0
      |  FROM lineitem),
      |lobj AS (
      |  SELECT *, '{' || concat_ws(',',
      |    CASE WHEN pos % 4 <> 0 THEN '"line_number":' || cast(pos AS varchar) END,
      |    (CASE WHEN v0 THEN '"item_id":"ITEM' ELSE '"sku":"ITEM' END)
      |      || cast(l_partkey AS varchar) || '"',
      |    (CASE WHEN v0 THEN '"description":"part ' ELSE '"item_name":"part ' END)
      |      || cast(l_partkey AS varchar) || '"',
      |    (CASE WHEN v0 THEN '"quantity":' ELSE '"qty":' END)
      |      || (CASE WHEN l_partkey % 113 = 0 THEN '-' ELSE '' END)
      |      || cast(cast(l_quantity AS decimal(18,2)) AS varchar),
      |    (CASE WHEN v0 THEN '"unit_price":' ELSE '"price":' END)
      |      || cast(cast(l_extendedprice AS decimal(18,2)) AS varchar),
      |    (CASE WHEN v0 THEN '"line_amount":' ELSE '"amount":' END)
      |      || cast(cast(l_extendedprice AS decimal(18,2))
      |              * (1 - cast(l_discount AS decimal(4,2))) AS varchar)
      |  ) || '}' AS obj FROM lpos),
      |ljson AS (
      |  SELECT l_orderkey, string_agg(obj, ',' ORDER BY pos) AS lines_json
      |  FROM lobj GROUP BY l_orderkey),
      |lxobj AS (
      |  SELECT l_orderkey, pos,
      |    '<line item_id="ITEM' || cast(l_partkey AS varchar)
      |    || '" description="part ' || cast(l_partkey AS varchar)
      |    || '" quantity="'
      |    || (CASE WHEN l_partkey % 113 = 0 THEN '-' ELSE '' END)
      |    || cast(cast(l_quantity AS decimal(18,2)) AS varchar)
      |    || '" unit_price="' || cast(cast(l_extendedprice AS decimal(18,2)) AS varchar)
      |    || '" line_amount="' || cast(cast(l_extendedprice AS decimal(18,2))
      |         * (1 - cast(l_discount AS decimal(4,2))) AS varchar)
      |    || '"/>' AS obj FROM lpos),
      |lxml AS (
      |  SELECT l_orderkey, string_agg(obj, '' ORDER BY pos) AS lines_xml
      |  FROM lxobj GROUP BY l_orderkey),
      |l1 AS (SELECT * FROM lpos WHERE pos = 1),
      |jbase AS (
      |  SELECT o.*, (o_orderkey % 2 = 0) AS v0, o_orderkey // 2 AS pair,
      |    CASE WHEN o_custkey % 3 = 0 THEN 'USD'
      |         WHEN o_custkey % 3 = 1 THEN 'EUR' ELSE 'GBP' END AS ccy0
      |  FROM orders o),
      |jbase2 AS (
      |  SELECT *, CASE WHEN o_orderkey % 7 = 0 THEN lower(ccy0) ELSE ccy0 END AS ccy_raw,
      |    'C' || cast(pair % 3 AS varchar) AS client_id,
      |    o_orderdate + (o_orderkey % 5) * INTERVAL 1 DAY AS ingest_ts,
      |    CASE WHEN o_orderkey % 101 = 0 THEN 'N/A'
      |         WHEN o_orderkey % 89 = 0 THEN '-' || cast(cast(o_totalprice AS decimal(18,2)) AS varchar)
      |         ELSE cast(cast(o_totalprice AS decimal(18,2)) AS varchar) END AS amt_str
      |  FROM jbase),
      |json_raw AS (
      |  SELECT src_row_number, client_id, src_file, ingest_ts, file_type,
      |    CASE WHEN src_row_number % 103 = 0 THEN substr(p, 1, 20) ELSE p END AS payload
      |  FROM (
      |    SELECT o_orderkey AS src_row_number, client_id,
      |      'client_' || cast(pair % 3 AS varchar) || '/json/batch_'
      |        || cast(o_orderkey % 10 AS varchar) || '.json' AS src_file,
      |      ingest_ts, 'JSON' AS file_type,
      |      '{' || concat_ws(',',
      |        CASE WHEN o_orderkey % 97 = 0 THEN NULL
      |             WHEN v0 THEN '"transaction_id":"TXN' || cast(pair AS varchar) || '"'
      |             ELSE '"txn_id":"TXN' || cast(pair AS varchar) || '"' END,
      |        (CASE WHEN v0 THEN '"transaction_ts":"' ELSE '"timestamp":"' END)
      |          || cast(o_orderdate AS varchar) || '"',
      |        (CASE WHEN v0 THEN '"currency":"' ELSE '"ccy":"' END) || ccy_raw || '"',
      |        (CASE WHEN v0 THEN '"total_amount":' ELSE '"amount":' END)
      |          || CASE WHEN o_orderkey % 101 = 0 THEN '"N/A"' ELSE amt_str END,
      |        (CASE WHEN v0 THEN '"customer_id":"CUST' ELSE '"customerId":"CUST' END)
      |          || cast(o_custkey AS varchar) || '"',
      |        CASE WHEN v0 THEN '"account_id":"ACC' || cast(o_custkey AS varchar) || '"' END,
      |        (CASE WHEN v0 THEN '"merchant":"M' ELSE '"payee":"M' END)
      |          || cast(o_custkey % 50 AS varchar) || '"',
      |        CASE WHEN lines_json IS NOT NULL
      |             THEN '"line_items":[' || lines_json || ']' END
      |      ) || '}' AS p
      |    FROM jbase2 LEFT JOIN ljson ON l_orderkey = o_orderkey
      |    WHERE o_orderkey % 3 = 0)),
      |xml_raw AS (
      |  SELECT src_row_number, client_id, src_file, ingest_ts, file_type,
      |    CASE WHEN src_row_number % 103 = 0 THEN substr(p, 1, 20) ELSE p END AS payload,
      |    pair, ccy_raw, amt_str, o_orderdate, o_custkey
      |  FROM (
      |    SELECT o_orderkey AS src_row_number, client_id,
      |      'client_' || cast(pair % 3 AS varchar) || '/xml/batch_'
      |        || cast(o_orderkey % 10 AS varchar) || '.xml' AS src_file,
      |      ingest_ts, 'XML' AS file_type,
      |      pair, ccy_raw, amt_str, o_orderdate, o_custkey,
      |      '<txn '
      |        || CASE WHEN o_orderkey % 97 = 0 THEN ''
      |                ELSE 'transaction_id="TXN' || cast(pair AS varchar) || '" ' END
      |        || 'transaction_ts="' || cast(o_orderdate AS varchar)
      |        || '" currency="' || ccy_raw
      |        || '" total_amount="' || amt_str
      |        || '" customer_id="CUST' || cast(o_custkey AS varchar)
      |        || '" account_id="ACC' || cast(o_custkey AS varchar)
      |        || '" merchant="M' || cast(o_custkey % 50 AS varchar)
      |        || '">' || coalesce(lines_xml, '') || '</txn>' AS p
      |    FROM jbase2 LEFT JOIN lxml ON l_orderkey = o_orderkey
      |    WHERE o_orderkey % 3 = 1)),
      |csv_raw AS (
      |  SELECT src_row_number, client_id, src_file, ingest_ts, file_type,
      |    CASE WHEN src_row_number % 103 = 0 THEN f[1:5] ELSE f END AS payload
      |  FROM (
      |    SELECT o_orderkey AS src_row_number, client_id,
      |      'client_' || cast(pair % 3 AS varchar) || '/csv/transactions_'
      |        || cast(o_orderkey % 4 AS varchar) || '.csv' AS src_file,
      |      ingest_ts, 'CSV' AS file_type,
      |      [CASE WHEN o_orderkey % 97 = 0 THEN '' ELSE 'TXN' || cast(pair AS varchar) END,
      |       cast(o_orderdate AS varchar),
      |       ccy_raw,
      |       amt_str,
      |       'CUST' || cast(o_custkey AS varchar),
      |       'ACC' || cast(o_custkey AS varchar),
      |       'M' || cast(o_custkey % 50 AS varchar),
      |       coalesce('ITEM' || cast(l_partkey AS varchar), ''),
      |       coalesce('part ' || cast(l_partkey AS varchar), ''),
      |       coalesce((CASE WHEN l_partkey % 113 = 0 THEN '-' ELSE '' END)
      |         || cast(cast(l_quantity AS decimal(18,2)) AS varchar), ''),
      |       coalesce(cast(cast(l_extendedprice AS decimal(18,2)) AS varchar), ''),
      |       coalesce(cast(cast(l_extendedprice AS decimal(18,2))
      |         * (1 - cast(l_discount AS decimal(4,2))) AS varchar), '')
      |      ] AS f
      |    FROM jbase2 LEFT JOIN l1 ON l1.l_orderkey = o_orderkey
      |    WHERE o_orderkey % 3 = 2)),
      |jhdr AS (
      |  SELECT client_id, 'JSON' AS source_system,
      |    CASE WHEN json_valid(payload) THEN coalesce(
      |      json_extract_string(payload,'$.transaction_id'),
      |      json_extract_string(payload,'$.txn_id'),
      |      json_extract_string(payload,'$.id')) END AS source_txn_id,
      |    CASE WHEN json_valid(payload) THEN try_cast(coalesce(
      |      json_extract_string(payload,'$.transaction_ts'),
      |      json_extract_string(payload,'$.transaction_time'),
      |      json_extract_string(payload,'$.timestamp'),
      |      json_extract_string(payload,'$.txn_timestamp')) AS timestamp) END AS txn_timestamp,
      |    CASE WHEN json_valid(payload) THEN upper(coalesce(
      |      json_extract_string(payload,'$.currency'),
      |      json_extract_string(payload,'$.ccy'))) END AS currency,
      |    CASE WHEN json_valid(payload) THEN try_cast(coalesce(
      |      json_extract_string(payload,'$.total_amount'),
      |      json_extract_string(payload,'$.amount'),
      |      json_extract_string(payload,'$.total')) AS decimal(18,2)) END AS total_amount,
      |    CASE WHEN json_valid(payload) THEN coalesce(
      |      json_extract_string(payload,'$.customer_id'),
      |      json_extract_string(payload,'$.customerId')) END AS customer_id,
      |    CASE WHEN json_valid(payload) THEN coalesce(
      |      json_extract_string(payload,'$.account_id'),
      |      json_extract_string(payload,'$.accountId')) END AS account_id,
      |    CASE WHEN json_valid(payload) THEN coalesce(
      |      json_extract_string(payload,'$.merchant'),
      |      json_extract_string(payload,'$.payee')) END AS merchant,
      |    src_file, src_row_number, ingest_ts,
      |    sha256(payload) AS payload_hash,
      |    json_valid(payload) AS parse_ok,
      |    CASE WHEN NOT json_valid(payload)
      |         THEN 'malformed JSON: ' || substr(payload, 1, 48) END
      |      AS parse_error, file_type,
      |    '{"raw_payload":"' || replace(payload, '"', '\"')
      |      || '","source_format":"JSON"}' AS attributes
      |  FROM json_raw),
      |xhdr AS (
      |  SELECT client_id, 'XML' AS source_system,
      |    CASE WHEN src_row_number % 103 <> 0 AND src_row_number % 97 <> 0
      |         THEN 'TXN' || cast(pair AS varchar) END AS source_txn_id,
      |    CASE WHEN src_row_number % 103 <> 0
      |         THEN try_cast(cast(o_orderdate AS varchar) AS timestamp) END AS txn_timestamp,
      |    CASE WHEN src_row_number % 103 <> 0 THEN upper(ccy_raw) END AS currency,
      |    CASE WHEN src_row_number % 103 <> 0
      |         THEN try_cast(amt_str AS decimal(18,2)) END AS total_amount,
      |    CASE WHEN src_row_number % 103 <> 0
      |         THEN 'CUST' || cast(o_custkey AS varchar) END AS customer_id,
      |    CASE WHEN src_row_number % 103 <> 0
      |         THEN 'ACC' || cast(o_custkey AS varchar) END AS account_id,
      |    CASE WHEN src_row_number % 103 <> 0
      |         THEN 'M' || cast(o_custkey % 50 AS varchar) END AS merchant,
      |    src_file, src_row_number, ingest_ts,
      |    sha256(payload) AS payload_hash,
      |    src_row_number % 103 <> 0 AS parse_ok,
      |    CASE WHEN src_row_number % 103 = 0
      |         THEN 'malformed XML: ' || substr(payload, 1, 48) END
      |      AS parse_error, file_type,
      |    '{"raw_payload":"' || replace(payload, '"', '\"')
      |      || '","source_format":"XML"}' AS attributes
      |  FROM xml_raw),
      |chdr AS (
      |  SELECT client_id, 'CSV' AS source_system,
      |    nullif(payload[1], '') AS source_txn_id,
      |    try_cast(nullif(payload[2], '') AS timestamp) AS txn_timestamp,
      |    upper(nullif(payload[3], '')) AS currency,
      |    try_cast(nullif(payload[4], '') AS decimal(18,2)) AS total_amount,
      |    nullif(payload[5], '') AS customer_id,
      |    nullif(payload[6], '') AS account_id,
      |    nullif(payload[7], '') AS merchant,
      |    src_file, src_row_number, ingest_ts,
      |    sha256(array_to_string(payload, '|')) AS payload_hash,
      |    len(payload) = 12 AS parse_ok,
      |    CASE WHEN len(payload) <> 12
      |         THEN 'expected 12 fields, got ' || cast(len(payload) as varchar) END
      |      AS parse_error, file_type,
      |    '{"csv_payload":["' || array_to_string(payload, '","')
      |      || '"],"source_format":"CSV"}' AS attributes
      |  FROM csv_raw),
      |hdr AS (SELECT * FROM jhdr UNION ALL SELECT * FROM xhdr
      |        UNION ALL SELECT * FROM chdr),
      |canon AS (
      |  SELECT *,
      |    coalesce(source_txn_id, payload_hash) AS eff_txn_id,
      |    sha256(client_id || '|' || coalesce(source_txn_id, payload_hash)) AS canonical_txn_id,
      |    row_number() OVER (PARTITION BY client_id, source_txn_id
      |      ORDER BY ingest_ts DESC, src_row_number DESC) AS rn,
      |    count(*) OVER (PARTITION BY client_id, source_txn_id) AS dup_cnt
      |  FROM hdr),
      |canon2 AS (
      |  SELECT *,
      |    concat_ws(',',
      |      CASE WHEN dup_cnt > 1 THEN 'DUPLICATE_TXN' END,
      |      CASE WHEN txn_timestamp IS NULL OR total_amount IS NULL THEN 'MISSING_REQUIRED' END,
      |      CASE WHEN total_amount < 0 THEN 'NEGATIVE_AMOUNT' END) AS anomaly_codes,
      |    (dup_cnt = 1 AND txn_timestamp IS NOT NULL AND total_amount IS NOT NULL
      |      AND NOT (total_amount < 0)) AS is_valid
      |  FROM canon),
      |surv AS (SELECT * FROM canon2 WHERE rn = 1)""".stripMargin

  /** Canonical line grain rebuilt from ground truth for the survivors. */
  val linesCtes: String =
    s"""jlines AS (
      |  SELECT s.canonical_txn_id, s.client_id, s.source_system,
      |    cast(p.pos AS int) AS line_number,
      |    cast(NULL AS varchar) AS line_txn_id,
      |    'ITEM' || cast(p.l_partkey AS varchar) AS item_id,
      |    'part ' || cast(p.l_partkey AS varchar) AS description,
      |    CASE WHEN p.l_partkey % 113 = 0 THEN -cast(p.l_quantity AS decimal(18,2))
      |         ELSE cast(p.l_quantity AS decimal(18,2)) END AS quantity,
      |    cast(p.l_extendedprice AS decimal(18,2)) AS unit_price,
      |    cast(p.l_extendedprice AS decimal(18,2))
      |      * (1 - cast(p.l_discount AS decimal(4,2))) AS line_amount,
      |    s.currency, s.src_file
      |  FROM surv s JOIN lpos p ON p.l_orderkey = s.src_row_number
      |  WHERE s.source_system = 'JSON' AND s.parse_ok),
      |xlines AS (
      |  SELECT s.canonical_txn_id, s.client_id, s.source_system,
      |    cast(p.pos AS int) AS line_number,
      |    cast(NULL AS varchar) AS line_txn_id,
      |    'ITEM' || cast(p.l_partkey AS varchar) AS item_id,
      |    'part ' || cast(p.l_partkey AS varchar) AS description,
      |    CASE WHEN p.l_partkey % 113 = 0 THEN -cast(p.l_quantity AS decimal(18,2))
      |         ELSE cast(p.l_quantity AS decimal(18,2)) END AS quantity,
      |    cast(p.l_extendedprice AS decimal(18,2)) AS unit_price,
      |    cast(p.l_extendedprice AS decimal(18,2))
      |      * (1 - cast(p.l_discount AS decimal(4,2))) AS line_amount,
      |    s.currency, s.src_file
      |  FROM surv s JOIN lpos p ON p.l_orderkey = s.src_row_number
      |  WHERE s.source_system = 'XML' AND s.parse_ok),
      |clines AS (
      |  SELECT s.canonical_txn_id, s.client_id, s.source_system,
      |    cast(1 AS int) AS line_number,
      |    cast(NULL AS varchar) AS line_txn_id,
      |    'ITEM' || cast(p.l_partkey AS varchar) AS item_id,
      |    'part ' || cast(p.l_partkey AS varchar) AS description,
      |    CASE WHEN p.l_partkey % 113 = 0 THEN -cast(p.l_quantity AS decimal(18,2))
      |         ELSE cast(p.l_quantity AS decimal(18,2)) END AS quantity,
      |    cast(p.l_extendedprice AS decimal(18,2)) AS unit_price,
      |    cast(p.l_extendedprice AS decimal(18,2))
      |      * (1 - cast(p.l_discount AS decimal(4,2))) AS line_amount,
      |    s.currency, s.src_file
      |  FROM surv s JOIN l1 p ON p.l_orderkey = s.src_row_number
      |  WHERE s.source_system = 'CSV' AND s.parse_ok),
      |lines_base AS (SELECT * FROM jlines UNION ALL SELECT * FROM xlines
      |               UNION ALL SELECT * FROM clines),
      |lines_all AS (SELECT *, $lineAttrs AS attributes FROM lines_base)""".stripMargin
}
