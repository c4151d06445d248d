package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test schema
  * (`/root/testdata/sf*`). Column pruning + predicate pushdown are left to
  * Catalyst — callers `.select` the columns they need and the parquet scan
  * reads only those (verified in PlanSpec).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw long nanos (legacy conf) and convert to
    * a microsecond timestamp with exact integer division (`DIV` — a double
    * divide would lose precision at ~1.7e18 ns). Matches the DuckDB oracle's
    * `cast(ts as timestamp)` truncation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // sessions built by Engine/Verify/Bench set this at construction; only
    // patch sessions that missed it (avoids re-mutating shared config on
    // every call, which could race concurrently-planned reads)
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
