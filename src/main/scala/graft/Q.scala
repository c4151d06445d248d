package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: the Spark
  * implementation plus (when SQL-expressible) the equivalent DuckDB oracle
  * SQL the driver hash-compares against. `oracle = None` → rows-only check;
  * those operators get dedicated ScalaTest coverage instead.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): Q =
    Q(fn, Some(oracle))
}
