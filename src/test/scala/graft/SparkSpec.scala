package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for specs: one shared local session per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.shared
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val shared: SparkSession = Engine.session("graft-test", 4)
}
