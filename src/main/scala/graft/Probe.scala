package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad: cross-engine parity / parser behavior checks. Not part
  * of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    import spark.implicits._
    val df = Seq(
      """{"a":12.50,"b":"x","n":5}""",      // number into string field?
      """{"a":"N/A","b":"y","n":"bad"}""",  // bad value into long field?
      """{"a":1,"b":"z"""                   // truncated
    ).toDF("payload")
    df.select(
      col("payload"),
      from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "a string, b string, n long, _corrupt string"),
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("p"),
      get_json_object(col("payload"), "$").isNotNull.as("gjo_ok"),
      get_json_object(col("payload"), "$.a").as("gjo_a")
    ).select("payload", "p.a", "p.b", "p.n", "p._corrupt", "gjo_ok", "gjo_a")
      .show(false)
    spark.stop()
  }
}
