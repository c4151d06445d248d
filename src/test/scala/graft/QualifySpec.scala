package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.QualifyRewrite

/** Snowflake `QUALIFY` support (plans/QualifyRewrite.scala): the
  * literal clause through the extensions parser hook AND the
  * [[QualifyRewrite.sql]] library entry, checked against hand-written
  * window+filter plans; plus the containment contract — the rewrite
  * only ever fires on text Spark already rejected, and a failed rewrite
  * rethrows the ORIGINAL error.
  */
class QualifySpec extends SparkSpec {

  private def fixture(): Unit = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0),
      (4L, "b", 5.0), (5L, "b", 15.0), (6L, "b", 15.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("qf")
  }

  test("literal QUALIFY through spark.sql (extensions parser): top-1 per group matches the window+filter plan") {
    fixture()
    val got = spark.sql(
      """SELECT id, grp, v FROM qf
        |QUALIFY row_number() OVER (PARTITION BY grp
        |  ORDER BY v DESC, id) = 1
        |ORDER BY grp""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id"))
    val want = spark.table("qf")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy("grp").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    assert(got == want, s"got $got want $want")
  }

  test("QUALIFY composes: CTE prefix, GROUP BY block, DISTINCT hoists AFTER the filter, ORDER/LIMIT tail survives") {
    fixture()
    // CTE + aggregate block + tail: top group by total, limited
    val agg = spark.sql(
      """WITH base AS (SELECT grp, v FROM qf WHERE v > 0)
        |SELECT grp, sum(v) AS total FROM base GROUP BY grp
        |QUALIFY rank() OVER (ORDER BY sum(v) DESC) <= 1
        |ORDER BY grp LIMIT 5""".stripMargin).collect()
    assert(agg.map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("a", 60.0)), agg.mkString(","))
    // DISTINCT applies AFTER QUALIFY (Snowflake's evaluation order):
    // both b-rows with v=15 pass rank()=1 and collapse to ONE row
    val dist = spark.sql(
      """SELECT DISTINCT grp, v FROM qf
        |QUALIFY rank() OVER (PARTITION BY grp ORDER BY v DESC) = 1
        |  AND grp = 'b'""".stripMargin).collect()
    assert(dist.map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("b", 15.0)), dist.mkString(","))
  }

  test("QUALIFY containment: set operators and nested-only QUALIFY refuse with the ORIGINAL parse error; working queries never touch the rewrite") {
    fixture()
    // depth-0 UNION: per-branch QUALIFY semantics need a real parser —
    // the original Spark parse error must surface
    val union = intercept[Exception] {
      spark.sql("""SELECT id FROM qf QUALIFY row_number()
        OVER (ORDER BY id) = 1 UNION SELECT id FROM qf""").collect()
    }
    assert(union.getMessage.toUpperCase.contains("QUALIFY"),
      s"unexpected: ${union.getMessage}")
    // QUALIFY only inside a subquery (depth > 0): not rewritable at the
    // top level — original error again
    intercept[Exception] {
      spark.sql("""SELECT * FROM (SELECT id FROM qf
        QUALIFY row_number() OVER (ORDER BY id) = 1)""").collect()
    }
    // the word inside a string literal never triggers: this query is
    // VALID and must return the literal untouched
    assert(spark.sql("SELECT 'qualify me' AS s").head.getString(0)
      == "qualify me")
    // a backticked column named qualify parses with Spark itself — the
    // rewrite never runs on accepted text
    assert(spark.sql("SELECT 1 AS `qualify`").head.getInt(0) == 1)
  }

  test("QualifyRewrite.sql library entry works on any session and passes ordinary SQL through untouched") {
    fixture()
    val got = QualifyRewrite.sql(spark,
      """SELECT grp, id FROM qf
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY id) = 2
        |ORDER BY grp""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 5L)), got.toString)
    assert(QualifyRewrite.sql(spark, "SELECT count(*) AS n FROM qf")
      .head.getLong(0) == 6L)
    // rewrite() itself: no top-level QUALIFY → None
    assert(QualifyRewrite.rewrite("SELECT 1").isEmpty)
    assert(QualifyRewrite.rewrite(
      "SELECT '... QUALIFY ...' FROM t").isEmpty)
  }

  test("q_qualify plans a KEYED window (no single-partition funnel)") {
    val df = SparkEntry.queries("q_qualify")(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("SinglePartition"), p.take(2000))
    assert(df.count() > 0)
  }
}
