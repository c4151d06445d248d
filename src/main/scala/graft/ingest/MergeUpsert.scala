package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent MERGE semantics (reference sql/05_merge_canonical.sql):
  * matched → source values win, not-matched → insert, unmatched target →
  * retained. Snapshot-functional formulation: one full-outer shuffle join on
  * the merge key produces the post-MERGE state — the scalable batch
  * equivalent of an in-place MERGE (and the body of the streaming
  * foreachBatch sink in graft.streaming).
  */
object MergeUpsert {

  /** Returns target-after-merge. Both inputs must share the schema;
    * `keys` identifies the merge grain. Adds `merge_action` ∈
    * {updated, inserted, retained}.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val t = target.select(struct(target.columns.map(col).toIndexedSeq: _*).as("t"))
      .select(keys.map(k => col(s"t.$k").as(k)) :+ col("t"): _*)
    val s = source.select(struct(source.columns.map(col).toIndexedSeq: _*).as("s"))
      .select(keys.map(k => col(s"s.$k").as(s"s_$k")) :+ col("s"): _*)
    val joinCond = keys.map(k => col(k) <=> col(s"s_$k")).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")
    val merged = coalesce(col("s"), col("t"))
    val action = when(col("s").isNotNull && col("t").isNotNull, "updated")
      .when(col("s").isNotNull, "inserted")
      .otherwise("retained")
    val cols = target.columns.map(c => merged.getField(c).as(c)).toIndexedSeq
    joined.select(cols :+ action.as("merge_action"): _*)
  }
}
