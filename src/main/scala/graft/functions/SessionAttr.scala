package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** `graft_session_attr('<key>')` — session-context governance, the
  * Snowflake `CURRENT_ROLE()` / session-variable shape for row policies
  * and masks (reference sql/07's ops views are per-client: "an analyst
  * sees only their own client" is the canonical policy, and it needs a
  * per-SESSION attribute the policy text can read).
  *
  * The attribute is an ordinary session conf under `graft.session.`:
  *
  * {{{
  *   spark.conf.set("graft.session.client", "ACME")
  *   ALTER TABLE t SET TBLPROPERTIES
  *     ('rowPolicy' = "client = graft_session_attr('client')")
  * }}}
  *
  * Resolution happens at ANALYSIS time on the driver: the builder folds
  * the conf value into a string literal (null when unset), so the
  * planted policy filter stays sargable — a per-session attribute
  * prunes generations exactly like a literal predicate, and executors
  * never need driver conf access. Two sessions differing only in the
  * attr get different plans over the same table, which is the point.
  */
object SessionAttr {

  val Name = "graft_session_attr"

  /** Conf namespace the function reads: `graft.session.<key>`. */
  val ConfPrefix = "graft.session."

  /** Analysis-time builder: literal key in, literal value out. */
  def builder(args: Seq[Expression]): Expression = {
    val key = args match {
      case Seq(Literal(s: UTF8String, StringType)) => s.toString
      case other => throw new IllegalArgumentException(
        s"$Name takes exactly one string-literal key, got $other")
    }
    SparkSession.active.conf.getOption(ConfPrefix + key) match {
      case Some(v) => Literal(UTF8String.fromString(v), StringType)
      case None => Literal(null, StringType)
    }
  }

  /** Session registration (idempotent) — the extension-less path; the
    * [[graft.GraftExtensions]] route injects the same builder.
    */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, FunctionIdentifier(Name), Name, builder)
}
