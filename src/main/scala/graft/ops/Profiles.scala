package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.7 strings — keyword-containment profile classifier.
  *
  * Reference semantics (app/utils.py:16-30): lowercase the name, walk an
  * ordered keyword→profile rule list, first containment wins, fall back
  * to a default profile. Used to pick synthetic-traffic parameters per
  * camera location.
  *
  * Spark form: a single `when` cascade over `lower(col).contains(...)` —
  * one codegen'd projection, no shuffle, applied at scan speed. Rule
  * order is semantic (first match wins), exactly as in the reference.
  */
object Profiles {

  /** Ordered rules: (profile, keywords). First profile whose any-keyword
    * matches wins. */
  def classify(c: Column, rules: Seq[(String, Seq[String])],
               default: String): Column = {
    val lc = lower(c)
    rules.foldLeft(Option.empty[Column]) { case (acc, (profile, kws)) =>
      val hit = kws.map(k => lc.contains(lit(k))).reduce(_ || _)
      Some(acc.fold(when(hit, lit(profile)))(_.when(hit, lit(profile))))
    }.map(_.otherwise(lit(default))).getOrElse(lit(default))
  }

  /** Profile distribution per group — counts per (group, profile). */
  def distribution(df: DataFrame, textCol: String, groupCol: String,
                   rules: Seq[(String, Seq[String])],
                   default: String): DataFrame =
    df.withColumn("profile", classify(col(textCol), rules, default))
      .groupBy(col(groupCol), col("profile"))
      .agg(count(lit(1)).as("n"))
      .orderBy(groupCol, "profile")
}
