package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's custom expressions as
  * SQL functions — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * and `SELECT qdot(a, b)` works in spark.sql too (the Column API via
  * `QDot.qdot` needs no registration). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.qdotEntry)
    ext.injectOptimizerRule(_ => graft.plans.PushdownNanosTs)
  }
}

object GraftExtensions {
  private val qdotEntry = (
    new FunctionIdentifier("qdot"),
    new ExpressionInfo(classOf[QDotProduct].getName, "qdot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "qdot(arrayA, arrayB) takes two arguments")
      QDotProduct(args.head, args(1)): Expression
    })

  /** Register on an already-built session (the extensions config only
    * applies at session construction). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      qdotEntry._1, qdotEntry._2, qdotEntry._3)
}
