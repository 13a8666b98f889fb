package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The supported extension point for the engine's custom expressions:
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) registers them for
  * SQL text, so `SELECT graft_dot(a, b)` works alongside the Column
  * API (`VectorOps.dot`). Sessions created without the extension still
  * run every `SparkEntry` query — the query builders bind expressions
  * through the Column API and never require the SQL registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2 && args(1).foldable,
          "graft_minhash(shingles, k) with literal k")
        MinHashSignature(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }))
  }
}
