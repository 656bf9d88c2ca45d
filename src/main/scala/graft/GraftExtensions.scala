package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MaskJaccard, VecDotProduct}

/** Session-extension entry point: makes the native kernels available in any
  * session via configuration —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  *
  * — including pure-SQL sessions (spark-sql / thrift) where no Scala code
  * runs to call `VectorExpressions.register`. The operator library also
  * self-registers defensively, so either path works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDotProduct].getName, "graft_vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_vec_dot expects 2 arguments")
        VecDotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_mask_jaccard"),
      new ExpressionInfo(classOf[MaskJaccard].getName, "graft_mask_jaccard"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_mask_jaccard expects 2 arguments")
        MaskJaccard(exprs.head, exprs(1))
      }))
  }
}
