package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{MinHashSigExpr, SimHash64Expr, TopKAgg}

/** Session extensions: registers the engine's custom Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT graft_simhash64(text) ...")` works
  * anywhere DataFrame code does. Install via
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder
      ))
    }
    ext.injectOptimizerRule(_ => IntegralEpochMsRule)
    ext.injectOptimizerRule(_ => RowNumberToPickRule)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" -> ((args: Seq[Expression]) => SimHash64Expr(args.head)),
    "graft_minhash_sig" -> ((args: Seq[Expression]) => args match {
      case Seq(text) => MinHashSigExpr(text, 3, 32)
      case Seq(text, k, n) =>
        MinHashSigExpr(text, intArg(k, "shingle k"), intArg(n, "numHashes"))
      case _ => throw new IllegalArgumentException(
        "graft_minhash_sig(text[, k, numHashes])")
    }),
    "graft_top_k" -> ((args: Seq[Expression]) => args match {
      case Seq(item, k) => TopKAgg(item, intArg(k, "k")).toAggregateExpression()
      case Seq(item, k, Literal(rev: Boolean, _)) =>
        TopKAgg(item, intArg(k, "k"), reverse = rev).toAggregateExpression()
      case _ => throw new IllegalArgumentException("graft_top_k(item, k[, reverse])")
    })
  )

  /** Register on an already-constructed session (the withExtensions hook
    * only runs at session build time). Optimizer rules attach through the
    * public experimental hook.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
    Seq(IntegralEpochMsRule, RowNumberToPickRule).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
      }
    }
  }
}
