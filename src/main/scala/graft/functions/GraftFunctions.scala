package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/**
 * Registration of graft's native Catalyst expressions.
 *
 * Two public entry points:
 *  - cluster/deploy: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
 *    (the `SparkSessionExtensions.injectFunction` route)
 *  - programmatic: `GraftFunctions.register(spark)` — idempotent, used
 *    lazily by the ops that consume the expressions, so callers never
 *    need to pre-configure their session.
 */
object GraftFunctions {

  val CosineName = "graft_cosine"

  private def entry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier(CosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineName),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"$CosineName takes 2 arguments")
        CosineSimilarity(es(0), es(1))
      })

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(entry)

  /** Idempotent per-session registration into the function registry. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = entry
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(ident))
      reg.registerFunction(ident, info, builder)
  }

  /** Codegen cosine similarity column; requires `register`/`inject` on
    * the active session (the graft.ops call sites do this lazily). */
  def cosine(a: Column, b: Column): Column = call_function(CosineName, a, b)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
