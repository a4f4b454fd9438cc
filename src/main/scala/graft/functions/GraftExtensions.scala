package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: injects the engine's native
  * expressions into every session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions`), so SQL users get them without calling
  * `GraftFunctions.register` imperatively. Both surfaces consume the same
  * `GraftFunctions.builders` list, so they cannot drift.
  *
  * This is the full extent of custom Catalyst surface the engine needs —
  * per SURVEY §4 no custom LogicalPlan/Strategy is warranted (every
  * operator is expressible with built-ins); the extension points used are
  * scalar Expressions only, all codegen'd.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}
