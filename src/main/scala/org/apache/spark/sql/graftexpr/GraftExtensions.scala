package org.apache.spark.sql
package graftexpr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the engine's native expressions to
  * SQL (SURVEY.md §4.3 — the extension-point route for custom operators):
  *
  *   spark.sql.extensions=org.apache.spark.sql.graftexpr.GraftExtensions
  *
  * registers `cosine_sim(array<float>, array<float>)` and
  * `jaccard_sim(array<bigint>, array<bigint>)` as codegen'd SQL functions,
  * usable from pure SQL alongside the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes 2 arguments")
        CosineSim(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaccard_sim takes 2 arguments")
        JaccardSim(children(0), children(1))
      }))
  }
}
