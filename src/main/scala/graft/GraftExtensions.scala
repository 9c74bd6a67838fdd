package graft

import graft.functions.{CosineSimilarity, DotProduct, L2Distance}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extension injector for the engine's custom Catalyst surface —
 * the supported way to ship native expressions with a library
 * (`spark.sql.extensions=graft.GraftExtensions`, or
 * `SparkSession.builder.withExtensions(new GraftExtensions)`), instead of
 * per-session registry mutation (VectorFns.register remains as the
 * programmatic fallback).
 *
 * The injected surface is deliberately tiny (SURVEY §4): three codegen'd
 * vector similarity expressions; everything else in the engine is
 * composition of Spark built-ins.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "cosine_sim", "cosine similarity of two float vectors",
      es => CosineSimilarity(es.head, es(1)))
    inject(ext, "dot_product", "dot product of two float vectors",
      es => DotProduct(es.head, es(1)))
    inject(ext, "l2_dist", "euclidean distance of two float vectors",
      es => L2Distance(es.head, es(1)))
  }

  private def inject(ext: SparkSessionExtensions, name: String, usage: String,
                     builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage), builder))
}
