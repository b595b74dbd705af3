package graft

import graft.functions.{CmsEstimate, CmsSketch, CosineSimilarity, HllSketch}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** The engine's public integration point: a `SparkSessionExtensions`
  * installer exposing every native graft function through the BLESSED
  * extension API —
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")  // or
  *     .withExtensions(new GraftExtensions)
  *
  * — so a user (or Thrift/Connect server) gets `cosine_sim`, `hll_distinct`,
  * `h60`, and the Bloom pair in plain SQL without touching internals. The
  * in-repo operators keep their lazy per-session `register()` calls (they
  * must work on an un-extended session, e.g. the driver harness's); this
  * class is the front door for everyone else.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSimilarity], "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("hll_distinct"),
      info(classOf[HllSketch], "hll_distinct"),
      (exprs: Seq[Expression]) => HllSketch(exprs.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("h60"),
      info(classOf[XHash.type], "h60"),
      // cross-engine md5-prefix hash, SQL-reachable for ad-hoc sketch work
      (exprs: Seq[Expression]) => XHash.h60Expr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      info(classOf[CmsSketch], "cms_sketch"),
      (exprs: Seq[Expression]) => CmsSketch(exprs.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      info(classOf[CmsEstimate], "cms_estimate"),
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info(classOf[BloomFilterAggregate], "graft_bloom_agg"),
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      info(classOf[BloomFilterMightContain], "graft_bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1))))
    // the two scan-side text shredders (round 5): SQL-reachable shingling
    // and content-defined chunking for ad-hoc dedup work
    ext.injectFunction((
      FunctionIdentifier("kgrams"),
      info(classOf[graft.functions.KGrams], "kgrams"),
      (exprs: Seq[Expression]) =>
        graft.functions.KGrams(exprs(0), intLit(exprs(1), "kgrams k"))))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      info(classOf[graft.functions.CdcChunks], "cdc_chunks"),
      (exprs: Seq[Expression]) =>
        graft.functions.CdcChunks(exprs(0), intLit(exprs(1), "cdc_chunks mask"))))
  }

  private def intLit(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
