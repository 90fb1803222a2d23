package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graft.{BpeTokenStats, CosineSimilarity, DotProduct, RollingHash, SimHash64, TopKRewriteRule, TopKStrategy}

/** SparkSessionExtensions wiring: exposes graft's native expressions as SQL
  * functions (`spark.sql.extensions=graft.plans.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`), so `spark.sql("SELECT
  * graft_cosine(a, b) ...")` works alongside the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - inner product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(s) - 64-bit polynomial content hash"),
      (args: Seq[Expression]) => RollingHash(args(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_stats"),
      info("bpe_token_stats",
        "bpe_token_stats(s) - [n_tokens, n_fallback] of the greedy subword walk (default vocab)"),
      (args: Seq[Expression]) => BpeTokenStats(args(0), graft.textanalysis.BpeVocab.Default)))
  }
}
