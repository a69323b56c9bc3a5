package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/**
 * SQL-surface registration for graft's native expressions, two ways:
 *
 *  1. `spark.sql.extensions=org.apache.spark.sql.graft.GraftSparkExtensions`
 *     (or `builder.withExtensions(new GraftSparkExtensions)`) registers
 *     them at session build — the standard plugin path for a cluster
 *     deployment;
 *  2. `GraftFunctions.register(spark)` injects into an already-running
 *     session (used by the test suite).
 *
 * After either, `SELECT simhash64(tokens), cosine_sim(a, b), …` works in
 * plain SQL, so lens `select_expr`/`filter` stages — and any downstream
 * SQL user — reach the codegen'd hot paths directly.
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => NativeRewrites)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftSparkExtensions].getName, null, name, usage, "")

  private def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  /** (name, info, builder) for every native function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(hashed, k) - k-element MinHash signature of a long array"),
      (args: Seq[Expression]) =>
        MinHashSig(args.head, literalInt(args(1), "minhash_sig k"))),
    ("sorted_long_intersect_size",
      info("sorted_long_intersect_size",
        "sorted_long_intersect_size(a, b) - |A∩B| of two sorted long arrays"),
      (args: Seq[Expression]) => SortedLongIntersectSize(args.head, args(1))),
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))

  /** Register into a live session (idempotent — a name already present
   *  is left alone, so session rebuilds don't trigger the registry's
   *  "replaced a previously registered function" WARN). Contract: graft
   *  function names are treated as graft-owned — if a session already
   *  binds one of them, the existing binding is assumed to BE graft's
   *  (cloned-session inheritance, a prior register call). A session
   *  that deliberately bound a foreign function under a graft name
   *  keeps it; use `createOrReplaceTempFunction` directly to clobber. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, _, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      else
        // Make silent shadowing diagnosable: if the existing binding is
        // NOT graft's (a foreign temp function, or a future Spark builtin
        // colliding with a graft name), queries run with its semantics
        // and this line is the only trace.
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"graft function '$name' already bound in this session; " +
            "keeping the existing binding (assumed graft-owned)")
    }
    registerOptimizations(spark)
  }

  /** Add [[NativeRewrites]] to a live session (idempotent) — the
   *  already-running-session analogue of `injectOptimizerRule`. */
  def registerOptimizations(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(NativeRewrites))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeRewrites
}
