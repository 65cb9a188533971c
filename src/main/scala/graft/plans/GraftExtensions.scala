package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharCounts, CosineSim, DotLong, MinHash16, SimHash32, SqDistLong}

/** SparkSessionExtensions entry point (SURVEY §2.D x02).
  *
  * Installed via `spark.sql.extensions=graft.plans.GraftExtensions`;
  * registers graft's native expressions as SQL functions so plain
  * `spark.sql("SELECT graft_cosine(a, b) ...")` uses the codegen
  * kernel — no UDF registration per session, works on every executor.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "graft_dot_long"),
      (children: Seq[Expression]) => DotLong(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist_long"),
      new ExpressionInfo(classOf[SqDistLong].getName, "graft_sqdist_long"),
      (children: Seq[Expression]) => SqDistLong(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "graft_minhash16"),
      (children: Seq[Expression]) => MinHash16(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_char_counts"),
      new ExpressionInfo(classOf[CharCounts].getName, "graft_char_counts"),
      (children: Seq[Expression]) => CharCounts(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (children: Seq[Expression]) => SimHash32(children.head)
    ))
    ext.injectOptimizerRule(_ => SelfDistanceElimination)
  }
}
