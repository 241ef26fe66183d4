package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSim, MinHashSig, RollingHash, ShingleSet, SimHash64, ZOrder2}

/** The library's `SparkSessionExtensions` entry point: registers every
  * native graft expression into the SQL function registry at session
  * build time, so `spark.sql("SELECT minhash_sig(text) ...")` works with
  * zero imperative setup — the standard way a Spark library ships custom
  * Catalyst expressions:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  *
  * The per-function `register(spark)` helpers remain for sessions the
  * caller doesn't construct.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  /** name → expression builder for every native graft function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> (es => RollingHash(es.head)),
    "minhash_sig" -> (es => MinHashSig(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "shingle_set" -> (es => ShingleSet(es.head)),
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "z_order2" -> (es => ZOrder2(es(0), es(1))))
}
