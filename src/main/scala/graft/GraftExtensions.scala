package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions._

/** SparkSessionExtensions entry point: registers every custom expression
  * as a SQL function, so the engine's operators are reachable from pure
  * SQL as well as the Column API:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT gunzip_if_gzip(data), simhash64(tokens) FROM ...
  *
  * (Also invokable on an existing session via
  * [[graft.functions.GraftFunctions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.GzipRoundtripElimination)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    def one(name: String, usage: String)(f: Expression => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        (es: Seq[Expression]) => f(es.head)))

    one("gunzip_if_gzip", "inflate gzip payloads, pass-through otherwise")(GunzipIfGzip)
    one("gzip_compress", "gzip-compress binary payloads")(GzipCompress)
    one("kpl_deaggregate", "split a KPL aggregate into user records")(KplDeaggregate)
    one("simhash64", "64-bit SimHash of a token array")(SimHash64)
    one("minhash_signature64", "64-perm MinHash signature of shingles")(
      MinHashSignature(_, 64))
    one("shingle_hashes3", "distinct hashed 3-gram shingles of a token array")(
      ShingleHashes(_, 3))
    one("hyperplane_sig16", "16-plane sign-LSH signature of array<double>")(
      HyperplaneSig(_, 16))
  }
}
