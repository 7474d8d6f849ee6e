package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayOverlapCount, BpeTokenCount, CharNgramSet, CharSetCount, MinhashSig, NonAlnumSpaceCount, NumGcd, NumLcm, SimHash60, VecDot, WordSetCount, WordShingleSet, ZorderKey}

/** SparkSessionExtensions hook: registers graft's native expressions
  * permanently in a session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * idiomatic deployment for a cluster, where per-session temp-function
  * registration (VectorExpressions.register / ScalarExpressions
  * .register, used by the library's own query entry points) would have
  * to be repeated in every job.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo("graft", name)
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      (c: Seq[Expression]) => VecDot(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("num_gcd"), info("num_gcd"),
      (c: Seq[Expression]) => NumGcd(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("num_lcm"), info("num_lcm"),
      (c: Seq[Expression]) => NumLcm(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("char_ngram_set"), info("char_ngram_set"),
      (c: Seq[Expression]) => CharNgramSet(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("array_overlap_count"), info("array_overlap_count"),
      (c: Seq[Expression]) => ArrayOverlapCount(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (c: Seq[Expression]) => MinhashSig(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("word_shingle_set"), info("word_shingle_set"),
      (c: Seq[Expression]) => WordShingleSet(c.head)))
    ext.injectFunction((FunctionIdentifier("simhash60"), info("simhash60"),
      (c: Seq[Expression]) => SimHash60(c.head)))
    ext.injectFunction((FunctionIdentifier("word_set_count"), info("word_set_count"),
      (c: Seq[Expression]) => WordSetCount(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("char_set_count"), info("char_set_count"),
      (c: Seq[Expression]) => CharSetCount(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("non_alnum_space_count"), info("non_alnum_space_count"),
      (c: Seq[Expression]) => NonAlnumSpaceCount(c.head)))
    ext.injectFunction((FunctionIdentifier("bpe_token_count"), info("bpe_token_count"),
      (c: Seq[Expression]) => BpeTokenCount(c.head)))
    ext.injectFunction((FunctionIdentifier("zorder_key"), info("zorder_key"),
      (c: Seq[Expression]) => ZorderKey(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("st_distance"), info("st_distance"),
      (c: Seq[Expression]) => functions.StDistance(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("st_intersects"), info("st_intersects"),
      (c: Seq[Expression]) => functions.StIntersects(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("st_within"), info("st_within"),
      (c: Seq[Expression]) => functions.StWithin(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("st_equals"), info("st_equals"),
      (c: Seq[Expression]) => functions.StEquals(c.head, c(1))))
    ext.injectFunction((FunctionIdentifier("st_area"), info("st_area"),
      (c: Seq[Expression]) => functions.StArea(c.head)))
    ext.injectFunction((FunctionIdentifier("st_asbinary"), info("st_asbinary"),
      (c: Seq[Expression]) => functions.StAsBinary(c.head)))
    ext.injectFunction((FunctionIdentifier("st_geomfromwkb"), info("st_geomfromwkb"),
      (c: Seq[Expression]) => functions.StGeomFromWkb(c.head)))
    ext.injectFunction((FunctionIdentifier("st_geomfromwkt"), info("st_geomfromwkt"),
      (c: Seq[Expression]) => functions.StGeomFromWkt(c.head)))
    // derived predicates, same SQL surface as the reference gis/mod.rs:
    // contains = within flipped, disjoint = NOT intersects
    ext.injectFunction((FunctionIdentifier("st_contains"), info("st_contains"),
      (c: Seq[Expression]) => functions.StWithin(c(1), c.head)))
    ext.injectFunction((FunctionIdentifier("st_disjoint"), info("st_disjoint"),
      (c: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Not(functions.StIntersects(c.head, c(1)))))
  }
}
