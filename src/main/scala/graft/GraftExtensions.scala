package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{AffineMinHash, ByteFeatures, DotF, DuckTypeMask, H32, H32B,
  HashedCharGrams, HashedShingles, HyperplaneSig, SimHash64, StAsText, StEnvelope,
  StGeomFromText, StPoint, TextFeatures, TopKByScore, VNorm}

/** Production registration path for the engine's extensions:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)       // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Injects the FULL user-facing function surface (geometry, hash /
  * MinHash / vector kernels, the bounded top-k aggregate) plus the
  * optimizer rule and planner strategy into every session built from
  * the configured builder — the counterpart of the reference loading
  * the DuckDB spatial extension at connection setup
  * (`/root/reference/src/dwca_parquet/settings.py:46-62`).
  * `GeoFunctions.register` / `Hashing.register` remain for sessions
  * the engine does not construct (e.g. the driver-owned harness
  * session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.JaccardRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    def inject(name: String, usage: String)(build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[StPoint].getName, null, name, usage, ""),
        build))
    def litInt(e: Expression): Int = {
      require(e.foldable, s"argument must be an integer literal, got: ${e.sql}")
      e.eval().asInstanceOf[Number].intValue()
    }

    inject("st_point", "st_point(x, y) - WKB point")(e => StPoint(e(0), e(1)))
    inject("st_geomfromtext", "st_geomfromtext(wkt) - WKT to WKB")(e => StGeomFromText(e(0)))
    inject("st_astext", "st_astext(wkb) - WKB to WKT")(e => StAsText(e(0)))
    inject("st_envelope", "st_envelope(wkb) - [xmin,ymin,xmax,ymax]")(e => StEnvelope(e(0)))
    inject("h32", "h32(s) - first 4 md5 bytes as unsigned int")(e => H32(e.head))
    inject("h32b", "h32b(s) - md5 bytes 4-7 as unsigned int")(e => H32B(e.head))
    inject("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array")(
      e => SimHash64(e.head))
    inject("hashed_shingles", "hashed_shingles(tokens, n) - hashed word n-gram set")(
      e => HashedShingles(e(0), litInt(e(1))))
    inject("hashed_chargrams", "hashed_chargrams(text, n) - hashed char n-gram set")(
      e => HashedCharGrams(e(0), litInt(e(1))))
    inject("affine_minhash", "affine_minhash(hv, k) - k-perm MinHash signature")(
      e => AffineMinHash(e(0), litInt(e(1))))
    inject("dotf", "dotf(a, b) - sequential-fold float dot product")(e => DotF(e(0), e(1)))
    inject("vnorm", "vnorm(a) - euclidean norm of a float vector")(e => VNorm(e.head))
    inject("hyperplane_sig", "hyperplane_sig(v, planes, dims) - LSH signature")(
      e => HyperplaneSig(e(0), litInt(e(1)), litInt(e(2))))
    inject("byte_features", "byte_features(blob) - one-pass payload byte features")(
      e => ByteFeatures(e.head))
    inject("duck_type_mask", "duck_type_mask(s) - DuckDB sniffer candidate-type bitmask")(
      e => DuckTypeMask(e.head))
    inject("text_features", "text_features(text, stops) - one-pass per-document token statistics")(
      e => {
        require(e(1).foldable,
          s"text_features stops must be a literal string array, got: ${e(1).sql}")
        TextFeatures(e(0),
          e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toArray[org.apache.spark.unsafe.types.UTF8String](
              org.apache.spark.sql.types.StringType).map(_.toString).toSeq)
      })
    inject("top_k_by_score", "top_k_by_score(score, id, k) - bounded top-k aggregate")(
      e => TopKByScore(e(0), e(1), litInt(e(2))))
  }
}
