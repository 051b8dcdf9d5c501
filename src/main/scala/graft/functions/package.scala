package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.{Column, SparkSession}

/**
 * Public function surface of the graft engine.
 *
 * Call [[functions.registerAll]] once per session (or install
 * [[GraftExtensions]] via `spark.sql.extensions`); the `Column`
 * wrappers below then resolve through the session's FunctionRegistry,
 * so they work identically from Scala and SQL text.
 */
package object functions {

  import graft.functions.{BloomFilterAgg, BloomMightContain, CosineSimExpr,
    GorillaChunkAgg, GorillaChunkAggRange,
    GorillaChunkBucketAgg, GorillaDecode,
    GorillaDecodeTimestamps, GorillaDecodeValues, GorillaEncode, GorillaEncodeValues,
    GorillaIsValid, GorillaNumPoints, ChunkFingerprintsExpr, HashSetSortedExpr, HyperplaneBucketsExpr, MinHashExpr,
    MinHashFromHashesExpr, MisraGriesAgg, ShingleHashesExpr, SimHashExpr, SimHashTextExpr,
    SortedIntersectCountExpr, AdcScoreExpr, Sq8DotExpr, Sq8EncodeExpr, VecDotExpr, VecL2SqExpr,
    LttbSelectExpr, WinnowFingerprintsExpr, WordNgramsExpr}

  type Builder = Seq[Expression] => Expression

  /** (name, expression builder) for every graft SQL function. */
  val all: Seq[(String, Builder)] = Seq(
    "gorilla_encode" -> (es => GorillaEncode(es(0), es(1), leadTrail = false)),
    "gorilla_encode_lt" -> (es => GorillaEncode(es(0), es(1), leadTrail = true)),
    "gorilla_encode_values" -> (es => GorillaEncodeValues(es(0), leadTrail = false)),
    "gorilla_decode" -> (es => GorillaDecode(es(0))),
    "gorilla_decode_values" -> (es => GorillaDecodeValues(es(0))),
    "gorilla_decode_ts" -> (es => GorillaDecodeTimestamps(es(0))),
    "gorilla_chunk_agg" -> (es => GorillaChunkAgg(es(0))),
    "gorilla_chunk_agg_range" -> (es => GorillaChunkAggRange(es(0), es(1), es(2))),
    // bucketSec/scale must be foldable literals
    "gorilla_chunk_bucket_agg" -> (es => GorillaChunkBucketAgg(es(0),
      es(1).eval(null).asInstanceOf[Number].longValue(),
      es(2).eval(null).asInstanceOf[Number].doubleValue())),
    "gorilla_num_points" -> (es => GorillaNumPoints(es(0))),
    "gorilla_is_valid" -> (es => GorillaIsValid(es(0))),
    // minhash(shingles, k): k must be a foldable int literal
    "minhash" -> (es => MinHashExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue())),
    // misra_gries(item, k): mergeable heavy-hitters sketch aggregate
    "misra_gries" -> (es => MisraGriesAgg(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue())),
    // bloom_agg(hash, numBits, numHashes): mergeable Bloom filter;
    // size parameters must be foldable int literals
    "bloom_agg" -> (es => BloomFilterAgg(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue(),
      es(2).eval(null).asInstanceOf[Number].intValue())),
    "bloom_might_contain" -> (es => BloomMightContain(es(0), es(1))),
    "simhash" -> (es => SimHashExpr(es(0))),
    "simhash_text" -> (es => SimHashTextExpr(es(0))),
    "cosine_sim" -> (es => CosineSimExpr(es(0), es(1))),
    "vec_dot" -> (es => VecDotExpr(es(0), es(1))),
    "vec_l2sq" -> (es => VecL2SqExpr(es(0), es(1))),
    "hyperplane_buckets" -> (es => HyperplaneBucketsExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue(),
      es(2).eval(null).asInstanceOf[Number].intValue())),
    "sq8_encode" -> (es => Sq8EncodeExpr(es(0), es(1))),
    "sq8_dot" -> (es => Sq8DotExpr(es(0), es(1))),
    "adc_score" -> (es => AdcScoreExpr(es(0), es(1))),
    "hash_set_sorted" -> (es => HashSetSortedExpr(es(0))),
    "sorted_intersect_count" -> (es => SortedIntersectCountExpr(es(0), es(1))),
    "shingle_hashes" -> (es => ShingleHashesExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue())),
    "word_ngrams" -> (es => WordNgramsExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue())),
    "minhash_hashes" -> (es => MinHashFromHashesExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue())),
    "lttb_select" -> (es => LttbSelectExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue())),
    "chunk_fps" -> (es => ChunkFingerprintsExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue(),
      es(2).eval(null).asInstanceOf[Number].intValue())),
    "winnow_fps" -> (es => WinnowFingerprintsExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue(),
      es(2).eval(null).asInstanceOf[Number].intValue())),
    "simhash_bucket_pairs" -> (es => SimhashBucketPairsExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue())),
    "hw_fold" -> (es => HoltWintersFoldExpr(es(0),
      es(1).eval(null).asInstanceOf[Number].doubleValue(),
      es(2).eval(null).asInstanceOf[Number].doubleValue())),
  )

  def expressionInfo(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  /** Register all graft functions with an existing session. Idempotent. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      registry.registerFunction(FunctionIdentifier(name), expressionInfo(name), builder)
    }
  }

  // ---- typed Column API ----
  def gorilla_encode(points: Column, headerTime: Column): Column =
    call_function("gorilla_encode", points, headerTime)
  def gorilla_encode_lt(points: Column, headerTime: Column): Column =
    call_function("gorilla_encode_lt", points, headerTime)
  def gorilla_encode_values(values: Column): Column =
    call_function("gorilla_encode_values", values)
  def gorilla_decode(chunk: Column): Column = call_function("gorilla_decode", chunk)
  def gorilla_decode_values(chunk: Column): Column = call_function("gorilla_decode_values", chunk)
  def gorilla_decode_ts(chunk: Column): Column = call_function("gorilla_decode_ts", chunk)
  def gorilla_chunk_agg(chunk: Column): Column = call_function("gorilla_chunk_agg", chunk)
  def gorilla_chunk_agg_range(chunk: Column, fromSec: Long, toSec: Long): Column =
    call_function("gorilla_chunk_agg_range", chunk,
      org.apache.spark.sql.functions.lit(fromSec), org.apache.spark.sql.functions.lit(toSec))
  def gorilla_chunk_bucket_agg(chunk: Column, bucketSec: Long, scale: Double): Column =
    call_function("gorilla_chunk_bucket_agg", chunk,
      org.apache.spark.sql.functions.lit(bucketSec), org.apache.spark.sql.functions.lit(scale))
  def gorilla_num_points(chunk: Column): Column = call_function("gorilla_num_points", chunk)
  def gorilla_is_valid(chunk: Column): Column = call_function("gorilla_is_valid", chunk)
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vec_l2sq(a: Column, b: Column): Column = call_function("vec_l2sq", a, b)
  def sq8_encode(vec: Column, invScale: Column): Column =
    call_function("sq8_encode", vec, invScale)
  def sq8_dot(a: Column, b: Column): Column = call_function("sq8_dot", a, b)
  def adc_score(codes: Column, lut: Column): Column =
    call_function("adc_score", codes, lut)
  def minhash(shingles: Column, k: Int): Column =
    call_function("minhash", shingles, org.apache.spark.sql.functions.lit(k))
  def misra_gries(item: Column, k: Int): Column =
    call_function("misra_gries", item, org.apache.spark.sql.functions.lit(k))
  def bloom_agg(hash: Column, numBits: Int, numHashes: Int): Column =
    call_function("bloom_agg", hash,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes))
  def bloom_might_contain(bloom: Column, hash: Column): Column =
    call_function("bloom_might_contain", bloom, hash)
  def simhash(tokens: Column): Column = call_function("simhash", tokens)
  def simhash_text(text: Column): Column = call_function("simhash_text", text)
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def hyperplane_buckets(vec: Column, nBits: Int, tables: Int): Column =
    call_function("hyperplane_buckets", vec,
      org.apache.spark.sql.functions.lit(nBits), org.apache.spark.sql.functions.lit(tables))
  def hash_set_sorted(xs: Column): Column = call_function("hash_set_sorted", xs)
  /** Not in the SQL registry: the centroid model rides the expression
    * (a bounded table baked into the plan), which SQL text can't carry. */
  def nearest_centroids(vec: Column, ids: Array[Int], mat: Array[Array[Float]],
                        nprobe: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      NearestCentroidsExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(vec), ids, mat, nprobe))
  /** Same model-rides-the-expression treatment for the full PQ encode. */
  def pq_encode_all(vec: Column, codes: Array[Array[Int]],
                    books: Array[Array[Array[Float]]]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PqEncodeAllExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(vec), codes, books))
  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)
  def shingle_hashes(text: Column, n: Int): Column =
    call_function("shingle_hashes", text, org.apache.spark.sql.functions.lit(n))
  def word_ngrams(text: Column, n: Int): Column =
    call_function("word_ngrams", text, org.apache.spark.sql.functions.lit(n))
  def minhash_hashes(hashes: Column, k: Int): Column =
    call_function("minhash_hashes", hashes, org.apache.spark.sql.functions.lit(k))
  def lttb_select(points: Column, nOut: Int): Column =
    call_function("lttb_select", points, org.apache.spark.sql.functions.lit(nOut))
  def chunk_fps(text: Column, size: Int, stride: Int): Column =
    call_function("chunk_fps", text, org.apache.spark.sql.functions.lit(size),
      org.apache.spark.sql.functions.lit(stride))
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    call_function("winnow_fps", text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  def hw_fold(points: Column, sf: Double, tf: Double): Column =
    call_function("hw_fold", points, org.apache.spark.sql.functions.lit(sf),
      org.apache.spark.sql.functions.lit(tf))

  def simhash_bucket_pairs(xs: Column, maxDist: Int): Column =
    call_function("simhash_bucket_pairs", xs,
      org.apache.spark.sql.functions.lit(maxDist))
}
