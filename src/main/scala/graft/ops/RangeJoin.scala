package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: match each point `p` to every interval
 * `[lo, hi]` that contains it, with NO equality key. Spark's native
 * plan for a pure `p BETWEEN lo AND hi` join is a
 * BroadcastNestedLoopJoin when one side fits in a broadcast and a
 * cartesian product when neither does — the first stops scaling at
 * the broadcast threshold, the second is O(|points| · |intervals|)
 * compares. Neither survives two big sides.
 *
 * Bucketed shape: slice the domain into fixed `bucketWidth` buckets.
 * Each interval explodes to the buckets it overlaps
 * (⌈len/width⌉ + 1 rows), each point maps to exactly ONE bucket, and
 * a bucket equi-join + residual BETWEEN reproduces the exact pair
 * set: every matching (point, interval) shares the point's bucket,
 * and each pair appears exactly once because a point has one bucket —
 * no post-join dedup. The shuffle is O(|points| + |intervals| ·
 * buckets-per-interval): linear, hash-partitioned, and a hot bucket
 * is an AQE-skew-splittable equi-join partition, not a nested loop.
 *
 * Pick `bucketWidth` near the typical interval length: much smaller
 * multiplies the interval side's explode factor, much larger packs
 * unrelated points into each bucket and shifts work to the residual
 * filter. Both stay correct — width tunes constants only.
 */
object RangeJoin {
  def bucketed(points: DataFrame, ptCol: String,
               intervals: DataFrame, loCol: String, hiCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(ptCol) / bucketWidth).cast("long"))
    pt.join(iv, pt("__bucket") === iv("__bucket") &&
        pt(ptCol) >= iv(loCol) && pt(ptCol) <= iv(hiCol))
      .drop(pt("__bucket")).drop(iv("__bucket"))
  }
}
