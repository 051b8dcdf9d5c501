package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Selection invariants of the LTTB kernel that the SQL oracle states
  * only implicitly. */
class LttbSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(pts: Seq[(Long, Long)], nOut: Int): Seq[(Long, Long)] = {
    val df = pts.toDF("ts", "cents")
      .agg(collect_list(struct(col("ts"), col("cents"))).as("p"))
      .select(explode(lttb_select(col("p"), nOut)).as("s"))
      .select(col("s.ts"), col("s.cents"))
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("n <= nOut keeps every point, sorted") {
    val pts = Seq((30L, 5L), (10L, 1L), (20L, 9L))
    assert(run(pts, 12) == pts.sorted)
  }

  test("nOut=2 returns exactly the endpoints (no area math, no div-by-zero)") {
    val pts = (0 until 40).map(i => (i.toLong * 60, (i % 7).toLong * 100))
    assert(run(pts, 2) == Seq(pts.head, pts.last))
  }

  test("inputs past the exact-Long area bound fail loudly, not wrap silently") {
    // nanosecond-scale ts x large cents: the doubled area product
    // would overflow Long — the kernel must refuse (advisor r8: a
    // silent wrap selects wrong points and only surfaces as an oracle
    // hash mismatch)
    val huge = (0 until 40).map(i => (i.toLong * 1_000_000_000_000L, (i % 7).toLong * 400_000_000L))
    val e = intercept[org.apache.spark.SparkException] {
      run(huge, 12)
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[ArithmeticException] &&
      c.getMessage.contains("area bound")), e.toString.take(500))
    // the same magnitudes on the documented seconds/cents grid are fine
    val sane = (0 until 40).map(i => (i.toLong * 3600, (i % 7).toLong * 1000))
    assert(run(sane, 12).size == 12)
  }

  test("first and last points always survive; output is nOut points in ts order") {
    val pts = (0L until 100L).map(t => (t, (t * 37 % 11) - 5))
    val out = run(pts, 12)
    assert(out.length == 12)
    assert(out.head == pts.head && out.last == pts.last)
    assert(out == out.sorted)
    // one selected point per middle bucket: strictly increasing ts
    assert(out.map(_._1).distinct.length == 12)
  }

  test("a spike dominates its bucket (the shape-preserving property)") {
    // flat line with one huge spike: LTTB must keep the spike, which a
    // uniform subsample would miss with high probability
    val pts = (0L until 200L).map(t => (t, if (t == 57L) 100000L else 0L))
    val out = run(pts, 12)
    assert(out.contains((57L, 100000L)), s"spike dropped: $out")
  }

  test("selection is input-order independent (kernel sorts internally)") {
    val pts = (0L until 150L).map(t => (t, t * t % 997))
    val shuffled = scala.util.Random.shuffle(pts)
    assert(run(pts, 12) == run(shuffled, 12))
  }
}
