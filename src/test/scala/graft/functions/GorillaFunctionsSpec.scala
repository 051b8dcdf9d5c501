package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GorillaFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("encode/decode round-trip through SQL functions") {
    val df = Seq(
      (1L, 7200L, 1.5), (1L, 7260L, 1.5), (1L, 7320L, 2.5), (1L, 7500L, 2.0),
      (2L, 7210L, 10.0), (2L, 7270L, 11.0)
    ).toDF("series", "ts", "v")

    val chunks = df.groupBy($"series")
      .agg(sort_array(collect_list(struct($"ts", $"v"))).as("pts"))
      .select($"series",
        graft.functions.gorilla_encode($"pts", lit(7200L)).as("chunk"))

    val back = chunks
      .select($"series", explode(graft.functions.gorilla_decode($"chunk")).as("p"))
      .select($"series", $"p.ts", $"p.v")
      .orderBy($"series", $"ts")
      .as[(Long, Long, Double)]
      .collect()

    assert(back.toSeq == Seq(
      (1L, 7200L, 1.5), (1L, 7260L, 1.5), (1L, 7320L, 2.5), (1L, 7500L, 2.0),
      (2L, 7210L, 10.0), (2L, 7270L, 11.0)))
  }

  test("SQL-text usage, chunk agg, num points, lead/trail variant") {
    val df = (0 until 1000).map(i => (7200L + i * 7L, math.sin(i / 25.0) * 100))
      .toDF("ts", "v")
    df.createOrReplaceTempView("pts")
    val row = spark.sql(
      """SELECT gorilla_chunk_agg(c) AS a, gorilla_num_points(c) AS n,
        |       gorilla_decode_values(c_lt) AS vs_lt
        |FROM (SELECT gorilla_encode(sort_array(collect_list(struct(ts, v))), 7200L) AS c,
        |             gorilla_encode_lt(sort_array(collect_list(struct(ts, v))), 7200L) AS c_lt
        |      FROM pts)""".stripMargin).collect()(0)
    val a = row.getStruct(0)
    assert(a.getLong(0) == 1000L)
    assert(a.getLong(1) == 7200L && a.getLong(2) == 7200L + 999 * 7L)
    assert(row.getInt(1) == 1000)
    val expected = (0 until 1000).map(i => math.sin(i / 25.0) * 100)
    assert(row.getSeq[Double](2) == expected)
    assert(math.abs(a.getDouble(5) - expected.sum) < 1e-9)
  }

  test("value-only encode round-trips and nulls propagate") {
    val df = Seq((1, Seq(1.0, 2.0, 3.0)), (2, null.asInstanceOf[Seq[Double]]))
      .toDF("id", "vs")
    val out = df.select($"id",
        graft.functions.gorilla_decode_values(
          graft.functions.gorilla_encode_values($"vs")).as("back"))
      .orderBy($"id").collect()
    assert(out(0).getSeq[Double](1) == Seq(1.0, 2.0, 3.0))
    assert(out(1).isNullAt(1))
  }

  test("expressions stay inside whole-stage codegen") {
    val chunk = graft.core.GorillaCodec.encode(Array(7200L, 7260L), Array(1.0, 2.0), 7200L)
    val dir = java.nio.file.Files.createTempDirectory("graft-codegen").toString
    Seq(Tuple1(chunk), Tuple1(chunk)).toDF("c").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(graft.functions.gorilla_num_points($"c").as("n"),
              graft.functions.gorilla_chunk_agg($"c").getField("sum_v").as("s"))
      .filter($"n" > 0)
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [gorilla_num_points"), plan)
    assert(df.as[(Int, Double)].collect().toSeq == Seq((2, 3.0), (2, 3.0)))
  }
}
