package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with SparkTestBase {

  test("TopKBuffer keeps the k best with deterministic ties and merges") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 11L), (3.0, 12L), (5.0, 9L), (0.5, 13L))
      .foreach { case (s, i) => b.insert(s, i) }
    // ties on score rank the smaller id first
    assert(b.sorted.toSeq === Seq((9L, 1, 5.0), (11L, 2, 5.0), (12L, 3, 3.0)))
    val other = new TopKBuffer(3)
    other.insert(4.0, 20L)
    b.merge(other)
    assert(b.sorted.toSeq === Seq((9L, 1, 5.0), (11L, 2, 5.0), (20L, 3, 4.0)))
  }

  test("top_k_by_score equals the window formulation on grouped data") {
    Hashing.register(spark)
    import spark.implicits._
    // deterministic scores with planted ties
    val df = (0 until 500).map { i =>
      val g = i % 7
      (g.toLong, i.toLong, (Hashing.jvm32(s"s:$i") % 100).toDouble)
    }.toDF("g", "id", "score")
    val viaAgg = df.groupBy("g")
      .agg(expr("top_k_by_score(score, id, 4)").as("top"))
      .selectExpr("g", "inline(top)")
      .select("g", "id", "rnk", "score")
      .collect().map(_.toSeq).toSet
    import org.apache.spark.sql.expressions.Window
    val viaWindow = df.withColumn("rnk",
        row_number().over(Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .where("rnk <= 4").select("g", "id", "rnk", "score")
      .collect().map(_.toSeq).toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.size === 28) // 7 groups x 4
  }

  test("float score / int id are implicitly cast; NaN ranks like the window sort") {
    Hashing.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // float score + int id exercise ImplicitCastInputTypes (used to
    // throw ClassCastException at runtime); NaN must take the same
    // rank as Spark's window sort gives it (greatest under desc)
    val df = Seq((1, 1, 1.5f), (1, 2, Float.NaN), (1, 3, 9.0f))
      .toDF("g", "id", "score")
    val viaAgg = df.groupBy("g")
      .agg(expr("top_k_by_score(score, id, 2)").as("top"))
      .selectExpr("inline(top)").select("id", "rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val viaWindow = df.withColumn("rnk", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .where("rnk <= 2").select("id", "rnk").collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1))).toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg === Set((2L, 1), (3L, 2)))
  }

  test("the aggregate plans with a partial ObjectHashAggregate below the exchange") {
    Hashing.register(spark)
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 5L, i.toLong, i.toDouble)).toDF("g", "id", "score")
      .groupBy("g").agg(expr("top_k_by_score(score, id, 3)").as("top"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    assert(p.toLowerCase.contains("partial_top_k_by_score"), p)
  }
}
