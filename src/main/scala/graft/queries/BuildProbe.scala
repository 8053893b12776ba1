package graft.queries

import org.apache.spark.sql.SparkSession

/** Perf scratchpad (queries package for kernel access): attribute
  * c03's per-invocation CONSTRUCTION cost to its sections. Not part
  * of the gate or bench surface. */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"    c03 section $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val fn = graft.SparkEntry.queries("c03_train_pipeline")
    graft.CacheScope.scoped {
      fn(spark, d).count() // warmup
      for (i <- 1 to 3) {
        import org.apache.spark.sql.functions._
        val s = spark
        graft.functions.Hashing.register(s)
        val docs = graft.Tables(s, d, "documents")
        val keepExact = t("keepExact") {
          docs.groupBy(md5(col("text")).as("h"))
            .agg(min("doc_id").as("doc_id")).select("doc_id")
        }
        val nearDrops = t("dupDrops")(DedupKernels.dupDrops(s, d))
        val quality = t("quality") {
          val evalPred = s"${PipelineKernels.pctSql("'eval:' || doc_id")} < 10"
          docs
            .selectExpr("doc_id", s"${PipelineKernels.toks} as t", s"$evalPred as is_eval")
            .selectExpr("doc_id", "is_eval", "t",
              """case when size(t) >= 2
                   then transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
                   else array() end as g2""")
            .selectExpr("doc_id", "is_eval",
              "10000 - (size(array_distinct(t)) * 10000) div size(t) as dup_tok_bp",
              """case when size(g2) > 0
                   then 10000 - (size(array_distinct(g2)) * 10000) div size(g2)
                   else 0L end as dup2_bp""",
              s"""aggregate(transform(t, x -> ${graft.functions.Hashing.h32Sql("concat('w:', x)")} % 2001 - 1000),
                            0L, (a, x) -> a + x) div size(t) as score_bp""")
            .where("not is_eval and dup2_bp <= 800 and dup_tok_bp <= 7000 and score_bp > 0")
            .select("doc_id")
        }
        val contaminated = t("grams+contaminated") {
          val evalPred = s"${PipelineKernels.pctSql("'eval:' || doc_id")} < 10"
          val grams = docs
            .selectExpr("doc_id", s"$evalPred as is_eval",
              s"""case when size(${PipelineKernels.toks}) >= 13
                    then transform(sequence(1, size(${PipelineKernels.toks}) - 12), i -> array_join(slice(${PipelineKernels.toks}, i, 13), ' '))
                    else array() end as gs""")
            .select(col("doc_id"), col("is_eval"), explode(col("gs")).as("g"))
          val evalGrams = grams.where("is_eval").select("g").distinct()
          grams.where("not is_eval")
            .join(evalGrams, "g").select("doc_id").distinct()
        }
        val cleaned = t("3 joins") {
          quality
            .join(keepExact, Seq("doc_id"), "left_semi")
            .join(nearDrops, Seq("doc_id"), "left_anti")
            .join(contaminated, Seq("doc_id"), "left_anti")
        }
        val df = t("shardShuffle") {
          PipelineKernels.shardShuffle(cleaned, 8, s.sparkContext.defaultParallelism)
        }
        val t0 = System.nanoTime()
        df.count()
        println(f"    c03 consume ${(System.nanoTime() - t0) / 1e9}%.3f s  (round $i)")
      }
    }
    spark.stop()
  }
}
