package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** End-to-end corpus-cleaning composition — the job a training-data
  * pipeline actually runs at 100 TB, assembled from the tier
  * operators: near-dup removal (MinHash-LSH pairs from d03, keep the
  * smallest doc_id of each dup cluster edge), quality floor (t02's
  * score), and language allowlist. One pass over the corpus plus the
  * LSH candidate machinery; the dup-id set is a broadcast-able
  * left-anti join side (dup pairs ≪ corpus by construction).
  */
object Pipeline {

  private val toks = "split(text, ' ')"

  val all: Map[String, Q] = Map(
    "c01_clean_corpus" -> Q(
      (s, d) => {
        // doc_ids to drop: the larger end of every verified dup pair
        val drops = Dedup.all("d03_lsh_pairs").fn(s, d).select(col("d2").as("doc_id")).distinct()
        val quality = Tables(s, d, "documents")
          .selectExpr("doc_id", "text", "lang",
            s"(size(array_distinct($toks)) * 10000) div size($toks) as uniq_bp",
            s"size($toks) as n_tokens")
          .selectExpr("doc_id", "lang", "n_tokens",
            "(uniq_bp + (case when n_tokens >= 15 then 10000 else 0 end)) div 2 as quality_bp")
        quality
          .where("lang in ('en', 'es') and quality_bp >= 4000")
          .join(drops, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang", "n_tokens", "quality_bp")
      },
      Some {
        val dupSql = Dedup.all("d03_lsh_pairs").oracle.get
        s"""WITH drops AS (SELECT DISTINCT d2 AS doc_id FROM ($dupSql)),
            quality AS (
              SELECT doc_id, lang, len(string_split(text,' ')) AS n_tokens,
                     ((len(list_distinct(string_split(text,' '))) * 10000)
                        // len(string_split(text,' '))
                      + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                       AS quality_bp
              FROM documents)
            SELECT doc_id, lang, n_tokens, quality_bp
            FROM quality
            WHERE lang IN ('en', 'es') AND quality_bp >= 4000
              AND doc_id NOT IN (SELECT doc_id FROM drops)"""
      },
      bench = true)
  )
}
