package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the documents/embeddings tables:
  * deduplication, text analysis, similarity search. SQL-expressible ones
  * carry DuckDB oracles; the sketch-based ones (MinHash/SimHash/LSH) are
  * deterministic and checked by their own specs + rows-only driver check.
  */
object PipelineQueries {
  import Btr.{t, pq}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: canonical doc per distinct text (hash-groupBy —
    // shuffle on a 64-bit text hash, not the full text, at scale the
    // standard first pass; here grouped on text directly for exactness)
    "q_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy("keep_id")
    }),

    // token count: whitespace tokenization per doc
    "q_token_count" -> ((s, d) => {
      t(s, d, "documents")
        .select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"),
          length(col("text")).as("n_chars_m"))
        .orderBy("doc_id")
    }),

    // quality scoring: length/punctuation/digit/whitespace ratios
    "q_text_quality" -> ((s, d) => {
      val text = col("text")
      val len = length(text).cast("double")
      t(s, d, "documents")
        .select(
          col("doc_id"),
          length(text).as("n_chars_m"),
          round(length(regexp_replace(text, "[^.!?,;:]", "")) / len, 4).as("punct_ratio"),
          round(length(regexp_replace(text, "[^0-9]", "")) / len, 4).as("digit_ratio"),
          round(length(regexp_replace(text, "[^ ]", "")) / len, 4).as("space_ratio"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        | length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        | length(text) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_m,
        | round(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
        | round(length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS digit_ratio,
        | round(length(regexp_replace(text, '[^ ]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS space_ratio
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
