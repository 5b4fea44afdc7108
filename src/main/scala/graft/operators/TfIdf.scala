package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF keyword extraction over the corpus — the classic
  * term-weighting pass (per-doc salient terms for indexing, quality
  * filtering, topic tagging). Smoothed idf (sklearn convention):
  * idf(t) = ln((N + 1)/(df(t) + 1)) + 1, score = tf · idf.
  *
  * Scale design: tf is one map-side-combinable (doc, term) aggregate;
  * the document-frequency table is VOCABULARY-sized (≪ corpus — Heaps'
  * law), so it broadcasts and the corpus-side join never shuffles; the
  * final top-k window is partitioned per doc. All arithmetic is
  * deterministic doubles (ln on both engines), so the path is exactly
  * oracle-checkable.
  */
object TfIdf {

  /** Top `k` terms per doc by (score desc, term asc). Columns:
    * doc_id, rank, term, tf, df, score. */
  def topTerms(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.count() // control-plane scalar
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), Seq("term"))
      .withColumn("idf",
        log((lit(n.toDouble) + 1.0) / (col("df").cast("double") + 1.0)) + 1.0)
      .withColumn("score", col("tf").cast("double") * col("idf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        col("tf"), col("df"), col("score"))
  }
}
