package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 ranked retrieval — the keyword-search complement to the vector
  * paths (the lexical half of standard hybrid search). Okapi BM25:
  *
  *   score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
  *   idf(t)      = ln((N − df + 0.5)/(df + 0.5) + 1)
  *
  * Scale design: only query-term postings materialize (the `isin`
  * pushes into the scan), the df/idf side is |query| rows → broadcast,
  * per-doc term scores fold in SORTED term order (a fixed fold order —
  * double addition is not associative, and an unordered SUM would be
  * partition-order-dependent), and the global top-N executes as
  * per-partition top-N + merge (`orderBy.limit`), never a
  * single-partition window.
  */
object Bm25 {

  /** Top `topN` docs for a bag-of-words query, by (score desc, doc_id). */
  def rank(docs: DataFrame, queryTerms: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val lens = docs.select(col("doc_id"),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("len"))
    val n = docs.count() // control-plane scalars
    val totalLen = lens.agg(sum(col("len"))).head().getLong(0)
    val avgdl = totalLen.toDouble / n
    val tf = toks.where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df from the postings themselves: a tf row exists iff the doc
    // contains the term — |queryTerms| rows, broadcast
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val idf = log((lit(n.toDouble) - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / avgdl)
    val termScore = idf * (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") + norm)
    tf.join(broadcast(df), Seq("term"))
      .join(lens, Seq("doc_id"))
      .select(col("doc_id"), col("term"), termScore.as("tscore"))
      .groupBy(col("doc_id"))
      // fixed fold order (term asc) so the double sum is reproducible
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("tscore")))),
        lit(0.0),
        (acc, s) => acc + s.getField("tscore")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** Batch-query BM25 — Q bag-of-words queries as ONE plan (the lexical
    * twin of [[SparseTopK.taTopKBatch]] and of the dense family's
    * broadcast query batch, vector_search_cluster.py:794-812):
    * `queryTerms` is a (query_id: long, term: string) table. Postings
    * materialize once for the UNION of all query terms (one semi-join
    * pushed to the scan), df/idf stay per-term (identical to the
    * single-query values), and the per-query fan-out is a broadcast join
    * onto the scored postings — the corpus is read once regardless of Q.
    * Per-query top-N runs as the partial+final WindowGroupLimit shape.
    * Output: (query_id, rank, doc_id, score), scores bit-identical to Q
    * separate [[rank]] calls (same term-sorted fold per doc). */
  def rankBatch(docs: DataFrame, queryTerms: DataFrame, topN: Int,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text"): DataFrame = {
    val q = queryTerms.select(col("query_id"), col("term")).distinct()
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val lens = docs.select(col("doc_id"),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("len"))
    val n = docs.count() // control-plane scalars
    val totalLen = lens.agg(sum(col("len"))).head().getLong(0)
    val avgdl = totalLen.toDouble / n
    val tf = toks
      .join(broadcast(q.select(col("term")).distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((lit(n.toDouble) - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / avgdl)
    val termScore = idf * (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") + norm)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(df), Seq("term"))
      .join(lens, Seq("doc_id"))
      .join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("term"), termScore.as("tscore"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("tscore")))),
        lit(0.0),
        (acc, s) => acc + s.getField("tscore")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topN)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[rankBatch]] over a PREBUILT impact index
    * ([[SparseTopK.buildImpactIndex]], whose `impact` column IS this
    * module's termScore — same k1/b/idf/norm expressions, bit-identical
    * doubles): exhaustive batch scoring becomes one grouped fold over
    * the index⋈queries join — no tokenization pass, no df aggregate,
    * the index-reuse serving shape. Rows are bit-identical to
    * [[rankBatch]] on the source corpus (same per-doc term-sorted
    * fold). */
  def rankBatchFromIndex(index: DataFrame, queryTerms: DataFrame,
      topN: Int): DataFrame = {
    val q = queryTerms.select(col("query_id"), col("term")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    index.join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("impact")))),
        lit(0.0),
        (acc, s) => acc + s.getField("impact")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topN)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }
}
