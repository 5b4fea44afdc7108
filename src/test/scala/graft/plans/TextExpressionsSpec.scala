package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)

  test("fused SimHash64 is identical to the HOF/oracle form on real docs") {
    val both = docs.select(
      Dedup.simhashExpr($"text").as("fast"),
      Dedup.simhashExprHof($"text").as("hof"))
    assert(both.where($"fast" =!= $"hof").count() == 0)
  }

  test("fused JaccardSim is identical to array_intersect/array_union form") {
    val sh = docs.select($"doc_id",
      TextFunctions.wordShingles($"text", 3).as("sh"))
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("fast"),
        Dedup.jaccardHof(col("a.sh"), col("b.sh")).as("hof"))
    assert(pairs.where($"fast" =!= $"hof").count() == 0)
  }

  test("fused HammingDistance equals the HOF form on simhash pairs") {
    val sh = Dedup.simhash(docs)
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.hammingDist(col("a.simhash"), col("b.simhash")).as("fast"),
        Dedup.hammingDistHof(col("a.simhash"), col("b.simhash")).as("hof"))
    assert(pairs.where($"fast" =!= $"hof").count() == 0)
  }

  test("JaccardSim handles duplicates and empties with set semantics") {
    val r = Seq(1).toDF("x").select(
      Dedup.jaccard(typedLit(Array("a", "a", "b")), typedLit(Array("b", "c"))).as("j1"),
      Dedup.jaccard(typedLit(Array.empty[String]), typedLit(Array.empty[String])).as("j2")).head()
    assert(r.getDouble(0) == 1.0 / 3.0)
    assert(r.getDouble(1) == 0.0)
  }
}
