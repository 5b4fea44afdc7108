package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.functions.{Distances, TextFunctions}
import graft.operators.Dedup

/** The fused expressions as plain SQL functions: registered on a live
  * session, each SQL call must equal its Column-API twin exactly. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered: Unit = GraftFunctions.register(spark)

  test("l2_sq / dot_product from SQL equal the Column API on real vectors") {
    registered
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
      .createOrReplaceTempView("emb_ext")
    val sql = spark.sql(
      """SELECT a.vec_id AS ai, b.vec_id AS bi,
        |       l2_sq(a.embedding, b.embedding) AS l2,
        |       dot_product(a.embedding, b.embedding) AS dp
        |FROM emb_ext a JOIN emb_ext b ON a.vec_id < b.vec_id""".stripMargin)
    val emb = spark.table("emb_ext")
    val api = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ai"), $"b.vec_id".as("bi"),
        Distances.l2SqFast($"a.embedding", $"b.embedding").as("l2"),
        Distances.dotFast($"a.embedding", $"b.embedding").as("dp"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("text functions from SQL equal the Column API on real docs") {
    registered
    spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
      .createOrReplaceTempView("docs_ext")
    val sql = spark.sql(
      """SELECT doc_id,
        |       simhash64(split(trim(text), '\\s+')) AS sh,
        |       min_shingle_hash(split(trim(text), '\\s+'), 3) AS fp,
        |       shingle_windows(split(trim(text), '\\s+'), 3) AS shg,
        |       pair_windows(split(trim(text), '\\s+')) AS pw,
        |       top_token_count(split(trim(text), '\\s+')) AS ttc,
        |       minhash_signature(shingle_windows(split(trim(text), '\\s+'), 3), 4) AS sig
        |FROM docs_ext""".stripMargin)
    val api = spark.table("docs_ext").select($"doc_id",
      Dedup.simhashExpr($"text").as("sh"),
      TextFunctions.docFingerprint($"text", 3).as("fp"),
      TextFunctions.wordShingles($"text", 3).as("shg"),
      TextFunctions.wordBigrams($"text").as("pw"),
      TextFunctions.topTokenCount($"text").as("ttc"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.MinHashSignature(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            TextFunctions.wordShingles($"text", 3)), 4)).as("sig"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("jaccard_sim and hamming_distance from SQL") {
    registered
    val r = spark.sql(
      """SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j,
        |       hamming_distance('1010', '1001') AS h""".stripMargin).head()
    assert(r.getDouble(0) == 0.5)
    assert(r.getInt(1) == 2)
  }

  test("sq_distance from SQL equals the Column API on real SQ8 data") {
    registered
    import graft.operators.SqIndex
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (vmin, scale) = SqIndex.trainMinMax(emb, 64)
    SqIndex.encode(emb, vmin, scale).createOrReplaceTempView("sq_ext")
    def arr(a: Array[Double]) = a.mkString("array(", "D,", "D)")
    val sql = spark.sql(
      s"""SELECT a.vec_id AS ai, b.vec_id AS bi,
         |       sq_distance(a.embedding, b.codes, ${arr(vmin)}, ${arr(scale)}) AS d
         |FROM sq_ext a JOIN sq_ext b ON a.vec_id < 3 AND b.vec_id >= 3""".stripMargin)
    val t = spark.table("sq_ext")
    val api = t.as("a").join(t.as("b"), $"a.vec_id" < 3 && $"b.vec_id" >= 3)
      .select($"a.vec_id".as("ai"), $"b.vec_id".as("bi"),
        SqIndex.sqDist($"a.embedding", $"b.codes", 64, vmin, scale).as("d"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("extensions injection path builds the same descriptors") {
    // the config path (spark.sql.extensions=graft.GraftExtensions) uses
    // injectFunction with the identical builders; exercising apply()
    // validates the descriptor wiring without a second SparkContext
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("non-literal parameter is rejected loudly") {
    registered
    val e = intercept[Exception] {
      spark.sql("SELECT min_shingle_hash(array('a'), 1 + 2) AS x").collect()
    }
    assert(e.getMessage != null)
  }

  test("FuseDistanceRule: HOF distance patterns compile to the fused codegen expressions") {
    registered
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(100)
    emb.createOrReplaceTempView("emb_fuse")
    // Column-API HOF forms (Distances.l2Sq / dot)
    val api = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ai"), $"b.vec_id".as("bi"),
        Distances.l2Sq($"a.embedding", $"b.embedding").as("l2"),
        Distances.dot($"a.embedding", $"b.embedding").as("dp"))
    val apiPlan = api.queryExecution.executedPlan.toString
    assert(apiPlan.contains("l2sqdistance") && apiPlan.contains("dotproduct"),
      s"rule must fuse the Column-API HOF chains:\n$apiPlan")
    // hand-written SQL HOF form with inline casts
    val sql = spark.sql(
      """SELECT a.vec_id AS ai, b.vec_id AS bi,
        |  aggregate(zip_with(a.embedding, b.embedding,
        |    (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |    0.0D, (acc, v) -> acc + v) AS l2,
        |  aggregate(zip_with(a.embedding, b.embedding,
        |    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |    0.0D, (acc, v) -> acc + v) AS dp
        |FROM emb_fuse a JOIN emb_fuse b ON a.vec_id < b.vec_id""".stripMargin)
    val sqlPlan = sql.queryExecution.executedPlan.toString
    assert(sqlPlan.contains("l2sqdistance") && sqlPlan.contains("dotproduct"),
      s"rule must fuse the SQL HOF chains:\n$sqlPlan")
    // results equal the fused Column API exactly (numerics identical)
    val fast = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ai"), $"b.vec_id".as("bi"),
        Distances.l2SqFast($"a.embedding", $"b.embedding").as("l2"),
        Distances.dotFast($"a.embedding", $"b.embedding").as("dp"))
    assert(sql.exceptAll(fast).isEmpty && fast.exceptAll(sql).isEmpty)
    assert(api.exceptAll(fast).isEmpty && fast.exceptAll(api).isEmpty)
  }

  test("FuseDistanceRule leaves non-distance aggregates alone") {
    registered
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(20)
    // element sum — same aggregate skeleton, different lambda body
    val df = emb.select(Distances.elementSum($"embedding").as("s"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("l2sqdistance") && !p.contains("dotproduct"))
    assert(df.count() == 20)
  }
}
