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

  test("ngram_windows / text_stats from SQL equal the Column API") {
    registered
    spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
      .createOrReplaceTempView("docs_ext2")
    val stops = TextFunctions.enStopwords
    val stopsSql = stops.map(s => s"'$s'").mkString("array(", ",", ")")
    val sql = spark.sql(
      s"""SELECT doc_id,
         |       ngram_windows(split(trim(text), '\\\\s+'), 3) AS ng,
         |       text_stats(text, $stopsSql) AS st
         |FROM docs_ext2""".stripMargin)
    val api = spark.table("docs_ext2").select($"doc_id",
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.NgramWindows(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            split(trim($"text"), "\\s+")), 3)).as("ng"),
      TextFunctions.textStats($"text").as("st"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("mat_vec / centroid_argmin / pq_encode from SQL equal the Column API") {
    registered
    import graft.operators.{IvfIndex, PqIndex}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    emb.createOrReplaceTempView("emb_ext2")
    val cents = IvfIndex.seedCentroids(emb, 4)
    val cb = PqIndex.seedCodebooks(emb, m = 4, subDim = 16, ksub = 4)
    // a small projection matrix: first 4 centroid vectors as rows
    val mat = cents.map(_._2)
    def fArr(a: Array[Float]) = a.mkString("array(CAST(", " AS FLOAT),CAST(", " AS FLOAT))")
    def fMat(m: Array[Array[Float]]) = m.map(fArr).mkString("array(", ",", ")")
    def fCube(c: Array[Array[Array[Float]]]) = c.map(fMat).mkString("array(", ",", ")")
    val cidsSql = cents.map(_._1).mkString("array(", "L,", "L)")
    val sql = spark.sql(
      s"""SELECT vec_id,
         |       mat_vec(embedding, ${fMat(mat)}) AS mv,
         |       centroid_argmin(embedding, $cidsSql, ${fMat(cents.map(_._2))}) AS cid,
         |       pq_encode(embedding, ${fCube(cb)}, 16) AS codes
         |FROM emb_ext2""".stripMargin)
    import org.apache.spark.sql.graft.ColumnBridge
    val api = emb.select($"vec_id",
      ColumnBridge.column(graft.plans.MatVec(
        ColumnBridge.expression($"embedding"), mat)).as("mv"),
      ColumnBridge.column(graft.plans.CentroidArgmin(
        ColumnBridge.expression($"embedding"), cents.map(_._1), cents.map(_._2))).as("cid"),
      PqIndex.encodeExpr($"embedding", cb, 4, 16).as("codes"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("bloom_might_contain / mmr_select from SQL behave like the operator paths") {
    registered
    // bloom: filter over known hashes — members always hit, novel string
    // may false-positive but the 3 members must be true
    val seen = Seq("a", "b", "c").toDF("content_hash")
    val bloom = seen.stat.bloomFilter("content_hash", 3, 0.01)
    val bytes = { val o = new java.io.ByteArrayOutputStream(); bloom.writeTo(o); o.toByteArray }
    val hex = bytes.map("%02X".format(_)).mkString
    val r = spark.sql(
      s"""SELECT bloom_might_contain('a', X'$hex') AS ha,
         |       bloom_might_contain('b', X'$hex') AS hb,
         |       bloom_might_contain('c', X'$hex') AS hc""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    // mmr_select: SQL call equals the operator's fused selection
    import graft.operators.MmrRerank
    val cand = Seq(
      (1L, 0.9, Array(1f, 0f)), (2L, 0.8, Array(1f, 0.1f)), (3L, 0.5, Array(0f, 1f)))
      .toDF("vec_id", "score", "embedding")
    val packed = cand.agg(collect_list(struct($"vec_id", $"score", $"embedding")).as("c"))
    packed.createOrReplaceTempView("mmr_ext")
    val sqlSel = spark.sql(
      "SELECT inline(mmr_select(c, 0.5D, 2)) FROM mmr_ext")
      .collect().map(_.toString).toSeq
    val apiSel = packed.select(explode(MmrRerank.mmrSelect($"c", 0.5, 2)).as("s"))
      .select($"s.*").collect().map(_.toString).toSeq
    assert(sqlSel == apiSel)
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

  test("FuseDistanceRule: cosine ratio shape fuses to the one-pass CosineSim") {
    registered
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(60)
    emb.createOrReplaceTempView("emb_cos")
    // canonical Column-API HOF tree: dot/(norm·norm)
    val api = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ai"), $"b.vec_id".as("bi"),
        Distances.cosineSim($"a.embedding", $"b.embedding").as("cs"))
    val apiPlan = api.queryExecution.executedPlan.toString
    assert(apiPlan.contains("cosinesim"),
      s"rule must fuse the cosine ratio into CosineSim:\n$apiPlan")
    // SQL spelling of the same ratio over HOF dots
    val dotSql = (x: String, y: String) =>
      s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    val sql = spark.sql(
      s"""SELECT a.vec_id AS ai, b.vec_id AS bi,
         |  ${dotSql("a.embedding", "b.embedding")} /
         |    (sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("b.embedding", "b.embedding")})) AS cs
         |FROM emb_cos a JOIN emb_cos b ON a.vec_id < b.vec_id""".stripMargin)
    val sqlPlan = sql.queryExecution.executedPlan.toString
    assert(sqlPlan.contains("cosinesim"),
      s"rule must fuse the SQL cosine ratio:\n$sqlPlan")
    // results equal the fused Column API exactly
    val fast = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ai"), $"b.vec_id".as("bi"),
        Distances.cosineSimFast($"a.embedding", $"b.embedding").as("cs"))
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
