package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // planted fixture: target speaks vocab A; the pool is half A-speakers,
  // half B-speakers — DSIR must overwhelmingly pick the A-speakers
  private def vocabDoc(vocab: Seq[String], seed: Int, len: Int): String =
    (0 until len).map(i => vocab(math.abs((seed * 31 + i * 17) % vocab.length))).mkString(" ")

  private val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val vocabB = Seq("one", "two", "three", "four", "five", "six")

  test("selection prefers pool docs matching the target distribution") {
    val target = (0 until 20).map(i => (i.toLong, vocabDoc(vocabA, i, 30)))
      .toDF("doc_id", "text")
    val pool = ((100 until 120).map(i => (i.toLong, vocabDoc(vocabA, i, 30))) ++
      (200 until 220).map(i => (i.toLong, vocabDoc(vocabB, i, 30))))
      .toDF("doc_id", "text")
    val picked = Dsir.select(target, pool, k = 20, b = 64)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val aPicked = picked.count(_ < 200)
    info(s"A-vocab docs in top-20: $aPicked/20")
    assert(aPicked >= 18, s"expected A-vocab docs to dominate, got $aPicked/20")
  }

  test("importance weights: A-speakers score higher than B-speakers, and logw is a sorted fold") {
    val target = (0 until 20).map(i => (i.toLong, vocabDoc(vocabA, i, 30)))
      .toDF("doc_id", "text")
    val pool = ((100 until 110).map(i => (i.toLong, vocabDoc(vocabA, i, 30))) ++
      (200 until 210).map(i => (i.toLong, vocabDoc(vocabB, i, 30))))
      .toDF("doc_id", "text")
    val ratios = Dsir.logRatios(target, pool, b = 64)
    assert(ratios.size == 64) // dense over all buckets
    val w = Dsir.importanceWeights(pool, ratios, b = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val minA = (100 until 110).map(i => w(i.toLong)).min
    val maxB = (200 until 210).map(i => w(i.toLong)).max
    info(f"min A logw = $minA%.3f, max B logw = $maxB%.3f")
    assert(minA > maxB)
  }

  test("klReport: DSIR-selected subset undercuts the random control on the planted fixture") {
    val target = (0 until 20).map(i => (i.toLong, vocabDoc(vocabA, i, 30)))
      .toDF("doc_id", "text")
    val pool = ((100 until 120).map(i => (i.toLong, vocabDoc(vocabA, i, 30))) ++
      (200 until 220).map(i => (i.toLong, vocabDoc(vocabB, i, 30))))
      .toDF("doc_id", "text")
    val picked = Dsir.select(target, pool, k = 10, b = 64).select($"doc_id")
    val selected = pool.join(picked, Seq("doc_id"), "left_semi")
    val rand = pool.orderBy(md5($"doc_id".cast("string")), $"doc_id").limit(10)
    val kl = Dsir.klReport(target,
      Seq("selected" -> selected, "random" -> rand, "pool" -> pool), b = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    info(s"kl = $kl")
    assert(kl("selected") < kl("random"))
    assert(kl("selected") < kl("pool"))
  }

  test("resample is deterministic and returns exactly k ranked rows") {
    val docs = (0 until 40).map(i => (i.toLong, vocabDoc(vocabA, i, 10)))
      .toDF("doc_id", "text")
    val ratios = Dsir.logRatios(docs, docs, b = 32)
    val weighted = Dsir.importanceWeights(docs, ratios, b = 32)
    val a = Dsir.resample(weighted, k = 10).collect().map(_.toSeq).toSeq
    val b = Dsir.resample(weighted, k = 10).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.length == 10)
    assert(a.map(_.head) == (1L to 10L))
  }
}
