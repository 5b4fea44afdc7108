package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IvfIndex, SparseTopK}

/** Versioned publish/rollback semantics: readers only ever see complete
  * versions, the pointer flip is last, rollback is one pointer write,
  * and pruning never drops the pointed-at version. */
class IndexVersionsSpec extends SparkSpec {
  import spark.implicits._

  test("publish → read latest → publish again → rollback → prune keeps the pinned version") {
    val dir = Files.createTempDirectory("idxver").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = IvfIndex.seedCentroids(emb, 8)

    assert(IndexVersions.latest(spark, dir).isEmpty)

    val v1 = IndexVersions.publish(spark, dir) { p =>
      IvfIndex.writeIndex(IvfIndex.assign(emb, cents), cents, p)
    }
    assert(v1 == 1L && IndexVersions.latest(spark, dir).contains(1L))

    val v2 = IndexVersions.publish(spark, dir) { p =>
      IvfIndex.writeIndex(IvfIndex.assign(emb.where($"vec_id" < 100), cents), cents, p)
    }
    assert(v2 == 2L && IndexVersions.latest(spark, dir).contains(2L))
    // latest read sees v2's smaller corpus
    val (_, a2) = IvfIndex.loadIndex(spark, IndexVersions.latestPath(spark, dir).get)
    assert(a2.count() == 100)

    // rollback = one pointer write; the full corpus is served again
    IndexVersions.setPointer(spark, dir, 1L)
    val (_, a1) = IvfIndex.loadIndex(spark, IndexVersions.latestPath(spark, dir).get)
    assert(a1.count() == emb.count())

    // prune keeps the newest `keep` AND the pinned version
    val v3 = IndexVersions.publish(spark, dir) { p =>
      IvfIndex.writeIndex(IvfIndex.assign(emb.where($"vec_id" < 50), cents), cents, p)
    }
    IndexVersions.setPointer(spark, dir, 1L) // pin the oldest
    val dropped = IndexVersions.prune(spark, dir, keep = 1)
    assert(!dropped.contains(1L), "pinned version must survive pruning")
    assert(IndexVersions.versions(spark, dir).contains(1L) &&
      IndexVersions.versions(spark, dir).contains(v3))

    // a crashed publish (directory written, pointer not flipped) is not served
    val preCrash = IndexVersions.latest(spark, dir)
    new java.io.File(s"$dir/v_99").mkdirs()
    assert(IndexVersions.latest(spark, dir) == preCrash,
      "an unpointed version directory must never be served")
  }

  test("works for the lexical impact index too (any directory artifact)") {
    val dir = Files.createTempDirectory("idxver2").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    IndexVersions.publish(spark, dir) { p =>
      SparseTopK.writeIndex(SparseTopK.buildImpactIndex(docs), p)
    }
    val terms = Seq("vector", "spark")
    val fromVersioned = SparseTopK.taTopKPersisted(
      spark, IndexVersions.latestPath(spark, dir).get, terms, 5)
    val direct = SparseTopK.taTopK(
      SparseTopK.buildImpactIndex(docs).localCheckpoint(true), terms, 5)
    assert(fromVersioned.collect().map(_.toSeq).toSeq ==
      direct.collect().map(_.toSeq).toSeq)
  }
}
