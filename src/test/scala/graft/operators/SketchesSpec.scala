package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet").cache()

  test("HLL estimate lands within the theoretical error band (1.04/sqrt(m), 5 sigma)") {
    val exact = li.agg(countDistinct($"l_orderkey")).head().getLong(0)
    val est = Sketches.hllEstimate(Sketches.hllRegisters(li, "l_orderkey", 64), 64)
      .head().getLong(2)
    val relErr = math.abs(est - exact).toDouble / exact
    info(f"HLL m=64: est=$est exact=$exact relErr=$relErr%.4f")
    assert(relErr <= 5 * 1.04 / math.sqrt(64.0))
  }

  test("HLL merge invariant: max-merged partial registers equal the full sketch") {
    val full = Sketches.hllRegisters(li, "l_orderkey", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // split three ways on an UNRELATED key — merge must not care how
    // the data was partitioned
    val merged = (0 until 3).map(i =>
        Sketches.hllRegisters(li.where(pmod($"l_partkey", lit(3)) === i),
          "l_orderkey", 64))
      .reduce(_ unionAll _)
      .groupBy($"bucket").agg(max($"rho").as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == full)
  }

  test("HLL register table is model-plane bounded: at most m rows, rho within bits+1") {
    val regs = Sketches.hllRegisters(li, "l_orderkey", 16).collect()
    assert(regs.length <= 16)
    assert(regs.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 29))
  }

  test("Count-Min is one-sided: est >= exact for EVERY key; table is d*w bounded") {
    val cms = Sketches.countMinTable(li, "l_suppkey")
    assert(cms.count() <= 4 * 256)
    val exact = li.groupBy($"l_suppkey").agg(count(lit(1)).as("exact"))
      .select($"l_suppkey".cast("string").as("k"), $"exact")
    val joined = Sketches.countMinLookup(cms, exact)
      .join(exact, Seq("k"))
      .select($"k", $"est", $"exact").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"CMS underestimated key ${r.getString(0)}")
    }
  }

  test("Count-Min merge: summed half-tables equal the full table") {
    val full = Sketches.countMinTable(li, "l_suppkey")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val merged = (0 until 2).map(i =>
        Sketches.countMinTable(li.where(pmod($"l_orderkey", lit(2)) === i), "l_suppkey"))
      .reduce(_ unionAll _)
      .groupBy($"row", $"slot").agg(sum($"cnt").as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged == full)
  }
}
