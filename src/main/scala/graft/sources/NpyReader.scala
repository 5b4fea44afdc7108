package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** S1 — NumPy `.npy` matrix ingestion to the standard embeddings schema
  * `(vec_id: long, embedding: array<float>)`.
  *
  * The reference loads per-shard `.npy` float32 matrices
  * (vector_search_cluster.py:994-996) and mmap-batches them
  * (:1164-1188). The Spark rendition: a driver-side header scan of each
  * file (control-plane — a few hundred bytes per shard file) assigns
  * global row offsets in lexicographic path order, then a distributed
  * `binaryFile` read decodes rows map-side, one task per shard file.
  *
  * Scale notes: `binaryFile` materializes a whole file per task, so
  * shard files must be executor-memory-sized — exactly the reference's
  * sharding contract (shards are built to fit a serving node). Row ids
  * are reproducible: offset(path) + row index, offsets cumulative over
  * sorted paths.
  *
  * Supported: v1/v2 headers, dtype `<f4`, C-order, 2-D shape — the
  * reference's embedding matrix format. Anything else fails loudly.
  */
object NpyReader {

  /** Parsed header: (dataOffset, numRows, numCols). */
  private[sources] def parseHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 10 &&
      bytes(0) == 0x93.toByte && new String(bytes, 1, 5, "US-ASCII") == "NUMPY",
      "not a .npy file (bad magic)")
    val major = bytes(6).toInt
    val (hlen, hoff) = major match {
      case 1 => (((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff), 10)
      case 2 | 3 =>
        (((bytes(11) & 0xff) << 24) | ((bytes(10) & 0xff) << 16) |
          ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff), 12)
      case v => throw new IllegalArgumentException(s".npy version $v unsupported")
    }
    val header = new String(bytes, hoff, hlen, "US-ASCII")
    require("'descr'\\s*:\\s*'<f4'".r.findFirstIn(header).isDefined,
      s".npy dtype must be <f4 (little-endian float32): $header")
    require("'fortran_order'\\s*:\\s*False".r.findFirstIn(header).isDefined,
      s".npy must be C-order: $header")
    val shapeRe = "'shape'\\s*:\\s*\\((\\d+)\\s*,\\s*(\\d+)\\s*,?\\)".r
    val (n, d) = shapeRe.findFirstMatchIn(header) match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt)
      case None => throw new IllegalArgumentException(
        s".npy shape must be 2-D (n, d): $header")
    }
    (hoff + hlen, n, d)
  }

  /** Decode one file's rows: (rowIdx, embedding). */
  private[sources] def decodeRows(bytes: Array[Byte]): Iterator[(Long, Array[Float])] = {
    val (off, n, d) = parseHeader(bytes)
    require(bytes.length >= off + n.toLong * d * 4,
      s".npy truncated: need ${n.toLong * d * 4} data bytes, have ${bytes.length - off}")
    val fb = ByteBuffer.wrap(bytes, off, n * d * 4)
      .order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    Iterator.tabulate(n) { i =>
      val row = new Array[Float](d)
      fb.position(i * d)
      fb.get(row)
      (i.toLong, row)
    }
  }

  /** Read every `.npy` under `dir` into `(vec_id, embedding)`, vec_id
    * globally contiguous over files in lexicographic path order. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val fs = new Path(dir).getFileSystem(sc.hadoopConfiguration)
    // control-plane header scan: first 4 KB per shard file → row offsets
    val paths = fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".npy"))
      .map(_.getPath).sortBy(_.toString)
    // keyed by basename (unique within the shard dir): binaryFile's path
    // column renders the URI differently than Hadoop's qualified Path
    val rowCounts = paths.map { p =>
      val in = fs.open(p)
      try {
        val head = new Array[Byte](4096)
        val read = in.read(head, 0, 4096)
        val (_, n, _) = parseHeader(java.util.Arrays.copyOf(head, math.max(read, 0)))
        p.getName -> n.toLong
      } finally in.close()
    }
    val offsets = rowCounts.map(_._1)
      .zip(rowCounts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val bcOffsets = sc.broadcast(offsets)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npy")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val base = bcOffsets.value(path.substring(path.lastIndexOf('/') + 1))
        decodeRows(content).map { case (i, v) => (base + i, v) }
      }
      .toDF("vec_id", "embedding")
  }
}
