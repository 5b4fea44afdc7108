package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S1 inverse — export an embeddings table to per-shard NumPy `.npy`
  * files, the reference's native vector format
  * (vector_search_cluster.py:994-996): a user migrating back (or running
  * the reference's shard builders downstream) gets bit-faithful float32
  * matrices.
  *
  * Layout contract (round-trips through [[NpyReader]]): rows are
  * range-partitioned and sorted by `vec_id`, one `shard_%05d.npy` per
  * non-empty partition, so lexicographic file order = global vec_id
  * order. Each task buffers only its own shard — shard size is bounded
  * by the partition sizing, the same shards-fit-a-node contract the
  * reference builds to. */
object NpyWriter {

  private[sources] def header(n: Int, d: Int): Array[Byte] = {
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, $d), }"
    val padded = dict + " " * (63 - (10 + dict.length) % 64) + "\n"
    val buf = ByteBuffer.allocate(10 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes("US-ASCII"))
      .put(1.toByte).put(0.toByte)
      .putShort(padded.length.toShort)
      .put(padded.getBytes("US-ASCII"))
    buf.array()
  }

  /** Write `df(vec_id, embedding)` under `dir` as .npy shards. `parts`
    * controls shard count (0 = default parallelism). */
  def write(df: DataFrame, dir: String, parts: Int = 0): Unit = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(out)
    df.select(col("vec_id"), col("embedding"))
      .repartitionByRange(p, col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          // buffer the shard's data block; the v1 header needs the row
          // count up front and a shard is node-sized by construction
          val data = new ByteArrayOutputStream()
          var n = 0
          var d = 0
          val scratch = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          rows.foreach { r =>
            val v = r.getSeq[Float](1)
            d = v.length
            v.foreach { f =>
              scratch.clear(); scratch.putFloat(f)
              data.write(scratch.array(), 0, 4)
            }
            n += 1
          }
          // executor-side FS handle: default Configuration resolves the
          // same filesystem the path names (local or HDFS)
          val taskFs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
          val file = new Path(dir, f"shard_${TaskContext.getPartitionId()}%05d.npy")
          val os = taskFs.create(file, true)
          try { os.write(header(n, d)); data.writeTo(os) } finally os.close()
        }
      }
  }
}
