package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** FAISS `IndexFlat` interop — the reference serves its product search
  * from prebuilt FAISS artifacts loaded with `faiss.read_index`
  * (reference app.py:75-80: faiss_products_flat.index,
  * faiss_reviews_ivf.index). This source reads the FLAT family
  * (IndexFlatIP / IndexFlatL2 — a small header over contiguous
  * row-major float32 vectors, the exact payload of the matching
  * `.npy` matrix) into the engine's (vec_id, embedding) frame shape,
  * with the same distributed byte-range scan as [[NpySource]]: the
  * driver parses only the fixed 45-byte header, executors seek
  * record-aligned slices through the Hadoop FS API.
  *
  * Format (public, faiss/impl/index_write.cpp `write_index` +
  * `write_index_header`): fourcc "IxFI" (inner-product) or "IxF2"
  * (L2), d int32, ntotal int64, two reserved int64 (1<<20 in every
  * release), is_trained uint8, metric_type int32, then the code
  * vector's element count as uint64 followed by ntotal*d
  * little-endian float32 values. Quantized/IVF families ("IwFl",
  * "IvPQ", …) carry trained state beyond a flat payload and are
  * rejected with a clear message — the engine BUILDS its own analogs
  * of those ([[graft.operators.Ivf]], [[graft.operators.Quantized]]).
  */
object FaissSource {

  /** Parsed IndexFlat header: metric ("ip"/"l2"), dims, rows, and the
    * byte offset where the float payload starts (always 45).
    */
  private[sources] final case class FlatHeader(metric: String, dim: Int, rows: Long,
                                               dataOffset: Long)

  private[sources] def parseHeader(bytes: Array[Byte]): FlatHeader = {
    require(bytes.length >= 45, "faiss index shorter than the IndexFlat preamble")
    val fourcc = new String(bytes.slice(0, 4), StandardCharsets.US_ASCII)
    require(fourcc == "IxFI" || fourcc == "IxF2",
      s"unsupported faiss index type '$fourcc' (IndexFlat IP/L2 only; " +
        "IVF/PQ artifacts carry trained state — rebuild with the engine's Ivf/Quantized ops)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    val d = bb.getInt
    val ntotal = bb.getLong
    bb.getLong; bb.getLong // reserved (1 << 20 in every faiss release)
    bb.get // is_trained — a flat index is always trained
    bb.getInt // metric_type — redundant with the fourcc for the flat family
    val nFloats = bb.getLong
    require(d > 0 && ntotal >= 0, s"implausible faiss header: d=$d ntotal=$ntotal")
    require(nFloats == ntotal * d,
      s"faiss payload count $nFloats != ntotal*d = ${ntotal * d} (truncated file?)")
    FlatHeader(if (fourcc == "IxFI") "ip" else "l2", d, ntotal, 45L)
  }

  /** Read a FAISS IndexFlat file as (vec_id, embedding) — vec_id is
    * the 0-based insertion index, exactly how the reference maps FAISS
    * result ids back to product rows. Same scale shape as
    * [[NpySource.readNpy]]: record-aligned `batchRows` ranges
    * parallelized across the cluster, each task seeking only its
    * slice — no whole-file buffering anywhere.
    */
  def readFlat(spark: SparkSession, path: String, batchRows: Int = 65536): DataFrame = {
    import spark.implicits._
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val header = {
      val in = fs.open(hadoopPath)
      try {
        val buf = new Array[Byte](math.min(fs.getFileStatus(hadoopPath).getLen, 45L).toInt)
        in.readFully(0L, buf)
        parseHeader(buf)
      } finally in.close()
    }
    val rowBytes = header.dim.toLong * 4
    val ranges = (0L until header.rows by batchRows.toLong)
      .map(start => (start, math.min(batchRows.toLong, header.rows - start).toInt))
    val pathStr = path
    val cols = header.dim
    val dataOffset = header.dataOffset
    spark.createDataset(ranges)
      .repartition(math.max(1, math.min(ranges.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val p = new Path(pathStr)
          val fsx = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val in = fsx.open(p)
          val out = it.flatMap { case (start, count) =>
            val bytes = new Array[Byte]((count * rowBytes).toInt)
            in.readFully(dataOffset + start * rowBytes, bytes)
            val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
            (0 until count).iterator.map { i =>
              val row = new Array[Float](cols)
              var j = 0; while (j < cols) { row(j) = bb.getFloat; j += 1 }
              (start + i, row)
            }
          }
          new Iterator[(Long, Array[Float])] {
            def hasNext: Boolean = { val h = out.hasNext; if (!h) in.close(); h }
            def next(): (Long, Array[Float]) = out.next()
          }
        }
      }
      .toDF("vec_id", "embedding")
  }
}
