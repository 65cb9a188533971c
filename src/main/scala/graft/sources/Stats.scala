package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Planning-time dataset statistics.
  *
  * The ANN operators size their hash/cell spaces from the input row
  * count (SURVEY §5) — the same class of statistic AQE plans from. The
  * count comes from parquet FOOTER metadata (exact, no Spark job) and
  * is cached per (path) per JVM, so repeated query constructions
  * (d07 + d15 + d17 in one run) never re-read it, and benchmark timings
  * measure the query itself rather than a planning-time count job.
  */
object Stats {

  private val rowCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Exact row count of a parquet file or directory of part files. */
  def parquetRowCount(s: SparkSession, path: String): Long =
    rowCounts.getOrElseUpdate(path, {
      val conf = s.sparkContext.hadoopConfiguration
      val root = new Path(path)
      val fs = root.getFileSystem(conf)
      val files: Seq[Path] =
        if (fs.getFileStatus(root).isFile) Seq(root)
        else {
          val it = fs.listFiles(root, true)
          val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
          while (it.hasNext) {
            val f = it.next()
            if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f.getPath
          }
          buf.toSeq
        }
      files.iterator.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try reader.getRecordCount finally reader.close()
      }.sum
    })
}
