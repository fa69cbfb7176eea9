package graft.sync

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.{CorpusStats, DictRow, DocRow, IndexBlock}
import graft.index.IndexTables
import graft.sources.TableIO

/** Read/write of one index version's table set under v=<batchId>/. */
object Tables {

  def load(spark: SparkSession, io: TableIO, version: String): IndexTables = {
    import spark.implicits._
    val dir = io.versionDir(version)
    val docs = io.readParquet(s"$dir/docs").as[DocRow]
    val index = io.readParquet(s"$dir/index").as[IndexBlock]
    val dict = io.readParquet(s"$dir/dict").as[DictRow]
    val r = io.readParquet(s"$dir/stats").head()
    IndexTables(docs, index, dict,
      CorpusStats(r.getAs[Long]("n"), r.getAs[Double]("avgdl")))
  }

  def loadCurrent(spark: SparkSession, io: TableIO): Option[IndexTables] =
    io.currentVersion().map(v => load(spark, io, v))

  /** Write a merged version: docs + index land first, then dict and
    * corpus stats are derived from the freshly *written* parquet — a
    * column-pruned metadata scan (count/tfSum, doclen) — so the expensive
    * encode shuffle in the index plan executes exactly once.
    */
  def writeVersion(spark: SparkSession, io: TableIO, m: graft.index.MergedData,
                   ver: String): Unit = {
    val dir = io.versionDir(ver)
    io.writeParquet(m.docs.toDF(), s"$dir/docs")
    io.writeParquet(m.index.toDF(), s"$dir/index")
    deriveDictStats(spark, io, ver)
  }

  /** dict + corpus stats from the written docs/index parquet (pruned
    * metadata-column scans).
    */
  def deriveDictStats(spark: SparkSession, io: TableIO, ver: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = io.versionDir(ver)
    val idx = io.readParquet(s"$dir/index")
    io.writeParquet(
      idx.groupBy($"term").agg(sum($"count").as("df"), sum($"tfSum").as("cf")),
      s"$dir/dict")
    val row = io.readParquet(s"$dir/docs")
      .agg(count(lit(1)), sum($"doclen")).head()
    val n = row.getLong(0)
    val sumDl = if (row.isNullAt(1)) 0L else row.getLong(1)
    val stats = CorpusStats(n, if (n == 0) 0.0 else sumDl.toDouble / n)
    io.writeParquet(Seq(stats).toDF(), s"$dir/stats")
  }
}
