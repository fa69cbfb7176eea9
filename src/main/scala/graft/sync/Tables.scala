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

  def write(spark: SparkSession, io: TableIO, t: IndexTables,
            version: String): Unit = {
    import spark.implicits._
    val dir = io.versionDir(version)
    io.writeParquet(t.docs.toDF(), s"$dir/docs")
    io.writeParquet(t.index.toDF(), s"$dir/index")
    io.writeParquet(t.dict.toDF(), s"$dir/dict")
    io.writeParquet(Seq(t.stats).toDF(), s"$dir/stats")
  }
}
