package graft.sync

import java.sql.Timestamp
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sources.TableIO

/** Multi-field update-timestamp watermark — the reference's full P3
  * semantics (lib/sync/downloader.js:194-243): a record is due when ANY
  * of its update-timestamp fields advanced past that field's watermark,
  * bounded above by the batch timestamp, where secondary fields are
  * nullable — `(ts1 > lo1 OR (ts2 IS NOT NULL AND ts2 > lo2)) AND
  * ts1 <= batchTs AND (ts2 IS NULL OR ts2 <= batchTs)` (the null branch:
  * dataAdapters worker.js + downloader.js:199-207). The first batch uses
  * `>=` at an epoch-0 watermark (getOp, downloader.js:185-192).
  */
object Watermark {

  val Epoch0 = new Timestamp(0L)

  /** The predicate as one Catalyst Column — pushes down to the parquet
    * scan like any native filter. `cols.head` is the primary (non-null)
    * timestamp; the rest are nullable secondaries.
    */
  def predicate(los: Map[String, Timestamp], batchTs: Timestamp,
                cols: Seq[String]): Column = {
    require(cols.nonEmpty, "watermark needs at least one timestamp column")
    val advanced = cols.map { c =>
      val lo = los.getOrElse(c, Epoch0)
      val cmp = if (lo.getTime == 0L) col(c) >= lit(lo) else col(c) > lit(lo)
      if (c == cols.head) cmp else col(c).isNotNull && cmp
    }.reduce(_ || _)
    val bounded = cols.map { c =>
      if (c == cols.head) col(c) <= lit(batchTs)
      else col(c).isNull || col(c) <= lit(batchTs)
    }.reduce(_ && _)
    advanced && bounded
  }

  /** Persisted per-field maxima for SECONDARY timestamp columns (the
    * primary's watermark derives from the docs table itself). Reference
    * analog: per-field state in internalConfig.json.
    */
  def read(io: TableIO): Map[String, Timestamp] =
    io.readSmallFile(s"${io.root}/watermarks")
      .map(_.linesIterator.filter(_.contains('=')).map { l =>
        val Array(c, ms) = l.split("=", 2)
        c -> new Timestamp(ms.trim.toLong)
      }.toMap)
      .getOrElse(Map.empty)

  def write(io: TableIO, maxes: Map[String, Timestamp]): Unit =
    io.writeSmallFile(s"${io.root}/watermarks",
      maxes.toSeq.sortBy(_._1)
        .map { case (c, t) => s"$c=${t.getTime}" }.mkString("\n"))
}
