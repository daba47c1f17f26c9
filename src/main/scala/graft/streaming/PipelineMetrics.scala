package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline observability: per-micro-batch row/value metrics via
  * `Dataset.observe` + a StreamingQueryListener — the monitoring seam a
  * production KSE deployment watches (throughput, gate reject rates,
  * sink volume) without touching the data path.
  *
  * `observe` metrics are aggregates computed INSIDE the existing plan
  * (piggy-backed on whatever exchange the query already does — zero
  * extra passes, zero extra shuffles at any scale), reported once per
  * micro-batch through the listener bus rather than written to the
  * sink. The listener keeps running totals in a concurrent map, so
  * operators and tests read a consistent snapshot while the stream is
  * live; production would forward the same events to a metrics backend
  * instead.
  */
object PipelineMetrics {

  /** Attach standard corpus-gate metrics to a document stream: rows seen
    * plus how many a `keep` predicate column retains — the reject-rate
    * counter for any curation gate, evaluated in-plan. */
  def observeGate(ds: Dataset[Row], name: String, keepCol: String): Dataset[Row] =
    ds.observe(name,
      count(lit(1)).as("rows"),
      sum(when(col(keepCol), 1L).otherwise(0L)).as("kept"))

  /** Attach a row-count + value-sum observation (sink-volume shape). */
  def observeVolume(ds: Dataset[Row], name: String, valueCol: String): Dataset[Row] =
    ds.observe(name,
      count(lit(1)).as("rows"),
      sum(col(valueCol)).as("value_sum"))

  /** Accumulates every named observation across micro-batches. One
    * instance per test/deployment; register with
    * `spark.streams.addListener`. */
  final class Accumulator extends StreamingQueryListener {
    private val totals = TrieMap.empty[(String, String), Long]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      om.keySet.forEach { name =>
        val row = om.get(name)
        row.schema.fieldNames.foreach { f =>
          val v = row.getAs[Any](f) match {
            case null       => 0L
            case l: Long    => l
            case i: Int     => i.toLong
            case other      => other.toString.toDouble.toLong
          }
          totals.updateWith((name, f)) {
            case Some(prev) => Some(prev + v)
            case None       => Some(v)
          }
        }
      }
    }

    /** Running total for (observation name, metric field); 0 if unseen. */
    def total(name: String, field: String): Long =
      totals.getOrElse((name, field), 0L)

    def snapshot: Map[(String, String), Long] = totals.toMap
  }
}
