package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Late-data accounting: how many rows each stateful stage silently
  * dropped because they arrived beyond the watermark, and where the
  * watermark currently stands — read from the engine's own
  * `StreamingQueryProgress` (`stateOperators.numRowsDroppedByWatermark`,
  * `eventTime.watermark`), so the numbers are authoritative and cost
  * ZERO extra work in the data path (no second pass, no observe column,
  * no shuffle at any scale).
  *
  * Watermark drops are the one place a streaming pipeline loses data by
  * DESIGN; a deployment that doesn't count them can't distinguish "no
  * late data" from "an upstream clock skew is silently shedding 2% of
  * events". Pair with [[QuotaStage]]-style dead-lettering when late rows
  * must be kept instead of counted.
  */
object LateDataAudit {

  /** Accumulates watermark-drop totals per query name across
    * micro-batches. One instance per test/deployment; register with
    * `spark.streams.addListener`. */
  final class Listener extends StreamingQueryListener {
    private val drops = TrieMap.empty[String, Long]
    private val watermarks = TrieMap.empty[String, String]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      // numRowsDroppedByWatermark is per-trigger; sum across batches
      val batchDrops = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      if (batchDrops > 0)
        drops.updateWith(name) { prev => Some(prev.getOrElse(0L) + batchDrops) }
      Option(p.eventTime.get("watermark")).foreach(w => watermarks.update(name, w))
    }

    /** Total rows dropped past the watermark by `queryName` so far. */
    def dropped(queryName: String): Long = drops.getOrElse(queryName, 0L)

    /** Last reported watermark of `queryName` (ISO-8601), if any. */
    def watermark(queryName: String): Option[String] = watermarks.get(queryName)
  }
}
