package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * Join-strategy helpers shared by the driver-loop operators (BFS, beams,
 * k-hop). A broadcast hint is only safe when the frame is provably small;
 * loop frontiers grow with the data, so each hop gates the hint on the
 * frontier's materialized row count instead of hinting unconditionally.
 */
object Joins {

  /** Rows above which a frontier stops being broadcast and the join falls
    * back to AQE's choice (shuffle join, or a runtime broadcast conversion
    * if the measured bytes allow). ~1M ids is well under the default 8GB
    * broadcast-table hard cap but large enough that real frontiers at test
    * scale always take the fast path. */
  val BroadcastRowCap: Long = 1000000L

  /** Broadcast `f` only when its known row count is under `cap`. Callers
    * count a localCheckpoint'd frame, so the count is a cheap cached scan. */
  def gatedBroadcast(f: DataFrame, rows: Long,
                     cap: Long = BroadcastRowCap): DataFrame =
    if (rows <= cap) broadcast(f) else f
}
