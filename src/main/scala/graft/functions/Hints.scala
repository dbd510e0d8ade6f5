package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared physical-plan hints. */
object Hints {

  /** Rows past which [[msgHint]] withholds the broadcast hint (~2 GB hashed
    * at two longs/row) — ONE definition for every round-loop caller
    * (GraphQ's rank/peel/label rounds, DedupClusters' CC rounds), so the
    * node-table discipline can't drift per file (ADVICE r12 #5).
    */
  val MsgBroadcastMaxRows: Long = 30000000L

  /** Size-gated broadcast hint for the NODE-sized message/label/state table
    * of a propagation round: the node table is O(nodes) while the edge list
    * is O(edges) and checkpointed in place, so shipping node state to the
    * edges beats shuffling edges to state by the edge/node ratio — every
    * round. Past [[MsgBroadcastMaxRows]] the hint is withheld and Catalyst
    * plans the shuffle join: correct at any scale, broadcast-fast on every
    * measurable one.
    */
  def msgHint(df: DataFrame, rows: Long): DataFrame =
    if (rows >= 0 && rows <= MsgBroadcastMaxRows) broadcast(df) else df
}
