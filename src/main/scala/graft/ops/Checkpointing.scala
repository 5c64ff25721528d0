package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative trainers ([[Graph.pageRank]],
  * [[Bpe.train]]): each round must cut the plan back to constant size
  * (the analyzed tree otherwise grows multiplicatively and OOMs the
  * driver by ~16 rounds).
  *
  * Two modes, selected per call site:
  *   - `None` (default): eager `localCheckpoint` — blocks live on
  *     executor local storage. Right for single-node and short jobs,
  *     but an executor loss discards its blocks and fails the job (the
  *     lineage needed to recompute them was just truncated).
  *   - `Some(dir)`: eager reliable `checkpoint` against `dir` (HDFS/
  *     object store on a real cluster) — survives executor loss, costs
  *     one extra write+read of the round's state. At 100 TB / 1000
  *     executors, losing one executor mid-iteration-30 must not restart
  *     the whole chain: pass a durable dir there.
  *
  * Both modes are EAGER, so callers can unpersist inputs immediately
  * after; results are bit-identical between modes (asserted in
  * `CheckpointModeSpec`) — the mode changes fault-tolerance, never
  * values.
  */
object Checkpointing {

  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
}
