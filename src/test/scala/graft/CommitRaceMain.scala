package graft

/** One OS-process contender for the cross-process commit-protocol
  * stress ([[CrossProcessCommitSpec]]): loops optimistic-concurrency
  * commits through [[graft.pipeline.MergeTable.raceCommit]] — the real
  * claim/CAS/commit code — retrying on the loud concurrent-writer
  * failures until `n` commits landed. No SparkSession: the protocol is
  * pure Hadoop-FS, so the contender JVM starts in ~a second and the
  * race is between PROCESSES (separate page caches, no shared JVM
  * memory fences), the shape real concurrent writers have. */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, writer, nStr) = args
    val conf = new org.apache.hadoop.conf.Configuration()
    val n = nStr.toInt
    val rnd = new java.util.Random(writer.hashCode.toLong)
    var done = 0
    var attempts = 0
    while (done < n) {
      attempts += 1
      if (attempts > 5000) {
        System.err.println(s"$writer livelocked after $attempts attempts")
        sys.exit(2)
      }
      try {
        graft.pipeline.MergeTable.raceCommit(conf, dir, writer)
        done += 1
      } catch {
        case e: IllegalStateException
            if e.getMessage.contains("concurrent writer") ||
              e.getMessage.contains("claimed") =>
          Thread.sleep(5L + rnd.nextInt(25).toLong)
      }
    }
    println(s"$writer done=$done attempts=$attempts")
  }
}
