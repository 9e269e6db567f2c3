package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only profiler: per-micro-batch duration breakdown for one
  * streaming query row. Test scope — not part of the library surface.
  * Usage: Test/runMain graft.tools.StreamProf <queryName> <sfDir>
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val s = graft.Sessions.local()
    s.streams.addListener(new StreamingQueryListener {
      def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        System.err.println(
          s"PROF batch=${p.batchId} rows=${p.numInputRows} durMs=${p.durationMs}")
      }
    })
    val t0 = System.nanoTime
    graft.SparkEntry.queries(name)(s, dir).count()
    System.err.println(f"PROF TOTAL ${(System.nanoTime - t0) / 1e9}%.2f s")
    s.stop()
  }
}
