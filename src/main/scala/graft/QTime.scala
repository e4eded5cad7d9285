package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness: run named registry queries once (after one
 *  untimed warmup of the first name) against SPARK_GRAFT_SF_DIR and
 *  print per-query seconds — the single-query iterate loop Bench is
 *  too coarse for. Same measurement contract as Bench: noop sink,
 *  persistent-RDD sweep + cache clear between queries. */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QTime <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.stateRoot =
      s"/tmp/graft_qstate_q${ProcessHandle.current().pid()}_" +
        s"${System.currentTimeMillis()}"
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      s
    }
    runOne(args.head) // untimed warmup
    args.foreach { n =>
      println(f"$n%-28s ${runOne(n)}%.2f s")
    }
    try {
      val root = new org.apache.hadoop.fs.Path(SparkEntry.stateRoot)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
