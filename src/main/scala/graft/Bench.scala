package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // throwaway warmup: absorb JVM/codegen/parquet-footer startup cost so
    // the first measured query isn't billed ~10 s of one-time work
    // (round-2 p05 artifact); untimed, failure-tolerant. Touches the
    // aggregate AND window codegen paths plus the events footer — a01
    // (first in sorted order) reads events through a window and was
    // absorbing that one-time cost into its own number.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").agg(sum("l_quantity"), countDistinct("l_suppkey"))
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/events.parquet")
        .limit(1000)
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type").orderBy("event_id")))
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    // deterministic (sorted) query order so per-query numbers are
    // attributable run-to-run; failures recorded as -1 + a failed list
    // SPARK_GRAFT_ONLY (comma list, dev-only) restricts the suite for
    // single-query profiling; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val failed = Seq.newBuilder[String]
    val swept = Seq.newBuilder[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes EVERY column — count() would let Catalyst
      // prune away the computed columns and time an empty scan
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // session hygiene: leftover storage blocks from one query degrade
      // every later query (round-3 artifact: the back half of the suite
      // ran 4–13× slow behind leaked LSH signature caches). After each
      // query's action completes, sweep any persistent blocks and record
      // which query left them — expected only for operators whose RESULT
      // is checkpoint-backed (d05 connected components cuts lineage with
      // localCheckpoint; its final blocks ARE the returned frame and the
      // caller owns them — here, the suite is that caller).
      val leftovers = spark.sparkContext.getPersistentRDDs
      if (leftovers.nonEmpty) {
        swept += name
        System.err.println(
          s"[bench] sweeping ${leftovers.size} persistent RDD(s) left by $name")
        leftovers.values.foreach(_.unpersist(false))
      }
      spark.catalog.clearCache()
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val sweptJson = swept.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"swept":$sweptJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
