package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Catch-up-depth soak for the scheduled-ingest turn: the b02 fixture
 * exercises a 2-slice catch-up, but the shape the per-slice
 * `localCheckpoint` in `IngestScheduler.runOnce` exists for is the
 * DEEP catch-up — a driver down for a month wakes to ~30 pending
 * slices, and without the per-slice lineage cut slice k+1's store
 * side would embed slice k's entire pipeline tree (plan depth, and
 * Catalyst planning cost, growing per slice). This harness measures
 * ONE tick catching up N constant-width slices at several N and
 * reports seconds plus per-slice seconds: the claim under test is
 * time ~linear in depth (flat per-slice cost), which can only hold if
 * plan depth stays bounded per slice.
 *
 * Fixture geometry (documents table, id-banded like b02):
 *   standing store = the [30%, 60%) id band (signed once, 32 bands);
 *   landing        = N consecutive 1%-wide slices from 60% up.
 * The store band is deliberately ~30× a slice so the per-slice screen
 * cost is store-dominated and CONSTANT to first order; the kept-sig
 * accumulation adds ≤ half the store again by slice 30, so a clean
 * run shows per-slice time flat to mildly rising — anything
 * super-linear is the unbounded-plan failure this soak guards.
 *
 * Usage: graft.CatchupSoak [depth ...]   (default: 2 10 30)
 *   SPARK_GRAFT_SF_DIR  source dir (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS    local parallelism (default 32)
 * Prints one JSON line: per-depth seconds, perSlice, and the
 * ratio of each depth's per-slice time to the shallowest depth's.
 */
object CatchupSoak {

  private def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val depths = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(2, 10, 30)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val unit = (maxId + 1L) / 100L // 1% of the id space per slice
    val b0 = 30L * unit
    val c0 = 60L * unit
    require(depths.forall(_ <= 30),
      "landing band is [60%, 90%): at most 30 one-percent slices")

    // untimed warmup: absorb JVM/codegen startup into a throwaway
    // signing pass so depth 2 (first measured) isn't billed for it
    Dedup.minhashSignatures(
        docs.filter(col("doc_id") >= b0 && col("doc_id") < b0 + unit),
        numBands = 32)
      .write.format("noop").mode("overwrite").save()

    val rows = depths.map { n =>
      val state = s"/tmp/graft_catchup_${ProcessHandle.current().pid()}_$n"
      val stateP = new org.apache.hadoop.fs.Path(state)
      val fs = stateP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(stateP, true)
      // fixture (untimed): seed the store, land N slices
      Dedup.minhashStoreSave(
        Dedup.MinhashStore(
          Dedup.minhashSignatures(
            docs.filter(col("doc_id") >= b0 && col("doc_id") < c0),
            numBands = 32).coalesce(8),
          "doc_id", 3, 128, 32, 42L),
        state + "/store")
      (0 until n).foreach { i =>
        docs.filter(col("doc_id") >= c0 + i * unit &&
            col("doc_id") < c0 + (i + 1) * unit)
          .coalesce(2)
          .write.mode("overwrite")
          .parquet(f"$state/landing/slice$i%03d")
      }
      val cfg = scheduler.IngestScheduler.IngestConfig(
        state + "/landing", state + "/store", state + "/ledger",
        curation = pipeline.Curation.CurationConfig(
          jaccardThreshold = 0.9))
      // timed: ONE tick catches up all N pending slices
      val t0 = System.nanoTime()
      val processed = scheduler.IngestScheduler.runOnce(
        spark, cfg, java.time.Instant.parse("2024-01-01T00:00:00Z"))
      val secs = (System.nanoTime() - t0) / 1e9
      require(processed.size == n,
        s"depth $n tick processed ${processed.size} slices")
      System.err.println(
        f"[catchup] depth=$n%2d  ${secs}%7.2f s  perSlice=${secs / n}%5.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(false))
      spark.catalog.clearCache()
      fs.delete(stateP, true)
      (n, secs)
    }
    val base = rows.head
    val qs = rows.map { case (n, s) =>
      s""""depth$n":{"sec":${f2(s)},"perSlice":${f2(s / n)},""" +
        s""""perSliceVsD${base._1}":${f2((s / n) / (base._2 / base._1))}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"catchup_soak","depths":$qs,"sf":"$src"}""")
    spark.stop()
  }
}
