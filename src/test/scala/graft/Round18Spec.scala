package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Round-18 optimization hardening: the scale-adaptive Par.spread
 *  contract, and the rebuild_tmp crash-window recovery + strict
 *  storeStats error behavior the r17 ADVICE flagged. */
class ParSpreadSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions._
  import graft.pipeline.Par

  test("spread raises a below-parallelism frame to defaultParallelism " +
    "without changing its rows") {
    val df = spark.range(0, 1000).toDF("id").coalesce(1)
      .withColumn("v", col("id") * 3)
    val out = Par.spread(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.agg(sum("v")).head().getLong(0) ==
      df.agg(sum("v")).head().getLong(0))
    assert(out.count() == 1000L)
  }

  test("spread is a no-op at or above defaultParallelism (the " +
    "production-partition-count contract: no shuffle is ever added)") {
    val p = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000, 1, p + 2).toDF("id")
    val out = Par.spread(df)
    // same plan object — no repartition node was inserted
    assert(out eq df)
  }

  test("spread passes streaming frames through unchanged") {
    val dir = Files.createTempDirectory("graft_r18_spreadstream")
    spark.range(0, 10).toDF("id").write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir.resolve("in").toString).schema)
      .parquet(dir.resolve("in").toString)
    assert(Par.spread(stream) eq stream)
  }
}

class HnswRebuildRecoverySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.pipeline.Hnsw

  private val dim = 8
  private def rawVec(id: Long): Array[Float] =
    Array.tabulate(dim)(j => math.sin(id * 31.0 + j * 7.0).toFloat)
  private def vecsDF(ids: Seq[Long]) =
    ids.map(id => (id, rawVec(id).toSeq)).toDF("vec_id", "embedding")

  test("a crash between rebuild's delete and rename is repaired on the " +
    "next load: the complete rebuild_tmp candidate is adopted") {
    val dir = Files.createTempDirectory("graft_r18_rebuildtmp").toString
    val path = dir + "/idx"
    Hnsw.save(Hnsw.build(vecsDF(0L until 60L), m = 4,
      efConstruction = 16, shards = 2), path)
    val before = Hnsw.topK(Hnsw.load(spark, path), vecsDF(Seq(7L)),
      k = 5, efSearch = 32).select("neighbor_id")
      .as[Long].collect().sorted
    // simulate the crash window: a fully-written candidate sits at
    // rebuild_tmp (what rebuild() lands before swapping), and the
    // process died after deleting the live nodes dir but before the
    // rename — the exact window the r17 ADVICE flagged
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val idx = Hnsw.load(spark, path)
    Hnsw.save(idx, path + "/rebuild_tmp")
    fs.delete(new org.apache.hadoop.fs.Path(path + "/nodes"), true)
    // load() adopts rebuild_tmp/nodes and serves identical results
    val after = Hnsw.topK(Hnsw.load(spark, path), vecsDF(Seq(7L)),
      k = 5, efSearch = 32).select("neighbor_id")
      .as[Long].collect().sorted
    assert(after.sameElements(before),
      s"post-recovery search diverged: ${after.toSeq} vs ${before.toSeq}")
    // and storeStats sees live rows again, not an empty store
    assert(Hnsw.storeStats(spark, path).head().getAs[Long]("n_live") == 60L)
  }

  test("storeStats propagates a genuine read failure instead of " +
    "reporting deleted_fraction 1.0 on a healthy-but-unreadable store") {
    val dir = Files.createTempDirectory("graft_r18_statserr").toString
    val path = dir + "/idx"
    Hnsw.save(Hnsw.build(vecsDF(0L until 20L), m = 4,
      efConstruction = 16, shards = 2), path)
    // corrupt the store: a non-parquet data file where shard dirs live
    val junk = new java.io.FileWriter(s"$path/nodes/part-junk.parquet")
    junk.write("this is not parquet"); junk.close()
    intercept[Exception] {
      Hnsw.storeStats(spark, path).head()
    }
  }
}
