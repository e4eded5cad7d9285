package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Round-19 optimization hardening: the job-free Par.spread probe (the
 *  r18 ADVICE found `.rdd` materializes every AQE query stage on
 *  exchange-bearing inputs — real jobs at plan time, re-executed by
 *  the caller's action), the derived stream-gate width replacing the
 *  literal `.repartition(8)`s, and the driver-side properties meta
 *  replacing the per-scalar-table parquet jobs. */
class ParProbeSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions._
  import graft.pipeline.Par

  /** Count jobs submitted while `body` runs (listener bus drained). */
  private def jobsDuring(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(500) } // listener bus is async; let it drain
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  test("spread on a broadcast-join-bearing tiny input still widens to " +
    "defaultParallelism — and the probe launches ZERO jobs") {
    val dir = Files.createTempDirectory("graft_r19_probe")
    spark.range(0, 200).toDF("id").withColumn("v", col("id") * 2)
      .coalesce(1).write.parquet(dir.resolve("a").toString)
    spark.range(0, 200).toDF("id").withColumn("w", col("id") * 3)
      .coalesce(1).write.parquet(dir.resolve("b").toString)
    val a = spark.read.parquet(dir.resolve("a").toString)
    val b = spark.read.parquet(dir.resolve("b").toString)
    val joined = a.join(b, "id") // tiny sides -> broadcast join (AQE-wrapped)
    var out: org.apache.spark.sql.DataFrame = null
    val jobs = jobsDuring { out = Par.spread(joined) }
    assert(jobs == 0, s"spread's probe submitted $jobs job(s)")
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.agg(sum(col("v") + col("w"))).head().getLong(0) ==
      joined.agg(sum(col("v") + col("w"))).head().getLong(0))
  }

  test("spread on a shuffle-exchange-bearing input passes through " +
    "(width is config/AQE-owned there) — still zero probe jobs") {
    val dir = Files.createTempDirectory("graft_r19_probe2")
    spark.range(0, 200).toDF("id").withColumn("k", col("id") % 7)
      .coalesce(1).write.parquet(dir.resolve("a").toString)
    val agg = spark.read.parquet(dir.resolve("a").toString)
      .groupBy("k").agg(count(lit(1)).as("n"))
    var out: org.apache.spark.sql.DataFrame = null
    val jobs = jobsDuring { out = Par.spread(agg) }
    assert(jobs == 0, s"spread's probe submitted $jobs job(s)")
    assert(out eq agg)
  }

  test("stream gate width derives from the session (min(cores, 8)), " +
    "and the conf knob overrides it") {
    val cores = spark.sparkContext.defaultParallelism
    assert(Par.streamGateWidth(spark) == math.min(cores, 8))
    spark.conf.set("spark.graft.stream.gate.width", "17")
    try assert(Par.streamGateWidth(spark) == 17)
    finally spark.conf.unset("spark.graft.stream.gate.width")
    assert(Par.streamGateWidth(spark) == math.min(cores, 8))
  }
}

class PropsMetaSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.history.StoreIO
  import graft.pipeline.{Dedup, Hnsw, Similarity}

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("writeProps/readProps roundtrip, refusing pairs a line cannot " +
    "carry (caller then falls back to parquet)") {
    val dir = Files.createTempDirectory("graft_r19_props").toString
    val p = new org.apache.hadoop.fs.Path(dir + "/meta")
    val f = fs(dir)
    assert(StoreIO.writeProps(f, p,
      Seq("id_col" -> "doc_id", "k" -> "3", "seed" -> "-42")))
    assert(f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
      "completeness marker missing — rebuild_tmp recovery keys on it")
    assert(StoreIO.readProps(f, p).get ==
      Map("id_col" -> "doc_id", "k" -> "3", "seed" -> "-42"))
    assert(!StoreIO.writeProps(f, p, Seq("a=b" -> "x")))
    assert(!StoreIO.writeProps(f, p, Seq("a" -> "x\ny")))
    assert(StoreIO.readProps(f,
      new org.apache.hadoop.fs.Path(dir + "/nope")).isEmpty)
  }

  test("minhash store roundtrips through the properties meta, and a " +
    "legacy parquet meta still loads") {
    val dir = Files.createTempDirectory("graft_r19_mhmeta").toString
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ff"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, numHashes = 16, numBands = 4)
    Dedup.minhashStoreSave(
      Dedup.MinhashStore(sigs, "doc_id", 3, 16, 4, 42L), dir + "/st")
    assert(fs(dir).exists(new org.apache.hadoop.fs.Path(
      dir + "/st/meta/meta.properties")), "meta should be the props form")
    val st = Dedup.minhashStoreLoad(spark, dir + "/st")
    assert((st.idCol, st.shingleK, st.numHashes, st.numBands, st.seed) ==
      ("doc_id", 3, 16, 4, 42L))
    // legacy: hand-write the old parquet meta over it
    fs(dir).delete(new org.apache.hadoop.fs.Path(dir + "/st/meta"), true)
    Seq(("doc_id", 3, 16, 4, 42L))
      .toDF("id_col", "shingle_k", "num_hashes", "num_bands", "seed")
      .coalesce(1).write.parquet(dir + "/st/meta")
    val legacy = Dedup.minhashStoreLoad(spark, dir + "/st")
    assert((legacy.idCol, legacy.shingleK, legacy.numHashes,
      legacy.numBands, legacy.seed) == ("doc_id", 3, 16, 4, 42L))
  }

  test("hnsw / ivf / pq stores roundtrip through the properties meta") {
    val dir = Files.createTempDirectory("graft_r19_annmeta").toString
    val vecs = (0L until 40L).map(i =>
        (i, Array.tabulate(8)(d => (math.sin(i * 31 + d).abs + 0.1).toFloat)))
      .toDF("vec_id", "embedding")
    Hnsw.save(Hnsw.build(vecs, m = 4, efConstruction = 16, shards = 2),
      dir + "/h")
    assert(fs(dir).exists(new org.apache.hadoop.fs.Path(
      dir + "/h/meta/meta.properties")))
    val h = Hnsw.load(spark, dir + "/h")
    assert(h.m == 4 && h.shards == 2 && h.idCol == "vec_id" &&
      h.layoutVersion == 2 && h.deletedCount == 0L)
    assert(Hnsw.topK(h, vecs.filter(col("vec_id") < 2), k = 3,
      efSearch = 16).count() == 6)

    Similarity.ivfSave(Similarity.ivfBuild(vecs, k = 4), dir + "/i")
    val ivf = Similarity.ivfLoad(spark, dir + "/i")
    assert(ivf.idCol == "vec_id" && ivf.embCol == "embedding")
    assert(Similarity.ivfTopK(ivf, vecs.filter(col("vec_id") < 2),
      k = 3, nprobe = 4).count() == 6)

    Similarity.pqSave(Similarity.pqBuild(vecs, m = 2, ks = 4), dir + "/p")
    val pq = Similarity.pqLoad(spark, dir + "/p")
    assert(pq.idCol == "vec_id" && pq.m == 2 && pq.ks == 4)
  }
}
