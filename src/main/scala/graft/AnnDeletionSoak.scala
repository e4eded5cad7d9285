package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Hnsw, Similarity}

/** HNSW deletion-fraction lifecycle measurement (the r16 verdict ask:
 *  "the rebuild policy is a number, not prose"): [[Hnsw.remove]] is
 *  tombstone-style — removed ids vanish from node tables and neighbor
 *  lists, but surviving lists are THINNED, not re-knitted, so graph
 *  navigability (and recall) decays as the cumulative deleted
 *  fraction grows. This main removes 10% / 30% / 50% of the corpus
 *  cumulatively (deterministic hash-ordered victim sequence, so the
 *  curve replays), measuring after each step:
 *    - recall@10 at ef=48 vs brute force over the SURVIVORS (the e27
 *      contract) for a fixed query set drawn from never-removed ids,
 *    - the store's meta deleted_fraction and rebuild recommendation
 *      ([[Hnsw.storeStats]]).
 *  One JSON line per step for BASELINE §19; the storeStats
 *  `rebuildAtFraction` default is pinned at the measured knee.
 *
 *  Invoke like Bench/Soak (plain JVM, pinned heap):
 *    graft.AnnDeletionSoak [fractions...]   (default: 0.1 0.3 0.5)
 */
object AnnDeletionSoak {

  private def f4(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val fracs =
      if (args.nonEmpty) args.toSeq.map(_.toDouble)
      else Seq(0.1, 0.3, 0.5)
    require(fracs == fracs.sorted && fracs.forall(f => f > 0 && f < 1),
      "fractions must be ascending in (0, 1)")
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
    import spark.implicits._

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .localCheckpoint() // read by every step's survivor/exact arm
    val n = emb.count()
    // deterministic victim sequence: hash order, so "first 10%" ⊂
    // "first 30%" ⊂ "first 50%" and the curve replays on any box
    val victims = emb.select(col("vec_id"))
      .orderBy(xxhash64(col("vec_id"), lit(17L)))
      .as[Long].collect()
    val maxRemoved = victims.take(math.ceil(n * fracs.max).toInt).toSet
    // fixed queries from ids that survive EVERY step — recall moves
    // only because the GRAPH degrades, never because the query set
    // changes
    val queryIds = emb.select(col("vec_id")).as[Long].collect().sorted
      .filterNot(maxRemoved).take(25)
    val queries = emb.filter(col("vec_id").isin(queryIds.map(Long.box): _*))
      .localCheckpoint()

    val store = s"/tmp/graft_soak/ann_deletion_${System.nanoTime()}"
    Hnsw.save(Hnsw.build(emb, m = 8, efConstruction = 64, shards = 4),
      store)

    var removedSoFar = 0
    fracs.foreach { frac =>
      val upTo = math.ceil(n * frac).toInt
      val batch = victims.slice(removedSoFar, upTo)
      removedSoFar = upTo
      val t0 = System.nanoTime()
      val nRemoved = Hnsw.remove(store,
        batch.toSeq.toDF("vec_id"))
      val removeSec = (System.nanoTime() - t0) / 1e9
      val removedSet = victims.take(upTo).toSet
      val survivors = emb.filter(
        not(col("vec_id").isin(removedSet.toSeq.map(Long.box): _*)))
      // ground truth materializes OUTSIDE the timed window (it is lazy
      // and would otherwise dominate search_sec inside recallAtK); the
      // timed window covers only the store load + graph search
      val exact = Similarity.bruteForceTopK(survivors, queries, k = 10)
        .localCheckpoint()
      val t1 = System.nanoTime()
      val approx = Hnsw.topK(Hnsw.load(spark, store), queries,
        k = 10, efSearch = 48)
        .select(lit("hnsw").as("method"), col("query_id"),
          col("neighbor_id")).localCheckpoint()
      val searchSec = (System.nanoTime() - t1) / 1e9
      val rec = Similarity.recallAtK(exact, approx)
        .agg(avg("recall").as("mean"), min("recall").as("min"))
        .head()
      val stats = Hnsw.storeStats(spark, store).head()
      println(s"""{"metric":"ann_deletion_soak","fraction":${f4(frac)},""" +
        s""""n_total":$n,"n_removed_step":$nRemoved,""" +
        s""""deleted_fraction":${f4(stats.getAs[Double]("deleted_fraction"))},""" +
        s""""recall_mean":${f4(rec.getAs[Double]("mean"))},""" +
        s""""recall_min":${f4(rec.getAs[Double]("min"))},""" +
        s""""rebuild_recommended":${stats.getAs[Boolean]("rebuild_recommended")},""" +
        s""""remove_sec":${f4(removeSec)},"search_sec":${f4(searchSec)}}""")
    }
    // the recovery point: the rebuild the recommendation asks for,
    // measured — recall at the deepest deletion step, re-knitted
    val t2 = System.nanoTime()
    Hnsw.rebuild(spark, store)
    val rebuildSec = (System.nanoTime() - t2) / 1e9
    val survivors = emb.filter(
      not(col("vec_id").isin(
        victims.take(removedSoFar).toSet.toSeq.map(Long.box): _*)))
    val exact = Similarity.bruteForceTopK(survivors, queries, k = 10)
      .localCheckpoint()
    val t3 = System.nanoTime()
    val approx = Hnsw.topK(Hnsw.load(spark, store), queries,
      k = 10, efSearch = 48)
      .select(lit("hnsw").as("method"), col("query_id"),
        col("neighbor_id")).localCheckpoint()
    val searchSec = (System.nanoTime() - t3) / 1e9
    val rec = Similarity.recallAtK(exact, approx)
      .agg(avg("recall").as("mean"), min("recall").as("min")).head()
    val stats = Hnsw.storeStats(spark, store).head()
    println(s"""{"metric":"ann_deletion_soak","fraction":"post_rebuild",""" +
      s""""n_total":$n,"n_removed_step":0,""" +
      s""""deleted_fraction":${f4(stats.getAs[Double]("deleted_fraction"))},""" +
      s""""recall_mean":${f4(rec.getAs[Double]("mean"))},""" +
      s""""recall_min":${f4(rec.getAs[Double]("min"))},""" +
      s""""rebuild_recommended":${stats.getAs[Boolean]("rebuild_recommended")},""" +
      s""""rebuild_sec":${f4(rebuildSec)},"search_sec":${f4(searchSec)}}""")
    spark.stop()
  }
}
