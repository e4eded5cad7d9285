package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Hnsw, Similarity}

/** Filtered-ANN selectivity × recall measurement (the r16 verdict's
 *  e28 done-criterion): recall@10 of the predicate-constrained HNSW
 *  walk and the semi-joined IVF probe at ~50% / ~10% / ~1% filter
 *  selectivity, vs brute force over the FILTERED corpus. The point
 *  under test is the filtered-ANN failure mode itself: post-filtering
 *  a fixed top-k at selectivity p keeps only ~p·k passers, while the
 *  in-walk filter keeps recall flat until the filter outruns the
 *  visit budget. One JSON line per (method, selectivity) for
 *  BASELINE §20.
 *
 *  Invoke like Bench/Soak (plain JVM, pinned heap):
 *    graft.FilteredAnnSoak
 */
object FilteredAnnSoak {

  private def f4(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  def main(args: Array[String]): Unit = {
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

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .localCheckpoint() // feeds every arm below
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 25).localCheckpoint()
    val hnsw = Hnsw.build(emb, m = 8, efConstruction = 64, shards = 4)
    val ivf = Similarity.ivfBuild(emb, k = 16)
    // the IVF assignment is consumed once per (selectivity × search);
    // pin it so the nearest-cell UDF pass doesn't re-run each time
    val ivfPinned = ivf.copy(assigned = ivf.assigned.localCheckpoint())

    val preds: Seq[(String, Column)] = Seq(
      ("50pct", col("label") % 2 === 0),
      ("10pct", col("label") === 3),
      ("1pct", col("vec_id") % 97 === 0))

    preds.foreach { case (tag, pred) =>
      val allowed = emb.filter(pred).select("vec_id").localCheckpoint()
      val nAllowed = allowed.count()
      // materialize the ground-truth arm OUTSIDE the timed window —
      // lazy, it would otherwise first execute inside recallAtK and
      // dominate every method's "search_sec" with the same brute-force
      // cross-join (queries×k rows, checkpoint is cheap)
      val exact = Similarity.bruteForceTopK(emb.filter(pred), queries,
        k = 10).localCheckpoint()
      Seq(
        ("hnsw_filtered", () => Hnsw.topKFiltered(hnsw, queries, allowed,
          k = 10, efSearch = 48)),
        ("ivf_filtered", () => Similarity.ivfTopKFiltered(ivfPinned,
          queries, allowed, k = 10, nprobe = 8)),
        // the failure mode measured beside the fix: take the
        // UNfiltered top-10 and post-filter it
        ("post_filtered", () => Hnsw.topK(hnsw, queries, k = 10,
          efSearch = 48).join(allowed.withColumnRenamed("vec_id",
            "neighbor_id"), "neighbor_id"))
      ).foreach { case (method, run) =>
        // the timed window covers ONLY the method's search (the
        // localCheckpoint materializes it: queries×k rows); recall
        // scoring happens after the clock stops
        val t0 = System.nanoTime()
        val approx = run().select(lit(method).as("method"),
          col("query_id"), col("neighbor_id")).localCheckpoint()
        val sec = (System.nanoTime() - t0) / 1e9
        val rec = Similarity.recallAtK(exact, approx)
          .agg(avg("recall").as("mean"), min("recall").as("min"),
            count(lit(1)).as("nq"))
          .head()
        println(s"""{"metric":"filtered_ann_soak","selectivity":"$tag",""" +
          s""""n_corpus":$n,"n_allowed":$nAllowed,"method":"$method",""" +
          s""""recall_mean":${f4(rec.getAs[Double]("mean"))},""" +
          s""""recall_min":${f4(rec.getAs[Double]("min"))},""" +
          s""""search_sec":${f4(sec)}}""")
      }
    }
    spark.stop()
  }
}
