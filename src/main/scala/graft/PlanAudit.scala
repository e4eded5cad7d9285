package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Full-registry plan sweep for the join shapes that do not survive
 *  scale: any logical Join that the planner can only run as a nested
 *  loop (no condition, or a non-equi condition) over TWO unbounded
 *  sides. A nested-loop join is FINE — and idiomatic — when one side
 *  is provably tiny (a global aggregate's 1-row stats frame, a
 *  literal threshold grid, a LIMITed frame): Catalyst's `maxRows`
 *  proves that, so the audit keys on it instead of a hand-kept name
 *  list. The few queries that legitimately nested-loop two unbounded
 *  sides are whitelisted WITH their justification — each is a bounded
 *  brute-force/eval arm or the query's own subject.
 *
 *  Run per round (`graft.PlanAudit [sfDir]`); the summary line lands
 *  in BASELINE.md so a plan regression is caught the round it
 *  appears, not when the bench melts. Building a query's DataFrame
 *  executes its eager state writes, so the audit runs in its own
 *  run-scoped state dir like every other harness main. */
object PlanAudit {

  /** Queries allowed an unbounded×unbounded nested-loop node, and WHY
   *  each is actually bounded in its data, not its schema. */
  val whitelist: Map[String, String] = Map(
    "e02_knn_brute_force" ->
      "ground-truth arm: corpus x fixed 25-query set (maxQueries guard)",
    "e04_embedding_neardup" ->
      "bounded all-pairs cosine verify arm on the small fixture band",
    "e09_knn_pq" ->
      "flat ADC scan IS the PQ method; the pruned path is e10 ivf-pq",
    "e14_incremental_pq" ->
      "ADC rescore of appended codes x fixed query set",
    "e15_margin_mining" ->
      "non-equi margin band over the fixed query set",
    "e17_ann_recall" -> "brute-force ground-truth arm inside the eval",
    "e24_ivf_nprobe_curve" ->
      "brute-force ground-truth arm inside the eval (e17 contract)",
    "e25_hnsw_recall" ->
      "brute-force ground-truth arm inside the eval (e17 contract)",
    "e26_hnsw_ef_curve" ->
      "brute-force ground-truth arm inside the eval (e17 contract)",
    "e27_hnsw_takedown" ->
      "brute-force ground-truth arm inside the eval (e17 contract)",
    "e28_filtered_ann" ->
      ("brute-force FILTERED-corpus ground-truth arm inside the eval " +
        "(e17 contract); the probe paths are the budget-bounded HNSW " +
        "walk and the semi-joined IVF cell scan"),
    "e18_truncated_ann" -> "brute-force arms at 3 dim budgets",
    "e20_random_projection" -> "two brute-force arms as JL ground truth",
    "x48_kmv_overlap" -> "source-pair KMV sketch grid (sources^2 rows)",
    "x50_contrastive_mine" ->
      "anchor x candidate mining over the capped fixture slice",
    "x66_join_blowup" -> "the query's SUBJECT is join-cardinality audit",
    "x76_overlap_matrix" -> "20x20 source-pair KMV grid by definition",
    // the distributed-prefix-sum pattern (p31 doc): an exclusive
    // prefix over the bucket summary via a broadcast `<` self-join —
    // both sides are groupBy(__bucket) frames, <= 64 rows by
    // construction, which Catalyst maxRows cannot prove (grouped
    // aggregates report None). Deliberate: the alternative is a
    // single-partition global window.
    "p31_ks_drift" ->
      "bucket-summary exclusive-prefix self-join, <= 64 rows/side",
    "p33_percentile_rank" ->
      "bucket-summary exclusive-prefix self-join, <= 64 rows/side",
    "x39_perplexity_buckets" ->
      "bucket-summary exclusive-prefix self-join, <= 64 rows/side",
    "x118_rank_correlation" ->
      ("pair count over the top-20 arm INTERSECTION: <= k^2 pairs by " +
        "construction; the lineage cut erases Catalyst's maxRows proof"),
    // NB scoring joins each doc against the label-meta frame —
    // groupBy(label) output, |labels| rows (sources-cardinality) by
    // construction; maxRows is None for grouped aggregates
    "x52_nb_classifier" ->
      "doc x label-meta frame, |labels| rows by construction",
    "x53_nb_incremental" ->
      "doc x label-meta frame, |labels| rows by construction",
    "x119_margin_reliability" ->
      "doc x label-meta frame, |labels| rows by construction")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A whitelist key matching no registry query is a latent hole: the
    // query it was written for has been renamed/removed, and a future
    // query could silently inherit the dead allowance. Fail loudly.
    val deadKeys = whitelist.keySet.diff(SparkEntry.queries.keySet)
    if (deadKeys.nonEmpty) {
      println(s"PLAN AUDIT: whitelist key(s) matching no registry query: " +
        deadKeys.toSeq.sorted.mkString(", "))
      spark.stop()
      sys.exit(2)
    }
    SparkEntry.stateRoot =
      s"/tmp/graft_qstate_p${ProcessHandle.current().pid()}_" +
        s"${System.currentTimeMillis()}"
    // a nested-loop side is benign when the optimizer can BOUND it
    val BenignRows = 1000L
    var flagged = 0
    var allowed = 0
    var errors = 0
    val bad = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val loops = qe.optimizedPlan.collect {
          case j: Join if j.condition.isEmpty ||
              // non-equi-only conditions nested-loop too: no EqualTo
              // between the two sides anywhere in the predicate
              !j.condition.exists(_.exists {
                case e: org.apache.spark.sql.catalyst.expressions.EqualTo =>
                  e.left.references.nonEmpty && e.right.references.nonEmpty
                case _ => false
              }) =>
            j
        }
        val unboundedLoops = loops.filterNot(j =>
          j.left.maxRows.exists(_ <= BenignRows) ||
            j.right.maxRows.exists(_ <= BenignRows))
        if (unboundedLoops.nonEmpty) {
          if (whitelist.contains(name)) {
            allowed += 1
            println(s"ALLOW $name: ${unboundedLoops.size} loop node(s) — " +
              whitelist(name))
          } else {
            flagged += 1
            bad += name
            println(s"FLAG  $name: ${unboundedLoops.size} unbounded " +
              s"nested-loop join(s)")
          }
        }
      } catch { case e: Throwable =>
        errors += 1
        println(s"ERR   $name: ${String.valueOf(e.getMessage).take(120)}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    println(s"PLAN AUDIT: ${SparkEntry.queries.size} queries, " +
      s"$flagged flagged, $allowed allowed (whitelisted), $errors errors")
    bad.result().foreach(n => println(s"  REGRESSION? $n"))
    try {
      val root = new org.apache.hadoop.fs.Path(SparkEntry.stateRoot)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    } catch { case _: Throwable => () }
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
