package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 additions: the footer audit recurses into partitioned
 *  layouts, reports absent statistics as NULL (not a sentinel), and
 *  carries the session's Hadoop conf to the executor-side reads. */
class ParquetAuditPartitionedSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, sum}

  test("recursive listing audits a date=-partitioned store") {
    val dir = Files.createTempDirectory("graft_r16_pqpart").toString
    (0 until 400)
      .map(i => (i.toLong, s"d${i % 4}", s"payload$i"))
      .toDF("id", "date", "v")
      .write.partitionBy("date").parquet(dir + "/store")
    val chunks = graft.sources.ParquetAudit.rowGroupChunks(
      spark, dir + "/store")
    // every partition dir contributes; partition col stays out of files
    val parts = chunks
      .select(org.apache.spark.sql.functions
        .regexp_extract(col("file_name"), "date=([^/]+)", 1).as("p"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(parts == Set("d0", "d1", "d2", "d3"))
    val cols = chunks.select("column_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(cols == Set("id", "v"))
    val nv = chunks.filter(col("column_name") === "id")
      .agg(sum("num_values")).head().getLong(0)
    assert(nv == 400L)
  }

  test("absent column statistics surface as NULL null_count, and " +
    "SUM skips them (DuckDB parity)") {
    val dir = Files.createTempDirectory("graft_r16_pqnostats").toString
    (0 until 100).map(i => (i.toLong, if (i % 5 == 0) None else Some(s"v$i")))
      .toDF("id", "s")
      .coalesce(1).write
      .option("parquet.column.statistics.enabled", "false")
      .parquet(dir + "/nostats")
    val chunks = graft.sources.ParquetAudit.rowGroupChunks(
      spark, dir + "/nostats")
    assert(chunks.schema("null_count").nullable)
    val rows = chunks.select("column_name", "null_count").collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(1)),
      "stats disabled but null_count not NULL — sentinel leak")
    // SUM over all-NULL yields NULL, never a corrupted negative total
    val summed = chunks.agg(sum("null_count")).head()
    assert(summed.isNullAt(0))
  }

  test("executor-side footer reads see the session's Hadoop conf") {
    // the ConfCarrier must round-trip custom spark.hadoop.* settings
    // (credentials, fs impls) — a fresh Configuration() would drop them
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.test.carrier.key", "survives")
    try {
      val carrier = new graft.sources.ConfCarrier(hc)
      val bytes = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bytes)
      oos.writeObject(carrier); oos.close()
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes.toByteArray))
        .readObject().asInstanceOf[graft.sources.ConfCarrier]
      assert(back.value.get("graft.test.carrier.key") == "survives")
    } finally hc.unset("graft.test.carrier.key")
  }
}

/** HNSW (e25): deterministic sharded graph build, bounded neighbor
 *  lists, high recall vs brute force, and the incremental-append ≡
 *  usable-index contract. */
class HnswSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions.col
  import graft.pipeline.{Hnsw, Similarity}

  private def emb = spark.read
    .parquet(s"$sfDir/embeddings.parquet")

  test("build is deterministic and neighbor lists respect the caps") {
    val i1 = Hnsw.build(emb, m = 6, efConstruction = 32, shards = 3)
    val i2 = Hnsw.build(emb, m = 6, efConstruction = 32, shards = 3)
    val g1 = i1.graph.orderBy("shard", "vec_id", "level")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getSeq[Long](3).toList))
    val g2 = i2.graph.orderBy("shard", "vec_id", "level")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getSeq[Long](3).toList))
    assert(g1.sameElements(g2), "same corpus + params must give the same graph")
    g1.foreach { case (_, id, level, ns) =>
      val cap = if (level == 0) 12 else 6
      assert(ns.size <= cap, s"node $id level $level list ${ns.size} > $cap")
      assert(!ns.contains(id), "self-edge")
    }
    // every vector landed in exactly one shard's node table
    assert(i1.nodes.count() == emb.count())
  }

  test("recall@10 vs brute force stays high, through save/load") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
    val dir = Files.createTempDirectory("graft_r16_hnsw").toString
    Hnsw.save(Hnsw.build(emb, m = 8, efConstruction = 64, shards = 4),
      dir + "/idx")
    val approx = Hnsw
      .topK(Hnsw.load(spark, dir + "/idx"), queries, k = 10, efSearch = 48)
      .select(org.apache.spark.sql.functions.lit("hnsw").as("method"),
        col("query_id"), col("neighbor_id"))
    val recall = Similarity.recallAtK(exact, approx)
      .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
    assert(recall >= 0.9, s"mean recall@10 $recall < 0.9")
  }

  test("append inserts into the stored graph; untouched shards keep " +
    "their files; appended vectors are findable") {
    val dir = Files.createTempDirectory("graft_r16_hnswapp").toString
    val half = emb.count() / 2
    Hnsw.save(Hnsw.build(emb.filter(col("vec_id") < half),
      m = 8, efConstruction = 64, shards = 4), dir + "/idx")
    // append ONLY ids hashing to shard 1 (layout v2): shards 0/2/3
    // files must not rewrite
    val before = Files.list(java.nio.file.Paths.get(dir + "/idx/graph"))
      .toArray.map(_.toString).sorted.toList
    val shard1 = org.apache.spark.sql.functions.udf(
      (id: Long) => Hnsw.shardOf(id, 4) == 1)
    val slice = emb.filter(col("vec_id") >= half && shard1(col("vec_id")))
    val nSlice = slice.count()
    Hnsw.append(dir + "/idx", slice)
    val idx = Hnsw.load(spark, dir + "/idx")
    assert(idx.nodes.count() == half + nSlice)
    // an appended vector is its own nearest neighbor at cosine 1
    val probeId = slice.agg(org.apache.spark.sql.functions
      .min("vec_id")).head().getLong(0)
    val res = Hnsw.topK(idx, emb.filter(col("vec_id") === probeId),
      k = 5, efSearch = 48)
    assert(res.count() == 5)
    // shard-partition dirs survive untouched (dynamic overwrite only
    // rewrote shard=1)
    val after = Files.list(java.nio.file.Paths.get(dir + "/idx/graph"))
      .toArray.map(_.toString).sorted.toList
    assert(before.filterNot(_.contains("shard=1"))
      .forall(after.contains), "untouched shard dirs vanished")
  }

  test("level assignment is geometric-ish: most nodes at level 0") {
    val mL = 1.0 / math.log(8.0)
    val levels = (0L until 10000L).map(Hnsw.levelFor(_, mL))
    assert(levels.count(_ == 0) > 7000)
    assert(levels.max <= 16)
  }
}

/** a24's kernel: randomized Theil–Sen converges on series the exact
 *  form refuses, deterministically. */
class TheilSenSampledSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.anomalies.Forecast

  // 5000 daily points, y = 3x + deterministic noise, every 10th point
  // a wild outlier — the series a22's maxPoints guard refuses
  private def longSeries = (0 until 5000).map { i =>
    val noise = ((i * 2654435761L) % 97).toDouble / 97.0 - 0.5
    val y = if (i % 10 == 0) 3.0 * i + 500.0 else 3.0 * i + noise
    ("m1", java.sql.Date.valueOf(java.time.LocalDate
      .ofEpochDay(19000L + i)), y)
  }.toDF("series", "day", "value")

  test("exact form refuses past maxPoints; sampled recovers the slope " +
    "through 10% outlier contamination") {
    val ex = intercept[IllegalArgumentException] {
      Forecast.theilSen(longSeries, Seq("series"), "day", "value")
    }
    assert(ex.getMessage.contains("maxPoints"))
    val r = Forecast.theilSenSampled(longSeries, Seq("series"), "day",
      "value", pairsPerSeries = 20000, seed = 11).head()
    val slope = r.getAs[Double]("slope")
    assert(math.abs(slope - 3.0) < 0.01, s"sampled slope $slope !~ 3.0")
    assert(r.getAs[Long]("n_pairs_sampled") == 20000L)
    assert(r.getAs[Long]("n_points") == 5000L)
  }

  test("deterministic: same data + seed = same slope; seed changes " +
    "the sample") {
    val small = longSeries.filter(col("value") < 3000)
    val a = Forecast.theilSenSampled(small, Seq("series"), "day",
      "value", pairsPerSeries = 500, seed = 11).head()
    val b = Forecast.theilSenSampled(small, Seq("series"), "day",
      "value", pairsPerSeries = 500, seed = 11).head()
    assert(a == b)
  }

  test("sampled tracks exact within tolerance on a small real series") {
    val ev = SparkEntry.eventsTable(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .localCheckpoint()
    val exact = Forecast.theilSen(ev, Seq("event_type"), "day", "cnt")
      .select(col("event_type"), col("slope").as("se"))
    val sampled = Forecast.theilSenSampled(ev, Seq("event_type"),
      "day", "cnt", pairsPerSeries = 300, seed = 7)
      .select(col("event_type"), col("slope").as("ss"))
    val worst = exact.join(sampled, "event_type")
      .agg(max(abs(col("se") - col("ss")))).head().getDouble(0)
    assert(worst <= 0.6, s"sampled drifted $worst > 0.6 from exact")
  }
}

/** HNSW takedown: removed ids vanish from node tables, neighbor lists,
 *  and search results; a fully-emptied shard leaves no ghost files. */
class HnswRemoveSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions.{col, lit}
  import graft.pipeline.Hnsw

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("remove excises ids from nodes, edges and search results") {
    val dir = Files.createTempDirectory("graft_r16_hnswrm").toString
    Hnsw.save(Hnsw.build(emb, m = 8, efConstruction = 64, shards = 4),
      dir + "/idx")
    val doomed = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
    val nDoomed = doomed.count()
    val n = Hnsw.remove(dir + "/idx", doomed)
    assert(n == nDoomed)
    val idx = Hnsw.load(spark, dir + "/idx")
    assert(idx.nodes.count() == emb.count() - nDoomed)
    // no surviving neighbor list references a removed id
    import spark.implicits._
    val ghostRefs = idx.graph
      .select(org.apache.spark.sql.functions
        .explode(col("neighbors")).as("n"))
      .filter(org.apache.spark.sql.functions.pmod(col("n"), lit(7L)) === 0)
      .count()
    assert(ghostRefs == 0, s"$ghostRefs neighbor refs to removed ids")
    // searches never return a removed id
    val res = Hnsw.topK(idx, emb.filter(col("vec_id") < 20),
      k = 10, efSearch = 48)
    assert(res.filter(org.apache.spark.sql.functions
      .pmod(col("neighbor_id"), lit(7L)) === 0).count() == 0)
    // idempotent / empty list: nothing to remove
    assert(Hnsw.remove(dir + "/idx", doomed) == 0L)
  }

  test("a fully-emptied shard leaves no ghost partition files") {
    val dir = Files.createTempDirectory("graft_r16_hnswrm2").toString
    Hnsw.save(Hnsw.build(emb, m = 8, efConstruction = 64, shards = 4),
      dir + "/idx")
    // shard 2 = all ids HASHING to 2 under layout v2
    val shard2 = org.apache.spark.sql.functions.udf(
      (id: Long) => Hnsw.shardOf(id, 4) == 2)
    val all2 = emb.filter(shard2(col("vec_id"))).select("vec_id")
    assert(Hnsw.remove(dir + "/idx", all2) == all2.count())
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + "/idx/nodes/shard=2")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + "/idx/graph/shard=2")))
    val idx = Hnsw.load(spark, dir + "/idx")
    val res = Hnsw.topK(idx, emb.filter(col("vec_id") < 8),
      k = 5, efSearch = 32)
    assert(res.filter(shard2(col("neighbor_id"))).count() == 0)
  }
}
