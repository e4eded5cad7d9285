package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Graph ANN: sharded HNSW (Malkov & Yashunin, "Efficient and robust
 *  approximate nearest neighbor search using Hierarchical Navigable
 *  Small World graphs", IEEE TPAMI 2018) — the industry-default ANN
 *  family for sub-billion-vector serving, beside the IVF/PQ/LSH/JL
 *  lanes in [[Similarity]].
 *
 *  Distribution model (the part Spark owns): HNSW itself is a
 *  pointer-chasing in-memory structure, so the scale unit is the
 *  SHARD — vectors hash to `shards` disjoint shards, each shard
 *  builds an INDEPENDENT layered graph inside one task
 *  (`flatMapGroups`, memory bounded by shard size, never the corpus),
 *  and the persisted index is a plain parquet adjacency store
 *  partitioned by shard. Queries broadcast to every shard (they are
 *  the small side by contract), each shard answers its local top-k
 *  from its own graph, and a window merge keeps the global top-k —
 *  exactly how sharded HNSW serving (Lucene/Elasticsearch segment
 *  graphs) distributes. At 100 TB, `shards` scales so a shard's
 *  vectors + adjacency (O(n·(d + M)) per shard) fit one executor;
 *  build is embarrassingly parallel across shards, search cost is
 *  O(shards · ef · log n) graph hops against O(corpus) for the flat
 *  scan.
 *
 *  Shard assignment is `splitmix64(id) mod shards` (layout_version 2,
 *  recorded in the store meta): production ids carry stride structure
 *  (snowflake ids, even-only keys, per-tenant ranges) that a raw
 *  `id mod shards` would concentrate into few shards — in the worst
 *  case one — breaking the shard-fits-one-executor memory contract.
 *  The hash spreads any id population uniformly. Stores persisted by
 *  the raw-mod layout (version 1, meta without a `layout_version`
 *  column) still load, append, remove and search with their original
 *  formula.
 *
 *  Determinism: level assignment uses a splitmix64 hash of the vector
 *  id (not an RNG), and every heap orders ties by id, so the same
 *  corpus + params yields byte-identical graphs regardless of task
 *  placement — the property every persisted store in this engine is
 *  held to.
 *
 *  Reference behavior anchor: the reference exposes only brute-force
 *  similarity (backend profiler); the ANN family is the
 *  beyond-reference scale path, held to the e17 recall contract
 *  (approx sets persist, ground truth re-derived exactly).
 */
object Hnsw {

  /** Current shard-layout version written by [[save]]: 2 = hashed
   *  (`splitmix64(id) mod shards`); 1 = the legacy raw
   *  `id mod shards` (stores whose meta predates the column). */
  private[graft] val CurrentLayoutVersion = 2

  /** One store row, node- or edge-grain (`kind`), so a shard's whole
   *  graph travels as ONE dataset through groupByKey — a union of two
   *  differently-shaped frames would need a lowest-common-denominator
   *  schema anyway, and this one keeps the build single-pass. */
  private[graft] case class GraphRow(
      shard: Int,
      vec_id: Long,
      kind: String, // "node" | "edge"
      emb: Array[Double], // node rows; null on edge rows
      max_level: Int, // node rows; -1 on edge rows
      level: Int, // edge rows; -1 on node rows
      neighbors: Array[Long]) // edge rows; null on node rows

  private def nodeRow(shard: Int, id: Long, v: Array[Double], ml: Int) =
    GraphRow(shard, id, "node", v, ml, -1, null)
  private def edgeRow(shard: Int, id: Long, l: Int, ns: Array[Long]) =
    GraphRow(shard, id, "edge", null, -1, l, ns)

  final case class HnswIndex(
      nodes: DataFrame, // (shard, vec_id, emb, max_level)
      graph: DataFrame, // (shard, vec_id, level, neighbors)
      m: Int,
      efConstruction: Int,
      shards: Int,
      idCol: String,
      embCol: String,
      layoutVersion: Int = CurrentLayoutVersion,
      // rides along so a load → save relocation cannot silently reset
      // the cumulative deletion counter while the graph stays thinned
      deletedCount: Long = 0L)

  /** Store-level metadata sidecar. `deletedCount` accumulates across
   *  [[remove]] calls so the rebuild policy ([[storeStats]]) is a
   *  number, not prose. */
  private[graft] final case class StoreMeta(
      m: Int,
      efConstruction: Int,
      shards: Int,
      idCol: String,
      embCol: String,
      layoutVersion: Int,
      deletedCount: Long)

  // ---- deterministic hashing: levels AND shard assignment -------------

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Shard for an id under a store layout. Version 2 hashes (id-stride
   *  immune); version 1 is the legacy raw mod kept only so old stores
   *  keep working. */
  private[graft] def shardOf(
      id: Long, shards: Int, layoutVersion: Int = CurrentLayoutVersion): Int =
    if (layoutVersion >= 2) java.lang.Math.floorMod(splitmix64(id), shards.toLong).toInt
    else java.lang.Math.floorMod(id, shards.toLong).toInt

  /** Geometric level from a hash of the id: floor(-ln(u) * mL), the
   *  paper's draw with u replaced by a uniform hash so the graph is a
   *  pure function of (ids, vectors, params). Capped at 16 — beyond
   *  that a level holds < n/m^16 nodes for any real shard. */
  private[graft] def levelFor(id: Long, mL: Double): Int = {
    val bits = splitmix64(id) >>> 11 // 53 uniform bits
    val u = (bits + 1).toDouble / (1L << 53).toDouble // (0, 1]
    math.min(16, math.floor(-math.log(u) * mL).toLong.toInt)
  }

  // ---- the per-shard in-memory kernel --------------------------------

  /** Build/search kernel for ONE shard's graph. Runs inside a task;
   *  memory is O(shardSize · (dim + M)). Vectors arrive unit-
   *  normalized, so distance = 1 − dot. */
  private[graft] final class ShardGraph(m: Int, efConstruction: Int) {
    private val maxM0 = 2 * m // level-0 lists are wider, per the paper
    private val mL = 1.0 / math.log(m.toDouble)
    private val ids = mutable.ArrayBuffer.empty[Long]
    private val vecs = mutable.ArrayBuffer.empty[Array[Double]]
    private val levels = mutable.ArrayBuffer.empty[Int]
    // adj(node)(level) = neighbor internal indexes
    private val adj =
      mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private val idToIdx = mutable.LongMap.empty[Int]
    private var entryIdx = -1

    def contains(id: Long): Boolean = idToIdx.contains(id)

    private def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      1.0 - s
    }

    private def register(id: Long, v: Array[Double], level: Int): Int = {
      val idx = ids.size
      ids += id; vecs += v; levels += level
      adj += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      idToIdx(id) = idx
      idx
    }

    /** Re-materialize a persisted node (load path): stored edges are
     *  TRUSTED, no re-selection. Call for every stored node (then
     *  [[loadEdges]]) before any [[insert]]. */
    def loadNode(id: Long, v: Array[Double], maxLevel: Int): Unit = {
      val idx = register(id, v, maxLevel)
      if (entryIdx < 0 || maxLevel > levels(entryIdx) ||
        (maxLevel == levels(entryIdx) && id < ids(entryIdx)))
        entryIdx = idx
    }

    /** Orphan-tolerant: an edge row whose own id has no node row (a
     *  torn nodes/graph write — the two tables rewrite as separate
     *  parquet jobs) degrades to a skipped row instead of bricking
     *  every subsequent load with a LongMap miss; unknown NEIGHBOR
     *  ids were always dropped. A level beyond the node's recorded
     *  max_level (the mirror-image tear) is likewise skipped. */
    def loadEdges(id: Long, level: Int, neighbors: Array[Long]): Unit =
      idToIdx.get(id).foreach { idx =>
        if (level >= 0 && level < adj(idx).length)
          adj(idx)(level) ++= neighbors.flatMap(idToIdx.get(_))
      }

    /** Greedy best-first search at one level (the paper's Algorithm
     *  2). Returns up to `ef` (dist, idx) ascending by (dist, id) —
     *  the id tiebreak keeps the whole build deterministic. */
    private def searchLayer(
        q: Array[Double], entries: Seq[Int], ef: Int, level: Int):
        mutable.ArrayBuffer[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.by { case (d, i) => (d, ids(i)) }
      val visited = mutable.BitSet.empty
      val candidates =
        mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
      val results = mutable.PriorityQueue.empty[(Double, Int)](ord)
      entries.foreach { e =>
        if (!visited(e)) {
          visited += e
          val d = dist(q, vecs(e))
          candidates.enqueue((d, e)); results.enqueue((d, e))
        }
      }
      while (results.size > ef) results.dequeue()
      var done = false
      while (!done && candidates.nonEmpty) {
        val (cd, c) = candidates.dequeue()
        if (cd > results.head._1 && results.size >= ef) {
          done = true // nearest unexpanded already worse than worst kept
        } else {
          adj(c)(level).foreach { n =>
            if (!visited(n)) {
              visited += n
              val d = dist(q, vecs(n))
              if (results.size < ef || d < results.head._1 ||
                (d == results.head._1 && ids(n) < ids(results.head._2))) {
                candidates.enqueue((d, n)); results.enqueue((d, n))
                if (results.size > ef) results.dequeue()
              }
            }
          }
        }
      }
      val out = mutable.ArrayBuffer.empty[(Double, Int)]
      while (results.nonEmpty) out += results.dequeue()
      out.sortInPlaceBy { case (d, i) => (d, ids(i)) }
      out
    }

    /** Layer-0 walk under a node predicate — the filtered-ANN
     *  admission rule: the frontier expands THROUGH failing nodes
     *  (they still route) but only passers enter the result heap, so
     *  a selective filter cannot strand the walk inside a disallowed
     *  region (the recall loss post-filtering suffers from). While
     *  fewer than `ef` passers are held, frontier admission is
     *  unconditional — the "ef inflation" that keeps recall up under
     *  selective filters — and `visitBudget` bounds total expansions
     *  so a near-empty filter terminates in O(budget) hops instead of
     *  flooding the shard. */
    private def searchLayer0Filtered(
        q: Array[Double], entries: Seq[Int], ef: Int,
        allowed: Int => Boolean, visitBudget: Int):
        mutable.ArrayBuffer[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.by { case (d, i) => (d, ids(i)) }
      val visited = mutable.BitSet.empty
      val candidates =
        mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
      val results = mutable.PriorityQueue.empty[(Double, Int)](ord)
      def admit(d: Double, i: Int): Unit =
        if (allowed(i)) {
          results.enqueue((d, i))
          if (results.size > ef) results.dequeue()
        }
      entries.foreach { e =>
        if (!visited(e)) {
          visited += e
          val d = dist(q, vecs(e))
          candidates.enqueue((d, e)); admit(d, e)
        }
      }
      var expansions = 0
      var done = false
      while (!done && candidates.nonEmpty && expansions < visitBudget) {
        val (cd, c) = candidates.dequeue()
        if (results.size >= ef && cd > results.head._1) {
          done = true
        } else {
          expansions += 1
          adj(c)(0).foreach { n =>
            if (!visited(n)) {
              visited += n
              val d = dist(q, vecs(n))
              if (results.size < ef || d < results.head._1 ||
                (d == results.head._1 && ids(n) < ids(results.head._2))) {
                candidates.enqueue((d, n)); admit(d, n)
              }
            }
          }
        }
      }
      val out = mutable.ArrayBuffer.empty[(Double, Int)]
      while (results.nonEmpty) out += results.dequeue()
      out.sortInPlaceBy { case (d, i) => (d, ids(i)) }
      out
    }

    private def connect(a: Int, b: Int, level: Int): Unit = {
      adj(a)(level) += b
      val cap = if (level == 0) maxM0 else m
      if (adj(a)(level).size > cap) {
        // prune to the `cap` closest (simple selection — the paper's
        // base variant; the diversity heuristic matters for heavily
        // clustered data, not for capped shard sizes)
        val kept = adj(a)(level).distinct
          .map(n => (dist(vecs(a), vecs(n)), n))
          .sortBy { case (d, n) => (d, ids(n)) }
          .take(cap).map(_._2)
        adj(a)(level) = mutable.ArrayBuffer(kept.toSeq: _*)
      }
    }

    /** Algorithm 1: greedy-descend to the node's top level, then
     *  search-and-connect per level with efConstruction. */
    def insert(id: Long, v: Array[Double]): Unit = {
      require(!idToIdx.contains(id),
        s"hnsw: duplicate vec_id $id in shard")
      val level = levelFor(id, mL)
      val idx = register(id, v, level)
      if (ids.size == 1) { entryIdx = idx; return }
      val oldEntryLevel = levels(entryIdx)
      var eps: Seq[Int] = Seq(entryIdx)
      var lev = oldEntryLevel
      while (lev > level) {
        eps = Seq(searchLayer(v, eps, 1, lev).head._2)
        lev -= 1
      }
      var l = math.min(level, oldEntryLevel)
      while (l >= 0) {
        val found = searchLayer(v, eps, efConstruction, l)
        val chosen = found.take(if (l == 0) maxM0 else m).map(_._2)
        chosen.foreach { n => adj(idx)(l) += n; connect(n, idx, l) }
        eps = found.map(_._2).toSeq
        l -= 1
      }
      if (level > oldEntryLevel) entryIdx = idx
    }

    /** Top-k (id, cosine) for one query vector (Algorithm 5). */
    def search(q: Array[Double], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entryIdx < 0) return Seq.empty
      var eps: Seq[Int] = Seq(entryIdx)
      var lev = levels(entryIdx)
      while (lev > 0) {
        eps = Seq(searchLayer(q, eps, 1, lev).head._2)
        lev -= 1
      }
      searchLayer(q, eps, math.max(ef, k), 0)
        .take(k).map { case (d, i) => (ids(i), 1.0 - d) }.toSeq
    }

    /** Top-k among ids passing `allowedId` ([[searchLayer0Filtered]]'s
     *  walk; upper levels descend unfiltered — they only route). */
    def searchFiltered(
        q: Array[Double], k: Int, ef: Int,
        allowedId: Long => Boolean, visitBudget: Int): Seq[(Long, Double)] = {
      if (entryIdx < 0) return Seq.empty
      var eps: Seq[Int] = Seq(entryIdx)
      var lev = levels(entryIdx)
      while (lev > 0) {
        eps = Seq(searchLayer(q, eps, 1, lev).head._2)
        lev -= 1
      }
      searchLayer0Filtered(q, eps, math.max(ef, k),
        i => allowedId(ids(i)), visitBudget)
        .take(k).map { case (d, i) => (ids(i), 1.0 - d) }.toSeq
    }

    def emit(shard: Int): Iterator[GraphRow] =
      ids.indices.iterator.map(i =>
        nodeRow(shard, ids(i), vecs(i), levels(i))) ++
        ids.indices.iterator.flatMap { i =>
          adj(i).indices.map(l =>
            edgeRow(shard, ids(i), l, adj(i)(l).map(ids).toArray))
        }
  }

  // ---- Spark-side build / persist / search ---------------------------

  private def normalized(
      vecs: DataFrame, idCol: String, embCol: String, shards: Int,
      layoutVersion: Int): Dataset[(Int, Long, Array[Double])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.filter(col(idCol).isNotNull && col(embCol).isNotNull)
      .select(
        col(idCol).cast("long").as("vec_id"),
        transform(col(embCol), x => x.cast("double")).as("emb"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (shardOf(id, shards, layoutVersion), id,
          if (n > 0) v.map(_ / n) else v)
      }
  }

  private def splitRows(rows: DataFrame): (DataFrame, DataFrame) = (
    rows.filter(col("kind") === "node")
      .select("shard", "vec_id", "emb", "max_level"),
    rows.filter(col("kind") === "edge")
      .select("shard", "vec_id", "level", "neighbors"))

  /** Build the sharded graph. One shuffle (groupByKey on shard); each
   *  group inserts in vec_id order, so the result is a pure function
   *  of the corpus. The combined rows are checkpointed once — nodes
   *  and graph views must not re-run the build each. */
  def build(
      vecs: DataFrame,
      m: Int = 8,
      efConstruction: Int = 64,
      shards: Int = 4,
      idCol: String = "vec_id",
      embCol: String = "embedding"): HnswIndex = {
    require(m >= 2, "hnsw: m must be >= 2")
    require(efConstruction >= m, "hnsw: efConstruction must be >= m")
    require(shards >= 1, "hnsw: shards must be >= 1")
    val spark = vecs.sparkSession
    import spark.implicits._
    val rows = normalized(vecs, idCol, embCol, shards, CurrentLayoutVersion)
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val g = new ShardGraph(m, efConstruction)
        it.toArray.sortBy(_._2).foreach { case (_, id, v) =>
          g.insert(id, v)
        }
        g.emit(shard)
      }
      .toDF()
      .localCheckpoint() // index-sized; one build feeds both views
    val (nodes, graph) = splitRows(rows)
    HnswIndex(nodes, graph, m, efConstruction, shards, idCol, embCol,
      CurrentLayoutVersion)
  }

  private def fsFor(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def readMeta(spark: SparkSession, path: String): StoreMeta = {
    // crash recovery for the writeMeta swap: if the swap died between
    // delete and rename, the fully-written candidate is still at
    // meta_tmp — adopt it instead of failing the load
    val fs = fsFor(spark, path)
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$path/meta_tmp")
    if (!fs.exists(metaPath) && fs.exists(tmpPath))
      fs.rename(tmpPath, metaPath)
    graft.history.StoreIO.readProps(fs, metaPath) match {
      case Some(p) =>
        // driver-side properties meta (the r19 format): zero Spark jobs
        StoreMeta(p("m").toInt, p("ef_construction").toInt,
          p("shards").toInt, p("id_col"), p("emb_col"),
          p.get("layout_version").map(_.toInt).getOrElse(1),
          p.get("deleted_count").map(_.toLong).getOrElse(0L))
      case None =>
        // legacy parquet meta — old stores stay loadable forever
        val df = spark.read.parquet(s"$path/meta")
        val has = df.columns.toSet
        val r = df.head()
        StoreMeta(
          r.getAs[Int]("m"), r.getAs[Int]("ef_construction"),
          r.getAs[Int]("shards"), r.getAs[String]("id_col"),
          r.getAs[String]("emb_col"),
          // pre-versioning stores used the raw-mod shard layout
          if (has("layout_version")) r.getAs[Int]("layout_version") else 1,
          if (has("deleted_count")) r.getAs[Long]("deleted_count") else 0L)
    }
  }

  /** Meta rewrite via write-to-tmp + swap: a direct mode("overwrite")
   *  deletes the old meta BEFORE the new file commits, so a crash
   *  mid-job bricks every later load. Here the full meta lands at
   *  meta_tmp first; the swap is two metadata-only FS ops, and
   *  [[readMeta]] adopts a stranded meta_tmp if the process dies
   *  between them. The meta itself is a driver-side properties file
   *  (7 scalars — a Spark parquet job to write it plus two more per
   *  read was pure overhead, r19; StoreIO.writeProps also lands the
   *  `_SUCCESS` marker [[recoverRebuildTmp]]'s completeness check
   *  keys on), with the legacy parquet write as the fallback for
   *  column names a properties line cannot carry. */
  private def writeMeta(
      spark: SparkSession, path: String, meta: StoreMeta): Unit = {
    val fs = fsFor(spark, path)
    val tmpPath = new org.apache.hadoop.fs.Path(s"$path/meta_tmp")
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    fs.delete(tmpPath, true)
    val wrote = graft.history.StoreIO.writeProps(fs, tmpPath, Seq(
      "m" -> meta.m.toString,
      "ef_construction" -> meta.efConstruction.toString,
      "shards" -> meta.shards.toString,
      "id_col" -> meta.idCol,
      "emb_col" -> meta.embCol,
      "layout_version" -> meta.layoutVersion.toString,
      "deleted_count" -> meta.deletedCount.toString))
    if (!wrote) {
      import spark.implicits._
      Seq((meta.m, meta.efConstruction, meta.shards, meta.idCol,
        meta.embCol, meta.layoutVersion, meta.deletedCount))
        .toDF("m", "ef_construction", "shards", "id_col", "emb_col",
          "layout_version", "deleted_count")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta_tmp")
    }
    fs.delete(metaPath, true)
    fs.rename(tmpPath, metaPath)
  }

  /** Persist as a parquet adjacency store, shard-partitioned so search
   *  and append scan only the shards they touch (the ivfSave layout).
   *  Meta records the shard-layout version (so old raw-mod stores stay
   *  loadable forever) and the cumulative deleted counter — carried
   *  from the index (0 for a fresh build), so relocating a store via
   *  load → save keeps its deletion history instead of silently
   *  resetting the rebuild signal. */
  def save(index: HnswIndex, path: String): Unit = {
    val spark = index.nodes.sparkSession
    index.nodes.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/nodes")
    index.graph.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/graph")
    writeMeta(spark, path, StoreMeta(index.m, index.efConstruction,
      index.shards, index.idCol, index.embCol, index.layoutVersion,
      index.deletedCount))
  }

  /** Crash recovery for [[rebuild]]'s three-dir swap (the readMeta
   *  meta_tmp pattern extended to the whole store): if the process died
   *  between a dir's delete and its rename, the fully-written candidate
   *  is still under rebuild_tmp — adopt any dir missing at the store
   *  root whose candidate is complete (parquet _SUCCESS present).
   *  No-op for healthy stores and for stranded tmp dirs whose originals
   *  survived (rebuild deletes tmp only after the full swap). */
  private def recoverRebuildTmp(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/rebuild_tmp")
    if (!fs.exists(tmp)) return
    Seq("nodes", "graph", "meta").foreach { t =>
      val dst = new org.apache.hadoop.fs.Path(s"$path/$t")
      val src = new org.apache.hadoop.fs.Path(s"$path/rebuild_tmp/$t")
      val complete = fs.exists(src) &&
        fs.exists(new org.apache.hadoop.fs.Path(
          s"$path/rebuild_tmp/$t/_SUCCESS"))
      if (complete && !fs.exists(dst)) fs.rename(src, dst)
    }
  }

  def load(spark: SparkSession, path: String): HnswIndex = {
    recoverRebuildTmp(spark, path)
    val meta = readMeta(spark, path)
    HnswIndex(
      spark.read.parquet(s"$path/nodes")
        .withColumn("shard", col("shard").cast("int")),
      spark.read.parquet(s"$path/graph")
        .withColumn("shard", col("shard").cast("int")),
      meta.m, meta.efConstruction, meta.shards, meta.idCol, meta.embCol,
      meta.layoutVersion, meta.deletedCount)
  }

  /** Store lifecycle stats and the rebuild recommendation (the T6
   *  suggestRefreshInterval pattern — a number, not prose): tombstone
   *  removal thins surviving neighbor lists without re-knitting them,
   *  so recall decays as the cumulative deleted fraction grows (the
   *  measured curve lives in BASELINE §19 — the knee sits past ~30%).
   *  `deleted_fraction` = deleted / (deleted + live); appends dilute
   *  it, which is correct — fresh inserts re-knit their neighborhoods.
   */
  def storeStats(
      spark: SparkSession, path: String,
      rebuildAtFraction: Double = 0.3): DataFrame = {
    recoverRebuildTmp(spark, path)
    val meta = readMeta(spark, path)
    // a FULLY emptied store (every shard dir deleted by takedowns)
    // leaves nodes/ holding only _SUCCESS — schema inference fails
    // exactly where the stats matter most (deleted_fraction 1.0), so
    // read n_live = 0 from the EMPTY layout only; any other read
    // failure (transient IO, permissions, corrupt footer) propagates —
    // a blanket getOrElse(0) here reported deleted_fraction 1.0 on a
    // healthy-but-unreadable store and could trigger a doomed rebuild
    val fs = fsFor(spark, path)
    val nodesDir = new org.apache.hadoop.fs.Path(s"$path/nodes")
    val hasData = fs.exists(nodesDir) && fs.listStatus(nodesDir).exists(
      st => st.isDirectory || st.getPath.getName.endsWith(".parquet"))
    val live =
      if (hasData) spark.read.parquet(s"$path/nodes").count() else 0L
    val total = live + meta.deletedCount
    val frac = if (total == 0L) 0.0 else meta.deletedCount.toDouble / total
    import spark.implicits._
    Seq((live, meta.deletedCount,
      math.round(frac * 1e6) / 1e6, frac >= rebuildAtFraction))
      .toDF("n_live", "deleted_count", "deleted_fraction",
        "rebuild_recommended")
  }

  /** The action [[storeStats]]'s recommendation points at: re-knit the
   *  store's graph from its surviving vectors (node rows carry the
   *  normalized embeddings, so no source corpus is needed), reset the
   *  deletion counter, and — as a side effect of rebuilding through
   *  [[build]] — MIGRATE a legacy raw-mod (v1) store to the hashed
   *  shard layout, the documented upgrade path for stride-skewed
   *  stores. Tombstone removal thins neighbor lists without
   *  re-selection ([[remove]]); past the measured ~30% knee the recall
   *  loss is real (BASELINE §20) and this is the repair. Full-store
   *  cost by design — run it on the index-maintenance cadence, not
   *  per takedown batch. */
  def rebuild(spark: SparkSession, path: String): Unit =
    graft.history.StoreIO.appendLocked(path) {
      val idx = load(spark, path)
      val vecs = idx.nodes
        .select(col("vec_id"), col("emb"))
        .localCheckpoint() // must not keep lineage into the files we replace
      val fresh = build(vecs, idx.m, idx.efConstruction, idx.shards,
        idCol = "vec_id", embCol = "emb")
      // land the WHOLE fresh store at rebuild_tmp first, then swap the
      // three dirs: a crash during the (long) build/write leaves the
      // original store untouched, and a crash mid-swap (a dir deleted
      // but its candidate not yet renamed in) is repaired on the next
      // load()/storeStats() by recoverRebuildTmp, which adopts the
      // complete candidate stranded at rebuild_tmp — strictly better
      // than delete-then-write, whose mid-crash loses everything. The
      // explicit per-dir delete also means a session-wide dynamic
      // partitionOverwriteMode can't leave a v1 store's stale shard
      // dirs behind to resurrect removed-layout rows.
      // Meta keeps the USER-facing column names (append/topK contracts).
      val fs = fsFor(spark, path)
      val tmp = s"$path/rebuild_tmp"
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      save(fresh.copy(idCol = idx.idCol, embCol = idx.embCol), tmp)
      Seq("nodes", "graph", "meta").foreach { t =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$t"), true)
        fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/$t"),
          new org.apache.hadoop.fs.Path(s"$path/$t"))
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

  /** Run `body` with dynamic partition-overwrite on, restoring the
   *  caller's setting after — shared by [[append]] and [[remove]] so
   *  the save/set/restore juggling exists exactly once. */
  private def withDynamicPartitionOverwrite[A](
      spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Turn a persisted shard back into tagged rows for the kernel. */
  private def taggedRows(
      nodes: DataFrame, graph: DataFrame): Dataset[GraphRow] = {
    val spark = nodes.sparkSession
    import spark.implicits._
    nodes.select(col("shard"), col("vec_id"), lit("node").as("kind"),
      col("emb"), col("max_level"), lit(-1).as("level"),
      lit(null).cast("array<long>").as("neighbors"))
      .unionByName(graph.select(col("shard"), col("vec_id"),
        lit("edge").as("kind"),
        lit(null).cast("array<double>").as("emb"),
        lit(-1).as("max_level"), col("level"), col("neighbors")))
      .as[GraphRow]
  }

  private def loadShard(g: ShardGraph, stored: Array[GraphRow]): Unit = {
    val (nodes, edges) = stored.partition(_.kind == "node")
    nodes.sortBy(_.vec_id).foreach(r =>
      g.loadNode(r.vec_id, r.emb, r.max_level))
    edges.foreach(r => g.loadEdges(r.vec_id, r.level, r.neighbors))
  }

  /** Incremental maintenance (the ivfAppend/e13 contract, graph
   *  edition): new vectors hash to their shards, each TOUCHED shard
   *  re-materializes its stored graph in memory (stored edges
   *  trusted — no re-selection for existing nodes) and runs the
   *  normal insert for the new nodes only; then only the touched
   *  shard partitions rewrite (dynamic partition overwrite).
   *  Untouched shards are never read. Compute is O(new · ef · log n)
   *  per shard; IO is O(touched shards). Same single-JVM appendLocked
   *  scope as every other store.
   *
   *  Admission (the bm25StoreAppend pattern): ids duplicated WITHIN
   *  the slice or already present in the store fail loudly BEFORE any
   *  work, naming the offending ids — the kernel's own duplicate
   *  `require` would otherwise surface mid-rebuild as an anonymous
   *  task failure. */
  def append(path: String, newVecs: DataFrame): Unit =
    graft.history.StoreIO.appendLocked(path) {
      val spark = newVecs.sparkSession
      import spark.implicits._
      val idx = load(spark, path)
      val fresh = normalized(newVecs, idx.idCol, idx.embCol, idx.shards,
        idx.layoutVersion)
        .localCheckpoint() // slice-sized; read 4x (checks, shards, inserts)
      // ONE shards-sized aggregation does both admission reads (r19):
      // the touched-shard list AND within-slice dup detection (ids
      // hash to exactly one shard, so a duplicated id is a
      // count≠countDistinct inequality in its own shard's row); the
      // id-naming query below runs only on the already-failing path
      val byShard = fresh.toDF("__shard", "__id", "__v")
        .groupBy(col("__shard"))
        .agg(count(lit(1)).as("__n"),
          countDistinct(col("__id")).as("__nd"))
        .collect()
      if (byShard.exists(r => r.getLong(1) != r.getLong(2))) {
        val dupIn = fresh.groupByKey(_._2).count()
          .filter(_._2 > 1L).map(_._1)
          .take(11)
        require(dupIn.isEmpty,
          "hnswAppend: ids duplicated within the append slice: " +
            dupIn.sorted.take(10).mkString(", ") +
            (if (dupIn.length > 10) ", …" else ""))
      }
      val touched = byShard.map(_.getInt(0)).sorted
      if (touched.nonEmpty) {
        val touchedSet = touched.toSet
        val shardList = touched.map(Integer.valueOf).toSeq
        // overlap can only live in the shards the new ids hash to, so
        // the touched-shard node scan is a complete check
        val overlap = idx.nodes.filter(col("shard").isin(shardList: _*))
          .select(col("vec_id"))
          .join(fresh.map(_._2).toDF("vec_id"), "vec_id")
          .limit(11).as[Long].collect()
        require(overlap.isEmpty,
          "hnswAppend: ids already present in the store: " +
            overlap.sorted.take(10).mkString(", ") +
            (if (overlap.length > 10) ", …" else ""))
        val stored = taggedRows(
          idx.nodes.filter(col("shard").isin(shardList: _*)),
          idx.graph.filter(col("shard").isin(shardList: _*)))
        val m = idx.m; val efC = idx.efConstruction
        val rebuilt = stored.groupByKey(_.shard)
          .cogroup(fresh.filter(t => touchedSet.contains(t._1))
            .groupByKey(_._1)) { (shard, old, add) =>
            val g = new ShardGraph(m, efC)
            loadShard(g, old.toArray)
            add.toArray.sortBy(_._2).foreach { case (_, id, v) =>
              g.insert(id, v)
            }
            g.emit(shard)
          }
          .toDF()
          .localCheckpoint() // one rebuild feeds both table writes
        val (nodesDF, graphDF) = splitRows(rebuilt)
        // partition-scoped overwrite: only the touched shards rewrite
        withDynamicPartitionOverwrite(spark) {
          nodesDF.write.mode("overwrite").partitionBy("shard")
            .parquet(s"$path/nodes")
          graphDF.write.mode("overwrite").partitionBy("shard")
            .parquet(s"$path/graph")
        }
      }
    }

  /** Takedown for the ANN store (the GDPR/DMCA lifecycle op every
   *  persisted index needs — Dedup.takedownPropagate's graph-index
   *  twin): removed ids vanish from their shards' node tables AND
   *  from every surviving neighbor list, so a search can never
   *  return (or route through) a removed vector. Only the TOUCHED
   *  shard partitions rewrite, same as [[append]]. Edges are
   *  filtered, not re-selected — mass deletion thins the graph, so
   *  the store meta accumulates `deleted_count` and [[storeStats]]
   *  turns it into a rebuild recommendation against the measured
   *  recall-vs-deletion curve (BASELINE §19). Meta rewrites LAST: a
   *  crash between data and meta leaves the counter conservatively
   *  stale, never a broken store. Returns the number of ids actually
   *  removed. */
  def remove(path: String, removeIds: DataFrame, idCol: String = "vec_id"): Long =
    graft.history.StoreIO.appendLocked(path) {
      val spark = removeIds.sparkSession
      import spark.implicits._
      val idx = load(spark, path)
      // ONE distinct job: the limit bounds what reaches the driver
      // (≤1M+1 longs ≈ 8 MB) and the length check refuses the
      // oversized batch — a separate count-probe would both pay the
      // aggregation twice and race a non-deterministic source
      val bounded = removeIds.select(col(idCol).cast("long")).distinct()
        .limit(1000001).as[Long].collect()
      require(bounded.length <= 1000000,
        "hnswRemove: takedown list exceeds 1M ids — partition the batch")
      val ids = bounded.toSet
      if (ids.isEmpty) 0L
      else {
        val touched = ids
          .map(id => shardOf(id, idx.shards, idx.layoutVersion))
          .toSeq.sorted
        val shardList = touched.map(Integer.valueOf)
        val idsB = spark.sparkContext.broadcast(ids)
        // localCheckpoint BEFORE the overwrite: the kept frames must
        // not keep lineage into the very parquet files the write
        // replaces (the append path's same discipline)
        val keptNodes = idx.nodes
          .filter(col("shard").isin(shardList: _*))
          .select("shard", "vec_id", "emb", "max_level")
          .as[(Int, Long, Array[Double], Int)]
          .filter(n => !idsB.value.contains(n._2))
          .toDF("shard", "vec_id", "emb", "max_level").localCheckpoint()
        val removedCount = idx.nodes
          .filter(col("shard").isin(shardList: _*)).count() -
          keptNodes.count()
        val keptEdges = idx.graph
          .filter(col("shard").isin(shardList: _*))
          .select("shard", "vec_id", "level", "neighbors")
          .as[(Int, Long, Int, Array[Long])]
          .filter(e => !idsB.value.contains(e._2))
          .map { case (sh, id, l, ns) =>
            (sh, id, l, ns.filterNot(idsB.value.contains))
          }
          .toDF("shard", "vec_id", "level", "neighbors").localCheckpoint()
        withDynamicPartitionOverwrite(spark) {
          keptNodes.write.mode("overwrite").partitionBy("shard")
            .parquet(s"$path/nodes")
          keptEdges.write.mode("overwrite").partitionBy("shard")
            .parquet(s"$path/graph")
        }
        // dynamic overwrite only rewrites partitions PRESENT in the
        // output — a shard emptied by a full takedown produces no rows,
        // so its stale dir must be deleted explicitly or searches
        // would resurrect the removed vectors
        val survivors = keptNodes.select("shard").distinct()
          .as[Int].collect().toSet
        val emptied = touched.map(_.toInt).filterNot(survivors)
        if (emptied.nonEmpty) {
          val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          emptied.foreach { sh =>
            fs.delete(new org.apache.hadoop.fs.Path(
              s"$path/nodes/shard=$sh"), true)
            fs.delete(new org.apache.hadoop.fs.Path(
              s"$path/graph/shard=$sh"), true)
          }
        }
        if (removedCount > 0L) {
          val meta = readMeta(spark, path)
          writeMeta(spark, path,
            meta.copy(deletedCount = meta.deletedCount + removedCount))
        }
        removedCount
      }
    }

  /** Search: queries (small side by contract — the bruteForceTopK
   *  maxQueries bound) collect to a broadcast array; every shard task
   *  re-materializes its graph from partition-local rows and answers
   *  all queries (k+1 locally, self-match dropped for bruteForceTopK
   *  parity); a window keeps the global top-k. Output matches
   *  ivfTopK: (query_id, neighbor_id, cosine, rank). */
  def topK(
      index: HnswIndex,
      queries: DataFrame,
      k: Int = 10,
      efSearch: Int = 32,
      maxQueries: Long = 65536L): DataFrame =
    topKMulti(index, queries, k, Seq(efSearch), maxQueries)
      .drop("ef_search")

  private def collectQueries(
      index: HnswIndex, queries: DataFrame, maxQueries: Long, op: String):
      Array[(Long, Array[Double])] = {
    val spark = index.nodes.sparkSession
    import spark.implicits._
    val qn = normalized(queries, index.idCol, index.embCol, 1,
      index.layoutVersion)
      .map { case (_, id, v) => (id, v) }
    // ONE bounded collect does both the size check and the fetch (the
    // separate count-then-collect paid the query subtree twice, r19):
    // the limit caps what reaches the driver at maxQueries+1 rows, and
    // one extra row proves the violation
    val rows = qn.limit(
      math.min(maxQueries + 1, Int.MaxValue.toLong).toInt).collect()
    require(rows.length <= maxQueries,
      s"$op: queries frame exceeds maxQueries — this arm " +
        "broadcasts the query side by contract; batch the queries")
    rows.sortBy(_._1)
  }

  /** [[topK]] at SEVERAL beam widths from ONE shard materialization —
   *  the ef-curve measurement (e26) would otherwise pay the graph
   *  load once per ef value; re-searching a loaded graph is the cheap
   *  part. Output adds an `ef_search` column. */
  def topKMulti(
      index: HnswIndex,
      queries: DataFrame,
      k: Int = 10,
      efSearches: Seq[Int] = Seq(32),
      maxQueries: Long = 65536L): DataFrame = {
    require(efSearches.nonEmpty, "hnswTopK: need at least one efSearch")
    val spark = index.nodes.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(
      collectQueries(index, queries, maxQueries, "hnswTopK"))
    val m = index.m; val efC = index.efConstruction
    val efs = efSearches.distinct.sorted
    val perShard = taggedRows(index.nodes, index.graph)
      .groupByKey(_.shard)
      .flatMapGroups { (_, it) =>
        val g = new ShardGraph(m, efC)
        loadShard(g, it.toArray)
        for {
          ef <- efs.iterator
          (qid, qv) <- qB.value.iterator
          (nid, cos) <- g.search(qv, k + 1, ef)
            .filter(_._1 != qid) // self-match out, bruteForce parity
            .take(k)
        } yield (ef, qid, nid, cos)
      }
      .toDF("ef_search", "query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("ef_search", "query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    perShard.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("ef_search", "query_id", "neighbor_id", "cosine", "rank")
  }

  /** Predicate-constrained search — the filtered-ANN surface every
   *  production vector search needs (lang/license/date/source
   *  filters): top-k among the ids in `allowed` only, WITHOUT the
   *  recall loss of post-filtering a fixed top-k (the classic
   *  filtered-ANN failure: an 1%-selective filter leaves ~k/100
   *  survivors of a post-filtered list). The walk evaluates
   *  membership during the layer-0 expansion: failing nodes still
   *  ROUTE (the graph stays navigable) but only passers are admitted
   *  to the result beam, and the beam keeps exploring until `ef`
   *  PASSERS are held — ef inflation proportional to 1/selectivity,
   *  bounded by `visitBudgetFactor · max(ef, k)` expansions per shard
   *  so a near-empty filter degrades gracefully instead of scanning
   *  the shard.
   *
   *  `allowed` is a DataFrame of ids passing the caller's predicate —
   *  computed from any metadata table with ordinary Spark filters, so
   *  the predicate language is all of SQL. It is NEVER collected or
   *  broadcast: ids hash to their shards (same layout as the store)
   *  and ride the same cogroup as the graph rows, so a 50%-selective
   *  filter over a 100 TB corpus costs one distributed shuffle of the
   *  id column, not a driver set. Scale-safe by the same shard
   *  contract as the index itself. */
  def topKFiltered(
      index: HnswIndex,
      queries: DataFrame,
      allowed: DataFrame,
      k: Int = 10,
      efSearch: Int = 32,
      visitBudgetFactor: Int = 32,
      maxQueries: Long = 65536L): DataFrame = {
    require(visitBudgetFactor >= 1,
      "hnswTopKFiltered: visitBudgetFactor must be >= 1")
    val spark = index.nodes.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(
      collectQueries(index, queries, maxQueries, "hnswTopKFiltered"))
    val lv = index.layoutVersion; val nsh = index.shards
    val allowByShard = allowed
      .select(col(index.idCol).cast("long").as("vec_id"))
      .filter(col("vec_id").isNotNull).distinct()
      .as[Long].map(id => (shardOf(id, nsh, lv), id))
    val m = index.m; val efC = index.efConstruction
    val budget = math.max(math.max(efSearch, k) * visitBudgetFactor, 256)
    val perShard = taggedRows(index.nodes, index.graph)
      .groupByKey(_.shard)
      .cogroup(allowByShard.groupByKey(_._1)) { (_, rows, ok) =>
        // a shard with NO allowed ids can never admit a result — skip
        // the graph build AND the per-query budget-exhausting walks
        // (drain `ok` first; `rows` is only consumed on the live path)
        val okArr = ok.map(_._2).toArray
        val stored = if (okArr.isEmpty) Array.empty[GraphRow]
          else rows.toArray
        if (stored.isEmpty) Iterator.empty
        else {
          val g = new ShardGraph(m, efC)
          loadShard(g, stored)
          // sorted array + binary search: allocation-light shard-local
          // membership, no boxing-heavy hash set
          java.util.Arrays.sort(okArr)
          val isAllowed = (id: Long) =>
            java.util.Arrays.binarySearch(okArr, id) >= 0
          for {
            (qid, qv) <- qB.value.iterator
            (nid, cos) <- g.searchFiltered(qv, k + 1, efSearch,
              isAllowed, budget)
              .filter(_._1 != qid) // self-match out, bruteForce parity
              .take(k)
          } yield (qid, nid, cos)
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    perShard.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
