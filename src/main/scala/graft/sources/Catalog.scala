package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.types.{ColumnMeta, ForeignKey, TableMeta}

/**
 * Sources layer (SURVEY.md §2.1, S1–S7): a table catalog over a directory
 * of parquet files, mirroring the reference's SQLAlchemy
 * engine + inspector surface (connectors.py:31-126, collector.py:48-148).
 *
 * Spark-first shape: a "connection" is a directory; each `<name>.parquet`
 * is a table; `spark.read.parquet` + temp views replace the warehouse
 * engine; `df.schema` replaces `inspector.get_columns`. PK/FK metadata —
 * which Spark's catalog does not model — rides in a `TableMeta` sidecar,
 * seeded here with the conventional keys of the test star schema.
 */
final class Catalog(val spark: SparkSession, val dir: String) {

  /** S4: list tables = parquet files in the connection directory
   *  (reference: collector.py:48-72). */
  def listTables(): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted.toSeq
  }

  /** S3: scan one table. Plain parquet read — filters/column pruning are
   *  pushed down by Catalyst into the scan. Deliberately NOT memoized:
   *  a cached relation pins the file listing and schema at first read,
   *  and this catalog powers a MONITORING engine — detectSchemaChanges
   *  and scheduled profiles must observe warehouse writes that happen
   *  after engine start (a memoized handle either serves stale data or
   *  fails on vanished part files). The footer re-read per call is the
   *  price of always seeing the live table. */
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so rule SQL can refer to tables
   *  by name (reference resolves names against the warehouse). */
  def registerAll(): Unit =
    listTables().foreach(n => table(n).createOrReplaceTempView(n))

  /** S5: column metadata (reference: collector.py:74-99). */
  def columns(name: String): Seq[ColumnMeta] =
    table(name).schema.fields.toSeq
      .map(f => ColumnMeta(f.name, f.dataType.simpleString, f.nullable))

  def schemaOf(name: String): StructType = table(name).schema

  /** S6: PK/FK sidecar for the test star schema. Spark has no PK/FK
   *  catalog, so the conventional TPC-H-ish keys are declared here
   *  (the reference gets these from inspector.get_pk_constraint /
   *  get_foreign_keys, collector.py:112-148). */
  def tableMeta(name: String): TableMeta =
    tableMeta(name, schemaOf(name))

  /** [[tableMeta]] without a fresh footer read — for callers that
   *  already hold the table's resolved schema (every
   *  `spark.read.parquet` resolves the footer eagerly, so a
   *  metadata loop that calls `table`/`schemaOf`/`tableMeta`
   *  separately pays three serial footer rounds per table). */
  def tableMeta(name: String, schema: StructType): TableMeta = {
    val pks = Catalog.primaryKeys.getOrElse(name, Nil)
    val fks = Catalog.foreignKeys.getOrElse(name, Nil)
    TableMeta(name,
      schema.fields.toSeq
        .map(f => ColumnMeta(f.name, f.dataType.simpleString, f.nullable)),
      pks, fks)
  }

  /** S7: data preview with column restriction + row cap
   *  (reference: app.py:2948-3031, MAX_PREVIEW_ROWS=50). */
  def preview(
      name: String,
      allowedColumns: Seq[String] = Nil,
      maxRows: Int = 50): DataFrame = {
    val df = table(name)
    val cols =
      if (allowedColumns.isEmpty) df.columns.toSeq
      else df.columns.toSeq.filter(allowedColumns.contains)
    df.select(cols.map(org.apache.spark.sql.functions.col): _*).limit(maxRows)
  }

  /** C1: snapshot of every table's structure (reference:
   *  schema_change_detector.py:71-126). */
  def snapshot(): Map[String, TableMeta] =
    listTables().map(n => n -> tableMeta(n)).toMap

  /** S6 validation: check the declared key sidecar AGAINST the data —
   *  one row per constraint with its violation count (PK: duplicate key
   *  tuples; FK: child rows whose non-null key has no parent — the
   *  referential-integrity scan, reference collector.py:112-148 reads
   *  these constraints and the validation families assert them). All
   *  checks union into ONE job; each FK check is a key-only left-anti
   *  join (shuffles 8-byte keys, never rows; AQE broadcasts small
   *  parents), each PK check one distinct-count aggregate. */
  def keyIntegrity(): DataFrame = {
    import org.apache.spark.sql.functions._
    val pkRows = Catalog.primaryKeys.toSeq.sortBy(_._1).map {
      case (t0, cols) =>
        // uniqueness over fully-non-null key tuples only: a NULL key
        // part is a nullability violation, not a duplicate, and Spark's
        // countDistinct / DuckDB's COUNT(DISTINCT struct) disagree on
        // partial-NULL tuples — excluding them keeps both engines on
        // identical semantics
        val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
        table(t0).filter(nonNull).agg(
          (count(lit(1)) - countDistinct(cols.head, cols.tail: _*))
            .as("violations"))
          .select(lit(t0).as("table_name"),
            lit("pk:" + cols.mkString(",")).as("constraint_name"),
            col("violations"))
    }
    val fkRows = Catalog.foreignKeys.toSeq.sortBy(_._1).flatMap {
      case (t0, fks) => fks.map { fk =>
        val child = table(t0).select(col(fk.column).as("__k"))
          .filter(col("__k").isNotNull)
        val parent = table(fk.refTable)
          .select(col(fk.refColumn).as("__k")).distinct()
        child.join(parent, Seq("__k"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(t0).as("table_name"),
            lit(s"fk:${fk.column}->${fk.refTable}.${fk.refColumn}")
              .as("constraint_name"),
            col("violations"))
      }
    }
    (pkRows ++ fkRows).reduce(_ unionByName _)
  }

  /** Row counts for many tables in ONE Spark job: each table contributes
   *  a single-row `count` aggregate (present even for empty tables) and
   *  the union-all runs every scan in parallel — versus one `count()`
   *  action per table in a serial driver loop (n sequential jobs). */
  def rowCounts(names: Seq[String] = listTables()): Map[String, Long] =
    rowCountsResolved(names.map(n => n -> table(n)))

  /** [[rowCounts]] over already-resolved handles (one union-all job;
   *  no fresh footer reads — see [[tableMeta]]'s note; a separate name
   *  because both signatures erase to Seq). */
  def rowCountsResolved(
      resolved: Seq[(String, DataFrame)]): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    if (resolved.isEmpty) Map.empty
    else resolved.map { case (n, df) =>
        df.agg(count(lit(1)).as("rc"))
          .select(lit(n).as("table_name"), col("rc")) }
      .reduce(_ unionByName _)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}

object Catalog {
  def apply(spark: SparkSession, dir: String): Catalog = new Catalog(spark, dir)

  /** Conventional key metadata for the driver-generated star schema. */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  val foreignKeys: Map[String, Seq[ForeignKey]] = Map(
    "nation" -> Seq(ForeignKey("n_regionkey", "region", "r_regionkey")),
    "customer" -> Seq(ForeignKey("c_nationkey", "nation", "n_nationkey")),
    "supplier" -> Seq(ForeignKey("s_nationkey", "nation", "n_nationkey")),
    "orders" -> Seq(ForeignKey("o_custkey", "customer", "c_custkey")),
    "lineitem" -> Seq(
      ForeignKey("l_orderkey", "orders", "o_orderkey"),
      ForeignKey("l_partkey", "part", "p_partkey"),
      ForeignKey("l_suppkey", "supplier", "s_suppkey")))
}
