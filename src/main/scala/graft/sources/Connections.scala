package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Warehouse connectivity (SURVEY.md §2.1 S1/S2/S9).
 *
 * S2: connection-string builders — the Spark-native analog of the
 * reference's SQLAlchemy URL builders (core/connections/builders.py:
 * 15-66) is a JDBC URL + options map for `spark.read.format("jdbc")`.
 * S1: a generic JDBC table reader. S9: table size/usage from the file
 * system (the reference reads warehouse INFORMATION_SCHEMA,
 * app.py:3681-3700 — for parquet-backed tables the files ARE the
 * storage metrics).
 */
object Connections {

  final case class JdbcConnection(url: String, options: Map[String, String])

  /** postgresql:// builder (builders.py:15-38 shape). */
  def postgres(
      host: String,
      port: Int = 5432,
      database: String,
      user: String,
      password: String): JdbcConnection =
    JdbcConnection(
      s"jdbc:postgresql://$host:$port/$database",
      Map("user" -> user, "password" -> password,
        "driver" -> "org.postgresql.Driver"))

  /** snowflake:// builder (builders.py:40-66 shape) — expressed as the
   *  generic JDBC form Spark's connector consumes. */
  def snowflake(
      account: String,
      database: String,
      schema: String,
      warehouse: String,
      user: String,
      password: String): JdbcConnection =
    JdbcConnection(
      s"jdbc:snowflake://$account.snowflakecomputing.com/",
      Map("db" -> database, "schema" -> schema, "warehouse" -> warehouse,
        "user" -> user, "password" -> password))

  /** Embedded Apache Derby builder — an in-process JDBC warehouse (the
   *  derby jars ship with Spark, no server needed). This is the
   *  integration-test analog of the reference's DB connections: the
   *  same `readJdbc` path a Postgres/Snowflake URL takes, but against
   *  a database that actually exists in this environment. */
  def derbyEmbedded(dbDir: String): JdbcConnection =
    JdbcConnection(
      s"jdbc:derby:$dbDir;create=true",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))

  /** S1: scan a warehouse table over JDBC. `partitionColumn`/bounds
   *  split the read into `numPartitions` parallel range scans — the
   *  difference between a single-threaded pull and a cluster-wide one. */
  def readJdbc(
      spark: SparkSession,
      conn: JdbcConnection,
      table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 1L,
      numPartitions: Int = 8): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
    conn.options.foreach { case (k, v) => r = r.option(k, v) }
    partitionColumn.foreach { pc =>
      r = r.option("partitionColumn", pc)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }
    r.load()
  }

  /** S9: table storage metrics from the files backing a parquet table. */
  def tableStorage(spark: SparkSession, dir: String, table: String): (Long, Long) = {
    val files = spark.read.parquet(s"$dir/$table.parquet").inputFiles
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }.sum
    (files.length.toLong, bytes)
  }
}
