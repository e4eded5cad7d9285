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
