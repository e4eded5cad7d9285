package graft.pipeline

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Classify.NBModel

/**
 * Versioned model registry for the trained classifiers — the same
 * event-sourced treatment the rule and anomaly-config stores give
 * their definitions (latest-version-wins reads, tombstone deletes,
 * no file ever rewritten in place), so the streaming serving path can
 * hot-reload "the current `quality_gate` model" by NAME while a
 * retrain publishes the next version beside it.
 *
 * Layout: `$path/manifest` is an append-only parquet ledger
 * (model_name, version, saved_at, deleted, label_col); the frames of
 * version v live at `$path/data/<name>/v<v>/{token_scores,label_meta}`.
 * The manifest row appends ONLY AFTER the version's data dirs are
 * fully written — a crash mid-save leaves an orphan data dir that no
 * reader ever resolves, never a dangling manifest entry (the same
 * commit-last discipline as the ingest ledger).
 *
 * Scale shape: the manifest is rows-per-mutation (metadata-sized); a
 * load reads exactly one version's two model frames (vocab-sized, not
 * corpus-sized). Old versions remain for rollback/audit and compact
 * away like any event-sourced table.
 */
final class ModelStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def manifestPath = s"$path/manifest"
  private def dataDir(name: String, version: Long) =
    s"$path/data/$name/v$version"

  private def exists: Boolean =
    graft.history.StoreIO.exists(spark, manifestPath)

  private def manifest: DataFrame = spark.read.parquet(manifestPath)

  /** Latest manifest row per model name (tombstones still visible here
   *  — callers decide; [[list]] hides them). */
  private def latest: DataFrame =
    manifest.groupBy("model_name")
      .agg(max_by(struct(col("version"), col("saved_at"), col("deleted"),
        col("label_col")), col("version")).as("__m"))
      .select(col("model_name"), col("__m.version").as("version"),
        col("__m.saved_at").as("saved_at"),
        col("__m.deleted").as("deleted"),
        col("__m.label_col").as("label_col"))

  private def latestFor(name: String): Option[(Long, Boolean, String)] =
    if (!exists) None
    else latest.filter(col("model_name") === name)
      .collect().headOption
      .map(r => (r.getAs[Long]("version"), r.getAs[Boolean]("deleted"),
        r.getAs[String]("label_col")))

  /** Publish a model version. Returns the version number assigned.
   *  Re-saving a name appends version n+1; a reader mid-load keeps the
   *  version it resolved (old dirs are immutable). */
  def save(name: String, model: NBModel,
      now: Instant = Instant.now()): Long = {
    require(name.nonEmpty && !name.contains("/"),
      s"model name must be a plain identifier, got '$name'")
    val version = latestFor(name).map(_._1 + 1L).getOrElse(1L)
    val dir = dataDir(name, version)
    model.tokenScores.write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/token_scores")
    model.labelMeta.write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/label_meta")
    val row = Seq((name, version, Timestamp.from(now), false,
      model.labelCol))
      .toDF("model_name", "version", "saved_at", "deleted", "label_col")
    graft.history.StoreIO.appendLocked(manifestPath) {
      row.write.mode(SaveMode.Append).parquet(manifestPath)
    }
    version
  }

  /** Load the CURRENT version of `name` (latest-version-wins). Fails
   *  loudly on an unknown or tombstoned name. */
  def load(name: String): NBModel = {
    val (version, deleted, labelCol) = latestFor(name).getOrElse(
      sys.error(s"model '$name' not found in $path"))
    require(!deleted, s"model '$name' is deleted (tombstoned)")
    loadVersion(name, version, labelCol)
  }

  /** Load a PINNED version (rollback/audit lane). */
  def loadVersion(name: String, version: Long,
      labelCol: String = "label"): NBModel = {
    val dir = dataDir(name, version)
    NBModel(spark.read.parquet(s"$dir/token_scores"),
      spark.read.parquet(s"$dir/label_meta"), labelCol)
  }

  /** Tombstone: the name disappears from [[list]] and [[load]] fails;
   *  history and data dirs stay (append-only store, audit lane). */
  def delete(name: String, now: Instant = Instant.now()): Unit = {
    val (version, _, labelCol) = latestFor(name).getOrElse(
      sys.error(s"model '$name' not found in $path"))
    val row = Seq((name, version + 1L, Timestamp.from(now), true,
      labelCol))
      .toDF("model_name", "version", "saved_at", "deleted", "label_col")
    graft.history.StoreIO.appendLocked(manifestPath) {
      row.write.mode(SaveMode.Append).parquet(manifestPath)
    }
  }

  /** Current catalog: latest live version per name. */
  def list(): DataFrame =
    if (!exists)
      Seq.empty[(String, Long, Timestamp, String)]
        .toDF("model_name", "version", "saved_at", "label_col")
    else latest.filter(!col("deleted"))
      .select("model_name", "version", "saved_at", "label_col")
}
