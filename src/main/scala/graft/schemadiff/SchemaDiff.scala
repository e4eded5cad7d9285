package graft.schemadiff

import graft.types.{SchemaChange, TableMeta}

/**
 * Schema-change detection (SURVEY.md §2.5, C1–C8).
 *
 * The reference diffs two schema snapshots with Python set operations
 * (schema_change_detector.py:190-406) and classifies importance
 * (:408-421). Snapshots are tiny (one row per column), so the diff itself
 * is driver-side set logic over `TableMeta` — the DATA-plane cost at
 * 100 TB is snapshot capture, which is pure metadata in Spark
 * (`df.schema`, no scan at all). Changes append to a parquet-backed
 * changes store for C8-style listing.
 */
object SchemaDiff {

  val importantChangeTypes: Set[String] = Set(
    "table_removed", "column_removed", "column_type_changed",
    "primary_key_changed")

  private def change(
      tpe: String,
      table: String,
      column: Option[String],
      details: Map[String, String]): SchemaChange =
    SchemaChange(tpe, table, column, details,
      important = importantChangeTypes.contains(tpe))

  /** C2–C5: compare two snapshots → ordered change records
   *  (schema_change_detector.py:184-406 semantics, deterministic order:
   *  change type sort-grouped per table). */
  def compare(
      current: Map[String, TableMeta],
      previous: Map[String, TableMeta]): Seq[SchemaChange] = {
    val changes = Seq.newBuilder[SchemaChange]
    val curTables = current.keySet
    val prevTables = previous.keySet

    // C2: added / removed tables, with column_count detail
    (curTables -- prevTables).toSeq.sorted.foreach { t =>
      changes += change("table_added", t, None,
        Map("column_count" -> current(t).columnCount.toString))
    }
    (prevTables -- curTables).toSeq.sorted.foreach { t =>
      changes += change("table_removed", t, None,
        Map("column_count" -> previous(t).columnCount.toString))
    }

    (curTables & prevTables).toSeq.sorted.foreach { t =>
      val cur = current(t)
      val prev = previous(t)
      val curCols = cur.columns.map(c => c.name -> c).toMap
      val prevCols = prev.columns.map(c => c.name -> c).toMap

      // C3: column add/remove/type/nullable
      (curCols.keySet -- prevCols.keySet).toSeq.sorted.foreach { c =>
        changes += change("column_added", t, Some(c), Map(
          "data_type" -> curCols(c).dataType,
          "nullable" -> curCols(c).nullable.toString))
      }
      (prevCols.keySet -- curCols.keySet).toSeq.sorted.foreach { c =>
        changes += change("column_removed", t, Some(c), Map(
          "data_type" -> prevCols(c).dataType,
          "nullable" -> prevCols(c).nullable.toString))
      }
      (curCols.keySet & prevCols.keySet).toSeq.sorted.foreach { c =>
        val cc = curCols(c); val pc = prevCols(c)
        if (cc.dataType != pc.dataType)
          changes += change("column_type_changed", t, Some(c), Map(
            "old_type" -> pc.dataType, "new_type" -> cc.dataType))
        if (cc.nullable != pc.nullable)
          changes += change("column_nullable_changed", t, Some(c), Map(
            "old_nullable" -> pc.nullable.toString,
            "new_nullable" -> cc.nullable.toString))
      }

      // C4: primary key set inequality
      if (cur.primaryKeys.toSet != prev.primaryKeys.toSet)
        changes += change("primary_key_changed", t, None, Map(
          "old_primary_key" -> prev.primaryKeys.sorted.mkString(","),
          "new_primary_key" -> cur.primaryKeys.sorted.mkString(",")))

      // C5: FK / index count-only compare (deliberately coarse,
      // schema_change_detector.py:361-406)
      if (cur.foreignKeys.size != prev.foreignKeys.size)
        changes += change("foreign_key_changed", t, None, Map(
          "old_count" -> prev.foreignKeys.size.toString,
          "new_count" -> cur.foreignKeys.size.toString))
      if (cur.indexes.size != prev.indexes.size)
        changes += change("index_changed", t, None, Map(
          "old_count" -> prev.indexes.size.toString,
          "new_count" -> cur.indexes.size.toString))
    }
    changes.result()
  }

  /** C6: any important change present? (schema_change_detector.py:408-421) */
  def hasImportantChanges(changes: Seq[SchemaChange]): Boolean =
    changes.exists(_.important)

  /** C7: baseline bootstrap — first run stores the snapshot and reports
   *  no changes (schema_change_detector.py:41-45). */
  def detect(
      current: Map[String, TableMeta],
      previous: Option[Map[String, TableMeta]]): Seq[SchemaChange] =
    previous match {
      case None => Nil
      case Some(prev) => compare(current, prev)
    }
}
