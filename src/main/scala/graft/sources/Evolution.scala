package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-evolution reader — onboarding a table whose parquet snapshots
 * drifted over time (columns added, numeric types widened): read every
 * snapshot, compute the WIDENED target schema along the safe numeric
 * lattice (byte < short < int < long < float < double, with any
 * int/float mix landing on double; decimals widen to the max
 * precision/scale), then union with per-snapshot casts and null-fill
 * for absent columns. Spark's own `mergeSchema` REFUSES an int-vs-long
 * conflict ("Failed to merge fields"); real crawl/CDC archives have
 * exactly those, and re-writing history is the thing a 100 TB archive
 * can't afford — so widen at READ.
 *
 * Incompatible drift (numeric vs string, struct vs scalar) fails
 * LOUDLY with the column and both types — silent coercion there would
 * corrupt data.
 *
 * Scale shape: schema work is driver-side metadata; the union is N
 * scans with map-only casts — no shuffle, and column pruning still
 * pushes through the Project.
 */
object Evolution {

  private val numericRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 4, DoubleType -> 5)

  private def widen(a: DataType, b: DataType, name: String): DataType =
    (a, b) match {
      case (x, y) if x == y => x
      case (x: DecimalType, y: DecimalType) =>
        val scale = math.max(x.scale, y.scale)
        val intDigits = math.max(x.precision - x.scale,
          y.precision - y.scale)
        // covering both sides can exceed Decimal's 38-digit ceiling
        // (e.g. (38,0) ∪ (10,6) needs 44); clamping silently would
        // truncate integer digits — data corruption, so refuse
        if (intDigits + scale > 38)
          sys.error(s"column '$name' cannot widen losslessly: " +
            s"${x.simpleString} ∪ ${y.simpleString} needs " +
            s"decimal(${intDigits + scale}, $scale) > decimal(38)")
        DecimalType(intDigits + scale, scale)
      case (x, y) if numericRank.contains(x) && numericRank.contains(y) =>
        // int-family × float-family mixes land on double: a long does
        // not fit a float, and a float's fraction does not fit a long
        val (ix, iy) = (numericRank(x), numericRank(y))
        if (ix <= 3 && iy <= 3) (if (ix >= iy) x else y)
        else if (ix >= 4 && iy >= 4) (if (ix >= iy) x else y)
        else DoubleType
      case (x, y) =>
        sys.error(s"column '$name' drifted incompatibly: " +
          s"${x.simpleString} vs ${y.simpleString} — widening only " +
          "covers the numeric lattice; fix the source or rename")
    }

  /** The widened union schema of `frames`, column order = first-seen. */
  def widenedSchema(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap[String, DataType]()
    schemas.foreach(_.fields.foreach { f =>
      order.get(f.name) match {
        case None => order(f.name) = f.dataType
        case Some(t) => order(f.name) = widen(t, f.dataType, f.name)
      }
    })
    StructType(order.map { case (n, t) => StructField(n, t) }.toSeq)
  }

  /** Read parquet snapshot dirs into one frame under the widened
   *  schema: absent columns null-fill, present columns cast. */
  def readEvolved(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "need at least one path")
    val frames = paths.map(spark.read.parquet(_))
    val target = widenedSchema(frames.map(_.schema))
    frames.map { df =>
      val have = df.columns.toSet
      df.select(target.fields.map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    }.reduce(_ unionByName _)
  }
}
