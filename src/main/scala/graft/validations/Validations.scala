package graft.validations

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.types.{TableMeta, ValidationResult, ValidationRule}

/**
 * Validation rule engine (SURVEY.md §2.3).
 *
 * V1: a rule's `query` is any SQL returning one scalar; executed with
 *     spark.sql over pre-registered temp views
 *     (reference: supabase_validation_manager.py:263 `fetchone()[0]`).
 * V2: comparison operators with the reference's exact edge semantics
 *     (supabase_validation_manager.py:342-372): None→invalid; `equals`
 *     numeric if both numeric else string compare; greater/less/between
 *     coerce through float and return false on coercion failure.
 */
object Evaluator {

  private def asDouble(v: Any): Option[Double] = v match {
    case null => None
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case l: Long => Some(l.toDouble)
    case i: Int => Some(i.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case d: java.math.BigDecimal => Some(d.doubleValue)
    case d: BigDecimal => Some(d.doubleValue)
    case b: Boolean => Some(if (b) 1.0 else 0.0) // Python float(True)=1.0
    case s: String => Try(s.trim.toDouble).toOption
    case _ => None
  }

  private def isNumeric(v: Any): Boolean = v match {
    case _: Double | _: Float | _: Long | _: Int | _: Short | _: Byte => true
    case _: java.math.BigDecimal | _: BigDecimal => true
    case _: Boolean => true // Python bool is an int subtype
    case _ => false
  }

  private def asIntegral(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case b: Boolean => Some(if (b) 1L else 0L)
    case d: java.math.BigDecimal if d.scale <= 0 || d.stripTrailingZeros.scale <= 0 =>
      Try(d.longValueExact).toOption
    case _ => None
  }

  /** Exact port of `_evaluate_rule` semantics. */
  def evaluate(operator: String, actual: Any, expected: Any): Boolean = {
    if (actual == null) return false
    operator match {
      case "equals" =>
        if (isNumeric(actual) && isNumeric(expected))
          // integral-to-integral compares exactly (Python int == int);
          // Double coercion only for mixed/fractional operands — Longs
          // above 2^53 must not collapse to equal doubles.
          (asIntegral(actual), asIntegral(expected)) match {
            case (Some(a), Some(e)) => a == e
            case _ => asDouble(actual).get == asDouble(expected).get
          }
        else actual.toString == expected.toString
      case "greater_than" =>
        (asDouble(actual), asDouble(expected)) match {
          case (Some(a), Some(e)) => a > e
          case _ => false
        }
      case "less_than" =>
        (asDouble(actual), asDouble(expected)) match {
          case (Some(a), Some(e)) => a < e
          case _ => false
        }
      case "between" =>
        expected match {
          case Seq(lo, hi) =>
            (asDouble(lo), asDouble(actual), asDouble(hi)) match {
              case (Some(l), Some(a), Some(h)) => l <= a && a <= h
              case _ => false
            }
          case l: List[_] if l.size == 2 =>
            evaluate("between", actual, Seq(l(0), l(1)))
          case _ => false
        }
      case _ => false
    }
  }
}

object Runner {

  /** V1: run one rule — execute its scalar SQL, compare. Errors become
   *  is_valid=false with the error captured, never a thrown exception
   *  (reference: supabase_validation_manager.py:320-330). */
  def runRule(spark: SparkSession, rule: ValidationRule): ValidationResult =
    Try {
      val row = spark.sql(rule.query).first()
      if (row.isNullAt(0)) null else row.get(0)
    } match {
      case Success(actual) =>
        ValidationResult(
          rule.name,
          Evaluator.evaluate(rule.operator, actual, rule.expectedValue),
          Option(actual), rule.expectedValue, rule.operator)
      case Failure(e) =>
        ValidationResult(rule.name, isValid = false, None,
          rule.expectedValue, rule.operator, Some(e.getMessage))
    }

  /** V4: parallel rule execution. The reference uses a ≤10-thread pool of
   *  warehouse connections (routes/validations.py:784-794); on Spark the
   *  equivalent is concurrent actions on one session — each rule's job is
   *  scheduled in parallel (use the FAIR scheduler at scale). Each rule is
   *  bounded by `timeout` (the reference enforces a 60 s statement
   *  timeout, supabase_validation_manager.py:258); a timed-out rule
   *  becomes an errored result, never a hung suite. */
  def runAll(
      spark: SparkSession,
      rules: Seq[ValidationRule],
      parallelism: Int = 10,
      timeout: Duration = scala.concurrent.duration.DurationInt(60).seconds)
      : Seq[ValidationResult] = {
    val ec = ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, math.max(rules.size, 1))))
    try {
      // each rule runs under its own job group (interruptOnCancel) so a
      // timeout CANCELS the underlying Spark jobs — abandoning the
      // Future alone would leave the job occupying cluster resources
      val runId = java.util.UUID.randomUUID().toString
      def group(i: Int) = s"graft-validation-$runId-$i"
      val futures = rules.zipWithIndex.map { case (r, i) =>
        Future {
          spark.sparkContext.setJobGroup(group(i),
            s"validation rule ${r.name}", interruptOnCancel = true)
          try runRule(spark, r)
          finally spark.sparkContext.clearJobGroup()
        }(ec)
      }
      rules.zip(futures).zipWithIndex.map { case ((r, f), i) =>
        Try(Await.result(f, timeout)) match {
          case Success(res) => res
          case Failure(_: java.util.concurrent.TimeoutException) =>
            spark.sparkContext.cancelJobGroup(group(i))
            ValidationResult(r.name, isValid = false, None, r.expectedValue,
              r.operator, Some(s"timeout after $timeout"))
          case Failure(e) =>
            ValidationResult(r.name, isValid = false, None, r.expectedValue,
              r.operator, Some(e.getMessage))
        }
      }
    } finally ec.shutdownNow()
  }

  /** V6: dedup on generation — skip rules whose name already exists
   *  (default_validations.py:460-476). */
  def dedupNew(
      generated: Seq[ValidationRule],
      existingNames: Set[String]): Seq[ValidationRule] =
    generated.filterNot(r => existingNames.contains(r.name))
}

/**
 * V3: default-rule generator — 14 rule families driven by schema
 * introspection and name heuristics. The pattern lists are kept verbatim
 * from the reference (default_validations.py:101,147-151,166-169,184-187,
 * 207-208,328-331,346-350,433-440) because the rules they emit are part of
 * the engine's observable behavior.
 */
object DefaultValidations {

  private val uniqueNamePatterns =
    Seq("id", "code", "number", "uuid", "guid", "key", "hash", "identifier")
  private val negativeAllowedPatterns = Seq(
    "balance", "difference", "delta", "change", "temperature",
    "coordinate", "adjustment", "net", "profit_loss", "margin")
  private val nonZeroPatterns = Seq(
    "price", "amount", "total", "cost", "rate", "fee", "tax",
    "revenue", "salary", "income", "expense")
  private val pastDatePatterns = Seq(
    "birth", "created", "start", "registered", "joined", "purchase",
    "transaction", "order", "payment", "issued", "shipped", "received")
  private val endDateTerms =
    Seq("end", "finish", "completed", "closed", "expiry", "expiration")
  private val refTableTerms = Seq("ref", "type", "status", "category", "lookup")
  private val importantColumnPatterns = Seq(
    "name", "description", "address", "city", "state", "country", "postal",
    "zip", "email", "phone", "status", "type", "category", "price", "cost",
    "amount")
  private val categoricalColumnPatterns = Seq(
    "status", "type", "category", "level", "tier", "class", "grade",
    "priority", "severity", "state", "region", "stage", "gender")
  private val largeTableIndicators =
    Seq("fact", "transaction", "event", "log", "history", "audit", "detail")
  private val mediumTableIndicators =
    Seq("order", "customer", "user", "account", "product", "item")

  private def isNumericType(dt: DataType): Boolean = dt.isInstanceOf[NumericType]
  private def isStringType(dt: DataType): Boolean = dt.isInstanceOf[StringType]
  private def isDateType(dt: DataType): Boolean = dt match {
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }

  /** Outlier threshold by table-size heuristic
   *  (default_validations.py:428-444). */
  def outlierThreshold(table: String): Int = {
    val t = table.toLowerCase
    if (largeTableIndicators.exists(t.contains)) 50
    else if (mediumTableIndicators.exists(t.contains)) 20
    else 5
  }

  /** Start-date column guess for end-date ordering checks
   *  (default_validations.py:391-425). */
  def guessStartDateColumn(endCol: String, columns: Seq[StructField]): String = {
    val startTermMap = Seq(
      "end" -> "start", "finish" -> "start", "completed" -> "created",
      "closed" -> "opened", "expiry" -> "issue", "expiration" -> "issue")
    val lower = endCol.toLowerCase
    startTermMap.collectFirst {
      case (endTerm, startTerm) if lower.contains(endTerm) =>
        lower.replace(endTerm, startTerm)
    }.flatMap(cand => columns.find(_.name.toLowerCase == cand).map(_.name))
      .orElse {
        val startIndicators = Seq("start", "created", "opened", "issue", "begin")
        val dateIndicators = Seq("date", "time", "timestamp", "dt")
        columns.find { c =>
          val n = c.name.toLowerCase
          startIndicators.exists(n.contains) && dateIndicators.exists(n.contains)
        }.map(_.name)
      }
      .getOrElse(endCol)
  }

  /** Backtick-quote an identifier for Spark SQL (ADVICE r1: raw
   *  interpolation breaks on names with spaces/quotes/backticks). */
  private def q(id: String): String = "`" + id.replace("`", "``") + "`"

  /** Generate the default rule set for a table from its Spark schema (+
   *  optional PK/FK sidecar). SQL is emitted in Spark dialect; the shapes
   *  mirror the reference family-for-family (14 families,
   *  default_validations.py:8-388). */
  def generate(
      table: String,
      schema: StructType,
      primaryKeys: Seq[String] = Nil,
      foreignKeys: Seq[String] = Nil,
      varcharMaxLengths: Map[String, Int] = Map.empty): Seq[ValidationRule] = {
    val rules = Seq.newBuilder[ValidationRule]
    val cols = schema.fields.toSeq
    val qt = q(table)

    // 1. not empty
    rules += ValidationRule(
      s"check_${table}_not_empty",
      s"Ensure $table table has at least one row",
      s"SELECT COUNT(*) FROM $qt", "greater_than", 0)

    // 2. PK uniqueness
    if (primaryKeys.nonEmpty) {
      val pk = primaryKeys.map(q).mkString(", ")
      rules += ValidationRule(
        s"check_${table}_pk_unique",
        s"Ensure primary key (${primaryKeys.mkString(", ")}) has no duplicates",
        s"""SELECT COUNT(*) FROM (
           |  SELECT $pk, COUNT(*) as count FROM $qt
           |  GROUP BY $pk HAVING COUNT(*) > 1) AS duplicates""".stripMargin,
        "equals", 0)
    }

    // 3. row growth vs previous count — the reference emits this as a
    // template whose prev_count is a placeholder over the same table
    // (default_validations.py:71-97); kept shape-for-shape.
    rules += ValidationRule(
      s"check_${table}_row_growth",
      s"Detect unusual growth in $table row count (>20% change)",
      s"""WITH current_count AS (
         |  SELECT COUNT(*) as count FROM $qt),
         |prev_count AS (
         |  SELECT CASE WHEN COUNT(*) = 0 THEN NULL ELSE COUNT(*) END as count
         |  FROM $qt)
         |SELECT CASE
         |  WHEN prev_count.count IS NULL THEN 0
         |  WHEN ABS(current_count.count - prev_count.count) > prev_count.count * 0.2 THEN 1
         |  ELSE 0 END
         |FROM current_count, prev_count""".stripMargin,
      "equals", 0)

    // 4. name-suggests-unique columns
    cols.filterNot(c =>
        primaryKeys.contains(c.name) || foreignKeys.contains(c.name))
      .filter(c => uniqueNamePatterns.exists(c.name.toLowerCase.contains))
      .foreach { c =>
        rules += ValidationRule(
          s"check_${c.name}_unique",
          s"Check that ${c.name} values are unique",
          s"""SELECT COUNT(*) FROM (
             |  SELECT ${q(c.name)}, COUNT(*) as count FROM $qt
             |  WHERE ${q(c.name)} IS NOT NULL
             |  GROUP BY ${q(c.name)} HAVING COUNT(*) > 1) AS duplicates""".stripMargin,
          "equals", 0)
      }

    // 5. not-null for non-nullable columns
    cols.filter(c => !c.nullable && !primaryKeys.contains(c.name)).foreach { c =>
      rules += ValidationRule(
        s"check_${c.name}_not_null",
        s"Ensure ${c.name} has no NULL values",
        s"SELECT COUNT(*) FROM $qt WHERE ${q(c.name)} IS NULL", "equals", 0)
    }

    // 6. non-negative numerics (unless name allows negatives)
    cols.filter(c => isNumericType(c.dataType))
      .filterNot(c => negativeAllowedPatterns.exists(c.name.toLowerCase.contains))
      .foreach { c =>
        rules += ValidationRule(
          s"check_${c.name}_positive",
          s"Ensure ${c.name} has no negative values",
          s"SELECT COUNT(*) FROM $qt WHERE ${q(c.name)} < 0", "equals", 0)
      }

    // 7. non-zero for money-ish columns
    cols.filter(c => isNumericType(c.dataType))
      .filter(c => nonZeroPatterns.exists(c.name.toLowerCase.contains))
      .foreach { c =>
        rules += ValidationRule(
          s"check_${c.name}_not_zero",
          s"Ensure ${c.name} has no zero values",
          s"SELECT COUNT(*) FROM $qt WHERE ${q(c.name)} = 0", "equals", 0)
      }

    // 8. date ranges
    cols.filter(c => isDateType(c.dataType)).foreach { c =>
      val lower = c.name.toLowerCase
      if (pastDatePatterns.exists(lower.contains))
        rules += ValidationRule(
          s"check_${c.name}_not_future",
          s"Ensure ${c.name} contains no future dates",
          s"SELECT COUNT(*) FROM $qt WHERE ${q(c.name)} > CURRENT_DATE",
          "equals", 0)
      rules += ValidationRule(
        s"check_${c.name}_reasonable_past",
        s"Ensure ${c.name} contains no unreasonably old dates",
        s"SELECT COUNT(*) FROM $qt WHERE ${q(c.name)} < '1970-01-01'",
        "equals", 0)
      if (endDateTerms.exists(lower.contains)) {
        val startCol = guessStartDateColumn(c.name, cols)
        rules += ValidationRule(
          s"check_${c.name}_end_date_order",
          s"Ensure ${c.name} occurs after any start date (if applicable)",
          s"""SELECT COUNT(*) FROM $qt
             |WHERE ${q(c.name)} IS NOT NULL AND ${q(startCol)} IS NOT NULL
             |AND ${q(c.name)} < ${q(startCol)}""".stripMargin,
          "equals", 0)
      }
    }

    // 9. string constraints
    cols.filter(c => isStringType(c.dataType)).foreach { c =>
      val lower = c.name.toLowerCase
      varcharMaxLengths.get(c.name).foreach { maxLen =>
        rules += ValidationRule(
          s"check_${c.name}_max_length",
          s"Ensure ${c.name} does not exceed max length ($maxLen)",
          s"SELECT COUNT(*) FROM $qt WHERE LENGTH(${q(c.name)}) > $maxLen",
          "equals", 0)
      }
      if (!c.nullable)
        rules += ValidationRule(
          s"check_${c.name}_not_empty_string",
          s"Ensure ${c.name} has no empty strings",
          s"SELECT COUNT(*) FROM $qt WHERE ${q(c.name)} = ''", "equals", 0)
      if (lower.contains("email"))
        rules += ValidationRule(
          s"check_${c.name}_valid_email",
          s"Ensure ${c.name} contains valid email format",
          s"""SELECT COUNT(*) FROM $qt
             |WHERE ${q(c.name)} IS NOT NULL AND ${q(c.name)} NOT LIKE '%@%.%'""".stripMargin,
          "equals", 0)
      if (lower.contains("phone") || lower.contains("mobile"))
        rules += ValidationRule(
          s"check_${c.name}_valid_phone",
          s"Ensure ${c.name} contains valid phone number format",
          // Spark has no SIMILAR TO; NOT RLIKE with an anchored regex is
          // the same predicate (reference: default_validations.py:267)
          s"""SELECT COUNT(*) FROM $qt
             |WHERE ${q(c.name)} IS NOT NULL
             |AND ${q(c.name)} NOT RLIKE '^(\\\\+)?[0-9][0-9 ()-]+$$'""".stripMargin,
          "equals", 0)
      if (lower.contains("zip") || lower.contains("postal"))
        rules += ValidationRule(
          s"check_${c.name}_valid_postal",
          s"Ensure ${c.name} follows postal/zip code patterns",
          s"""SELECT COUNT(*) FROM $qt
             |WHERE ${q(c.name)} IS NOT NULL AND LENGTH(TRIM(${q(c.name)})) < 3""".stripMargin,
          "equals", 0)
    }

    // 10. 3-sigma outliers per numeric column
    cols.filter(c => isNumericType(c.dataType)).foreach { c =>
      rules += ValidationRule(
        s"check_${c.name}_outliers",
        s"Check for extreme outliers in ${c.name} (> 3 std deviations)",
        s"""WITH stats AS (
           |  SELECT AVG(${q(c.name)}) as avg_val, STDDEV(${q(c.name)}) as stddev_val
           |  FROM $qt WHERE ${q(c.name)} IS NOT NULL)
           |SELECT COUNT(*) FROM $qt, stats
           |WHERE ${q(c.name)} > stats.avg_val + 3 * stats.stddev_val
           |OR ${q(c.name)} < stats.avg_val - 3 * stats.stddev_val""".stripMargin,
        "less_than", outlierThreshold(table))
    }

    // 11. reference-table size
    if (refTableTerms.exists(table.toLowerCase.contains))
      rules += ValidationRule(
        s"check_${table}_ref_table_size",
        s"Ensure reference table $table has a reasonable number of rows",
        s"SELECT COUNT(*) FROM $qt", "less_than", 1000)

    // 12. null-rate for important nullable columns
    cols.filter(c => c.nullable && !primaryKeys.contains(c.name))
      .filter(c => importantColumnPatterns.exists(c.name.toLowerCase.contains))
      .foreach { c =>
        rules += ValidationRule(
          s"check_${c.name}_null_rate",
          s"Ensure ${c.name} null rate is below acceptable threshold",
          // Spark dialect for COUNT(*) FILTER (WHERE ...)
          s"""SELECT (COUNT(CASE WHEN ${q(c.name)} IS NULL THEN 1 END) * 100.0
             |  / NULLIF(COUNT(*), 0)) FROM $qt""".stripMargin,
          "less_than", 25.0)
      }

    // 13. categorical distribution (no value >95%)
    cols.filter(c => isStringType(c.dataType))
      .filter(c => categoricalColumnPatterns.exists(c.name.toLowerCase.contains))
      .foreach { c =>
        rules += ValidationRule(
          s"check_${c.name}_distribution",
          s"Ensure ${c.name} has a reasonable value distribution",
          s"""WITH val_counts AS (
             |  SELECT ${q(c.name)}, COUNT(*) as count,
             |  (COUNT(*) * 100.0 / NULLIF((SELECT COUNT(*) FROM $qt), 0)) as pct
             |  FROM $qt WHERE ${q(c.name)} IS NOT NULL GROUP BY ${q(c.name)})
             |SELECT COUNT(*) FROM val_counts WHERE pct > 95.0""".stripMargin,
          "equals", 0)
      }

    // 14. FK distinct-count sanity
    cols.filter(c => foreignKeys.contains(c.name)).foreach { c =>
      rules += ValidationRule(
        s"check_${c.name}_ref_distribution",
        s"Ensure ${c.name} references a reasonable number of distinct values",
        s"""SELECT CASE WHEN (SELECT COUNT(DISTINCT ${q(c.name)}) FROM $qt
           |  WHERE ${q(c.name)} IS NOT NULL) = 1 THEN 1 ELSE 0 END""".stripMargin,
        "equals", 0)
    }

    rules.result()
  }

  def generateForMeta(meta: TableMeta, schema: StructType): Seq[ValidationRule] =
    generate(meta.table, schema, meta.primaryKeys, meta.foreignKeys.map(_.column))
}
