package graft.api

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Batch multiplexer: one call fanning to many engine operations
 * (reference: the /api/batch endpoint, app.py:5853-5990 — requests as
 * (id, path, params), results keyed by id, per-request error isolation,
 * entries without id/path skipped).
 *
 * Spark-first re-expression: the "routes" are the operation registry
 * (name → (SparkSession, dir) => DataFrame), and sub-requests share ONE
 * SparkSession, submitted from a bounded pool of threads so Spark's
 * scheduler interleaves their jobs — the multiplexing actually overlaps
 * scans and shuffles instead of serializing HTTP hops like the
 * reference. A failing or unknown op yields an error entry and never
 * kills the batch (app.py's per-request try/except).
 */
object BatchRunner {

  final case class BatchRequest(id: String, op: String)

  /** One sub-result: the op's DataFrame, or the error that stopped it. */
  final case class BatchResponse(
      id: String, op: String, result: Either[String, DataFrame])

  final case class BatchSummaryRow(
      id: String, op: String, ok: Boolean, rows: Long,
      head: Option[String], error: Option[String])

  /** Resolve each request against `registry` and build its DataFrame.
   *  Plans stay lazy — callers drive the actions — but construction
   *  itself is isolated per request: unknown ops and throwing builders
   *  become Left entries in input order. Requests with a blank id or op
   *  are skipped (reference behavior). */
  def run(
      spark: SparkSession,
      dir: String,
      requests: Seq[BatchRequest],
      registry: Map[String, (SparkSession, String) => DataFrame]):
      Seq[BatchResponse] =
    requests.filter(r => r.id.nonEmpty && r.op.nonEmpty).map { r =>
      registry.get(r.op) match {
        case None => BatchResponse(r.id, r.op, Left(s"unknown op: ${r.op}"))
        case Some(fn) =>
          try BatchResponse(r.id, r.op, Right(fn(spark, dir)))
          catch {
            case scala.util.control.NonFatal(e) =>
              BatchResponse(r.id, r.op,
                Left(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
      }
    }

  /** Execute a batch to completion: build AND materialize every
   *  sub-request concurrently (`parallelism` submitter threads; Spark
   *  interleaves the jobs within the shared session) and return one
   *  driver-small summary frame — (id, op, ok, rows, head, error),
   *  where `head` is the first cell of the first row, the "did it
   *  really run" witness. Row order = input id order. */
  def summary(
      spark: SparkSession,
      dir: String,
      requests: Seq[BatchRequest],
      registry: Map[String, (SparkSession, String) => DataFrame],
      parallelism: Int = 4): DataFrame = {
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val rows =
      try {
        val futures = requests
          .filter(r => r.id.nonEmpty && r.op.nonEmpty)
          .map { r =>
            Future {
              run(spark, dir, Seq(r), registry).head match {
                case BatchResponse(id, op, Left(err)) =>
                  BatchSummaryRow(id, op, ok = false, rows = -1L, None,
                    Some(err))
                case BatchResponse(id, op, Right(df)) =>
                  try {
                    // ONE job per sub-request: count + a witness value
                    // in a single aggregate pass (count-then-limit(1)
                    // would execute the full sub-plan twice)
                    val agg = df.columns.headOption match {
                      case Some(c0) => df.agg(
                        org.apache.spark.sql.functions.count(
                          org.apache.spark.sql.functions.lit(1)),
                        org.apache.spark.sql.functions.first(
                          df.col(c0), ignoreNulls = false)).head
                      case None => org.apache.spark.sql.Row(df.count(), null)
                    }
                    val head = Option(agg.get(1)).map(_.toString)
                    BatchSummaryRow(id, op, ok = true, agg.getLong(0), head,
                      None)
                  } catch {
                    case scala.util.control.NonFatal(e) =>
                      BatchSummaryRow(id, op, ok = false, rows = -1L, None,
                        Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
                  }
              }
            }
          }
        Await.result(Future.sequence(futures), Duration.Inf)
      } finally pool.shutdown()
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }
}
