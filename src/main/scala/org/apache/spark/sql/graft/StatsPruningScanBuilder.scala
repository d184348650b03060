package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Manifest-stats file pruning at SCAN PLANNING — the Iceberg manifest
  * evaluation step for the SQL door: the catalyst filters Spark pushes
  * into the scan are ALSO evaluated against the table's per-file
  * manifest stats (zone min/max, Bloom bitmaps), and when they prove
  * some files irrelevant the scan is REBUILT over the survivor subset —
  * the query then never lists, opens, or footer-reads the pruned files.
  * Parquet row-group stats still prune WITHIN the surviving files; this
  * layer cuts the file list itself, which at ~1M files is the
  * object-store request count.
  *
  * Pure delegation otherwise: pushdown calls forward to the inner
  * builder (so Spark's own bookkeeping — residual filters, required
  * schema — is untouched), and when nothing prunes the inner builder's
  * scan is returned unchanged. Pruning is candidate SELECTION with the
  * conservative contracts of the stats layer (files without stats for a
  * referenced column always survive), and every pushed filter is still
  * applied by the scan/engine — a pruning bug could only cost I/O on
  * this side of the contract, but the planner's job (`plan`) must never
  * drop a file whose stats admit the predicate. */
final class StatsPruningScanBuilder(
    inner: FileScanBuilder,
    rebuild: Seq[String] => ScanBuilder,
    plan: Seq[Expression] => Option[Seq[String]])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  private var captured: Seq[Expression] = Nil
  private var required: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
    inner.pruneColumns(requiredSchema)
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    captured = filters
    inner.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def build(): Scan = plan(captured) match {
    case Some(survivors) =>
      val b = rebuild(survivors)
      b match {
        case f: FileScanBuilder =>
          // replay the pushdown the engine performed on the wrapper, so
          // the pruned scan carries identical residual-filter and
          // column-pruning state
          f.pushFilters(captured)
          required.foreach(f.pruneColumns)
          f.build()
        case other => other.build()
      }
    case None => inner.build()
  }
}
