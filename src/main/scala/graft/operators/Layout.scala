package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for 100 TB tables: multi-dimensional
  * clustering so file-level min/max statistics prune scans on EVERY
  * clustered dimension, not just the sort's leading column — the
  * OPTIMIZE ZORDER of lakehouse engines, from first principles.
  *
  * A plain `sortWithinPartitions(x)` gives perfect pruning on x and
  * none on y; interleaving the bits of x and y into one Morton
  * (Z-order) key and range-partitioning + sorting by it bounds each
  * file to a small axis-aligned box in (x, y) space, so a predicate
  * on EITHER column skips most files by footer stats alone. At 100 TB
  * the scan saved by skipping is the single biggest lever a layout
  * decision controls.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative int columns — x in the even bit positions, y in the
    * odd. A native codegen expression ([[graft.functions.MortonInterleave]]):
    * the Column-algebra formulations (per-bit unrolled sum, then the
    * magic-numbers ladder) both exploded under consumers — the ladder's
    * tree doubles per rung and `CollapseProject` inlines it into every
    * downstream leaf reference, producing a 15k-line generated method
    * that overflowed Janino and silently fell back to interpreted
    * execution. The native expression generates one static call bound
    * to a Java local, constant-size wherever the key is consumed, and
    * its integer arithmetic is pinned bit-for-bit to the oracle's
    * shifted-bit-sum SQL.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.ZOrderExpressions.mortonInterleave(
      x.cast("long"), y.cast("long"), bits)

  /** Inverse of [[zValue]]: recover one coordinate from a Morton key —
    * `lane = 0` returns x (even bit positions), `lane = 1` returns y
    * (odd). Useful for debugging a clustered layout and for re-deriving
    * coordinates when only the sort key was persisted.
    */
  def zExtract(z: Column, lane: Int): Column =
    graft.functions.ZOrderExpressions.mortonExtract(z, lane)

  /** Write `df` parquet clustered on the Z-order of (xCol, yCol):
    * range-partition on the z key (files own disjoint z intervals)
    * and sort within partitions (row groups subdivide them). The key
    * is layout-only — dropped before write; readers see the original
    * schema plus pruning-friendly footer stats on both columns.
    */
  def writeClustered(df: DataFrame, path: String, xCol: String,
      yCol: String, numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val z = "__graft_zvalue"
    require(!df.columns.contains(z), s"input already has a $z column")
    df.withColumn(z, zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }
}
