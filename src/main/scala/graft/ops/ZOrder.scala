package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the layout
  * optimization behind 2-D data skipping (SURVEY.md §2b sinks row):
  * sorting by interleaved bits keeps records that are close in EVERY
  * dimension close in the file order, so per-file (and per-row-group)
  * min/max stats become tight bounding boxes and a scan with
  * predicates on either dimension prunes most files. A single-column
  * sort gives that for one dimension only.
  *
  * The interleave is plain integer arithmetic (statically unrolled
  * shift/mask sum — codegen-friendly, whole-stage-compatible, and
  * reproducible in any engine), not a UDF.
  */
object ZOrder {

  /** Morton code of two nonnegative ints using `bitsPer` bits each:
    * bit b of `x` lands at position 2b, bit b of `y` at 2b+1. Inputs
    * beyond the bit budget must be clamped by the caller (quantize
    * first); 2*bitsPer <= 62 keeps the code in a nonnegative long. */
  def interleave2(x: Column, y: Column, bitsPer: Int): Column = {
    require(bitsPer >= 1 && bitsPer <= 31,
      s"bitsPer must be in [1, 31], got $bitsPer")
    (0 until bitsPer).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1L)) * (1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1L)) * (1L << (2 * b + 1)))
    }.reduce(_ + _)
  }

  /** Write `df` clustered by the Morton code of two quantized
    * dimension columns: range-partition on the code (so files cover
    * disjoint z-ranges), sort within partitions (so row groups within
    * a file are clustered too), then write parquet. `numFiles` targets
    * one z-range per output file. */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column,
      bitsPer: Int, numFiles: Int, path: String): Unit = {
    // withColumn would silently replace a same-named input column and
    // the final drop would then DELETE the caller's data from the
    // written output.
    require(!df.columns.contains("__zorder"),
      "input already has a __zorder column — rename it first")
    val z = interleave2(xCol, yCol, bitsPer).as("__zorder")
    df.withColumn("__zorder", z)
      .repartitionByRange(numFiles, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")
      .write.mode("overwrite").parquet(path)
  }
}
