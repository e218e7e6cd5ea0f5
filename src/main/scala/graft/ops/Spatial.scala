package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial joins — the 2-D sibling of [[RangeJoin]]'s
  * 1-D bucketization. A direct distance-predicate join plans as a
  * broadcast nested loop (O(n²) compares); binning the plane into
  * radius-sized cells turns it into a cell-EQUI join where only the
  * 3×3 neighborhood can contain matches.
  */
object Spatial {

  /** All unordered point pairs within `radius` (Euclidean, inclusive).
    *
    * One side explodes into its 3×3 cell neighborhood, the other stays
    * in its own cell, so every candidate pair meets EXACTLY once (the
    * right point emits one row) — no output distinct. The residual
    * test is integer squared distance: with integral coordinates the
    * whole operator is float-free and engine-exact. Cell width = radius
    * keeps the neighborhood minimal; per-cell candidate count is the
    * data density knob (at 100 TB pick the width so a cell's points fit
    * a task, and the 9× left-side explode stays the only blow-up).
    *
    * Coordinates must be non-negative integrals (`DIV` truncation =
    * floor there; negative axes would need a floor-div shift).
    */
  def radiusSelfJoin(pts: DataFrame, idCol: String, xCol: String,
                     yCol: String, radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val base = pts.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", expr(s"x DIV $radius"))
      .withColumn("cy", expr(s"y DIV $radius"))
    def cell(cx: Column, cy: Column): Column = cx * lit(1000000L) + cy
    val shifts = for (dx <- -1 to 1; dy <- -1 to 1)
      yield cell(col("cx") + dx, col("cy") + dy)
    val left = base.withColumn("cell", explode(array(shifts: _*)))
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        col("cell"))
    val right = base
      .select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
        cell(col("cx"), col("cy")).as("cell"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    left.join(right, "cell")
      .filter(col("a_id") < col("b_id") && d2 <= lit(radius * radius))
      .select(col("a_id"), col("b_id"), d2.as("d2"))
  }
}
