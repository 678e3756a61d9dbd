package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-banding for distributed prefix sums — the shared machinery
  * behind every "global ordered cumsum without a single-partition
  * window" operator (concentration, KS/AUC ECDFs, lift ranking):
  * rows band BY VALUE via `width_bucket` over broadcast [lo, hi]
  * bounds, per-band totals make a config-scale offset relation, and
  * the in-band window partitions by band. Banding is an
  * implementation detail: any band count gives identical results
  * (pinned per-operator).
  *
  * The helpers guard the degenerate cases `width_bucket` mishandles:
  * lo == hi (single distinct value — a null band would silently DROP
  * rows through the later band equi-join) collapses to one band, and
  * v == hi landing in the overflow bucket `bands+1` is fine for both
  * orders (it stays order-consistent).
  */
object Banding {

  /** Band ascending in value: band order == value order. */
  def bandAsc(v: Column, lo: Column, hi: Column, bands: Int): Column =
    when(hi <= lo, lit(1))
      .otherwise(width_bucket(v.cast("double"), lo.cast("double"),
        hi.cast("double"), lit(bands)))
      .cast("int")

  /** Band descending in value: band order == reverse value order
    * (band 0 or 1 holds the maxima). */
  def bandDesc(v: Column, lo: Column, hi: Column, bands: Int): Column =
    when(hi <= lo, lit(1))
      .otherwise(lit(bands) + 1 - width_bucket(v.cast("double"),
        lo.cast("double"), hi.cast("double"), lit(bands)))
      .cast("int")
}
