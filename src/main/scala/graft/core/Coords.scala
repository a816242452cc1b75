package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Detector→V2/V3 coordinate rotation (reference:
  * cosmo/monitor_helpers.py:92–108): fixed 45° rotation,
  * v2 = x·cos45 + y·sin45, v3 = x·cos45 − y·sin45. Pure column math —
  * stays in codegen. */
object Coords {
  private val angle = math.toRadians(45.0)

  def v2(slewX: Column, slewY: Column): Column =
    slewX * math.cos(angle) + slewY * math.sin(angle)

  def v3(slewX: Column, slewY: Column): Column =
    slewX * math.cos(angle) - slewY * math.sin(angle)
}
