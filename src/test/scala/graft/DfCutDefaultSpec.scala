package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the round-16 class closure: ABSOLUTE document-frequency
  * cut DEFAULTS. Round 15–16 measured the failure twice — winnow at 30×
  * returned 75 of 146 clusters under its fixed default, and the fuzzy
  * join returned 0 of 360,000 matches — because a df threshold is a cut
  * on a quantity that GROWS with the corpus: any absolute default is
  * correct at its calibration scale and silently wrong past it. All
  * four cuts in the repo now default to `maxDf = 0` (corpus-relative
  * resolution, floor = the old calibrated default) with the absolute
  * value as an explicit caller override.
  *
  * Contract: no `def` signature under src/main may ship a POSITIVE
  * `maxDf` default — `maxDf: Int = 0` (auto) is the only allowed
  * default. Explicit per-call values remain fine (registry queries pin
  * their calibrated oracle configurations); it is the LIBRARY DEFAULT
  * that must not rot with scale. A new operator shipping an absolute
  * default turns this suite red.
  *
  * Byte-level grep on purpose, the RegistryEvidenceSpec convention. */
class DfCutDefaultSpec extends AnyFunSuite {

  test("no operator ships a positive absolute maxDf default") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      "src/main/scala not found — run from repo root")
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.walk(root)
    val files =
      try stream.iterator().asScala.filter(_.toString.endsWith(".scala")).toVector
      finally stream.close()
    val bad = "maxDf:\\s*Int\\s*=\\s*[1-9]".r
    var autos = 0
    val offending = files.flatMap { p =>
      val lines = java.nio.file.Files.readAllLines(p).asScala.toVector
      lines.zipWithIndex.collect {
        case (l, i) if l.contains("maxDf: Int = 0") =>
          autos += 1; None
        case (l, i) if bad.findFirstIn(l).isDefined =>
          Some(s"$p:${i + 1}")
      }.flatten
    }
    assert(autos > 0, "grep found zero auto maxDf defaults — needle rotted?")
    assert(offending.isEmpty,
      s"""${offending.size} signature(s) ship an absolute maxDf default —
         |default to `maxDf: Int = 0` and resolve corpus-relative
         |(max(calibrated floor, ceil(frac × corpus size)), the
         |Text.resolveMaxDf contract); keep the absolute value as an
         |explicit caller override only:
         |${offending.mkString("\n")}""".stripMargin)
  }
}
