package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.ops.Text

/** Content-defined chunking (org.apache.spark.sql.graft.CdcCuts).
  *
  * The stateless form (minSize=1, unreachable maxSize) is oracled by
  * t_cdc_chunks/dedup_cdc against the same windowed fold in DuckDB; this
  * spec pins what the oracle can't reach: the stateful min/max guards,
  * edge cases, reconstruction, and the shift-invariance property that is
  * the point of CDC.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val Mod = 1000000007L

  /** Brute-force reference: windowed fold recomputed per position —
    * exactly the oracle SQL's formulation. */
  private def bruteCuts(s: String, w: Int, d: Int): Seq[Int] = {
    val cps = s.codePoints.toArray
    val n = cps.length
    val cuts = (w to n).filter { i =>
      val h = cps.slice(i - w, i).foldLeft(0L)((acc, c) => (acc * 31 + c) % Mod)
      h % d == 0
    }
    if (n == 0) Seq.empty
    else if (cuts.nonEmpty && cuts.last == n) cuts else cuts :+ n
  }

  private def cuts(s: String, w: Int = 8, d: Int = 64,
                   min: Int = 1, max: Int = Int.MaxValue): Seq[Int] =
    Seq(s).toDF("t")
      .select(GraftExtensions.cdcCuts(col("t"), w, d, min, max))
      .head().getSeq[Int](0)

  test("stateless cuts equal the per-position windowed fold") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh ijkl mno"
    val samples = Seq.fill(20)(
      (0 until (50 + rnd.nextInt(400))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("", "a", "short", "exactly8")
    for (s <- samples; d <- Seq(16, 64)) {
      assert(cuts(s, 8, d) == bruteCuts(s, 8, d), s"divisor $d text ${s.take(30)}")
    }
  }

  test("empty and sub-window inputs") {
    assert(cuts("") == Seq.empty)
    assert(cuts("abc") == Seq(3)) // shorter than window: one whole-text chunk
  }

  test("minSize suppresses close cuts; every non-final chunk >= minSize") {
    val rnd = new scala.util.Random(7)
    val s = (0 until 2000).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val c = cuts(s, 4, 8, min = 20)
    val lens = (Seq(0) ++ c).sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(lens.init.forall(_ >= 20), s"short non-final chunk in $lens")
    assert(c.last == s.length)
  }

  test("maxSize force-cuts content that never fires the hash") {
    // constant run + divisor too large to ever fire: only forced cuts
    val s = "a" * 100
    val c = cuts(s, 8, 1000000000, min = 1, max = 30)
    assert(c == Seq(30, 60, 90, 100))
  }

  test("chunks shift-invariantly: a prefix edit re-chunks only the head") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefgh ijkl mno"
    val s = (0 until 3000).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def chunkHashes(t: String): Seq[String] =
      Text.cdcChunks(Seq((1L, t)).toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("chunk_idx").select("chunk_md5").as[String].collect().toSeq
    val base = chunkHashes(s)
    val edited = chunkHashes("INSERTED PREFIX " + s)
    // all chunks after the first boundary downstream of the edit realign
    val common = base.reverse.zip(edited.reverse).takeWhile { case (a, b) => a == b }.size
    assert(base.size > 10, s"sample too boundary-poor: ${base.size} chunks")
    assert(common >= base.size - 2,
      s"only $common of ${base.size} tail chunks survived a prefix edit")
  }

  test("cdcChunks reconstructs the text exactly") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog " * 20),
                 (2L, ""), (3L, "tiny")).toDF("doc_id", "text")
    val chunks = Text.cdcChunks(df, "doc_id", "text")
    val back = chunks.groupBy("doc_id")
      .agg(sum("chunk_len").as("n"), count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back(1L) == ("the quick brown fox jumps over the lazy dog " * 20).length)
    assert(back(3L) == 4)
    assert(!back.contains(2L)) // empty doc: no chunks
    // md5 of ordered concat == md5 of original (byte-identical slices)
    val joined = chunks.filter(col("doc_id") === 1L).orderBy("chunk_idx")
    val starts = joined.select("chunk_start").as[Long].collect()
    assert(starts.head == 1L)
  }

  /** Byte-level brute force: the oracle fold over unsigned UTF-8 bytes. */
  private def bruteByteCuts(bytes: Array[Byte], w: Int, d: Int): Seq[Int] = {
    val n = bytes.length
    val cuts = (w to n).filter { i =>
      val h = bytes.slice(i - w, i).foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % Mod)
      h % d == 0
    }
    if (n == 0) Seq.empty
    else if (cuts.nonEmpty && cuts.last == n) cuts else cuts :+ n
  }

  private def byteCuts(s: String, w: Int = 8, d: Int = 64): Seq[Int] =
    Seq(s).toDF("t")
      .select(GraftExtensions.cdcCuts(col("t").cast("binary"), w, d, 1, Int.MaxValue))
      .head().getSeq[Int](0)

  test("binary cuts equal the per-position fold over UTF-8 bytes") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcde fghé日本語 ökверст"
    val samples = Seq.fill(15)(
      (0 until (50 + rnd.nextInt(300))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("", "é", "日本語テキスト", "plain ascii only")
    for (s <- samples; d <- Seq(16, 64)) {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(byteCuts(s, 8, d) == bruteByteCuts(bytes, 8, d),
        s"divisor $d text ${s.take(30)}")
    }
  }

  test("on all-ASCII input byte cuts equal code-point cuts") {
    val rnd = new scala.util.Random(29)
    val s = (0 until 1500).map(_ => ('a' + rnd.nextInt(20)).toChar).mkString
    assert(byteCuts(s) == cuts(s))
  }

  test("on multi-byte input byte cuts use byte positions (diverge from code points)") {
    // 2-byte chars: byte length is double → the final forced cut differs
    val s = "é" * 40
    assert(byteCuts(s).last == 80)
    assert(cuts(s).last == 40)
  }

  test("cdcChunksBinary slices the payload byte-exactly") {
    val texts = Seq((1L, "résumé naïve café " * 30), (2L, "ascii only " * 40))
    val chunks = Text.cdcChunksBinary(texts.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").collect()
    for ((id, t) <- texts) {
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val mine = chunks.filter(_.getLong(0) == id)
      assert(mine.map(_.getLong(3)).sum == bytes.length, s"doc $id total bytes")
      for (r <- mine) {
        val start = r.getLong(2).toInt - 1
        val len = r.getLong(3).toInt
        val slice = bytes.slice(start, start + len)
        val md = java.security.MessageDigest.getInstance("MD5").digest(slice)
          .map("%02x".format(_)).mkString
        assert(r.getString(4) == md, s"doc $id chunk at $start")
      }
    }
  }

  test("cdc_cuts is SQL-registered with literal-argument validation") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT cdc_cuts('aaaaaaaaaaaa', 4, 1000000000, 1, 5) AS c")
      .head().getSeq[Int](0)
    assert(r == Seq(5, 10, 12))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT cdc_cuts(t, length(t), 64, 1, 10) FROM VALUES ('x') AS v(t)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.contains("NON_FOLDABLE"))
  }
}
