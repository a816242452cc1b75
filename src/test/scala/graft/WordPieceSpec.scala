package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.ops.{Unigram, WordPiece}

/** WordPiece greedy segmentation (org.apache.spark.sql.graft
  * .WordPieceEncode + ops.WordPiece). The corpus-derived paths are
  * oracled by t_wordpiece_encode / t_wordpiece_corpus; this spec pins
  * the expression semantics the oracle can't reach: the brute-force
  * greedy contract on arbitrary vocabularies, the [UNK] null path, and
  * the greedy-vs-min-cost divergence that distinguishes WordPiece from
  * the unigram DP.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: textbook greedy longest-match-first. */
  private def bruteWp(word: String, vocab: Set[String], maxLen: Int): Option[Seq[String]] = {
    var pos = 0
    val out = Seq.newBuilder[String]
    while (pos < word.length) {
      val ls = (1 to math.min(maxLen, word.length - pos)).reverse
      ls.map { l =>
        if (pos == 0) word.substring(0, l) else "##" + word.substring(pos, pos + l)
      }.find(vocab.contains) match {
        case Some(p) =>
          out += p
          pos += p.length - (if (pos == 0) 0 else 2)
        case None => return None
      }
    }
    Some(out.result())
  }

  private def encode(word: String, vocab: Seq[String], maxLen: Int = 6): Option[Seq[String]] = {
    val r = Seq(word).toDF("word")
      .select(GraftExtensions.wordpieceEncode(col("word"), typedLit(vocab), maxLen))
      .head()
    if (r.isNullAt(0)) None else Some(r.getSeq[String](0))
  }

  test("greedy encode equals brute force on random vocab/word samples") {
    val rnd = new scala.util.Random(17)
    val alphabet = "abcd"
    def randWord(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(4))).mkString
    val vocabBase = (1 to 40).map(_ => randWord(1 + rnd.nextInt(4)))
    val vocab = (vocabBase ++ vocabBase.map("##" + _) ++
      alphabet.map(_.toString) ++ alphabet.map("##" + _)).distinct
    for (_ <- 1 to 60) {
      val w = randWord(3 + rnd.nextInt(8))
      assert(encode(w, vocab) == bruteWp(w, vocab.toSet, 6), s"word $w")
    }
  }

  test("unk path: a position with no matching piece yields null") {
    assert(encode("xyz", Seq("x", "##y")) == None) // 'z' unreachable
    assert(encode("xyz", Seq("x", "##y", "##z")) == Some(Seq("x", "##y", "##z")))
    assert(encode("zebra", Seq("a", "##b")) == None) // no start match
  }

  test("greedy commits to the long early piece even when it strands the tail") {
    // vocab: "abc" and a,b,c singles but no ##d — greedy takes "abc",
    // then "##d" fails => UNK; min-cost segmentation a b c d would cover.
    assert(encode("abcd", Seq("abc", "a", "##b", "##c")) == None)
    // with coverage the greedy pick is still longest-first
    assert(encode("abcd", Seq("abc", "a", "##b", "##c", "##d"))
      == Some(Seq("abc", "##d")))
  }

  test("word-initial and continuation pieces are position-exclusive") {
    // "ab": "##ab" may not match at the start; "ab" may not match inside
    assert(encode("ab", Seq("##ab", "a", "##b")) == Some(Seq("a", "##b")))
    assert(encode("abab", Seq("ab", "##a", "##b")) == Some(Seq("ab", "##a", "##b")))
  }

  test("vocab policy: single-char floor makes every corpus word encodable") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
                   (2L, "beta beta gamma xylophone")).toDF("doc_id", "text")
    val words = Unigram.wordCounts(docs, "text")
    val pieces = WordPiece.vocabPieces(words, topK = 5)
    val enc = WordPiece.encodeWords(words, pieces).collect()
    assert(enc.forall(!_.isNullAt(2)), "some corpus word hit UNK")
    // round-trip: pieces reassemble the word
    for (r <- enc) {
      val w = r.getString(0)
      val joined = r.getSeq[String](2).map(_.stripPrefix("##")).mkString
      assert(joined == w, s"$w reassembled as $joined")
    }
  }

  test("encodeCorpus counts words and pieces per document") {
    val docs = Seq((1L, "aa bb aa"), (2L, "aa")).toDF("doc_id", "text")
    val words = Unigram.wordCounts(docs, "text")
    val pieces = WordPiece.vocabPieces(words)
    val out = WordPiece.encodeCorpus(docs, "doc_id", "text", pieces)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out(0)._2 == 3 && out(1)._2 == 1)
    // "aa" is a top piece itself → 1 piece per word
    assert(out(0)._3 == 3 && out(1)._3 == 1)
  }

  test("per-language fertility: pieces per word over the lang-grouped encode") {
    // the t_tokenizer_fertility shape (encodeCorpus grouped by lang):
    // lang a — "aa" is a whole piece (1), "ab" splits (2) with this tiny
    // vocab; lang b — one 1-piece word. Fertility = pieces / words.
    val docs = Seq(("a", "aa ab aa"), ("a", "aa"), ("b", "aa"))
      .toDF("lang", "text")
    val words = Unigram.wordCounts(docs, "text")
    val pieces = WordPiece.vocabPieces(words)
    val out = WordPiece.encodeCorpus(docs, "lang", "text", pieces)
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words"), 4))
      .orderBy("lang")
      .as[(String, Long, Long, Double)].collect().toSeq
    // vocabPieces includes "aa" and "ab" as whole words (top starts), so
    // every word is 1 piece here — unless "ab" misses the top cut, which
    // this 2-word vocab can't trigger. 4 words / 4 pieces for a, 1/1 b.
    assert(out == Seq(("a", 4L, 4L, 1.0), ("b", 1L, 1L, 1.0)))
  }

  test("fertility > 1 when a word must split into continuations") {
    // force a split: vocab without the whole word "abc" but with its
    // parts — 1 word, 3 pieces, fertility 3.0
    val docs = Seq(("x", "abc")).toDF("lang", "text")
    val vocab = Seq("a", "##b", "##c")
    val out = WordPiece.encodeCorpus(docs, "lang", "text", vocab)
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words"), 4))
      .as[(String, Long, Long, Double)].head()
    assert(out == (("x", 1L, 3L, 3.0)))
  }

  test("segmentation counts code points, not UTF-16 chars (non-BMP)") {
    // five U+1F600 emoji = 5 code points (10 Java chars); the 5-cp piece
    // must be reachable under maxPieceLen=6
    val e = new String(Character.toChars(0x1F600))
    val word = e * 5
    val vocab = Seq(word, e, "##" + e)
    assert(encode(word, vocab, 6) == Some(Seq(word)))
    // and a 3-cp cap picks the longest CODE-POINT prefix, then continues
    assert(encode(word, Seq(e * 3, e, "##" + e, "##" + (e * 2)), 3)
      == Some(Seq(e * 3, "##" + (e * 2))))
  }
}
