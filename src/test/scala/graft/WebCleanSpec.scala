package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Web-curation operators (C4 line cleaning, Gopher quality rules,
  * corpus-wide paragraph dedup): hand-computed oracles on tiny line
  * tables; the DuckDB hash-compare covers the sf-scale synthesized
  * corpus. */
class WebCleanSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "a", "of")

  test("c4LineKeep: terminal punctuation, min words, javascript") {
    val lines = Seq(
      "one two three four five.",   // keep
      "one two three four five",    // no terminal punct
      "short line.",                 // < 5 words
      "enable JavaScript to view this page.", // javascript
      "is it five whole words?",    // keep (?)
      "five words ending in bang!") // keep (!)
      .toDF("line")
    val kept = lines.filter(Curation.c4LineKeep(col("line")))
      .as[String].collect().toSeq
    assert(kept == Seq("one two three four five.",
      "is it five whole words?", "five words ending in bang!"))
  }

  test("c4Clean: page drops on brace/lorem, min kept lines, clean hash") {
    val lines = Seq(
      // doc 1: three good lines -> kept
      (1L, 0L, "alpha beta gamma delta eps."),
      (1L, 1L, "one two three four five!"),
      (1L, 2L, "six seven eight nine ten?"),
      // doc 2: good lines but a brace line -> page dropped
      (2L, 0L, "alpha beta gamma delta eps."),
      (2L, 1L, "function() { var x = 1; }"),
      (2L, 2L, "one two three four five."),
      (2L, 3L, "six seven eight nine ten."),
      // doc 3: only two kept lines -> dropped by minKeptLines
      (3L, 0L, "alpha beta gamma delta eps."),
      (3L, 1L, "one two three four five."),
      (3L, 2L, "no terminal punctuation here")
    ).toDF("doc_id", "idx", "line")
    val out = Curation.c4Clean(lines, "doc_id", "idx", "line")
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "page_ok", "kept")
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 3L, true, true),
      (2L, 4L, 3L, false, false),
      (3L, 3L, 2L, true, false)))
    // clean_md5 = md5 of kept lines joined by \n, only for kept pages
    val md = Curation.c4Clean(lines, "doc_id", "idx", "line")
      .orderBy("doc_id").select("clean_md5").as[String].collect().toSeq
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("alpha beta gamma delta eps.\none two three four five!\n" +
        "six seven eight nine ten?").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md == Seq(expected, null, null))
  }

  test("c4Clean: kept-line order follows idx, not input order") {
    val lines = Seq(
      (1L, 2L, "third line has five words."),
      (1L, 0L, "first line has five words."),
      (1L, 1L, "second line has five words."))
      .toDF("doc_id", "idx", "line")
    val md = Curation.c4Clean(lines, "doc_id", "idx", "line",
        minKeptLines = 3)
      .select("clean_md5").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("first line has five words.\nsecond line has five words.\n" +
        "third line has five words.").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md == expected)
  }

  test("gopherRules: each rule flips keep at its boundary") {
    def doc(id: Long, text: String) = (id, text)
    // base doc: 50 four-char words incl. two stopwords -> passes all
    val okText = (Seq("the", "a") ++ Seq.fill(48)("word")).mkString(" ")
    val shortText = (Seq("the", "a") ++ Seq.fill(10)("word")).mkString(" ")
    val longWords = (Seq("the", "a") ++
      Seq.fill(48)("verylongtokenxx")).mkString(" ")       // mean len > 10
    val oneStop = (Seq("the") ++ Seq.fill(49)("word")).mkString(" ")
    val docs = Seq(doc(1, okText), doc(2, shortText), doc(3, longWords),
      doc(4, oneStop)).toDF("doc_id", "text")
    val lines = Seq(
      (1L, "plain line."), (2L, "plain line."),
      (3L, "plain line."), (4L, "plain line."))
      .toDF("doc_id", "line")
    val out = Curation.gopherRules(docs, lines, "doc_id", "text", "line",
        stops)
      .orderBy("doc_id").select("doc_id", "keep")
      .as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, true), (2L, false), (3L, false), (4L, false)))
  }

  test("gopherRules: bullet and ellipsis line ratios") {
    val text = (Seq("the", "a") ++ Seq.fill(48)("word")).mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val lines = Seq(
      (1L, "- bullet one"), (1L, "- bullet two"),
      (1L, "- bullet three"), (1L, "plain."),
      (2L, "trailing off..."), (2L, "also trailing..."),
      (2L, "plain."), (2L, "plain again."))
      .toDF("doc_id", "line")
    val out = Curation.gopherRules(docs, lines, "doc_id", "text", "line",
        stops, maxBulletRatio = 0.5, maxEllipsisRatio = 0.3)
      .orderBy("doc_id")
      .select("doc_id", "bullet_ratio", "ellipsis_ratio", "keep")
      .as[(Long, Double, Double, Boolean)].collect().toSeq
    assert(out == Seq((1L, 0.75, 0.0, false), (2L, 0.0, 0.5, false)))
  }

  test("paragraphDedup: one keeper corpus-wide at smallest (doc, idx)") {
    val lines = Seq(
      (1L, 0L, "unique to doc one"),
      (1L, 1L, "shared boilerplate"),
      (2L, 0L, "shared boilerplate"),
      (2L, 1L, "unique to doc two"),
      (3L, 0L, "shared boilerplate"),
      (3L, 1L, "shared boilerplate")) // intra-doc repeat also dropped
      .toDF("doc_id", "idx", "line")
    val out = Curation.paragraphDedup(lines, "doc_id", "idx", "line")
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_dropped")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L), (2L, 2L, 1L), (3L, 2L, 2L)))
    // doc 3 loses everything -> md5 of empty string, not NULL
    val md3 = Curation.paragraphDedup(lines, "doc_id", "idx", "line")
      .filter(col("doc_id") === 3).select("clean_md5").as[String].head()
    assert(md3 == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("htmlExtract strips chrome, preserves blocks, decodes entities") {
    val html = "<html><head><title>t</title>" +
      "<style>p { color: red; }</style></head><body>" +
      "<script>if (1<2) { alert('x'); }</script>" +
      "<!-- a\nmultiline comment -->" +
      "<p>first  para</p><p>A &amp; B &lt;tag&gt; &quot;q&quot;</p>" +
      "<div>in <b>a</b> div</div></body></html>"
    val got = Seq(html).toDF("h")
      .select(graft.ops.Text.htmlExtract(col("h")).as("c"))
      .as[String].head()
    // no block-closing tag between the title text and the first <p>
    // (open tags become spaces), so they share a line
    assert(got == "t first para\nA & B <tag> \"q\"\nin a div", got)
  }

  test("htmlLinkDensity: anchor chars over clean chars; empty page is 1.0") {
    // clean text = "home x" (6 chars), anchor text = "home" (4)
    val got = Seq("<p><a href='/'>home</a> x</p>").toDF("h")
      .select(graft.ops.Text.htmlLinkDensity(col("h")).as("d"))
      .as[Double].head()
    assert(math.abs(got - 4.0 / 6.0) < 1e-12, got.toString)
    val empty = Seq("<script>var x;</script>").toDF("h")
      .select(graft.ops.Text.htmlLinkDensity(col("h")).as("d"))
      .as[Double].head()
    assert(empty == 1.0)
  }

  test("trainTextClassifier: round-1 weights sum to lr/2 on one positive doc") {
    // one doc, y=1, w0=0 -> sigma(0)=0.5 and each touched bucket gets
    // w_b = lr*0.5*tf_b; since sum_b tf_b = 1 the weight total is
    // exactly lr/2 up to the 1e-6 per-bucket rounding
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val w = Curation.trainTextClassifier(docs, "doc_id", "text",
        lit(true), buckets = 16, rounds = 1, lr = 4.0)
      .agg(sum("w")).as[Double].head()
    assert(math.abs(w - 2.0) < 16 * 5e-7)
  }

  test("trainTextClassifier: separates disjoint-vocab classes") {
    val pos = (0 until 20).map(i => (i.toLong, "good clean prose text here"))
    val neg = (20 until 40).map(i => (i.toLong, "spam junk noise garbage stuff"))
    val docs = (pos ++ neg).toDF("doc_id", "text")
    val w = Curation.trainTextClassifier(docs, "doc_id", "text",
        col("doc_id") < 20, buckets = 32, rounds = 3, lr = 10.0)
      .orderBy("bucket").select("w").as[Double].collect().toSeq
    val scored = docs.select(col("doc_id"),
        Curation.classifierScore(col("text"), w).as("p"))
      .as[(Long, Double)].collect().toMap
    val posP = pos.map(d => scored(d._1))
    val negP = neg.map(d => scored(d._1))
    assert(posP.min > negP.max,
      s"positive class must outscore negative: ${posP.min} vs ${negP.max}")
    assert(posP.min > 0.5 && negP.max < 0.5)
  }

  test("null edges: c4 treats null lines as not-kept, score of null text is null") {
    // a null line fails the keep rule (rlike(null) -> null -> not
    // counted) and does NOT poison the page verdict
    val lines = Seq(
      (1L, 0L, Option("alpha beta gamma delta eps.")),
      (1L, 1L, Option("one two three four five!")),
      (1L, 2L, Option("six seven eight nine ten?")),
      (1L, 3L, Option.empty[String]))
      .toDF("doc_id", "idx", "line")
    val out = Curation.c4Clean(lines, "doc_id", "idx", "line")
      .select("n_lines", "n_kept", "kept")
      .as[(Long, Long, Boolean)].head()
    assert(out == ((4L, 3L, true)))
    // classifierScore propagates null text as null, not a crash or 0.5
    val p = Seq(Option.empty[String]).toDF("text")
      .select(Curation.classifierScore(col("text"), Seq(0.1, 0.2)).as("p"))
      .select(col("p").isNull).as[Boolean].head()
    assert(p)
  }

  test("aucOnGrid: tie-corrected Mann-Whitney matches the brute-force pairs") {
    // pos 0.9 beats both negs (2); pos 0.8 ties neg 0.8 (0.5) and
    // beats neg 0.2 (1) -> (2 + 1.5) / (2*2) = 0.875
    val scored = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.2, 0))
      .toDF("p", "y")
    val out = Curation.aucOnGrid(scored, "p", "y")
      .as[(Double, Long, Long)].head()
    assert(out == ((0.875, 2L, 2L)))
    // perfect separation -> 1.0; reversed -> 0.0
    val perfect = Seq((0.9, 1), (0.8, 1), (0.3, 0)).toDF("p", "y")
    assert(Curation.aucOnGrid(perfect, "p", "y")
      .select("auc").as[Double].head() == 1.0)
    val reversed = Seq((0.1, 1), (0.8, 0)).toDF("p", "y")
    assert(Curation.aucOnGrid(reversed, "p", "y")
      .select("auc").as[Double].head() == 0.0)
  }

  test("classifierScore matches a hand-computed margin") {
    // score = sigma(mean over tokens of w[bucket(tok)]); recompute the
    // buckets with the same portable hash and check the closed form
    val w = (0 until 8).map(b => b * 0.1 - 0.3)
    val docs = Seq((1L, "one two three")).toDF("doc_id", "text")
    val buckets = docs
      .select(explode(split(col("text"), " ", -1)).as("t"))
      .select(pmod(graft.ops.Text.portableHash(col("t")), lit(8L)).as("b"))
      .as[Long].collect()
    val expected = 1.0 / (1.0 +
      math.exp(-buckets.map(b => w(b.toInt)).sum / 3.0))
    val got = docs.select(
        Curation.classifierScore(col("text"), w).as("p"))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("stored-model round trip: score from a parquet weight table == t_classifier_scored") {
    // the production serving shape (judge r11): train once, persist the
    // (bucket, w) table, score every later batch from the STORED model
    // with no retraining. Scored-from-stored must reproduce the
    // registered t_classifier_scored query byte-for-byte.
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("clfw").toString
    Curation.trainTextClassifier(docs, "doc_id", "text",
        col("lang") === "en", buckets = 64, rounds = 3, lr = 5.0)
      .write.mode("overwrite").parquet(dir)
    val stored = Curation.weightsFromDF(spark.read.parquet(dir), buckets = 64)
    val scored = docs.select(col("doc_id"),
        Curation.classifierScore(col("text"), stored).as("__p"),
        (col("lang") === "en").cast("long").as("y"))
      .select(col("doc_id"), round(col("__p"), 4).as("p"),
        (col("__p") >= 0.5).as("pred"), col("y"))
      .orderBy("doc_id")
      .as[(Long, Double, Boolean, Long)].collect().toSeq
    val registered = queries.Registry.byName("t_classifier_scored")(spark, sfDir)
      .as[(Long, Double, Boolean, Long)].collect().toSeq
    assert(scored == registered,
      "scoring from the stored weight table must match the trained-inline query")
  }

  test("weightsFromDF zero-fills buckets absent from the stored table") {
    val sparse = Seq((1L, 0.5), (3L, -0.25)).toDF("bucket", "w")
    assert(Curation.weightsFromDF(sparse, 5) == Seq(0.0, 0.5, 0.0, -0.25, 0.0))
  }
}
