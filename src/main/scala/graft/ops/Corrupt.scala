package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-corruption objective data prep (T5, Raffel et al. 2020 §3.1.4):
  * mask contiguous token spans, replace each span with a numbered
  * sentinel in the inputs, and emit the masked spans behind their
  * sentinels as the targets.
  *
  * This is the DETERMINISTIC block variant: tokens group into fixed
  * `blockLen` blocks and a block is masked when a content hash of
  * (doc id, block index) lands in 1/`maskOneInK` — giving the T5 paper's
  * ~15% noise density at mean span ≈ `blockLen` (adjacent masked blocks
  * merge into longer spans, the gaps-and-islands step) while staying
  * engine-portable and exactly replayable by an independent SQL oracle —
  * the same determinism trade every hash-seeded op in this engine makes
  * (content-hash uniforms, not RNG state).
  *
  * Scale shape: one token explode, one block-level window pair over the
  * masked blocks (per-doc state = masked-block count), one ordered
  * per-doc assembly aggregation — no join wider than doc id, no
  * corpus-level state.
  */
object Corrupt {

  /** Prefix-LM split (UL2's S-denoiser, Tay et al. 2022): one
    * hash-chosen cut point; inputs = the prefix, targets = the rest.
    * Per-row expression only. */
  def prefixLmSplit(df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val toks = split(col(textCol), " ", -1)
    val n = size(toks)
    val c = pmod(Text.portableHash(
      concat(col(idCol).cast("string"), lit("#plm"))),
      (n + 1).cast("long")).cast("int")
    df.select(col(idCol).as("id"), n.cast("long").as("n_tokens"),
      (n - c).cast("long").as("n_masked"),
      when(c < n, 1L).otherwise(0L).as("n_spans"),
      array_join(slice(toks, lit(1), c), " ").as("inputs"),
      array_join(slice(toks, c + 1, n - c), " ").as("targets"))
  }

  /** UL2 mixture of denoisers (Tay et al. 2022): each doc routes by
    * content hash to one paradigm — R (regular span corruption: short
    * spans, ~14% noise), X (extreme: long spans, ~50% noise), or S
    * (sequential prefix-LM split) — and carries its paradigm tag, the
    * way UL2 prepends [R]/[X]/[S] mode tokens. The routing hash is
    * independent of each paradigm's masking hashes, and every branch is
    * the already-certified operator ([[spanCorrupt]] at two configs,
    * [[prefixLmSplit]]), so the mixture adds exactly one filter per
    * branch + a union — no new corpus-level state. */
  def ul2Mix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val route = pmod(Text.portableHash(
      concat(col(idCol).cast("string"), lit("#ul2"))), lit(3L))
    val r = spanCorrupt(df.filter(route === 0), idCol, textCol,
      blockLen = 3, maskOneInK = 7).withColumn("paradigm", lit("R"))
    val x = spanCorrupt(df.filter(route === 1), idCol, textCol,
      blockLen = 8, maskOneInK = 2).withColumn("paradigm", lit("X"))
    val s = prefixLmSplit(df.filter(route === 2), idCol, textCol)
      .withColumn("paradigm", lit("S"))
    r.unionByName(x).unionByName(s)
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022): split each
    * doc's token stream at two DETERMINISTIC points and render
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M` (the PSM order the
    * paper trains on). The two cut points derive from content hashes of
    * (doc id, 1|2) reduced modulo n+1 and SORTED, so any engine replays
    * them exactly; degenerate cuts (empty middle) are legal FIM data and
    * kept — the fim_rate gate belongs upstream (apply the transform to a
    * hash-chosen fraction of docs). Per-row expression only: no explode,
    * no shuffle beyond the source scan. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ", -1)
    val n = size(toks)
    def cut(salt: Int) = pmod(Text.portableHash(
      concat(col(idCol).cast("string"), lit(s"#fim$salt"))),
      (n + 1).cast("long")).cast("int")
    val a = least(cut(1), cut(2))
    val b = greatest(cut(1), cut(2))
    // slice(arr, start1based, len); empty slices join to ""
    val p = array_join(slice(toks, lit(1), a), " ")
    val m = array_join(slice(toks, a + 1, b - a), " ")
    val s = array_join(slice(toks, b + 1, n - b), " ")
    df.select(col(idCol).as("id"), n.cast("long").as("n_tokens"),
      a.cast("long").as("cut_a"), b.cast("long").as("cut_b"),
      concat(lit("<fim_prefix> "), p, lit(" <fim_suffix> "), s,
        lit(" <fim_middle> "), m).as("fim"))
  }

  /** One row per input doc: `(id, n_tokens, n_masked, n_spans, inputs,
    * targets)`. `inputs` = unmasked tokens with `<extra_id_k>` replacing
    * the k-th masked span (positional order); `targets` = each span's
    * sentinel followed by its masked tokens, concatenated in order;
    * empty string when nothing was masked. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  blockLen: Int = 3, maskOneInK: Int = 7): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    require(maskOneInK >= 2, s"maskOneInK must be >= 2, got $maskOneInK")
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "tok")))
      .withColumn("blk", floor(col("pos") / blockLen))
      .withColumn("masked",
        pmod(Text.portableHash(concat(col("id").cast("string"), lit(":"),
          col("blk").cast("string"))), lit(maskOneInK.toLong)) === 0)
    // gaps-and-islands over the masked BLOCKS: adjacent masked blocks
    // share (blk - row_number), and dense_rank over that island key
    // numbers the sentinels in positional order
    val wB = Window.partitionBy("id").orderBy("blk")
    val islands = toks.filter(col("masked")).select("id", "blk").distinct()
      .withColumn("island", col("blk") - row_number().over(wB))
      .withColumn("sent",
        dense_rank().over(Window.partitionBy("id").orderBy("island")) - 1)
      .select("id", "blk", "sent")
    val wS = Window.partitionBy("id", "sent")
    val tt = toks.join(islands, Seq("id", "blk"), "left")
      .withColumn("first_pos",
        when(col("sent").isNotNull, min("pos").over(wS)))
    val sentinel = concat(lit("<extra_id_"), col("sent"), lit(">"))
    val inputPiece = when(col("sent").isNull, col("tok"))
      .when(col("pos") === col("first_pos"), sentinel)
    val targetPiece = when(col("sent").isNotNull,
      when(col("pos") === col("first_pos"),
        concat(sentinel, lit(" "), col("tok"))).otherwise(col("tok")))
    def assemble(piece: org.apache.spark.sql.Column) =
      array_join(transform(array_sort(collect_list(
        when(piece.isNotNull, struct(col("pos"), piece.as("p"))))),
        _.getField("p")), " ")
    tt.groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("sent").isNotNull, 1L).otherwise(0L)).as("n_masked"),
        (coalesce(max("sent"), lit(-1)) + 1).cast("long").as("n_spans"),
        assemble(inputPiece).as("inputs"),
        assemble(targetPiece).as("targets"))
  }
}
