package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The BPE-merge stub's semantics: rank-ordered merges, chained rules,
  * and the word-boundary marker — the properties that make the fixed
  * table a faithful stand-in for a learned tokenizer.
  */
class BpeTokenSpec extends SparkSpecBase {

  private def counts(texts: String*): Seq[(String, Long, Long)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(col("text"), size(split(col("text"), " ")).cast("long").as("ws"),
        TrainingData.bpeTokenCount(col("text")).as("bpe"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("chained merges collapse known words; unmergeable chars stay single") {
    val got = counts("the", "join", "hash", "order", "scan", "zzz").map(t => (t._1, t._3))
    // the: t h e -> th e -> the (rule 2 consumes rule 1's output)
    // join: j o i n -> (i n) -> (j o) -> jo in -> join
    // hash: h a s h -> h as h -> has h -> hash
    // order: o r d e r -> or d er (3); scan: s c a n -> s c an (3)
    // zzz: no rule touches z -> 3 single-char tokens
    assert(got == Seq(("the", 1L), ("join", 1L), ("hash", 1L),
      ("order", 3L), ("scan", 3L), ("zzz", 3L)))
  }

  test("merges never cross word boundaries") {
    // "...t" + "h..." adjacent words: without the | marker the t h rule
    // would merge across the gap and undercount
    val Seq((_, ws, bpe)) = counts("cat house")
    assert(ws == 2L)
    // cat: c a t (no rule) = 3; house: h o u s e (no rule fires: "s t"
    // needs t, "a s" needs a) = 5 -> 8 total, NOT 7
    assert(bpe == 8L)
  }

  test("left-to-right non-overlapping replace (BPE scan order)") {
    // "inin": i n i n -> both pairs merge left-to-right -> in in = 2
    val Seq((_, _, bpe)) = counts("inin")
    assert(bpe == 2L)
  }

  test("q106 boundaries differ from q80 exactly where BPE token inflation says they must") {
    val dir = tmpDir()
    // "zzzz" stays 4 single-char tokens under the merges table, so 750
    // whitespace tokens are 3000 BPE tokens: doc2 starts inside
    // sequence 0 under q80 but at sequence 1 under q106 — packing with
    // whitespace counts misplaces every boundary after a long doc
    val doc1 = Array.fill(750)("zzzz").mkString(" ")
    writeDocuments(dir, (1L, doc1, "en", "s", 1L), (2L, "a b c", "en", "s", 1L))
    val q80 = TrainingData.q80SequencePack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq // (doc, n_tokens, seq_id)
    val q106 = TrainingData.q106BpeSequencePack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(q80 == Seq((1L, 750L, 0L), (2L, 3L, 0L)))
    assert(q106 == Seq((1L, 3000L, 0L), (2L, 3L, 1L)))
  }
}
