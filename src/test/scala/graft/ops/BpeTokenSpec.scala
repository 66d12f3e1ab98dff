package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** The TRAINED BPE tokenizer (round 7): single-round pair-count
  * training with a lexical tie-break (a pure function of the corpus,
  * invariant to partitioning), and the native replay kernel
  * ([[graft.functions.BpeTokenCount]]) pinned output-identical to the
  * builtin-fold reference semantics.
  */
class BpeTokenSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  /** Replay-mechanics probe with an EXPLICIT merge table (the kernel's
    * semantics are merge-table-independent).
    */
  private def counts(merges: Seq[(String, String)], texts: String*): Seq[(String, Long)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    texts.toDF("text")
      .select(col("text"), TrainingData.bpeTokenCount(col("text"), merges).as("bpe"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  private val HandMerges: Seq[(String, String)] = Seq(
    "t h" -> "th", "th e" -> "the", "i n" -> "in", "a n" -> "an",
    "o r" -> "or", "e r" -> "er", "s t" -> "st", "a s" -> "as",
    "j o" -> "jo", "jo in" -> "join", "h as" -> "has", "has h" -> "hash")

  test("chained merges collapse known words; unmergeable chars stay single") {
    val got = counts(HandMerges, "the", "join", "hash", "order", "scan", "zzz")
    // the: t h e -> th e -> the (rule 2 consumes rule 1's output)
    assert(got == Seq(("the", 1L), ("join", 1L), ("hash", 1L),
      ("order", 3L), ("scan", 3L), ("zzz", 3L)))
  }

  test("merges never cross word boundaries") {
    // without the | marker the "t h" rule would merge across the gap
    assert(counts(HandMerges, "cat house") == Seq(("cat house", 8L)))
  }

  test("left-to-right non-overlapping replace (BPE scan order)") {
    assert(counts(HandMerges, "inin") == Seq(("inin", 2L)))
  }

  test("kernel edge cases: empty text, leading/trailing/double spaces, empty merge table") {
    // "a  b" splits as [a, "", b] on whitespace (3 fields) and spells
    // as "a | | b" (4 symbols): 4 - 3 + 1 = 2
    val edge = Seq("", " ", "a", "a ", " a", "a  b")
    assert(counts(Nil, edge: _*).map(_._2) == Seq(1L, 0L, 1L, 1L, 1L, 2L))
    // "in" with the table: 1 token; with no table: 2 chars
    assert(counts(HandMerges, "in") == Seq(("in", 1L)))
    assert(counts(Nil, "in") == Seq(("in", 2L)))
  }

  test("native kernel is output-identical to the builtin-fold reference on the corpus") {
    graft.functions.GraftFunctions.register(spark)
    val merges = TrainingData.trainedBpeMerges(spark, sf)
    val diff = Tables.documents(spark, sf)
      .select(col("doc_id"),
        TrainingData.bpeTokenCount(col("text"), merges).as("kernel"),
        TrainingData.bpeTokenCountFold(col("text"), merges).as("fold"))
      .filter(col("kernel") =!= col("fold"))
      .count()
    assert(diff == 0L, s"$diff docs diverge between kernel and builtin fold")
  }

  test("training is deterministic and partitioning-invariant (count desc, pair asc)") {
    val docs = Tables.documents(spark, sf)
    val a = TrainingData.bpeMergeTrainFrom(docs.repartition(1))
      .collect().map(_.toString).toSeq
    val b = TrainingData.bpeMergeTrainFrom(docs.repartition(7))
      .collect().map(_.toString).toSeq
    assert(a.size == TrainingData.BpeMergeCount && a == b,
      s"trained table must be a pure function of the corpus:\n$a\nvs\n$b")
    // rank order embeds the tie-break: counts non-increasing, pats
    // strictly increasing within equal counts
    val rows = TrainingData.bpeMergeTrainFrom(docs)
      .orderBy("rk").collect().map(r => (r.getLong(3), r.getString(1))).toSeq
    rows.sliding(2).foreach {
      case Seq((c1, p1), (c2, p2)) =>
        assert(c1 > c2 || (c1 == c2 && p1 < p2), s"rank order violated: ($c1,$p1) -> ($c2,$p2)")
      case _ => ()
    }
  }

  test("pairs spanning a word gap never become rules") {
    val dir = tmpDir()
    // "ab ab ab": in-word pair "ab" ×3; the gap pairs ("b ", " a")
    // must be excluded even though they also occur 2×+
    writeDocuments(dir, (1L, "ab ab ab", "en", "s", 1L))
    val rules = TrainingData.bpeMergeTrainFrom(Tables.documents(spark, dir))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules == Seq(("a b", "ab")), s"got $rules")
  }

  test("a literal '|' in raw text never becomes a rule (it spells the word gap in the replay)") {
    val dir = tmpDir()
    // "x|" and "|y" are the most frequent adjacent pairs — training a
    // rule from either would let the replay merge ACROSS spelled word
    // boundaries (every gap is a '|'), breaking the merges-never-cross-
    // words invariant and the fertility ≥ 1 bound downstream
    writeDocuments(dir, (1L, "x|y x|y x|y zq zq", "en", "s", 1L))
    val rules = TrainingData.bpeMergeTrainFrom(Tables.documents(spark, dir))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules.forall { case (p, r) => !p.contains("|") && !r.contains("|") },
      s"gap-marker rules trained: $rules")
    assert(rules.contains(("z q", "zq")), s"legitimate pair lost: $rules")
  }

  test("q106 boundaries differ from q80 exactly where BPE token inflation says they must") {
    val dir = tmpDir()
    // corpus-trained rule: "z z" -> "zz" (the only in-word pair), so
    // "zzzz" = zz zz = 2 BPE tokens per word. 1100 words -> 2200 BPE
    // vs 1100 whitespace tokens: doc2 starts inside sequence 0 under
    // q80 but at sequence 1 under q106 — packing with whitespace
    // counts misplaces every boundary after a long doc.
    val doc1 = Array.fill(1100)("zzzz").mkString(" ")
    writeDocuments(dir, (1L, doc1, "en", "s", 1L), (2L, "a b c", "en", "s", 1L))
    val q80 = TrainingData.q80SequencePack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq // (doc, n_tokens, seq_id)
    val q106 = TrainingData.q106BpeSequencePack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(q80 == Seq((1L, 1100L, 0L), (2L, 3L, 0L)))
    assert(q106 == Seq((1L, 2200L, 0L), (2L, 3L, 1L)))
  }
}
