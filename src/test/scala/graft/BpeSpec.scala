package graft

import graft.text.Bpe

/** BPE trainer/encoder semantics: hand-computed merge goldens, the
  * lexicographic tie-break, train/encode agreement, early stop, and the
  * distributed token-count path.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-computed merge sequence") {
    // corpus: ab×3, abc×1 → pair counts (a,b)=4, (b,c)=1 → merge (a,b);
    // then words [ab]×3, [ab,c]×1 → merge (ab,c); then nothing mergeable
    val wc = Seq(("ab", 3L), ("abc", 1L))
    assert(Bpe.learnMerges(wc, 10) == Seq(("a", "b"), ("ab", "c")),
      "merge sequence must follow weighted pair frequency and stop early")
  }

  test("learnMerges: ties break to the lexicographically smallest pair") {
    // (a,b) and (b,a) both count 1 → (a,b) wins round 1
    val wc = Seq(("ab", 1L), ("ba", 1L))
    assert(Bpe.learnMerges(wc, 1) == Seq(("a", "b")))
  }

  test("encodeWord: lowest-rank merges apply everywhere, in rank order") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    assert(Bpe.encodeWord("abcab", ranks) == Seq("abc", "ab"))
    assert(Bpe.encodeWord("ababab", ranks) == Seq("ab", "ab", "ab"))
    assert(Bpe.encodeWord("xyz", ranks) == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("a", ranks) == Seq("a"))
  }

  test("train then encode reproduces the trainer's own segmentation") {
    // every training word must re-encode to ONE token once fully merged
    val docs = Seq((1L, "low low low lower lowest"),
      (2L, "low lowest newest newest")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 100)
    val ranks = merges.zipWithIndex.toMap
    for (w <- Seq("low", "lower", "lowest", "newest"))
      assert(Bpe.encodeWord(w, ranks) == Seq(w),
        s"fully-trained vocab must encode training word '$w' to itself")
  }

  test("tokenCounts: distributed apply matches per-word encoding") {
    val docs = Seq((1L, "ab abc ab"), (2L, "abc xy"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "c"))
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: ab→1, abc→1, ab→1 = 3; doc 2: abc→1, xy→2 = 3; doc 3: 0
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 0L), s"got $got")
    assert(Bpe.encodeWord("xy", ranks).length == 2)
  }

  test("wordCounts cap is deterministic by (count desc, word)") {
    val docs = Seq((1L, "b b b a a c c d")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text", maxVocab = 3)
    assert(wc == Seq(("b", 3L), ("a", 2L), ("c", 2L)),
      s"cap must keep the most frequent words, ties by word: $wc")
  }
}
