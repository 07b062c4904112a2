package graft

import org.apache.spark.sql.functions._

import graft.text.Quality

/** Gopher-rule quality signals and PII scrubbing — hand-computed goldens. */
class QualitySpec extends SparkSpec {

  test("gopherTextStats: word shape, symbols, alpha fraction, stopword hits") {
    import spark.implicits._
    val df = Seq((1L, "the cat and the hat ### sat ... here 42")).toDF("doc_id", "text")
    val out = Quality.gopherTextStats(df, "text").head()
    // words: the cat and the hat ### sat ... here 42 → 10 words
    assert(out.getAs[Long]("word_count") == 10L)
    // total chars = 3+3+3+3+3+3+3+3+4+2 = 30 → mean 3.0
    assert(math.abs(out.getAs[Double]("mean_word_len") - 3.0) < 1e-12)
    // 3 hashes + 1 ellipsis = 4 symbols / 10 words
    assert(math.abs(out.getAs[Double]("symbol_word_ratio") - 0.4) < 1e-12)
    // words with a letter: all but "###", "...", "42" → 7/10
    assert(math.abs(out.getAs[Double]("alpha_word_frac") - 0.7) < 1e-12)
    // stop list occurrences: the, and, the → 3
    assert(out.getAs[Long]("stopword_hits") == 3L)
  }

  test("lineRepetitionStats: duplicate lines and duplicated characters") {
    import spark.implicits._
    val text = Seq("alpha beta", "unique line", "alpha beta", "", "  ", "tail").mkString("\n")
    val df = Seq((1L, text), (2L, "single line only")).toDF("doc_id", "text")
    val out = Quality.lineRepetitionStats(df, "text")
      .orderBy("doc_id").collect()
    // doc 1: non-empty lines = [alpha beta, unique line, alpha beta, tail]
    // dup fraction = 1 − 3/4; dup chars = 2·10 over 10+11+10+4 = 35
    assert(math.abs(out(0).getAs[Double]("dup_line_frac") - 0.25) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("dup_line_char_frac") - 20.0 / 35.0) < 1e-12)
    // doc 2: single line → both zero
    assert(out(1).getAs[Double]("dup_line_frac") == 0.0)
    assert(out(1).getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("ngramRepetitionStats: top 2-gram count, char fraction, tie-break") {
    import spark.implicits._
    // "a b a b a" → grams: [a b, b a, a b, b a] — 'a b' and 'b a' both
    // count 2; tie broken by lexicographically smallest → 'a b'
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val out = Quality.ngramRepetitionStats(df, "text", n = 2).head()
    assert(out.getAs[String]("top_ngram") == "a b")
    assert(out.getAs[Long]("top_ngram_count") == 2L)
    // 2 occurrences × 3 chars over joined length 9
    assert(math.abs(out.getAs[Double]("top_ngram_char_frac") - 6.0 / 9.0) < 1e-12)
    // 5 words, 2 distinct → dup_word_frac 0.6
    assert(math.abs(out.getAs[Double]("dup_word_frac") - 0.6) < 1e-12)
  }

  test("tokenKlDivergence: hand-computed drift, zero for a lone stratum") {
    import spark.implicits._
    // a: {x:2, y:1}, b: {x:1, y:3} → global {x:3, y:4} over 7 tokens
    val df = Seq(("a", "x x y"), ("b", "x y y y")).toDF("source", "text")
    val out = Quality.tokenKlDivergence(df, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("kl"))).toMap
    val klA = 2.0 / 3 * math.log((2.0 / 3) / (3.0 / 7)) +
      1.0 / 3 * math.log((1.0 / 3) / (4.0 / 7))
    val klB = 1.0 / 4 * math.log((1.0 / 4) / (3.0 / 7)) +
      3.0 / 4 * math.log((3.0 / 4) / (4.0 / 7))
    assert(out("a")._1 == 3L && out("b")._1 == 4L)
    assert(math.abs(out("a")._2 - klA) < 1e-12)
    assert(math.abs(out("b")._2 - klB) < 1e-12)
    assert(klA > 0 && klB > 0, "drifted strata diverge")
    // a stratum identical to the corpus has zero divergence
    val lone = Quality.tokenKlDivergence(
      Seq(("only", "x y z x")).toDF("source", "text"), "source", "text")
      .head().getAs[Double]("kl")
    assert(math.abs(lone) < 1e-15)
  }

  test("klDrift: hand-computed smoothed divergence, zero on identical frames, novel words counted") {
    import spark.implicits._
    val batch = Seq((1L, "x x y")).toDF("id", "text")
    val base = Seq((2L, "x y y z")).toDF("id", "text")
    val out = Quality.klDrift(batch, base, "text").head()
    // union vocab {x,y,z}: p=(3/6,2/6,1/6), q=(2/7,3/7,2/7)
    val kl = 0.5 * math.log(0.5 / (2.0 / 7)) +
      (1.0 / 3) * math.log((1.0 / 3) / (3.0 / 7)) +
      (1.0 / 6) * math.log((1.0 / 6) / (2.0 / 7))
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[Long]("n_novel_words") == 0L)
    assert(math.abs(out.getAs[Double]("kl") - kl) < 1e-12)
    // identical frames → zero drift
    val same = Quality.klDrift(base, base, "text").head()
    assert(math.abs(same.getAs[Double]("kl")) < 1e-15)
    // a batch-only word registers as novel
    val nov = Quality.klDrift(
      Seq((3L, "x brandnew")).toDF("id", "text"), base, "text").head()
    assert(nov.getAs[Long]("n_novel_words") == 1L)
    assert(nov.getAs[Double]("kl") > 0)
    // gate semantics (the x72 threshold): a same-distribution batch
    // passes a 0.05 gate, a fully-novel-vocabulary batch fails it
    val drifted = Quality.klDrift(
      Seq((4L, "alien words never seen before anywhere at all"))
        .toDF("id", "text"), base, "text").head()
    assert(drifted.getAs[Double]("kl") > 0.05, "drifted batch must trip the gate")
    assert(same.getAs[Double]("kl") <= 0.05, "in-distribution batch must pass")
  }

  test("perplexityBuckets: rank-based terciles per language, head = common text") {
    import spark.implicits._
    // "a" dominates the corpus → all-"a" docs score lowest cross-entropy;
    // docs with rare singleton words score highest
    val docs = Seq(
      (1L, "a a a a a a", "en"), (2L, "a a a a a rare1", "en"),
      (3L, "a a a rare2 rare3 rare4", "en"),
      (4L, "a a rare5 rare6 rare7 rare8", "en"),
      (5L, "rare9 rareA rareB rareC a a", "en"),
      (6L, "rareD rareE rareF rareG rareH a", "en"),
      (7L, "a a a a a a", "de"), (8L, "rareI rareJ rareK a a a", "de"),
      (9L, "a a a a rareL a", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Quality.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("cross_entropy"), r.getAs[Int]("bucket"))).toMap
    // en: 6 docs → terciles of 2; doc 1 (all common) must be head,
    // doc 6 (most rare words) must be tail
    assert(out(1L)._2 == 1 && out(6L)._2 == 3)
    assert(Seq(1L, 2L, 3L, 4L, 5L, 6L).map(out(_)._2).sorted
      == Seq(1, 1, 2, 2, 3, 3))
    // ce must be monotone with the bucket assignment
    val enSorted = Seq(1L, 2L, 3L, 4L, 5L, 6L).sortBy(id => (out(id)._1, id))
    assert(enSorted.map(out(_)._2) == Seq(1, 1, 2, 2, 3, 3))
    // de: 3 docs → one per bucket, all-common doc is head
    assert(out(7L)._2 == 1 && out(8L)._2 == 3 && out(9L)._2 == 2)
  }

  test("knBigramCrossEntropy: hand-computed interpolated KN probabilities") {
    import spark.implicits._
    // corpus: doc 1 "a b a b", doc 2 "b c" →
    //   bigram counts: (a,b):2 (b,a):1 (b,c):1; types T=3
    //   contexts: c(a)=2, N1+(a,·)=1; c(b)=2, N1+(b,·)=2
    //   continuations: N1+(·,b)=1, N1+(·,a)=1, N1+(·,c)=1
    //   P(b|a) = (2−.75)/2 + .75·1/2·(1/3) = 0.75
    //   P(a|b) = (1−.75)/2 + .75·2/2·(1/3) = 0.375 = P(c|b)
    val df = Seq((1L, "a b a b"), (2L, "b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Quality.knBigramCrossEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2, "single-token doc produces no row")
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    val ce1 = -(math.log(0.75) + math.log(0.375) + math.log(0.75)) / 3
    assert(math.abs(out(0).getAs[Double]("cross_entropy") - ce1) < 1e-12)
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(math.abs(out(1).getAs[Double]("cross_entropy")
      - (-math.log(0.375))) < 1e-12)
    // the interpolated KN distribution must sum to 1 over each context:
    // context a: 0.625 + .75·1/2·(3/3) = 1; context b: .25 + .75·2/2 = 1
    assert(math.abs((0.625 + 0.75 * 0.5) - 1.0) < 1e-12)
  }

  test("tfidf + cosineRetrieve: sklearn smooth-idf weights, hand-computed cosines") {
    import spark.implicits._
    val df = Seq((1L, "apple banana apple"), (2L, "apple banana"),
      (3L, "cherry banana")).toDF("doc_id", "text")
    // N=3; df: apple 2, banana 3, cherry 1
    val ia = math.log(4.0 / 3.0) + 1 // apple idf
    val ib = 1.0                     // banana: ln(4/4)+1
    val ic = math.log(2.0) + 1       // cherry idf
    val w = graft.text.Tfidf.tfidf(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Double]("weight"), r.getAs[Double]("norm"))).toMap
    assert(math.abs(w((1L, "apple"))._1 - 2 * ia) < 1e-12)
    assert(math.abs(w((3L, "cherry"))._1 - ic) < 1e-12)
    val n1 = math.sqrt(4 * ia * ia + ib * ib)
    val n2 = math.sqrt(ia * ia + ib * ib)
    val n3 = math.sqrt(ic * ic + ib * ib)
    assert(math.abs(w((1L, "apple"))._2 - n1) < 1e-12)
    val out = graft.text.Tfidf.cosineRetrieve(df, "doc_id", "text",
      queryIds = Seq(1L), k = 2).orderBy("rank").collect()
    val s12 = (2 * ia * ia + ib * ib) / (n1 * n2)
    val s13 = ib * ib / (n1 * n3)
    assert(out.length == 2)
    assert(out(0).getAs[Long]("doc_id") == 2L && out(0).getAs[Int]("rank") == 1)
    assert(math.abs(out(0).getAs[Double]("sim")
      - math.rint(s12 * 1e6) / 1e6) < 1e-12)
    assert(out(1).getAs[Long]("doc_id") == 3L)
    assert(math.abs(out(1).getAs[Double]("sim")
      - math.rint(s13 * 1e6) / 1e6) < 1e-12)
  }

  test("ngramRepetitionStats: short doc yields empty top gram, zero fraction") {
    import spark.implicits._
    val out = Quality.ngramRepetitionStats(
      Seq((1L, "solo")).toDF("doc_id", "text"), "text", n = 2).head()
    assert(out.getAs[String]("top_ngram") == "")
    assert(out.getAs[Long]("top_ngram_count") == 0L)
    assert(out.getAs[Double]("top_ngram_char_frac") == 0.0)
  }

  test("gopherAllStats equals the composed two-pass form column for column") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the hat ### sat ... here 42"),
      (2L, "a b a b a"),
      (3L, "solo"),
      (4L, ""),
      (5L, "z y x w z y x w z y the be to of and that have with"),
      (6L, Seq.fill(40)("spam spam").mkString(" "))).toDF("doc_id", "text")
    val cols = Seq("word_count", "mean_word_len", "symbol_word_ratio",
      "alpha_word_frac", "stopword_hits", "top_ngram", "top_ngram_count",
      "top_ngram_char_frac", "dup_word_frac").map(col)
    val fused = Quality.gopherAllStats(df, "text", n = 2)
      .select(col("doc_id") +: cols: _*)
    val composed = Quality.ngramRepetitionStats(
      Quality.gopherTextStats(df, "text"), "text", n = 2)
      .select(col("doc_id") +: cols: _*)
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty,
      "fused and composed quality stats must be identical")
  }

  test("scrubPii: email, url, ip, phone each redacted; order prevents cross-eating") {
    import spark.implicits._
    val cases = Seq(
      (1L, "mail me a.b+c@sub.example.org today",
        "mail me <EMAIL> today"),
      (2L, "see https://ex.com/a?b=1 and http://plain.io now",
        "see <URL> and <URL> now"),
      (3L, "host 192.168.0.17 up", "host <IP> up"),
      (4L, "call +1 (415) 555-0134 now", "call <PHONE> now"),
      // an IPv4 must become <IP>, not be eaten by the phone heuristic
      (5L, "ip 10.0.123.7 and phone 415-555-0134 both",
        "ip <IP> and phone <PHONE> both"),
      (6L, "no pii here at all", "no pii here at all"))
    val df = cases.map { case (i, in, _) => (i, in) }.toDF("id", "t")
    val got = df.select(col("id"), Quality.scrubPii(col("t")).as("s"))
      .orderBy("id").collect().map(_.getString(1))
    cases.map(_._3).zip(got).foreach { case (want, g) => assert(g == want, s"$g != $want") }
    // flags
    val flags = df.select(col("id"),
      Quality.piiFlag(col("t"), "email").as("e"),
      Quality.piiFlag(col("t"), "ip").as("i")).orderBy("id").collect()
    assert(flags(0).getBoolean(1) && !flags(0).getBoolean(2))
    assert(!flags(5).getBoolean(1) && !flags(5).getBoolean(2))
  }

  test("gopherPasses: verdict flips on word count and repetition thresholds") {
    import spark.implicits._
    // unique tokens after the stopword lead-in, so no 2-gram repeats
    val good = "the quick brown fox and the lazy dog saw " +
      Seq.tabulate(60)(i => s"token$i").mkString(" ")
    val repetitive = Seq.fill(60)("spam spam").mkString(" ")
    val short = "the end of it"
    val df = Seq((1L, good), (2L, repetitive), (3L, short)).toDF("doc_id", "text")
    val out = Quality.ngramRepetitionStats(
      Quality.gopherTextStats(df, "text"), "text", n = 2)
      .withColumn("passes", Quality.gopherPasses())
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("passes"), "varied long doc should pass")
    assert(!out(1).getAs[Boolean]("passes"), "top-2gram repetition should fail")
    assert(!out(2).getAs[Boolean]("passes"), "short doc should fail")
  }

  test("c4LineClean applies the published line rules; c4DocKeep the page rules") {
    import spark.implicits._
    val doc = Seq(
      "Good first sentence here.",      // kept
      "Also a fine question?",          // kept
      "too short.",                     // < 3 words
      "no terminal punctuation at all", // no terminator
      "  Trimmed line survives too.  ", // kept after trim
      "enable JavaScript to view this." // poison word, case-folded
    ).mkString("\n")
    val got = Seq(Tuple1(doc)).toDF("t")
      .select(Quality.c4LineClean(org.apache.spark.sql.functions.col("t")).as("c"))
      .head().getString(0)
    assert(got == Seq("Good first sentence here.", "Also a fine question?",
      "Trimmed line survives too.").mkString("\n"))

    def keep(orig: String, minLines: Int = 3): Boolean =
      Seq(Tuple1(orig)).toDF("t")
        .select(Quality.c4DocKeep(org.apache.spark.sql.functions.col("t"),
          Quality.c4LineClean(org.apache.spark.sql.functions.col("t")),
          minLines).as("k"))
        .head().getBoolean(0)
    assert(keep(doc))                              // 3 surviving lines
    assert(!keep(doc + "\nvar x = { a: 1 };"))     // brace poison
    assert(!keep(doc + "\nLorem Ipsum filler."))   // boilerplate poison
    assert(!keep(doc, minLines = 4))               // threshold
  }

  test("LangId: Cavnar-Trenkle profiles separate languages the stopword argmax can't see") {
    import spark.implicits._
    import graft.text.LangId
    // two synthetic "languages" with disjoint character inventories —
    // no stopwords in common with the x7 lists, so only the n-gram
    // profiles can tell them apart
    val aa = "zxq wvu zxw qvz xqw zuv wqx" // lang A inventory
    val bb = "min nim imn nmi mni inm nmn" // lang B inventory
    val train = (0 until 6).map(i => (i.toLong, "A", s"$aa $aa extra$i")) ++
      (6 until 12).map(i => (i.toLong, "B", s"$bb $bb extra$i"))
    val docs = train.toDF("doc_id", "lang", "text")
    val prof = LangId.profiles(docs, "text", "lang", n = 3, profileSize = 40)
    // profile is deterministic: rank 1 per language is a fixed gram
    val p = prof.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)))
    assert(p.count(_._3 == 1) == 2)
    // classify unseen docs drawn from each inventory
    val test = Seq((100L, s"$aa zxq wvu"), (101L, s"$bb nim mni"))
      .toDF("doc_id", "text")
    val got = LangId.classify(test, "doc_id", "text", prof, "lang",
        n = 3, profileSize = 40, docGrams = 30)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(100L -> "A", 101L -> "B"))
    // the one-pass fused form equals the two-API composition exactly
    val composed = LangId.classify(docs, "doc_id", "text", prof, "lang",
        n = 3, profileSize = 40, docGrams = 30)
      .collect().map(_.toSeq).toSet
    val fused = LangId.classifySelfLabeled(docs, "doc_id", "text", "lang",
        n = 3, profileSize = 40, docGrams = 30)
      .collect().map(_.toSeq).toSet
    assert(fused == composed)
  }

  test("GramCountList: counts, (count desc, gram asc) order, short-input edge") {
    import spark.implicits._
    import graft.functions.GramCountList
    // "abab" 2-grams: ab×2, ba×1 → [(ab,2),(ba,1)]; tie order is
    // binary-lexicographic: "aaa" 1-grams → [(a,3)] then "ba" vs "ab"
    val df = Seq("abab", "ab", "a", "", "xyxyxy").toDF("s")
      .select(col("s"), GramCountList(col("s"), 2).as("g"))
    val got = df.collect().map { r =>
      r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getString(0), e.getLong(1))).toList
    }.toMap
    assert(got("abab") == List(("ab", 2L), ("ba", 1L)))
    assert(got("ab") == List(("ab", 1L)))
    assert(got("a") == Nil) // shorter than n
    assert(got("") == Nil)
    // xyxyxy: xy×3, yx×2 — count-desc order
    assert(got("xyxyxy") == List(("xy", 3L), ("yx", 2L)))
    // equal counts tie-break: "cba" 1-grams → a,b,c ascending
    val tie = Seq("cba").toDF("s")
      .select(GramCountList(col("s"), 1).as("g"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0)).toList
    assert(tie == List("a", "b", "c"))
    // parity with the declarative explode→groupBy→window path on real text
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "abc abc abc"))
      .toDF("id", "t")
    val viaExpr = docs.select(col("id"),
      explode(GramCountList(graft.text.TextOps.normalize(col("t")), 3)).as("e"))
      .select(col("id"), col("e.gram").as("g"), col("e.c").as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaSql = docs.select(col("id"),
        explode(org.apache.spark.sql.functions.transform(
          sequence(lit(1), length(graft.text.TextOps.normalize(col("t"))) - 2),
          i => graft.text.TextOps.normalize(col("t")).substr(i, lit(3))))
          .as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaExpr == viaSql)
  }

  // ------------------------------------------------------------------
  // duplicatedSpans recall contract vs brute-force ExactSubstr
  // ------------------------------------------------------------------
  //
  // The scaladoc on TextOps.duplicatedSpanProfile claims that because
  // anchors are taken at EVERY token position (stride 1), recall over
  // duplicated token positions is exactly 1.0 vs the suffix-array
  // ExactSubstr contract (Lee et al. 2022): every position inside a
  // duplicated substring of >= minLen tokens must fall inside a
  // reported span, regardless of the span's offset or length. This
  // spec proves it against a driver-side brute force and also pins
  // the documented one-sidedness (reported spans may OVER-cover).
  //
  // Brute-force definition: position p of doc d is duplicated iff it is
  // covered by some window of exactly minLen tokens whose text occurs
  // >= 2 times in the corpus (every duplicated substring of length
  // L >= minLen contains p in at least one duplicated minLen-window,
  // and every duplicated minLen-window is itself such a substring — so
  // exact-minLen windows mark precisely the ExactSubstr positions).

  test("duplicatedSpans: recall 1.0 vs brute-force ExactSubstr on adversarial planted spans") {
    import spark.implicits._
    import graft.text.TextOps
    val k = 4
    val minLen = 8
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i")
    val spanA = (0 until 8).map(i => s"aa$i")   // length == minLen exactly
    val spanB = (0 until 13).map(i => s"bb$i")  // length 13, doc-start copy
    val spanC = (0 until 9).map(i => s"cc$i")   // length 9, doc-END copies
    val spanD = (0 until 10).map(i => s"dd$i")  // within-doc repetition
    val e1 = (0 until 4).map(i => s"ee$i")      // == k, chains with e2
    val e2 = (0 until 4).map(i => s"ff$i")      // == k
    // Adversarial placement: A at offsets 20 and 3 (different alignment
    // mod k), B at position 0, C flush against both doc ends, D twice in
    // one doc, E1+E2 adjacent so their k-anchors chain into a >= minLen
    // span although no single >= minLen substring is duplicated.
    val docs = Seq(
      1L -> (uniq("u1x", 20) ++ spanA ++ uniq("u1y", 12)),
      2L -> (uniq("u2x", 3) ++ spanA ++ uniq("u2y", 15) ++ spanB ++ uniq("u2z", 6)),
      3L -> (spanB ++ uniq("u3x", 25) ++ spanC),
      4L -> (uniq("u4x", 30) ++ spanC),
      5L -> uniq("u5x", 40),
      6L -> (uniq("u6x", 5) ++ spanD ++ uniq("u6y", 5) ++ spanD ++ uniq("u6z", 3)),
      7L -> (uniq("u7x", 10) ++ e1 ++ e2 ++ uniq("u7y", 10)),
      8L -> (uniq("u8x", 12) ++ e1 ++ uniq("u8y", 12)),
      9L -> (uniq("u9x", 7) ++ e2 ++ uniq("u9y", 14)))
    // driver-side brute force over exact minLen-windows
    val winCount = scala.collection.mutable.Map.empty[String, Int]
    for ((_, toks) <- docs; w <- toks.sliding(minLen) if w.length == minLen)
      winCount(w.mkString(" ")) = winCount.getOrElse(w.mkString(" "), 0) + 1
    val brute: Map[Long, Set[Int]] = docs.map { case (id, toks) =>
      val marked = scala.collection.mutable.Set.empty[Int]
      for ((w, s) <- toks.sliding(minLen).zipWithIndex
           if w.length == minLen && winCount(w.mkString(" ")) >= 2)
        marked ++= (s until s + minLen)
      id -> marked.toSet
    }.toMap
    val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val spans = TextOps.duplicatedSpans(df, "doc_id", "text", k, minLen)
      .collect()
      .groupBy(_.getAs[Long]("__id"))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getAs[Number]("__s").intValue,
          r.getAs[Number]("__x").intValue)).toSeq }
    val covered: Map[Long, Set[Int]] = docs.map { case (id, _) =>
      id -> spans.getOrElse(id, Seq.empty)
        .flatMap { case (s, x) => s to x }.toSet
    }.toMap
    // RECALL = 1.0: every brute-force duplicated position is covered
    for ((id, pos) <- brute; p <- pos)
      assert(covered(id).contains(p), s"doc $id position $p missed")
    // exact boundaries where no chaining exists: docs 1-4 and 6 report
    // spans matching the planted extents position for position
    for (id <- Seq(1L, 2L, 3L, 4L, 6L))
      assert(covered(id) == brute(id), s"doc $id over/under-covered")
    assert(spans(3L).toSet == Set((0, 12), (38, 46)))   // B at 0, C at end
    assert(spans(6L).size == 2 && covered(6L).size == 20)
    assert(!covered.contains(5L) || covered(5L).isEmpty) // clean doc silent
    // ONE-SIDEDNESS: doc 7's chained k-grams assemble a reported span of
    // 8 tokens although brute force marks nothing (no single >= minLen
    // duplicated substring exists there) — over-coverage, never a miss
    assert(brute(7L).isEmpty && covered(7L) == (10 until 18).toSet)
    // and the chain sources themselves (len k < minLen) stay unreported
    assert(covered(8L).isEmpty && covered(9L).isEmpty)
    // corpus-level recall/precision numbers for the scaladoc contract
    val bruteTotal = brute.values.map(_.size).sum
    val coverTotal = covered.values.map(_.size).sum
    val hit = brute.map { case (id, ps) => ps.count(covered(id).contains) }.sum
    assert(hit == bruteTotal)                  // recall exactly 1.0
    assert(coverTotal == bruteTotal + 8)       // only doc 7 over-covers

    // EXACT tier (k = minLen): coverage must equal brute force on EVERY
    // doc — including the adversarial chain doc, where the k < minLen
    // approximation over-covers and the exact tier must stay silent
    val exact = TextOps.duplicatedSpans(df, "doc_id", "text",
        k = minLen, minLen = minLen)
      .collect()
      .groupBy(_.getAs[Long]("__id"))
      .map { case (id, rs) => id -> rs.flatMap(r =>
        r.getAs[Number]("__s").intValue to r.getAs[Number]("__x").intValue)
        .toSet }
    for ((id, _) <- docs.map(d => d._1 -> ()).toMap)
      assert(exact.getOrElse(id, Set.empty) == brute(id),
        s"exact tier must equal brute force on doc $id")
  }
}
