package graft

import org.apache.spark.sql.functions._

import graft.llm.{Chunk, LangModel, SubstringDedup}

/** Round-6 curation additions on planted fixtures: duplicated-substring
  * spans land exactly where the repeated text was planted; LM scoring ranks
  * typical text above rare text; chunking covers every token with the
  * declared overlap; OOV profiling counts positions outside the vocab.
  */
class CurationSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicatedSpans finds the planted shared passage and merges overlap") {
    import spark.implicits._
    // 5-token passage shared by docs 1 and 2, embedded in distinct noise;
    // doc 3 is all-unique. k=3 grams of the passage occur twice corpus-wide.
    val shared = "alpha beta gamma delta epsilon"
    val df = docs(
      (1L, s"u1 u2 u3 $shared u4 u5"),
      (2L, s"v1 $shared v2 v3 v4"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8"))
    val got = SubstringDedup.duplicatedSpans(df, "text", "doc_id", k = 3)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: passage at tokens 4..8; doc 2: tokens 2..6; doc 3: nothing.
    // The three overlapping 3-gram windows merge into ONE maximal span.
    assert(got == Set((1L, 4L, 8L, 5L), (2L, 2L, 6L, 5L)))
  }

  test("duplicatedSpans counts within-doc repetition too (Lee et al. semantics)") {
    import spark.implicits._
    val df = docs((1L, "x y z noise1 noise2 x y z"), (2L, "a b c d e f"))
    val got = SubstringDedup.duplicatedSpans(df, "text", "doc_id", k = 3)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (1L, 6L, 8L)))
  }

  test("duplicationProfile keeps every doc and computes the covered fraction") {
    import spark.implicits._
    val df = docs((1L, "p q r p q r"), (2L, "s t u v w x y z a b"))
    val got = SubstringDedup.duplicationProfile(df, "text", "doc_id", k = 3)
      .select("doc_id", "n_tokens", "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().map { case (a, b, c, e) => a -> ((b, c, e)) }.toMap
    assert(got(1L) == ((6L, 6L, 1.0)))
    assert(got(2L) == ((10L, 0L, 0.0)))
  }

  test("unigram LM scoring ranks rare-token docs as higher surprise") {
    import spark.implicits._
    val common = Seq.fill(20)("the").mkString(" ")
    val df = docs((1L, common), (2L, "zyx wvu tsr"), (3L, common + " the the"))
    val lm = LangModel.unigramLm(df, "doc_id", "text")
    val scored = LangModel.scoreDocs(df, "doc_id", "text", lm, floorLogp = 0.0)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(scored(2L) > scored(1L)) // rare tokens => higher avg NLL
    assert(scored.size == 3)
  }

  test("scoreDocs applies the floor for terms absent from a reference LM") {
    import spark.implicits._
    val ref = docs((10L, "known words only"))
    val lm = LangModel.unigramLm(ref, "doc_id", "text")
    val floor = -9.876543
    val scored = LangModel.scoreDocs(docs((1L, "unseen unseen")), "doc_id", "text",
      lm, floorLogp = floor).select("doc_id", "n_tokens", "avg_nll")
      .as[(Long, Long, Double)].collect()
    assert(scored.toSeq == Seq((1L, 2L, 9.8765))) // round(-floor, 4)
  }

  test("slidingWindow covers all tokens, overlaps by size-stride, keeps the tail") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = Chunk.slidingWindow(docs((1L, text)), "doc_id", "text",
      chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, 4L, "t4 t5 t6 t7"),
      (2L, 7L, 4L, "t7 t8 t9 t10")))
  }

  test("slidingWindow drops suffix-only trailing starts but keeps real remainders") {
    import spark.implicits._
    // 5 tokens, size 4, stride 3: starts 1 and 4; start 4 covers t4,t5 (the
    // remainder). A 4-token doc emits ONLY chunk 0 (start 4 would be a
    // suffix of it).
    val got5 = Chunk.slidingWindow(docs((1L, "a b c d e")), "doc_id", "text", 4, 3)
      .select("chunk_idx", "n_tok").as[(Long, Long)].collect().toSet
    assert(got5 == Set((0L, 4L), (1L, 2L)))
    val got4 = Chunk.slidingWindow(docs((1L, "a b c d")), "doc_id", "text", 4, 3)
      .select("chunk_idx", "n_tok").as[(Long, Long)].collect().toSet
    assert(got4 == Set((0L, 4L)))
  }

  test("ccnet buckets split each stratum into head/middle/tail by percent-rank") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // stratum A: 9 docs, distinct scores 1..9 -> pr = (i-1)/8; head covers
    // pr in [0, 1/3) = scores 1..3, middle [1/3, 2/3) = 4..6, tail = 7..9.
    // stratum B: single doc -> pr 0 -> head.
    val scored = ((1 to 9).map(i => (i.toLong, "A", i.toDouble)) :+
      ((100L, "B", 42.0))).toDF("doc_id", "source", "nll")
    val got = graft.llm.Sampling.ccnetBuckets(scored, "doc_id", "source", col("nll"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert((1L to 3L).forall(got(_) == "head"))
    assert((4L to 6L).forall(got(_) == "middle"))
    assert((7L to 9L).forall(got(_) == "tail"))
    assert(got(100L) == "head")
  }

  test("vocab is tie-pinned and oovProfile counts positions outside it") {
    import spark.implicits._
    val df = docs((1L, "aa aa bb cc"), (2L, "aa bb dd dd dd"))
    // counts: aa=3, dd=3, bb=2, cc=1. Top-3 by (c desc, term asc): aa, dd, bb.
    val vb = LangModel.vocab(df, "doc_id", "text", 3)
    val terms = vb.orderBy("rank").select("term").as[String].collect().toSeq
    assert(terms == Seq("aa", "dd", "bb"))
    val prof = LangModel.oovProfile(df, "doc_id", "text", vb)
      .select("doc_id", "n_tokens", "n_oov", "oov_frac")
      .as[(Long, Long, Long, Double)].collect().map { case (a, b, c, e) => a -> ((b, c, e)) }.toMap
    assert(prof(1L) == ((4L, 1L, 0.25))) // cc is OOV
    assert(prof(2L) == ((5L, 0L, 0.0)))
  }

  test("piiScrub redacts emails, IPs, phones in order; counts match redactions") {
    import spark.implicits._
    val df = docs(
      (1L, "mail a.b+c@ex-1.example.com or 192.168.1.100 or +1 (555) 010-7788 done"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.org z@w.io and ip 8.8.8.8"))
    val got = graft.llm.Scrub.piiScrub(df, "doc_id", "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "clean")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L)._1 == 1L && got(1L)._2 == 1L && got(1L)._3 == 1L)
    assert(got(1L)._4 == "mail <EMAIL> or <IP> or <PHONE> done")
    // the IP pass runs BEFORE the phone pass: a dotted quad is never
    // half-eaten as a phone-shaped digit run
    assert(!got(1L)._4.contains("<PHONE>8") && !got(1L)._4.contains("1.100"))
    assert(got(2L) == ((0L, 0L, 0L, "no pii here at all"))) // untouched
    assert(got(3L) == ((2L, 1L, 0L, "two mails <EMAIL> <EMAIL> and ip <IP>")))
  }

  test("urlBlocklistFlags: host-exact probe, url-less docs kept, case-folded") {
    import spark.implicits._
    val df = docs(
      (1L, "read https://Ads.Example.COM/banner and https://ok.example.org/a"),
      (2L, "only https://ok.example.org/b here"),
      (3L, "no urls at all"),
      (4L, "subdomain https://sub.ads.example.com/x is NOT the listed host"))
    val block = Seq("ads.example.com").toDF("domain")
    val got = graft.llm.Scrub.urlBlocklistFlags(df, "doc_id", "text", block)
      .select("doc_id", "n_urls", "n_blocked", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, false))) // case-insensitive host match
    assert(got(2L) == ((1L, 0L, true)))
    assert(got(3L) == ((0L, 0L, true))) // never exploded, still present
    // exact-host policy: subdomains only block if listed themselves
    assert(got(4L) == ((1L, 0L, true)))
  }

  test("curationFunnel: gates nest in sequence and each planted failure drops one stage") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, "s0", long),                       // survives everything
      (2L, "s0", "too short"),                // fails the length gate
      (3L, "s0", ("spam " * 35).trim),        // long enough, fails repetition
      (4L, "s0", long),                       // exact dup of 1 → loses dedup
      (5L, "s1", long + " unique tail")       // other source, survives
    ).toDF("doc_id", "source", "text")
    val got = graft.llm.QualityModel.curationFunnel(df, "doc_id", "text",
      "source", minTokens = 30, maxRepPct = 20)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // s0: 4 in → 3 past length (doc 2 out) → 2 past repetition (doc 3 out)
    // → 1 past dedup (doc 4 loses to doc 1's min-id win)
    assert(got("s0") == (("s0", 4L, 3L, 2L, 1L)), got("s0").toString)
    assert(got("s1") == (("s1", 1L, 1L, 1L, 1L)))
  }

  test("Split: fingerprint policy co-locates every dup group; id policy can leak") {
    import spark.implicits._
    // 40 fingerprint groups of 3 exact dups each (normalization folds the
    // case/whitespace variants): enough groups that SOME id-hash split
    // separates a group, while the fp policy cannot by construction
    val df = (0L until 40L).flatMap { g =>
      Seq((g * 3, s"shared text body $g"), (g * 3 + 1, s"  SHARED   text body $g "),
        (g * 3 + 2, s"shared text body $g"))
    }.toDF("doc_id", "text")
    val a = graft.llm.Split.assign(df, "doc_id", "text", valFrac = 0.3)
    // same fingerprint → same fp-side, always
    assert(a.groupBy("fp").agg(countDistinct(col("split_by_fp")).as("n"))
      .filter(col("n") > 1).count() == 0)
    val rep = graft.llm.Split.leakageReport(df, "doc_id", "text", valFrac = 0.3)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rep("by_fp")._4 == 0L, s"fp policy must never leak: ${rep("by_fp")}")
    assert(rep("by_id")._4 > 0L, "fixture should exhibit the id-policy leak")
    // both policies partition all 120 docs
    assert(rep("by_id")._2 + rep("by_id")._3 == 120L)
    assert(rep("by_fp")._2 + rep("by_fp")._3 == 120L)
  }
}
