package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Fuzzy, FuzzyImpl, TextImpl, VectorFunctions, VectorImpl}

/** Unit + property coverage for the hand-rolled scalar runtimes (F1 fuzz
  * ratio, cosine/dot, simhash) — SURVEY.md §5.3.
  */
class FunctionsSpec extends SparkSuite {

  private def ratio(a: String, b: String): Int =
    FuzzyImpl.ratio(UTF8String.fromString(a), UTF8String.fromString(b))

  // --- F1 fuzz.ratio: parity with fuzzywuzzy's published values -----------

  test("fuzz.ratio matches fuzzywuzzy on known pairs") {
    assert(ratio("this is a test", "this is a test!") == 97)
    assert(ratio("kitten", "sitting") == 62)
    assert(ratio("", "") == 100)
    assert(ratio("abc", "") == 0)
    assert(ratio("new york mets", "new york mets") == 100)
  }

  test("fuzz.ratio uses banker's rounding like Python round()") {
    // lcs=5, |a|+|b|=16 -> 100*10/16 = 62.5 -> half-to-even -> 62
    assert(ratio("abcdefgh", "abcdexyz") == 62)
  }

  test("fuzz.ratio properties: range, symmetry, identity") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val a = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val r = ratio(a, b)
      assert(r >= 0 && r <= 100, s"range: $a / $b -> $r")
      assert(r == ratio(b, a), s"symmetry: $a / $b")
      assert(ratio(a, a) == 100, s"identity: $a")
    }
  }

  test("fuzz.ratio handles non-ascii code points") {
    assert(ratio("héllo", "héllo") == 100)
    assert(ratio("日本語", "日本語") == 100)
    assert(ratio("日本語", "日本") == 80) // lcs=2, 2*2/5 = 0.8
  }

  test("native FuzzRatio expression evaluates in a query (codegen path)") {
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("abc", "abc")).toDF("a", "b")
    val got = df.select(Fuzzy.fuzzRatio(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == Seq(62, 100))
  }

  test("ratioApprox stays within [0,100] and equals 100 on identity") {
    import spark.implicits._
    val df = Seq(("cold widget", "cold widget"), ("cold widget", "warm gear"), ("", "")).toDF("a", "b")
    val got = df.select(Fuzzy.ratioApprox(col("a"), col("b"))).as[Int].collect()
    assert(got(0) == 100 && got(2) == 100)
    assert(got.forall(r => r >= 0 && r <= 100))
  }

  // --- cosine / dot -------------------------------------------------------

  test("cosine/dot on known vectors, via the native expression") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val Array(cos) = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(cos - 10.0 / 14.0) < 1e-12)
    val Array(dot) = df.select(VectorFunctions.dotProduct(col("a"), col("b"))).as[Double].collect()
    assert(dot == 10.0)
  }

  test("cosine throws on dimension mismatch; NaN on zero norm") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Double*) = ArrayData.toArrayData(xs.toArray)
    intercept[IllegalArgumentException](VectorImpl.cosine(arr(1.0, 2.0), arr(1.0)))
    assert(VectorImpl.cosine(arr(0.0, 0.0), arr(1.0, 2.0)).isNaN)
  }

  test("cosine of a vector with itself is 1") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val v = Array.fill(16)(rnd.nextGaussian())
      val c = VectorImpl.cosine(ArrayData.toArrayData(v), ArrayData.toArrayData(v))
      assert(math.abs(c - 1.0) < 1e-12)
    }
  }

  // --- simhash ------------------------------------------------------------

  test("simhash is deterministic and identical docs collide exactly") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def sh(tokens: String*) =
      TextImpl.simhash64(ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray))
    assert(sh("a", "b", "c") == sh("a", "b", "c"))
    assert(sh("a", "b", "c") != sh("x", "y", "z"))
    // near-duplicate token sets land within a small hamming distance
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.drop(1) :+ "extra"
    val h = java.lang.Long.bitCount(sh(base: _*) ^ sh(near: _*))
    assert(h <= 16, s"hamming $h too large for near-dup")
  }

  test("native expressions are callable from SQL text after registration") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT fuzz_ratio('kitten', 'sitting') AS f, " +
        "dot_product(array(1.0, 2.0), array(3.0, 4.0)) AS d, " +
        "simhash64(array('a','b')) = simhash64(array('a','b')) AS same")
      .as[(Int, Double, Boolean)].head()
    assert(got == ((62, 11.0, true)))
  }

  test("runtime installation: functions register, md5 rule rewrites plans") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT fuzz_ratio('abc', 'abc') AS f").head().getInt(0) == 100)
    val before = spark.experimental.extraOptimizations
    try {
      org.apache.spark.sql.graft.GraftFunctions.installOptimizations(spark)
      org.apache.spark.sql.graft.GraftFunctions.installOptimizations(spark) // idempotent
      assert(spark.experimental.extraOptimizations
        .count(_ == org.apache.spark.sql.graft.ReplaceMd5WithFast) == 1)
      // non-literal input so constant folding can't collapse it first
      val df = spark.sql("SELECT md5(CAST(id AS STRING)) AS h FROM range(1)")
      assert(df.queryExecution.optimizedPlan.toString.contains("fast_md5"))
      assert(df.head().getString(0) == "cfcd208495d565ef66e7dff9f98764da") // md5("0")
    } finally spark.experimental.extraOptimizations = before
  }

  test("fastMd5 is byte-identical to the builtin md5") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val strs = ("" +: (1 to 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)) ++
      Seq("héllo wörld", "日本語テキスト")
    val df = strs.toDF("s")
    val mismatches = df.select(
      org.apache.spark.sql.graft.GraftColumns.fastMd5(col("s")).as("fast"),
      md5(col("s")).as("builtin"))
      .filter(col("fast") =!= col("builtin")).count()
    assert(mismatches == 0)
  }

  test("fnv1a64 matches the published test vector") {
    // FNV-1a 64-bit of empty input is the offset basis
    assert(TextImpl.fnv1a64(Array.emptyByteArray) == 0xcbf29ce484222325L)
    assert(TextImpl.fnv1a64("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
  }

  // --- native lang_id vs the pure-builtin specification -------------------

  test("native lang_id agrees with langIdFromTokens on planted cases") {
    import spark.implicits._
    import graft.llm.TextStats
    val texts = Seq(
      "the cat and the hat is in a box", // en
      "der hund ist nicht mit der katze", // de
      "el perro y la casa que se ve", // es
      "le chien et les chats dans une maison", // fr
      "的 一 是 不 了", // zh
      "en un lugar", // es/fr overlap words: tie broken alphabetically
      "xyzzy plugh nothing matches here", // und
      "", // empty -> und
      "the und le el 的") // one hit each -> 5-way tie -> de (alphabetical)
    val df = texts.toDF("text")
      .select(TextStats.tokens(lower(col("text"))).as("toks"))
      .select(
        TextStats.langIdFromTokens(col("toks")).as("spec"),
        TextStats.langIdNative(col("toks")).as("native"))
    val rows = df.as[(String, String)].collect()
    rows.foreach { case (s, n) => assert(s == n, s"spec=$s native=$n") }
    assert(rows.map(_._2).toSeq ==
      Seq("en", "de", "es", "fr", "zh", "es", "und", "und", "de"))
  }

  test("native lang_id agrees with the specification on random token soup") {
    import spark.implicits._
    import graft.llm.TextStats
    val vocab = TextImpl.stopwords.values.flatten.toVector ++
      Vector("foo", "bar", "baz", "qux")
    val rnd = new scala.util.Random(11)
    val texts = (1 to 300).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val mismatches = texts.toDF("text")
      .select(TextStats.tokens(lower(col("text"))).as("toks"))
      .select(
        TextStats.langIdFromTokens(col("toks")).as("spec"),
        TextStats.langIdNative(col("toks")).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("native lang_id matches the spec on NULL text: both identify 'und'") {
    import spark.implicits._
    import graft.llm.TextStats
    val df = Seq[(Long, String)]((1L, null), (2L, "the cat")).toDF("id", "text")
      .select(col("id"), TextStats.tokens(lower(col("text"))).as("toks"))
      .select(col("id"),
        TextStats.langIdFromTokens(col("toks")).as("spec"),
        TextStats.langIdNative(col("toks")).as("native"))
      .orderBy("id")
    val rows = df.as[(Long, String, String)].collect()
    assert(rows(0)._2 == rows(0)._3, s"NULL-text disagreement: ${rows(0)}")
    assert(rows(0)._3 == "und")
    assert(rows(1)._3 == "en")
  }

  test("LongSummary typed Aggregator: typed and udaf paths agree with plain aggs") {
    import spark.implicits._
    import graft.functions.LongSummary
    val ds = Seq(("a", 3L), ("a", 1L), ("a", 7L), ("b", 5L)).toDS()
    val typed = ds.groupByKey(_._1).mapValues(_._2)
      .agg(LongSummary.toColumn).collect().toMap
    assert(typed("a") == graft.functions.LongSummaryOut(3L, 11L, 1L, 7L))
    assert(typed("b") == graft.functions.LongSummaryOut(1L, 5L, 5L, 5L))
    val viaUdaf = ds.toDF("k", "v").groupBy("k")
      .agg(udaf(LongSummary).apply(col("v")).as("s"))
      .select(col("k"), col("s.n"), col("s.sum"), col("s.mn"), col("s.mx"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(viaUdaf == Set(("a", 3L, 11L, 1L, 7L), ("b", 1L, 5L, 5L, 5L)))
  }

  test("lang_id is callable from SQL text; NULL input is 'und' there too") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    val out = spark.sql(
      "SELECT lang_id(array('the', 'of', 'ist')) AS l").head().getString(0)
    assert(out == "en")
    val nul = spark.sql(
      "SELECT lang_id(CAST(NULL AS ARRAY<STRING>)) AS l").head().getString(0)
    assert(nul == "und")
  }

  test("kmv sketch: exact below k, estimator within KMV error, dup-insensitive") {
    import spark.implicits._
    import org.apache.spark.sql.graft.KmvColumns.kmvSketch
    val hv = org.apache.spark.sql.functions.conv(
      org.apache.spark.sql.functions.substring(md5(col("v").cast("string")), 1, 15),
      16, 10).cast("long")
    // below k: the sketch IS the distinct set, duplicates don't inflate it
    val small = Seq.tabulate(40)(i => i.toLong % 10).toDF("v")
      .agg(kmvSketch(hv, 64).as("s"))
      .select(col("s.n_kept"), col("s.kth"), col("s.est"))
      .as[(Int, Option[Long], Long)].head()
    assert(small == ((10, None, 10L)))
    // above k: (k-1)/kth estimator; 1/sqrt(k-1) ~ 12.6% std err, allow 4 sigma
    val est = Seq.tabulate(2000)(_.toLong).toDF("v")
      .agg(kmvSketch(hv, 64).as("s")).select(col("s.est")).as[Long].head()
    assert(math.abs(est - 2000L) < 1000, s"est=$est")
  }

  test("kmv sketch merge across partitions equals the single-partition sketch") {
    import spark.implicits._
    import org.apache.spark.sql.graft.KmvColumns.kmvSketch
    val hv = org.apache.spark.sql.functions.conv(
      org.apache.spark.sql.functions.substring(md5(col("v").cast("string")), 1, 15),
      16, 10).cast("long")
    def sketch(np: Int) = Seq.tabulate(500)(i => (i % 3).toString -> i.toLong)
      .toDF("k", "v").repartition(np)
      .groupBy("k").agg(kmvSketch(hv, 32).as("s"))
      .select(col("k"), col("s.n_kept"), col("s.kth"), col("s.est"))
      .as[(String, Int, Option[Long], Long)].collect().toSet
    assert(sketch(7) == sketch(1))
  }

  test("jaro_winkler matches DuckDB's independent implementation on pinned pairs") {
    import spark.implicits._
    // expected values probed from DuckDB jaro_winkler_similarity — the
    // textbook constants (Winkler boost >0.7 only, prefix cap 4, empty -> 0)
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // boosted, 1 transposition
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("abcdef", "abzzzz", 0.5555555555555555),   // jaro <= 0.7: NO boost
      ("abcdefgh", "abcdefzz", 0.9),              // prefix 6 capped at 4
      ("aaaaaa", "aaaaaa", 1.0),
      ("abc", "", 0.0), ("", "", 0.0),            // DuckDB: empties score 0
      ("a", "a", 1.0), ("ab", "ba", 0.0))         // window 0: no matches
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(graft.functions.Fuzzy.jaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b, want), v) =>
      assert(math.abs(v - want) < 1e-12, s"jw($a, $b) = $v, want $want")
    }
    // SQL registration path
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    assert(math.abs(spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA')")
      .as[Double].head() - 0.9611111111111111) < 1e-12)
  }

  test("two nearest-* folds fuse into one codegen stage (freshName collision)") {
    import org.apache.spark.sql.graft.GraftColumns
    // Non-nullable inputs => nullSafeCodeGen emits NO scoping braces, so two
    // folds in one generated method would collide on a fixed temp local name
    // (janino dup-var -> silent interpreted fallback). fallback=false turns
    // that silent fallback into a hard failure the test can see.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(2).select(
        array(col("id").cast("double"), lit(1.0)).as("v1"),
        array(lit(2.0), col("id").cast("double")).as("v2"),
        array(
          struct(col("id").as("cid"), array(lit(0.0), lit(0.0)).as("cv")),
          struct((col("id") + 10L).as("cid"),
            array(lit(2.0), lit(1.0)).as("cv"))).as("cents"),
        array(
          struct(col("id").as("cent_id"),
            array(lit(1.0), lit(0.0)).as("cent_emb")),
          struct((col("id") + 10L).as("cent_id"),
            array(lit(0.0), lit(1.0)).as("cent_emb"))).as("ccents"))
      val out = df.select(
        GraftColumns.nearestSqEntry(col("v1"), col("cents")).as("a"),
        GraftColumns.nearestSqEntry(col("v2"), col("cents")).as("b"),
        GraftColumns.nearestCosineEntry(col("v1"), col("ccents")).as("c"),
        GraftColumns.nearestCosineEntry(col("v2"), col("ccents")).as("d"))
      val rows = out.orderBy(col("a.cid")).collect()
      assert(rows.length == 2)
      // id=0: v1=[0,1]; cents cid=0 cv=[0,0] d=1, cid=10 cv=[2,1] d=5 -> (1,0)
      val a0 = rows(0).getStruct(0)
      assert(a0.getDouble(0) == 1.0 && a0.getLong(1) == 0L)
      // the projection itself must be whole-stage-codegen'd: the plan
      // string marks fused stages with the `*(n)` prefix
      val plan = out.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
        s"nearest-* projection not whole-stage-codegen'd:\n$plan")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
