package graft

import org.apache.spark.sql.functions._

import graft.functions.Fuzzy
import graft.ops.{Flatten, FuzzyJoin, Integrity}

/** The reference's places backfill, end to end on the FIXTURES.md §B3/§B4
  * micro-fixtures: duplicate audit, country filter, hemisphere strip-cast,
  * and the fuzzy best-match join with the reference's max(en, vi) scoring —
  * including the exact-match (ratio == 100) and diacritic near-miss pairs.
  */
class PlacesSpec extends SparkSuite {

  // §B3: dup place_id, one non-Vietnam row, lat/lon with hemisphere chars
  private def places = {
    import spark.implicits._
    Seq(
      ("p1", "Socialist Republic of Vietnam", "21.0245N", "105.8412E", "Ha Noi"),
      ("p2", "Socialist Republic of Vietnam", "10.8231N", "106.6297E", "Ho Chi Minh City"),
      ("p2", "Socialist Republic of Vietnam", "10.8231N", "106.6297E", "Ho Chi Minh City"),
      ("p3", "Kingdom of Thailand", "13.7563N", "100.5018E", "Bangkok"),
      ("p4", "Socialist Republic of Vietnam", "22.1470N", "105.8348E", "Bac Kan"))
      .toDF("place_id", "country", "lat", "lon", "name")
  }

  test("A2 duplicate audit flags the duplicated place_id") {
    import spark.implicits._
    val dups = Integrity.dupAudit(places, "place_id")
      .as[(String, Long)].collect().toMap
    assert(dups == Map("p2" -> 2L))
  }

  test("P10 country filter keeps only Vietnam candidates") {
    assert(places.filter(col("country") === "Socialist Republic of Vietnam")
      .select("place_id").distinct().count() == 3)
  }

  test("P7 strip-cast turns hemisphere strings into doubles") {
    import spark.implicits._
    val got = places.filter(col("place_id") === "p1")
      .select(Flatten.stripSuffixCast(col("lat")), Flatten.stripSuffixCast(col("lon")))
      .as[(Double, Double)].head()
    assert(got == ((21.0245, 105.8412)))
  }

  test("J4 fuzzy top-1 with max(en, vi) scoring: exact match wins at 100") {
    import spark.implicits._
    // §B4: an exact en match (reference's ratio==100 short-circuit) and a
    // diacritic near-miss where the vi form scores best
    val names = Seq(
      (1L, "Bac Kan", "Bắc Kạn"),
      (2L, "Ha Noi", "Hà Nội")).toDF("id", "en", "vi")
    val cands = places.filter(col("country") === "Socialist Republic of Vietnam")
      .select(col("name").as("cand"), col("place_id")).distinct()
    val score = greatest(
      Fuzzy.fuzzRatio(lower(col("en")), lower(col("cand"))),
      Fuzzy.fuzzRatio(lower(col("vi")), lower(col("cand"))))
    val got = FuzzyJoin.top1(names, cands, "id", score, Seq(col("cand")))
      .select(col("id"), col("cand"), col("score")).as[(Long, String, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("Bac Kan", 100))) // exact en match -> 100
    assert(got(2L)._1 == "Ha Noi")        // diacritic near-miss still wins
    assert(got(2L)._2 >= 80)
  }

  test("unicode fuzz scores: diacritics cost per code point, not per byte") {
    import org.apache.spark.unsafe.types.UTF8String
    def r(a: String, b: String) =
      graft.functions.FuzzyImpl.ratio(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(r("bắc kạn", "bac kan") < 100)
    assert(r("bắc kạn", "bắc kạn") == 100)
    // 7 code points each, 5 shared -> 2*5/14 ≈ 71 (not byte-skewed)
    assert(r("bắc kạn", "bac kan") == 71)
  }
}
