package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.F
import graft.engine.{Ops, Validate}
import graft.pipeline.Schemas

/** Property-based guards (SURVEY §5): odds strings, haversine vs a direct
  * Scala reimplementation, coalesce-precedence truth table, name-map
  * idempotence, V3 repair, F17 key pick.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("media header property: PNG and WAV fields round-trip for random values") {
    import graft.operators.Multimodal
    val dims = Gen.listOfN(40, for {
      w <- Gen.chooseNum(1, Int.MaxValue)
      h <- Gen.chooseNum(1, Int.MaxValue)
      sr <- Gen.chooseNum(1, Int.MaxValue)
    } yield (w, h, sr)).sample.get
    val out = dims.toDF("w", "h", "sr")
      .select(col("w"), col("h"), col("sr"),
        Multimodal.pngWidth(Multimodal.pngHeaderBytes(col("w"), col("h"))).as("pw"),
        Multimodal.pngHeight(Multimodal.pngHeaderBytes(col("w"), col("h"))).as("ph"),
        Multimodal.wavSampleRate(Multimodal.wavHeaderBytes(col("sr"))).as("psr"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(3) == r.getInt(0) && r.getInt(4) == r.getInt(1),
        s"png dims ${r.getInt(0)}x${r.getInt(1)} -> ${r.getInt(3)}x${r.getInt(4)}")
      assert(r.getInt(5) == r.getInt(2), s"wav sr ${r.getInt(2)} -> ${r.getInt(5)}")
    }
  }

  test("CSV record/field property: random fields round-trip through write->split->parse") {
    import graft.sources.v2.HttpCsvSource.{parseCsvLine, splitRecords}
    // fields over a hostile alphabet: commas, quotes, newlines, CR, unicode
    val fieldGen = Gen.listOf(Gen.oneOf(
      Gen.oneOf(',', '"', '\n', '\r', 'ø', 'é'), Gen.alphaNumChar))
      .map(_.mkString)
    val rowsGen = Gen.listOfN(25, Gen.listOfN(4, fieldGen)).sample.get
    def writeField(f: String): String =
      if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r') || f.isEmpty)
        "\"" + f.replace("\"", "\"\"") + "\""
      else f
    val body = rowsGen.map(_.map(writeField).mkString(",")).mkString("\n")
    val parsed = splitRecords(body).map(parseCsvLine)
    // records whose every field is empty serialize to `"","","",""` and
    // survive; truly blank LINES are skipped by contract — our writer
    // never emits those, so counts must match exactly
    assert(parsed.length == rowsGen.length,
      s"${rowsGen.length} rows in, ${parsed.length} records out")
    parsed.zip(rowsGen).zipWithIndex.foreach { case ((got, want), i) =>
      val g = got.map(Option(_).getOrElse("")).toSeq
      // verbatim round-trip, CRs included: the writer quotes every field
      // containing a CR, and splitRecords' CRLF normalization only strips
      // a record-final CR at quote depth zero — which writer output never
      // produces — so no field is ever altered
      assert(g.size == want.size, s"row $i arity: $g vs $want")
      g.zip(want).zipWithIndex.foreach { case ((gf, wf), j) =>
        assert(gf == wf, s"row $i field $j: <$gf> vs <$wf>")
      }
    }
  }

  test("tokenId property: matches direct MD5-prefix computation, in [0, 2^32)") {
    val words = Gen.listOfN(60,
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)).sample.get.distinct
    def ref(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val out = words.toDF("w")
      .select($"w", graft.operators.Dedup.tokenId($"w").as("tid"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(out(w) == ref(w), s"tokenId($w)")
      assert(out(w) >= 0L && out(w) < (1L << 32))
    }
  }

  test("hash-sample property: selection invariant under repartitioning") {
    val ids = (1L to 2000L).toDF("id")
    def sampled(df: org.apache.spark.sql.DataFrame) =
      df.filter(graft.operators.Dedup.tokenId($"id".cast("string")) % 100 < 10)
        .collect().map(_.getLong(0)).sorted.toSeq
    val base = sampled(ids)
    assert(base.nonEmpty && base.size < 400) // ~10%
    assert(sampled(ids.repartition(17)) == base)
    assert(sampled(ids.orderBy(desc("id"))) == base)
  }

  test("F7 property: fractional odds match direct computation on a/b grids") {
    val cases = for (a <- 1 to 20; b <- 1 to 8) yield (s"$a/$b", 1.0 + a.toDouble / b)
    val out = cases.map(_._1).toDF("s")
      .select(F.fractionalToDecimal($"s").as("d")).collect().map(_.getDouble(0))
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12) }
  }

  test("F8 property: column haversine equals direct Scala implementation") {
    def ref(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val (p1, p2) = (math.toRadians(lat1), math.toRadians(lat2))
      val (dp, dl) = (math.toRadians(lat2 - lat1), math.toRadians(lon2 - lon1))
      val a = math.pow(math.sin(dp / 2), 2) +
        math.cos(p1) * math.cos(p2) * math.pow(math.sin(dl / 2), 2)
      2 * 6371.0 * math.asin(math.sqrt(math.min(1.0, a)))
    }
    val coords = Gen.listOfN(40, for {
      lat1 <- Gen.choose(-90.0, 90.0); lon1 <- Gen.choose(-180.0, 180.0)
      lat2 <- Gen.choose(-90.0, 90.0); lon2 <- Gen.choose(-180.0, 180.0)
    } yield (lat1, lon1, lat2, lon2)).sample.get
    val out = coords.toDF("a", "b", "c", "d")
      .select(F.haversineKm($"a", $"b", $"c", $"d").as("km"))
      .collect().map(_.getDouble(0))
    out.zip(coords).foreach { case (got, (a, b, c, d)) =>
      assert(math.abs(got - ref(a, b, c, d)) < 1e-6, s"($a,$b,$c,$d)") }
  }

  test("J5 property: precedence truth table over all null patterns") {
    val patterns = for {
      e <- Seq(Some(1.0), None); j <- Seq(Some(2.0), None)
    } yield (e, j)
    val out = patterns.toDF("e", "j")
      .select(Ops.precedence($"e", $"j", lit(9.0)).as("v"))
      .collect().map(_.getDouble(0))
    val expected = patterns.map {
      case (Some(e), _) => e
      case (None, Some(j)) => j
      case _ => 9.0
    }
    assert(out.toSeq == expected)
  }

  test("J9 property: name normalization is idempotent") {
    val nameMap = Seq(("Raw A", "Canon A"), ("Raw B", "Canon B")).toDF("raw", "canonical")
    val facts = Seq("Raw A", " Raw B ", "Canon A", "Unmapped").toDF("team")
    import graft.pipeline.Enrich
    val once = Enrich.normalizeNames(facts, nameMap, Seq("team"))
    val twice = Enrich.normalizeNames(once, nameMap, Seq("team"))
    assert(once.orderBy("team").collect().map(_.getString(0)).toSeq ==
      twice.orderBy("team").collect().map(_.getString(0)).toSeq)
    assert(once.collect().map(_.getString(0)).toSet ==
      Set("Canon A", "Canon B", "Unmapped"))
  }

  test("V3 repairs missing/invalid files, leaves valid ones alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_v3_").toString
    val p = s"$dir/teams.csv"
    assert(Validate.ensureMinCsv(p, Schemas.teamsMaster)) // missing → repaired
    assert(!Validate.ensureMinCsv(p, Schemas.teamsMaster)) // now valid → untouched
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "bogus,header\n")
    assert(Validate.ensureMinCsv(p, Schemas.teamsMaster)) // wrong header → repaired
  }

  test("F17 picks uefa/champ soccer keys first, then fallbacks") {
    assert(Validate.pickSportKey(Seq("basketball_nba", "soccer_uefa_champs_league",
      "soccer_epl")).contains("soccer_uefa_champs_league"))
    assert(Validate.pickSportKey(Seq("soccer_epl", "soccer_brazil"))
      .contains("soccer_epl"))
    assert(Validate.pickSportKey(Seq("soccer_brazil")).contains("soccer_brazil"))
    assert(Validate.pickSportKey(Seq("hockey_nhl")).isEmpty)
  }

  test("V1+V2 report counts rows and missing columns") {
    val df = Seq((1, "x")).toDF("id", "name")
    val r = Validate.report("t", df, Seq("id", "name", "zz"))
    assert(!r.ok && r.missing == Seq("zz") && r.rows == 1)
  }
}
