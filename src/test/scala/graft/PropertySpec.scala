package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{dates, money}
import graft.lake.Lake

/** Property tests (SURVEY §5 engine test plan): randomized inputs with a
  * fixed seed, evaluated in ONE Spark pass per property (not one job per
  * case). */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.pureApply(Gen.Parameters.default, Seed(42L))

  test("property: brlToDouble(toBrl(x)) == round(x, 2)") {
    val xs = sample(Gen.listOfN(300,
      Gen.chooseNum(-9999999.99, 9999999.99)))
    val df = LocalTable.of(spark,
      StructType(Seq(StructField("x", DoubleType))), xs.map(Row(_)))
    val bad = df
      .withColumn("rt", money.brlToDouble(money.toBrl(col("x"))))
      .withColumn("expected", round(col("x"), 2))
      .filter(abs(col("rt") - col("expected")) > 1e-9 || col("rt").isNull)
      .collect()
    assert(bad.isEmpty, s"round-trip failed for: ${bad.take(5).mkString(",")}")
  }

  test("property: toDateMulti parses every supported rendering of any date") {
    val days = sample(Gen.listOfN(200, Gen.chooseNum(0, 40000)))
    val df = LocalTable.of(spark,
      StructType(Seq(StructField("d", IntegerType))), days.map(Row(_)))
      .withColumn("date", date_add(lit(java.sql.Date.valueOf("1950-01-01")), col("d")))
    val rendered = Seq("dd/MM/yyyy", "yyyy-MM-dd", "dd-MM-yyyy", "yyyyMMdd")
    val bad = rendered.map { fmt =>
      df.withColumn("parsed", dates.toDateMulti(date_format(col("date"), fmt)))
        .filter(col("parsed") =!= col("date") || col("parsed").isNull)
        .count()
    }
    assert(bad.forall(_ === 0L), s"per-format failures: ${rendered.zip(bad)}")
  }

  test("property: dedupByKeys keeps exactly one max-ordered row per key") {
    val rows = sample(Gen.listOfN(500, for {
      k <- Gen.chooseNum(0L, 40L)
      v <- Gen.chooseNum(0L, 1000000L)
    } yield (k, v)))
    val df = LocalTable.of(spark,
      StructType(Seq(StructField("k", LongType), StructField("v", LongType))),
      rows.map { case (k, v) => Row(k, v) })
    val got = Lake.dedupByKeys(df, Seq("k"), Some("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(got === expected)
  }

  test("property: PDF write → extract round-trips arbitrary latin-1 lines") {
    // hostile content: parens, backslashes, accents, digits, punctuation
    val lineGen = Gen.listOfN(8, Gen.frequency(
      10 -> Gen.alphaNumChar,
      3 -> Gen.oneOf('(', ')', '\\', 'ã', 'ç', 'É', ' ', ',', '/', '$', '-'),
      1 -> Gen.oneOf('*', '%', '<', '>', '[', ']'))).map(_.mkString)
    val docs = sample(Gen.listOfN(30, Gen.listOfN(4, lineGen)))
    docs.foreach { lines =>
      // PDF text layout cannot represent blank/whitespace-only lines
      val ls = lines.map(_.trim).filter(_.nonEmpty)
      val viaPdf = graft.parse.PdfText.extractText(PdfFixture.pdf(Seq(ls)))
      assert(viaPdf === ls.mkString("\n"), s"lines=$ls")
      val raw = graft.parse.PdfText.extractText(
        PdfFixture.pdf(Seq(ls), compress = false))
      assert(raw === ls.mkString("\n"), s"uncompressed lines=$ls")
    }
  }

  test("property: extractText never throws on arbitrary or corrupted bytes") {
    // executor-side robustness: a damaged landing PDF must degrade to ""
    // (or partial text), never kill the task
    val rnd = new scala.util.Random(4242)
    val garbage = Seq.fill(20)(Array.fill(rnd.nextInt(4000))(rnd.nextInt().toByte))
    garbage.foreach(b => graft.parse.PdfText.extractText(b)) // must not throw
    // structured prefixes with torn-off tails (truncated real PDFs)
    val real = PdfFixture.pdf(Seq(Seq("alpha", "beta", "gamma")))
    (1 until real.length by 97).foreach { cut =>
      graft.parse.PdfText.extractText(real.take(cut)) // must not throw
    }
    // bit-flipped stream bytes (corrupt Flate payloads)
    val flipped = real.clone()
    (0 until flipped.length by 31).foreach(i => flipped(i) = (flipped(i) ^ 0x5a).toByte)
    graft.parse.PdfText.extractText(flipped) // must not throw
  }

  test("property: conformToSchema always matches the destination schema") {
    val dest = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType), StructField("d", DateType)))
    val subsets = sample(Gen.listOfN(10,
      Gen.someOf("a", "b", "c", "d").map(_.toList))).filter(_.nonEmpty)
    subsets.foreach { cols =>
      val src = LocalTable.of(spark,
        StructType(dest.fields.filter(f => cols.contains(f.name))), Seq.empty)
      val out = Lake.conformToSchema(src, dest)
      assert(out.schema === dest, s"subset $cols")
    }
  }
}
