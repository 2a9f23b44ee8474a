package graft

import graft.llmops.LmArtifact
import org.apache.spark.sql.functions._

/** ARPA bigram-backoff LM artifact: hand-checked model arithmetic, the
  * exact-normalization law the context-count denominator exists for,
  * byte-pinned file form, export→import round trip, hand-assembled
  * FOREIGN files (the Xlsx/PDF/VocabArtifact discipline), backoff
  * scoring, and the loud-failure matrix.
  *
  * Hand model over ["a b a c", "a b"]: cu a=3 b=2 c=1, T=6 V=3;
  * P_uni = (c+1)/10 → a .4 b .3 c .2 unk .1. cb: "a b"=2 "b a"=1
  * "a c"=1; contexts a (c1=3, N1+=2, seen 5/10) b (c1=1, N1+=1,
  * seen 4/10). bow(a) = (.75·2/3)/(.5) = 1 → 0; bow(b) =
  * (.75·1/1)/(.6) = 1.25 → 96910 micro. P(b|a) = 1.25/3,
  * P(c|a) = .25/3, P(a|b) = .25.
  */
class LmArtifactSpec extends SparkTestBase {

  private def tinyCorpus = {
    import spark.implicits._
    Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
  }

  private val expectedTable = Set(
    (1, "<unk>", 1000000L, Some(0L)),
    (1, "a", 397940L, Some(0L)),
    (1, "b", 522879L, Some(96910L)),
    (1, "c", 698970L, Some(0L)),
    (2, "a b", 380211L, None),
    (2, "a c", 1079181L, None),
    (2, "b a", 602060L, None))

  private def tableSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSet

  test("arpaTable matches the hand-computed model exactly") {
    assert(tableSet(LmArtifact.arpaTable(tinyCorpus)) === expectedTable)
  }

  test("normalization law: per context, seen mass + bow * unseen unigram mass = 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick red fox sleeps"),
      (3L, "a lazy dog jumps"),
      (4L, "over the red dog")).toDF("doc_id", "text")
    val t = LmArtifact.arpaTable(docs).collect()
    val uni = t.filter(_.getInt(0) == 1)
      .map(r => r.getString(1) -> math.pow(10, -r.getLong(2) / 1e6)).toMap
    val bows = t.filter(_.getInt(0) == 1)
      .map(r => r.getString(1) -> math.pow(10, r.getLong(3) / 1e6)).toMap
    val bi = t.filter(_.getInt(0) == 2).map { r =>
      val Array(w1, w2) = r.getString(1).split(" ")
      (w1, w2, math.pow(10, -r.getLong(2) / 1e6))
    }
    bi.groupBy(_._1).foreach { case (w1, rows) =>
      val seenP = rows.map(_._3).sum
      val seenUniMass = rows.map(r => uni(r._2)).sum
      val total = seenP + bows(w1) * (1.0 - seenUniMass)
      // quantization to the micro grid perturbs each term by <= 1e-6
      // relative; the c1-vs-cu bug class this law exists to catch is
      // off by whole percents.
      assert(math.abs(total - 1.0) < 1e-3, s"context '$w1' sums to $total")
    }
    // every unigram with no continuations backs off with weight 1
    val ctxWords = bi.map(_._1).toSet
    t.filter(r => r.getInt(0) == 1 && !ctxWords.contains(r.getString(1)))
      .foreach(r => assert(r.getLong(3) === 0L))
  }

  test("writeArpa bytes are pinned: sections, counts, tab fields, bow only when != 1") {
    val dir = java.nio.file.Files.createTempDirectory("arpa_pin").toString
    val m = LmArtifact.writeArpa(spark,
      LmArtifact.arpaTable(tinyCorpus), s"$dir/model.arpa").collect()
    assert(m.length === 1)
    assert(m.head.getAs[Long]("n_unigrams") === 4L)
    assert(m.head.getAs[Long]("n_bigrams") === 3L)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "model.arpa"))
    val expected =
      "\\data\\\nngram 1=4\nngram 2=3\n\n" +
        "\\1-grams:\n" +
        "-1.000000\t<unk>\n" +
        "-0.397940\ta\n" +
        "-0.522879\tb\t0.096910\n" +
        "-0.698970\tc\n\n" +
        "\\2-grams:\n" +
        "-0.380211\ta b\n" +
        "-1.079181\ta c\n" +
        "-0.602060\tb a\n\n" +
        "\\end\\\n"
    assert(new String(bytes, "UTF-8") === expected)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    assert(m.head.getAs[String]("content_md5") === md5)
  }

  test("export -> import round trip reproduces the table exactly") {
    val dir = java.nio.file.Files.createTempDirectory("arpa_rt").toString
    val table = LmArtifact.arpaTable(tinyCorpus)
    LmArtifact.writeArpa(spark, table, s"$dir/model.arpa").collect()
    assert(tableSet(LmArtifact.readArpa(spark, s"$dir/model.arpa")) ===
      expectedTable)
  }

  test("foreign file imports: CRLF, space separators, %g floats, absent bow") {
    val dir = java.nio.file.Files.createTempDirectory("arpa_foreign")
    val foreign =
      "\\data\\\r\nngram 1=3\r\nngram 2=1\r\n\r\n" +
        "\\1-grams:\r\n" +
        "-1 <unk>\r\n" +
        "-1.5e-1 hello -2.5e-2\r\n" +
        "-0.30103 world\r\n\r\n" +
        "\\2-grams:\r\n" +
        "-0.5 hello world\r\n\r\n" +
        "\\end\\\r\n"
    val p = dir.resolve("foreign.arpa")
    java.nio.file.Files.write(p, foreign.getBytes("UTF-8"))
    val got = tableSet(LmArtifact.readArpa(spark, p.toString))
    assert(got === Set(
      (1, "<unk>", 1000000L, Some(0L)),
      (1, "hello", 150000L, Some(-25000L)),
      (1, "world", 301030L, Some(0L)),
      (2, "hello world", 500000L, None)))
  }

  test("import failures are loud with line numbers") {
    val dir = java.nio.file.Files.createTempDirectory("arpa_bad")
    def write(name: String, s: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, s.getBytes("UTF-8"))
      p.toString
    }
    val noData = write("a.arpa", "\\1-grams:\n-1\t<unk>\n\\end\\\n")
    val e1 = intercept[IllegalArgumentException](
      LmArtifact.readArpa(spark, noData))
    assert(e1.getMessage.contains(":1:") &&
      e1.getMessage.contains("\\data\\"))
    val badCount = write("b.arpa",
      "\\data\\\nngram 1=2\n\\1-grams:\n-1\t<unk>\n\\end\\\n")
    val e2 = intercept[IllegalArgumentException](
      LmArtifact.readArpa(spark, badCount))
    assert(e2.getMessage.contains("declares 2"))
    val quad = write("c.arpa", "\\data\\\nngram 4=1\n\\1-grams:\n\\end\\\n")
    val e3 = intercept[IllegalArgumentException](
      LmArtifact.readArpa(spark, quad))
    assert(e3.getMessage.contains("4-gram"))
    val nonNum = write("d.arpa",
      "\\data\\\nngram 1=1\n\\1-grams:\nxyz\t<unk>\n\\end\\\n")
    val e4 = intercept[IllegalArgumentException](
      LmArtifact.readArpa(spark, nonNum))
    assert(e4.getMessage.contains("non-numeric") &&
      e4.getMessage.contains(":4:"))
    val trailing = write("e.arpa",
      "\\data\\\nngram 1=1\n\\1-grams:\n-1\t<unk>\n\\end\\\nmore\n")
    val e5 = intercept[IllegalArgumentException](
      LmArtifact.readArpa(spark, trailing))
    assert(e5.getMessage.contains("after \\end\\"))
    val noEnd = write("f.arpa", "\\data\\\nngram 1=1\n\\1-grams:\n-1\t<unk>\n")
    val e6 = intercept[IllegalArgumentException](
      LmArtifact.readArpa(spark, noEnd))
    assert(e6.getMessage.contains("missing \\end\\"))
  }

  test("backoff scoring: seen pair uses bigram, unseen pair pays uni(w2) - bow(w1), OOV maps to <unk>") {
    import spark.implicits._
    val lm = LmArtifact.arpaTable(tinyCorpus).localCheckpoint(true)
    val doc = Seq((7L, "a b z")).toDF("doc_id", "text")
    val r = LmArtifact.arpaScore(doc, "doc_id", "text", lm).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_pairs") === 2L)
    assert(row.getAs[Long]("n_oov") === 1L)      // target z -> <unk>
    assert(row.getAs[Long]("n_backoff") === 1L)  // pair (b, <unk>) unseen
    // (a,b) seen: 380211; (b,<unk>): uni(<unk>) 1000000 - bow(b) 96910
    assert(row.getAs[Long]("sum_nll10_micro") === 380211L + 903090L)
  }

  test("scoring refuses a model without <unk>") {
    import spark.implicits._
    val lm = LmArtifact.arpaTable(tinyCorpus)
      .filter(col("gram") =!= LmArtifact.Unk).localCheckpoint(true)
    val doc = Seq((7L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      LmArtifact.arpaScore(doc, "doc_id", "text", lm))
    assert(e.getMessage.contains("<unk>"))
  }

  test("a literal <unk> token in the reference corpus refuses loudly") {
    import spark.implicits._
    val docs = Seq((1L, "real text with <unk> inside")).toDF("doc_id", "text")
    val e = intercept[Exception](LmArtifact.arpaTable(docs).collect())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("<unk>"), msgs)
  }

  test("bigram-free corpus still writes and re-imports (empty 2-gram section)") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, "word")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("arpa_uni").toString
    val t = LmArtifact.arpaTable(docs)
    val m = LmArtifact.writeArpa(spark, t, s"$dir/u.arpa").collect()
    assert(m.head.getAs[Long]("n_bigrams") === 0L)
    assert(tableSet(LmArtifact.readArpa(spark, s"$dir/u.arpa")) === tableSet(t))
  }

  test("microToDecimal prints the exact grid value") {
    assert(LmArtifact.microToDecimal(0L) === "0.000000")
    assert(LmArtifact.microToDecimal(-1L) === "-0.000001")
    assert(LmArtifact.microToDecimal(1234567L) === "1.234567")
    assert(LmArtifact.microToDecimal(-96910L) === "-0.096910")
  }

  // --- trigram order -------------------------------------------------
  // Hand model over ["a b a b c"]: cu a=2 b=2 c=1, T=5 V=3, denom 9.
  // Bigrams: ab=2 ba=1 bc=1; c1(a)=2, c1(b)=2. Trigrams: aba=1 abc=1
  // bab=1; c12(a b)=2 (N1+=2), c12(b a)=1 (N1+=1).
  // P(a|ab) = P(c|ab) = .25/2 = .125 → nll 903090;
  // P(b|ba) = .25/1 = .25 → nll 602060.
  // bow2(a b) = (.75·2/2) / (1 − (cb(ba)+cb(bc) − .75·2)/c1(b))
  //           = .75 / (1 − .5/2) = 1.0 → 0 micro (field omitted);
  // bow2(b a) = (.75·1/1) / (1 − (cb(ab) − .75)/c1(a))
  //           = .75 / (1 − 1.25/2) = 2.0 → 301030 micro.

  private def triCorpus = {
    import spark.implicits._
    Seq((1L, "a b a b c")).toDF("doc_id", "text")
  }

  private def micro(x: Double): Long =
    math.floor(math.log10(x) * 1e6 + 0.5).toLong

  test("arpaTable3: hand-computed trigram probs and bigram-context bows") {
    val t = LmArtifact.arpaTable3(triCorpus).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(t.contains((3, "a b a", -micro(0.125), None)))
    assert(t.contains((3, "a b c", -micro(0.125), None)))
    assert(t.contains((3, "b a b", -micro(0.25), None)))
    assert(t.contains((2, "a b", -micro(0.625), Some(0L))))
    assert(t.contains((2, "b a", -micro(0.125), Some(301030L))))
    assert(t.contains((2, "b c", -micro(0.125), Some(0L))))
    // unigram rows identical to the bigram trainer's
    val base = LmArtifact.arpaTable(triCorpus).collect()
      .filter(_.getInt(0) == 1)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val uni3 = t.filter(_._1 == 1).map(r => (r._2, r._3, r._4.get))
    assert(uni3 === base)
  }

  test("trigram normalization law: sum over w3 of P(w3 | w1 w2) = 1 by enumeration") {
    val rows = LmArtifact.arpaTable3(triCorpus).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    def p(micro: Long): Double = math.pow(10.0, -micro / 1e6)
    def bowOf(n: Int, g: String): Double =
      rows.find(r => r._1 == n && r._2 == g)
        .map(r => math.pow(10.0, r._4 / 1e6)).getOrElse(1.0)
    val vocab = rows.filter(_._1 == 1).map(_._2)
    val tri = rows.filter(_._1 == 3).map(r => r._2 -> p(r._3)).toMap
    val bi = rows.filter(_._1 == 2).map(r => r._2 -> p(r._3)).toMap
    val uni = rows.filter(_._1 == 1).map(r => r._2 -> p(r._3)).toMap
    for (ctx <- Seq(("a", "b"), ("b", "a"))) {
      val total = vocab.map { w3 =>
        tri.getOrElse(s"${ctx._1} ${ctx._2} $w3",
          bowOf(2, s"${ctx._1} ${ctx._2}") *
            bi.getOrElse(s"${ctx._2} $w3", bowOf(1, ctx._2) * uni(w3)))
      }.sum
      assert(math.abs(total - 1.0) < 1e-3, s"context $ctx sums to $total")
    }
  }

  test("trigram .arpa: 3-gram section + bigram bow fields pinned; round trip; scoring paths") {
    val dir = java.nio.file.Files.createTempDirectory("arpa3").toString
    val t = LmArtifact.arpaTable3(triCorpus).localCheckpoint(true)
    val m = LmArtifact.writeArpa(spark, t, s"$dir/m3.arpa").collect()
    assert(m.head.getAs[Long]("n_trigrams") === 3L)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "m3.arpa")), "UTF-8")
    assert(text.contains("ngram 3=3\n"))
    assert(text.contains("\n\\3-grams:\n"))
    assert(text.contains("-0.903090\tb a\t0.301030\n")) // bow field present
    assert(text.contains("-0.204120\ta b\n"))           // bow 1 omitted
    assert(text.contains("-0.903090\ta b a\n"))
    // round trip: n=2 bow coalesces to 0 where omitted (trigram file)
    assert(tableSet(LmArtifact.readArpa(spark, s"$dir/m3.arpa")) === tableSet(t))
    // scoring: tri hit / double backoff to unigram
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "c c c")).toDF("doc_id", "text")
    val sc = LmArtifact.arpaScore3(docs, "doc_id", "text", t)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // doc 1: one triple "a b a", a trigram hit
    assert(sc(0) === ((1L, 1L, 0L, 0L, 0L, -micro(0.125))))
    // doc 2: "c c c" — no trigram, no bigram (c c), bow(c) = bow2 = 1:
    // nll = nll_uni(c) = -log10(2/9)
    assert(sc(1) === ((2L, 1L, 0L, 0L, 1L, -micro(2.0 / 9.0))))
    // a FOREIGN trigram file: CRLF, spaces, 4-field bigram lines
    val foreign = dir + "/f.arpa"
    java.nio.file.Files.write(java.nio.file.Paths.get(foreign),
      ("\\data\\\r\nngram 1=2\r\nngram 2=1\r\nngram 3=1\r\n\r\n" +
        "\\1-grams:\r\n-1 <unk> -0.5\r\n-0.3 x -0.2\r\n" +
        "\\2-grams:\r\n-0.4 x x 0.1\r\n" +
        "\\3-grams:\r\n-0.6 x x x\r\n\\end\\\r\n").getBytes("UTF-8"))
    val f = tableSet(LmArtifact.readArpa(spark, foreign))
    assert(f.contains((2, "x x", 400000L, Some(100000L))))
    assert(f.contains((3, "x x x", 600000L, None)))
  }

  /** KN hand model over ["a b c", "a b d", "x a b"]: cb (a,b)=3
    * (b,c)=(b,d)=(x,a)=1 → |bigram types| nb=4, V=5, denom 10;
    * continuation nc: a=b=c=d=1, x=0 → P_cont a..d = .2, x = unk = .1.
    * Trigrams (a,b,c)/(a,b,d)/(x,a,b) once each → ckn (b,c)=(b,d)=
    * (a,b)=1; ckn contexts: b (n1pk=2, tot=2), a (1, 1).
    * P_KN(c|b)=P_KN(d|b)=.25/2=.125; P_KN(b|a)=.25.
    * bow(b) = (.75·2/2)/(1−4/10) = 1.25 → 96910;
    * bow(a) = (.75)/(1−2/10) = .9375 → log10 = −28029 (floor+.5 grid).
    * Trigram contexts: (a,b): n1p3=2 c12=2 sum_ckn=2 tot(b)=2 →
    * bow2 = .75/(1−.25) = 1 → 0; (x,a): .75/(1−.25) = 1 → 0.
    * P(c|ab)=P(d|ab)=.25/2=.125; P(b|xa)=.25.
    * Context-only bigram (x,a): nll = u(a) − bow(x) = 698970 − 0.
    */
  private def knCorpus = {
    import spark.implicits._
    Seq((1L, "a b c"), (2L, "a b d"), (3L, "x a b")).toDF("doc_id", "text")
  }

  test("arpaTable3Kn: continuation-count lower orders, hand-computed") {
    val t = tableSet(LmArtifact.arpaTable3Kn(knCorpus))
    val expected = Set(
      (1, "<unk>", 1000000L, Some(0L)),
      (1, "a", 698970L, Some(-28029L)),
      (1, "b", 698970L, Some(96910L)),
      (1, "c", 698970L, Some(0L)),
      (1, "d", 698970L, Some(0L)),
      (1, "x", 1000000L, Some(0L)),
      (2, "a b", 602060L, Some(0L)),
      (2, "b c", 903090L, Some(0L)),
      (2, "b d", 903090L, Some(0L)),
      (2, "x a", 698970L, Some(0L)), // context-only: u(a) − bow(x)
      (3, "a b c", 903090L, None),
      (3, "a b d", 903090L, None),
      (3, "x a b", 602060L, None))
    assert(t === expected)
  }

  test("KN normalization law: every trigram context sums to 1 by enumeration") {
    val rows = LmArtifact.arpaTable3Kn(knCorpus).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    def p(micro: Long): Double = math.pow(10.0, -micro / 1e6)
    def bowOf(n: Int, g: String): Double =
      rows.find(r => r._1 == n && r._2 == g)
        .map(r => math.pow(10.0, r._4 / 1e6)).getOrElse(1.0)
    val vocab = rows.filter(_._1 == 1).map(_._2)
    val tri = rows.filter(_._1 == 3).map(r => r._2 -> p(r._3)).toMap
    val bi = rows.filter(_._1 == 2).map(r => r._2 -> p(r._3)).toMap
    val uni = rows.filter(_._1 == 1).map(r => r._2 -> p(r._3)).toMap
    for (ctx <- Seq(("a", "b"), ("x", "a"))) {
      val total = vocab.map { w3 =>
        tri.getOrElse(s"${ctx._1} ${ctx._2} $w3",
          bowOf(2, s"${ctx._1} ${ctx._2}") *
            bi.getOrElse(s"${ctx._2} $w3", bowOf(1, ctx._2) * uni(w3)))
      }.sum
      assert(math.abs(total - 1.0) < 1e-3, s"KN context $ctx sums to $total")
    }
    // and the bigram level: Σ_w3 P(w3 | b) = 1 over the KN distribution
    val totalB = vocab.map { w3 =>
      bi.getOrElse(s"b $w3", bowOf(1, "b") * uni(w3))
    }.sum
    assert(math.abs(totalB - 1.0) < 1e-3, s"KN bigram context b sums to $totalB")
  }

  test("KN table writes and scores through the unchanged envelope/decoder") {
    val dir = java.nio.file.Files.createTempDirectory("arpakn").toString
    val t = LmArtifact.arpaTable3Kn(knCorpus).localCheckpoint(true)
    val m = LmArtifact.writeArpa(spark, t, s"$dir/kn.arpa").collect()
    assert(m.head.getAs[Long]("n_trigrams") === 3L)
    assert(tableSet(LmArtifact.readArpa(spark, s"$dir/kn.arpa")) === tableSet(t))
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "q q q")).toDF("doc_id", "text")
    val sc = LmArtifact.arpaScore3(docs, "doc_id", "text", t)
      .orderBy("doc").collect()
    // doc 1: the (a,b,c) triple is a tri hit at 903090
    assert(sc(0).getAs[Long]("n_triples") === 1L &&
      sc(0).getAs[Long]("n_oov") === 0L &&
      sc(0).getAs[Long]("sum_nll10_micro") === 903090L)
    // doc 2: all OOV → <unk> path, double backoff
    assert(sc(1).getAs[Long]("n_oov") === 1L &&
      sc(1).getAs[Long]("n_backoff_uni") === 1L)
  }
}
