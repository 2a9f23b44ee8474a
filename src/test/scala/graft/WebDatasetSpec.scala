package graft

import graft.ingest.WebDataset
import org.apache.spark.sql.functions._

/** WebDataset tar export/import: the USTAR header byte-pinned against
  * the POSIX layout, round trips through real shard files, quarantine
  * on torn/corrupt archives, and (when a system `tar` exists) a
  * cross-tool listing check.
  */
class WebDatasetSpec extends SparkTestBase {

  private def member(name: String, data: String): Array[Byte] =
    // tarMember is package-private to ingest; reached via the test shim
    graft.ingest.WebDatasetTestShim.tarMember(name, data.getBytes("UTF-8"))

  test("tarMember: the USTAR header byte layout, spec-pinned") {
    val m = member("7.txt", "hi")
    assert(m.length === 1024) // 512 header + 512 padded data
    def s(off: Int, len: Int) = new String(m, off, len, "ISO-8859-1")
    assert(s(0, 5) === "7.txt" && m(5) === 0.toByte)
    assert(s(100, 7) === "0000644" && m(107) === 0.toByte) // mode
    assert(s(108, 7) === "0000000" && m(115) === 0.toByte) // uid
    assert(s(116, 7) === "0000000" && m(123) === 0.toByte) // gid
    assert(s(124, 11) === "00000000002" && m(135) === 0.toByte) // size
    assert(s(136, 11) === "00000000000" && m(147) === 0.toByte) // mtime 0 — deterministic
    assert(m(156) === '0'.toByte) // typeflag regular file
    assert(s(257, 5) === "ustar" && m(262) === 0.toByte)
    assert(s(263, 2) === "00")
    // checksum: recompute with the field as spaces; stored form is
    // 6 octal digits + NUL + space
    var sum = 0L
    (0 until 512).foreach { i =>
      sum += (if (i >= 148 && i < 156) ' '.toInt else m(i) & 0xff)
    }
    val stored = java.lang.Long.parseLong(s(148, 6), 8)
    assert(stored === sum)
    assert(m(154) === 0.toByte && m(155) === ' '.toByte)
    // data + zero padding
    assert(s(512, 2) === "hi")
    assert((514 until 1024).forall(m(_) == 0.toByte))
    // a 512-multiple payload gets no pad block
    assert(member("k.bin", "x" * 512).length === 1024)
  }

  test("round trip: multi-part samples, null parts skipped, key-adjacent " +
      "members, readSamples pivot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wds_rt").toString
    val df = Seq(
      (1L, "alpha", "{\"a\":1}"),
      (2L, "beta", null),
      (3L, "gamma", "{\"a\":3}"),
      (10L, "delta", "{\"a\":10}"))
      .toDF("id", "txt", "meta")
    val manifest = WebDataset.write(df, col("id"),
      Seq("txt" -> col("txt"), "meta" -> col("meta")), dir, shards = 2)
      .collect()
    assert(manifest.length === 2)
    assert(manifest.map(_.getLong(1)).sum === 4L) // samples
    val back = WebDataset.read(spark, dir)
    assert(back.where(!col("ok")).count() === 0L)
    val rows = back.collect().map(r => (r.getString(2), r.getString(3),
      new String(r.getAs[Array[Byte]](4), "UTF-8"))).toSet
    assert(rows === Set(
      ("1", "txt", "alpha"), ("1", "meta", "{\"a\":1}"),
      ("2", "txt", "beta"),
      ("3", "txt", "gamma"), ("3", "meta", "{\"a\":3}"),
      ("10", "txt", "delta"), ("10", "meta", "{\"a\":10}")))
    // a sample's members are ADJACENT within the shard: same key rows
    // have consecutive member_idx
    val adj = back.collect().groupBy(r => (r.getString(0), r.getString(2)))
      .values.forall { rs =>
        val idxs = rs.map(_.getLong(1)).sorted
        idxs.zip(idxs.tail).forall { case (a, b) => b == a + 1 }
      }
    assert(adj, "sample members must be adjacent")
    val piv = WebDataset.readSamples(spark, dir, Seq("txt", "meta"))
      .collect().map(r => r.getString(1) ->
        ((new String(r.getAs[Array[Byte]](2), "UTF-8"),
          Option(r.getAs[Array[Byte]](3)).map(new String(_, "UTF-8")))))
      .toMap
    assert(piv("2") === (("beta", None)))
    assert(piv("10") === (("delta", Some("{\"a\":10}"))))
    // byte-determinism: a second export writes identical shard bytes
    val dir2 = java.nio.file.Files.createTempDirectory("wds_rt2").toString
    WebDataset.write(df, col("id"),
      Seq("txt" -> col("txt"), "meta" -> col("meta")), dir2, shards = 2)
      .collect()
    def bytesOf(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    assert(bytesOf(dir).toSeq === bytesOf(dir2).toSeq)
  }

  test("quarantine: torn archive keeps the parsed prefix, a corrupt " +
      "header checksum is one ok=false row, foreign prefix field joins") {
    val full = member("0.txt", "hello") ++ member("1.txt", "world") ++
      new Array[Byte](1024)
    // clean parse
    val clean = graft.ingest.WebDatasetTestShim.parseTar(full)
    assert(clean.map(_._2.map(_._1)) === Seq(Some("0.txt"), Some("1.txt")))
    // torn mid-data of the second member (header complete, payload
    // short): first survives, one None
    val torn = graft.ingest.WebDatasetTestShim.parseTar(full.take(1024 + 514))
    assert(torn.length === 2)
    assert(torn(0)._2.map(_._1) === Some("0.txt"))
    assert(torn(1)._2 === None)
    // corrupt checksum: flip a name byte of member 1
    val bad = full.clone()
    bad(1024) = 'X'.toByte
    val q = graft.ingest.WebDatasetTestShim.parseTar(bad)
    assert(q(0)._2.isDefined && q(1)._2 === None)
    // missing terminator at EXACT end of file is tolerated
    val noTerm = graft.ingest.WebDatasetTestShim.parseTar(
      full.take(full.length - 1024))
    assert(noTerm.flatMap(_._2.map(_._1)) === Seq("0.txt", "1.txt"))
    // USTAR prefix field joins with '/'
    val pm = member("img.png", "p")
    System.arraycopy("data/shard0".getBytes("UTF-8"), 0, pm, 345, 11)
    // re-checksum after editing the prefix (the test edits raw bytes)
    java.util.Arrays.fill(pm, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += pm(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy(("0" * (6 - cs.length) + cs).getBytes("ISO-8859-1"),
      0, pm, 148, 6)
    pm(154) = 0; pm(155) = ' '.toByte
    val withPrefix = graft.ingest.WebDatasetTestShim.parseTar(
      pm ++ new Array[Byte](1024))
    assert(withPrefix.head._2.map(_._1) === Some("data/shard0/img.png"))
  }

  test("system tar (when present) lists our archive — cross-tool interop") {
    val tarBin = new java.io.File("/usr/bin/tar")
    val tarBin2 = new java.io.File("/bin/tar")
    val bin = if (tarBin.exists) tarBin else tarBin2
    assume(bin.exists, "no system tar on this box")
    val f = java.nio.file.Files.createTempFile("wds_sys", ".tar")
    val bytes = member("42.txt", "payload") ++ member("42.json", "{}") ++
      new Array[Byte](1024)
    java.nio.file.Files.write(f, bytes)
    val p = new ProcessBuilder(bin.getAbsolutePath, "-tf", f.toString)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() === 0, s"tar -tf failed:\n$out")
    assert(out.split("\n").map(_.trim).filter(_.nonEmpty).toSeq ===
      Seq("42.txt", "42.json"))
  }
}
