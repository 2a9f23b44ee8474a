package graft

import java.nio.file.{Files, Paths}

import graft.ingest.TokenBin
import org.apache.spark.sql.functions._

/** Megatron-style .bin/.idx shards: byte-pinned index layout (the
  * TfRecordFrame byte-pin precedent), deterministic sharding, round
  * trips for both dtypes, loud out-of-range writes, and the reader's
  * quarantine contract over every corruption class.
  */
class TokenBinSpec extends SparkTestBase {

  test("idx/bin bytes are pinned: MMIDIDX v1 header, LE sizes/pointers/doc_idx, uint16 payload") {
    import spark.implicits._
    // one shard, two sequences in seq order: [3, 1, 65535] and [7]
    val dir = Files.createTempDirectory("tokbin_pin").toString
    val df = Seq((0L, Seq(3L, 1L, 65535L)), (1L, Seq(7L)))
      .toDF("seq", "tokens")
    val manifest = TokenBin.write(df, "seq", "tokens", dir, shards = 1).collect()
    assert(manifest.length === 1)
    assert(manifest.head.getAs[Long]("n_sequences") === 2L)
    assert(manifest.head.getAs[Long]("n_tokens") === 4L)
    assert(manifest.head.getAs[Long]("n_bytes") === 8L)

    val bin = Files.readAllBytes(Paths.get(dir, "part-00000.bin"))
    // uint16 little-endian: 3, 1, 65535, 7
    assert(bin.toSeq === Seq[Byte](3, 0, 1, 0, -1, -1, 7, 0))

    val idx = Files.readAllBytes(Paths.get(dir, "part-00000.idx"))
    def u64(v: Long) = (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte)
    def i32(v: Int) = (0 until 4).map(i => ((v >> (8 * i)) & 0xff).toByte)
    val expected =
      "MMIDIDX".getBytes("US-ASCII").toSeq ++ Seq[Byte](0, 0) ++ // magic
        u64(1) ++ Seq[Byte](8) ++            // version, dtype code uint16
        u64(2) ++ u64(3) ++                  // n sequences, doc_idx length
        i32(3) ++ i32(1) ++                  // sizes
        u64(0) ++ u64(6) ++                  // byte pointers (3 tokens * 2)
        u64(0) ++ u64(1) ++ u64(2)           // doc_idx 0..n
    assert(idx.toSeq === expected)
    // no tmp leftovers, no checksum sidecars
    val listed = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(listed === Set("part-00000.bin", "part-00000.idx"))
  }

  test("round trip both dtypes; sharding deterministic (seq mod shards, ascending within shard)") {
    import spark.implicits._
    val seqs = (0L until 37L).map(s =>
      (s, (0L to s % 5).map(k => (s * 31 + k * 7) % 60000)))
    val df = seqs.toDF("seq", "tokens").repartition(7) // scrambled input
    val dir = Files.createTempDirectory("tokbin_rt").toString
    TokenBin.write(df, "seq", "tokens", dir, shards = 4)
    val back = TokenBin.read(spark, dir).localCheckpoint(true)
    assert(back.where(!col("ok")).isEmpty)
    assert(back.count() === 37L)
    // shard s holds exactly the seqs ≡ s (mod 4), ascending — so the
    // (shard, position) pair recovers the original sequence id exactly
    val got = back.collect().map { r =>
      val shard = r.getString(0).takeRight(5).toInt
      val pos = r.getLong(1)
      (shard.toLong + pos * 4, r.getSeq[Long](2))
    }.toMap
    seqs.foreach { case (s, toks) => assert(got(s) === toks, s"seq $s") }
    // byte-determinism: a second write of the same frame is identical
    val dir2 = Files.createTempDirectory("tokbin_rt2").toString
    TokenBin.write(df.repartition(3), "seq", "tokens", dir2, shards = 4)
    (0 until 4).foreach { p =>
      Seq("bin", "idx").foreach { ext =>
        val a = Files.readAllBytes(Paths.get(dir, f"part-$p%05d.$ext"))
        val b = Files.readAllBytes(Paths.get(dir2, f"part-$p%05d.$ext"))
        assert(java.util.Arrays.equals(a, b), s"part-$p.$ext differs")
      }
    }
    // int32 dtype round-trips ids past 65535
    val big = Seq((0L, Seq(70000L, 2147483647L, 0L))).toDF("seq", "tokens")
    val dir3 = Files.createTempDirectory("tokbin_i32").toString
    TokenBin.write(big, "seq", "tokens", dir3, shards = 1, dtype = "int32")
    val b3 = TokenBin.read(spark, dir3).collect()
    assert(b3.forall(_.getBoolean(3)))
    assert(b3.head.getSeq[Long](2) === Seq(70000L, 2147483647L, 0L))
  }

  test("fragment geometry: .idx doc index pins byte-for-byte, doc column round-trips, bad geometry fails loudly") {
    import spark.implicits._
    // two packed sequences: seq 0 = fragments [2, 1] over tokens
    // [3, 1, 65535]; seq 1 = one fragment [7] — four entries never
    // appear: entries are FRAGMENTS (3 total), docs group them (2).
    val dir = Files.createTempDirectory("tokbin_frag").toString
    val df = Seq(
      (0L, Seq(3L, 1L, 65535L), Seq(2L, 1L)),
      (1L, Seq(7L), Seq(1L)))
      .toDF("seq", "tokens", "frags")
    val m = TokenBin.write(df, "seq", "tokens", dir, shards = 1,
      fragsCol = "frags").collect()
    assert(m.head.getAs[Long]("n_sequences") === 3L) // entries = fragments
    assert(m.head.getAs[Long]("n_tokens") === 4L)

    val bin = Files.readAllBytes(Paths.get(dir, "part-00000.bin"))
    assert(bin.toSeq === Seq[Byte](3, 0, 1, 0, -1, -1, 7, 0)) // payload unchanged
    val idx = Files.readAllBytes(Paths.get(dir, "part-00000.idx"))
    def u64(v: Long) = (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte)
    def i32(v: Int) = (0 until 4).map(i => ((v >> (8 * i)) & 0xff).toByte)
    val expected =
      "MMIDIDX".getBytes("US-ASCII").toSeq ++ Seq[Byte](0, 0) ++
        u64(1) ++ Seq[Byte](8) ++            // version, dtype uint16
        u64(3) ++ u64(3) ++                  // 3 entries, doc_idx length 3
        i32(2) ++ i32(1) ++ i32(1) ++        // fragment sizes
        u64(0) ++ u64(4) ++ u64(6) ++        // byte pointers
        u64(0) ++ u64(2) ++ u64(3)           // doc starts: seq0@0, seq1@2, end
    assert(idx.toSeq === expected)

    // read back: one row per fragment, doc groups fragments by sequence
    val back = TokenBin.read(spark, dir).orderBy("seq_idx").collect()
    assert(back.forall(_.getAs[Boolean]("ok")))
    assert(back.map(r => (r.getAs[Long]("seq_idx"), r.getAs[Long]("doc"),
      r.getAs[Seq[Long]]("tokens"))).toSeq === Seq(
      (0L, 0L, Seq(3L, 1L)), (1L, 0L, Seq(65535L)), (2L, 1L, Seq(7L))))

    // geometry that does not tile the tokens fails loudly
    val bad = Seq((0L, Seq(1L, 2L, 3L), Seq(2L, 2L))).toDF("seq", "tokens", "frags")
    val dirB = Files.createTempDirectory("tokbin_fragbad").toString
    val ex = intercept[Exception] {
      TokenBin.write(bad, "seq", "tokens", dirB, shards = 1, fragsCol = "frags")
    }
    assert(ex.toString.contains("does not tile") ||
      Option(ex.getCause).exists(_.toString.contains("does not tile")))

    // null/empty frags mean "one fragment" — byte-identical to no-frags
    val dirC = Files.createTempDirectory("tokbin_fragnull").toString
    val dirD = Files.createTempDirectory("tokbin_fragless").toString
    val withNull = Seq((0L, Seq(3L, 1L, 65535L), null: Seq[Long]),
      (1L, Seq(7L), Seq.empty[Long])).toDF("seq", "tokens", "frags")
    TokenBin.write(withNull, "seq", "tokens", dirC, shards = 1, fragsCol = "frags")
    TokenBin.write(withNull.drop("frags"), "seq", "tokens", dirD, shards = 1)
    Seq("bin", "idx").foreach { ext =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(dirC, s"part-00000.$ext")),
        Files.readAllBytes(Paths.get(dirD, s"part-00000.$ext"))), ext)
    }

    // a corrupt doc index (decreasing / wrong endpoint) quarantines
    val idxC = Files.readAllBytes(Paths.get(dir, "part-00000.idx"))
    idxC(idxC.length - 8) = 9.toByte // last doc_idx value 3 -> 9 (> n)
    Files.write(Paths.get(dir, "part-00000.idx"), idxC)
    assert(TokenBin.read(spark, dir).where(!col("ok")).count() === 1L)
  }

  test("int-typed token column casts losslessly; float/string token columns fail loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tokbin_int").toString
    val intToks = Seq((0L, Seq(3, 1, 70))).toDF("seq", "tokens")
    TokenBin.write(intToks, "seq", "tokens", dir, shards = 1)
    val back = TokenBin.read(spark, dir).collect()
    assert(back.head.getAs[Seq[Long]]("tokens") === Seq(3L, 1L, 70L))
    val bad = Seq((0L, Seq(1.5, 2.0))).toDF("seq", "tokens")
    val ex = intercept[IllegalArgumentException] {
      TokenBin.write(bad, "seq", "tokens", dir, shards = 1)
    }
    assert(ex.getMessage.contains("array of integral"))
  }

  test("non-numeric seq and duplicate seq FAIL the write loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tokbin_guard").toString
    // a string key would cast to null and silently drop every row
    val stringKey = Seq(("doc-1", Seq(1L))).toDF("seq", "tokens")
    val e1 = intercept[IllegalArgumentException] {
      TokenBin.write(stringKey, "seq", "tokens", dir, shards = 1)
    }
    assert(e1.getMessage.contains("must be numeric"))
    // duplicate order keys would sort arrival-dependently — the
    // byte-determinism contract requires uniqueness
    val dup = Seq((7L, Seq(1L)), (7L, Seq(2L))).toDF("seq", "tokens")
    val e2 = intercept[Exception] {
      TokenBin.write(dup, "seq", "tokens", dir, shards = 1)
    }
    assert(e2.toString.contains("duplicate sequence id") ||
      Option(e2.getCause).exists(_.toString.contains("duplicate sequence id")))
  }

  test("out-of-range token FAILS the write loudly; empty token arrays drop") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tokbin_range").toString
    val bad = Seq((0L, Seq(70000L))).toDF("seq", "tokens")
    val ex = intercept[Exception] {
      TokenBin.write(bad, "seq", "tokens", dir, shards = 1)
    }
    assert(ex.getMessage.contains("outside uint16 range") ||
      Option(ex.getCause).exists(_.getMessage.contains("outside uint16 range")) ||
      ex.toString.contains("outside uint16 range"))
    val dir2 = Files.createTempDirectory("tokbin_empty").toString
    val withEmpty = Seq((0L, Seq(5L)), (1L, Seq.empty[Long]))
      .toDF("seq", "tokens")
    val m = TokenBin.write(withEmpty, "seq", "tokens", dir2, shards = 1).collect()
    assert(m.head.getAs[Long]("n_sequences") === 1L)
  }

  test("quarantine contract: bad magic, torn bin, pointer lies, missing half — one ok=false row each, intact shards unaffected") {
    import spark.implicits._
    def freshDir(tag: String): String =
      Files.createTempDirectory(s"tokbin_q_$tag").toString
    def writeOne(dir: String): Unit =
      TokenBin.write(Seq((0L, Seq(1L, 2L, 3L)), (1L, Seq(9L)))
        .toDF("seq", "tokens"), "seq", "tokens", dir, shards = 1)
    def failures(dir: String): Long =
      TokenBin.read(spark, dir).where(!col("ok")).count()

    // bad magic
    val d1 = freshDir("magic"); writeOne(d1)
    val idx1 = Files.readAllBytes(Paths.get(d1, "part-00000.idx"))
    idx1(0) = 'X'.toByte
    Files.write(Paths.get(d1, "part-00000.idx"), idx1)
    assert(failures(d1) === 1L && TokenBin.read(spark, d1).count() === 1L)

    // torn bin (truncated payload ≠ index total)
    val d2 = freshDir("torn"); writeOne(d2)
    val bin2 = Files.readAllBytes(Paths.get(d2, "part-00000.bin"))
    Files.write(Paths.get(d2, "part-00000.bin"), bin2.dropRight(2))
    assert(failures(d2) === 1L)

    // pointer lies: flip a pointer byte (sizes say 3 tokens, ptr differs)
    val d3 = freshDir("ptr"); writeOne(d3)
    val idx3 = Files.readAllBytes(Paths.get(d3, "part-00000.idx"))
    // second pointer lives after header(34) + 2 sizes(8) + first ptr(8)
    idx3(34 + 8 + 8) = 99.toByte
    Files.write(Paths.get(d3, "part-00000.idx"), idx3)
    assert(failures(d3) === 1L)

    // missing .bin
    val d4 = freshDir("missing"); writeOne(d4)
    Files.delete(Paths.get(d4, "part-00000.bin"))
    assert(failures(d4) === 1L)

    // an intact shard NEXT TO a corrupt one still parses whole
    val d5 = freshDir("mixed")
    TokenBin.write((0L until 8L).map(s => (s, Seq(s, s + 1)))
      .toDF("seq", "tokens"), "seq", "tokens", d5, shards = 2)
    val idx5 = Files.readAllBytes(Paths.get(d5, "part-00001.idx"))
    idx5(0) = 'X'.toByte
    Files.write(Paths.get(d5, "part-00001.idx"), idx5)
    val mixed = TokenBin.read(spark, d5).localCheckpoint(true)
    assert(mixed.where(!col("ok")).count() === 1L)
    assert(mixed.where(col("ok")).count() === 4L) // shard 0's 4 sequences
  }
}
