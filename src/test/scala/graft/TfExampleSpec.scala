package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.TfExampleEncode

/** tf.train.Example encoding: byte-pinned check values, a round trip
  * through a minimal independent proto parser (varints, packed lists,
  * float32 LE, negative int64s), null/sort semantics, the SQL surface,
  * and the composed writeExamples shard export. The nesting/varint
  * composition is additionally oracled cross-engine (q_x_tfexample).
  */
class TfExampleSpec extends SparkTestBase {

  private def enc(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.select(TfExampleEncode.tfExample(struct(df.columns.map(col): _*)))
      .head().getAs[Array[Byte]](0)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // ---- minimal independent tf.Example parser (test-only) ----
  private def varint(b: Array[Byte], p0: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = p0
    while ((b(p) & 0x80) != 0) { v |= (b(p) & 0x7FL) << shift; shift += 7; p += 1 }
    (v | ((b(p) & 0x7FL) << shift), p + 1)
  }
  private def fields(b: Array[Byte], from: Int, to: Int): Seq[(Int, Array[Byte])] = {
    var p = from
    val out = Seq.newBuilder[(Int, Array[Byte])]
    while (p < to) {
      val (tag, p1) = varint(b, p)
      require((tag & 7) == 2, s"only length-delimited fields expected, got tag $tag")
      val (len, p2) = varint(b, p1)
      out += (((tag >> 3).toInt, java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt)))
      p = p2 + len.toInt
    }
    out.result()
  }
  /** Example bytes → feature name → decoded value. */
  private def parse(b: Array[Byte]): Map[String, Any] = {
    val Seq((1, features)) = fields(b, 0, b.length)
    fields(features, 0, features.length).map { case (1, entry) =>
      val fs = fields(entry, 0, entry.length).toMap
      val name = new String(fs(1), "UTF-8")
      val Seq((kind, list)) = fields(fs(2), 0, fs(2).length)
      val value = kind match {
        case 1 => // BytesList: repeated length-delimited
          fields(list, 0, list.length).map(e => new String(e._2, "UTF-8"))
        case 3 => // Int64List: one packed field
          val Seq((1, packed)) = fields(list, 0, list.length)
          var p = 0
          val vs = Seq.newBuilder[Long]
          while (p < packed.length) { val (v, p2) = varint(packed, p); vs += v; p = p2 }
          vs.result()
        case 2 => // FloatList: one packed field
          val Seq((1, packed)) = fields(list, 0, list.length)
          packed.grouped(4).map { g =>
            java.lang.Float.intBitsToFloat(
              (g(0) & 0xFF) | ((g(1) & 0xFF) << 8) | ((g(2) & 0xFF) << 16) | ((g(3) & 0xFF) << 24))
          }.toSeq
      }
      name -> value
    }.toMap
  }

  test("byte-pinned check values: bytes feature and multi-byte-varint int64 feature") {
    import spark.implicits._
    // {"text": "abc"} — hand-assembled expected bytes
    assert(hex(enc(Seq(("abc")).toDF("text"))) ===
      "0a110a0f0a0474657874" + "1207" + "0a050a03616263")
    // {"v": 300} — varint(300) = AC 02
    assert(hex(enc(Seq((300L)).toDF("v"))) ===
      "0a0d0a0b0a0176" + "1206" + "1a040a02ac02")
  }

  test("round trip through an independent parser: all types, negatives, arrays") {
    import spark.implicits._
    val df = Seq((7L, "hello", Seq(1L, -2L, 300L), Seq(1.5f, -0.25f), 2.5f))
      .toDF("id", "t", "toks", "emb", "w")
    val m = parse(enc(df))
    assert(m("id") === Seq(7L))
    assert(m("t") === Seq("hello"))
    // negative int64 encodes as 10-byte varint two's complement
    assert(m("toks").asInstanceOf[Seq[Long]] === Seq(1L, -2L, 300L))
    assert(m("emb") === Seq(1.5f, -0.25f))
    assert(m("w") === Seq(2.5f))
  }

  test("null fields are skipped; features sort by name regardless of struct order") {
    import spark.implicits._
    val m = parse(enc(
      Seq(("z-val", null: java.lang.Long, "a-val")).toDF("zfield", "gone", "afield")))
    assert(m.keySet === Set("zfield", "afield"))
    // sorted emission: afield's entry precedes zfield's in the raw bytes
    val raw = hex(enc(Seq(("z", "a")).toDF("zf", "af")))
    assert(raw.indexOf(hex("af".getBytes)) < raw.indexOf(hex("zf".getBytes)))
  }

  test("SQL surface + unsupported type rejected at analysis") {
    val r = spark.sql(
      "SELECT graft_tf_example(named_struct('text', 'abc')) AS e").head()
    assert(hex(r.getAs[Array[Byte]](0)).startsWith("0a110a0f0a0474657874"))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_tf_example(named_struct('m', map('a', 1)))").head()
    }
    assert(err.getMessage.toLowerCase.contains("tf_example") ||
      err.getMessage.toLowerCase.contains("datatype") ||
      err.getMessage.toLowerCase.contains("unsupported"))
  }

  test("TfExampleDecode: encode∘decode is the identity; missing/mismatched features null; garbage -> null row") {
    import spark.implicits._
    import org.apache.spark.sql.graftfn.TfExampleDecode
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType),
      StructField("toks", ArrayType(LongType)),
      StructField("emb", ArrayType(FloatType))))
    val df = Seq((7L, "hello", Seq(1L, 300L), Seq(1.5f, -0.25f)))
      .toDF("id", "t", "toks", "emb")
    val back = df
      .select(TfExampleEncode.tfExample(struct(df.columns.map(col): _*)).as("e"))
      .select(TfExampleDecode.tfExampleDecode(col("e"), schema).as("d"))
      .select("d.*").head()
    assert(back.getLong(0) === 7L)
    assert(back.getString(1) === "hello")
    assert(back.getSeq[Long](2) === Seq(1L, 300L))
    assert(back.getSeq[Float](3) === Seq(1.5f, -0.25f))
    // missing feature ("extra") and kind mismatch ("t" as long) → null fields
    val lenient = StructType(Seq(
      StructField("t", LongType), StructField("extra", StringType),
      StructField("id", LongType)))
    val l = df
      .select(TfExampleEncode.tfExample(struct(df.columns.map(col): _*)).as("e"))
      .select(TfExampleDecode.tfExampleDecode(col("e"), lenient).as("d"))
      .select("d.*").head()
    assert(l.isNullAt(0) && l.isNullAt(1) && l.getLong(2) === 7L)
    // garbage bytes → null row, not an exception
    val g = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(TfExampleDecode.tfExampleDecode(col("b"), schema).as("d"))
      .head()
    assert(g.isNullAt(0))
    // pure-SQL round trip via the registered functions
    val s = spark.sql(
      "SELECT graft_tf_example_decode(graft_tf_example(named_struct('id', 42L, 't', 'x')), 'id BIGINT, t STRING') AS d")
      .select("d.*").head()
    assert(s.getLong(0) === 42L && s.getString(1) === "x")
  }

  test("readStream + readExamples: landed shards absorb as micro-batches, typed decode round-trips") {
    import spark.implicits._
    import graft.ingest.TfRecords
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType)))
    val land = java.nio.file.Files.createTempDirectory("tfland").toString
    def drop(tag: String, ids: Range): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tfdrop").toString
      TfRecords.writeExamples(
        ids.map(i => (i.toLong, s"doc-$i")).toDF("id", "t"), tmp, shards = 1)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp, "part-00000.tfrecord"),
        java.nio.file.Paths.get(land, s"drop-$tag.tfrecord"))
    }
    drop("a", 0 until 10)
    val ckpt = java.nio.file.Files.createTempDirectory("tfland_ckpt").toString
    val got = scala.collection.mutable.Set[Long]()
    def runOnce(): Unit = {
      val q = TfRecords.readStream(spark, land).writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.where(col("ok"))
            .withColumn("d", org.apache.spark.sql.graftfn.TfExampleDecode
              .tfExampleDecode(col("payload"), schema))
            .select("d.id").collect().foreach(r => got.synchronized {
              got += r.getLong(0)
            })
          ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    assert(got.toSet === (0L until 10L).toSet)
    drop("b", 10 until 15) // a second vendor drop lands
    runOnce()
    assert(got.toSet === (0L until 15L).toSet)
    // typed batch read over the same landing dir
    val typed = TfRecords.readExamples(spark, land, schema)
    assert(typed.where(!col("ok")).isEmpty)
    assert(typed.select("id").collect().map(_.getLong(0)).toSet ===
      (0L until 15L).toSet)
    assert(typed.where(col("id") === 3L).select("t").head().getString(0) === "doc-3")
  }

  test("foreign producers: unpacked repeated int64/float lists decode; truncated packed floats null only their field") {
    import spark.implicits._
    import org.apache.spark.sql.graftfn.TfExampleDecode
    import org.apache.spark.sql.types._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def feature(name: String, featBody: Array[Byte]): Array[Byte] = {
      val n = name.getBytes("UTF-8")
      val entry = b(0x0A, n.length) ++ n ++ b(0x12, featBody.length) ++ featBody
      b(0x0A, entry.length) ++ entry
    }
    // Int64List with UNPACKED values [3, 300]: wire-type-0 entry per value —
    // legal proto3 a conforming parser must accept even for packed fields.
    val toks = b(0x1A, 5, 0x08, 3, 0x08, 0xAC, 0x02)
    // FloatList with one UNPACKED wire-type-5 value 1.5f (LE 00 00 C0 3F)
    val emb = b(0x12, 5, 0x0D, 0x00, 0x00, 0xC0, 0x3F)
    val t = b(0x0A, 4, 0x0A, 2, 'a', 'b')
    val schema = StructType(Seq(
      StructField("toks", ArrayType(LongType)),
      StructField("emb", ArrayType(FloatType)),
      StructField("t", StringType)))
    def decode(feats: Array[Byte]) = {
      val ex = b(0x0A, feats.length) ++ feats
      Seq(ex).toDF("e")
        .select(TfExampleDecode.tfExampleDecode(col("e"), schema).as("d"))
        .select("d.*").head()
    }
    val r = decode(feature("toks", toks) ++ feature("emb", emb) ++ feature("t", t))
    assert(r.getSeq[Long](0) === Seq(3L, 300L))
    assert(r.getSeq[Float](1) === Seq(1.5f))
    assert(r.getString(2) === "ab")
    // truncated packed FloatList (6 bytes, not a whole number of float32s)
    // → that FIELD nulls; siblings decode — never a null row or a kill
    val badEmb = b(0x12, 8, 0x0A, 6, 1, 2, 3, 4, 5, 6)
    val r2 = decode(feature("emb", badEmb) ++ feature("t", t))
    assert(r2.isNullAt(1), "truncated packed float list must null its own field")
    assert(r2.getString(2) === "ab", "siblings of a failed feature must survive")
    assert(r2.isNullAt(0))
  }

  test("gzip shards: compressed export round-trips, compresses, corrupt gz quarantines observably") {
    import spark.implicits._
    import graft.ingest.TfRecords
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType)))
    val docs = (0 until 200).map(i => (i.toLong, ("lorem ipsum " * 40) + i))
      .toDF("id", "t")
    val plain = java.nio.file.Files.createTempDirectory("tfgz-plain").toString
    val gz = java.nio.file.Files.createTempDirectory("tfgz").toString
    val mPlain = TfRecords.writeExamples(docs, plain, shards = 2)
    val mGz = TfRecords.writeExamples(docs, gz, shards = 2, gzip = true)
    // manifest counts record-level bytes identically; files named .gz
    assert(mGz.agg(sum("n_records")).head().getLong(0) === 200L)
    assert(mGz.select("file").collect().forall(_.getString(0).endsWith(".tfrecord.gz")))
    // the repetitive corpus must actually compress on disk
    def dirBytes(d: String) =
      new java.io.File(d).listFiles().filter(_.getName.contains("tfrecord"))
        .map(_.length()).sum
    assert(dirBytes(gz) < dirBytes(plain) / 2,
      s"gzip shards did not compress: ${dirBytes(gz)} vs ${dirBytes(plain)}")
    // typed read decompresses transparently
    val typed = TfRecords.readExamples(spark, gz, schema)
    assert(typed.where(!col("ok")).isEmpty)
    assert(typed.select("id").collect().map(_.getLong(0)).toSet === (0L until 200L).toSet)
    // corrupt gzip stream → that shard's records drop AND the loss is
    // OBSERVABLE: at least one ok=false quarantine row names the shard
    // (symmetric with plain-shard torn frames), no killed task, and the
    // untouched shard still serves all of its records
    val f = new java.io.File(gz).listFiles().filter(_.getName.endsWith(".gz")).head
    val raw = java.nio.file.Files.readAllBytes(f.toPath)
    raw(raw.length / 2) = (raw(raw.length / 2) ^ 0x7).toByte
    java.nio.file.Files.write(f.toPath, raw)
    val corruptedCount = mGz.collect()
      .find(_.getAs[String]("file").endsWith(f.getName))
      .get.getAs[Long]("n_records")
    val after = TfRecords.read(spark, gz)
    assert(after.where(col("ok")).count() === 200L - corruptedCount)
    val quarantined = after.where(!col("ok")).collect()
    assert(quarantined.nonEmpty, "corrupt gzip shard must emit a quarantine row")
    assert(quarantined.forall(_.getAs[String]("file").endsWith(f.getName)))
    assert(quarantined.forall(r => r.isNullAt(r.fieldIndex("payload"))))
  }

  test("writeExamples: sharded tf.data-ready export round-trips") {
    import spark.implicits._
    import graft.ingest.TfRecords
    val dir = java.nio.file.Files.createTempDirectory("tfex").toString
    val docs = (0 until 64).map(i => (i.toLong, s"doc-$i", Seq(i.toLong, i + 1L)))
      .toDF("id", "t", "toks")
    val manifest = TfRecords.writeExamples(docs, dir, shards = 2)
    assert(manifest.agg(sum("n_records")).head().getLong(0) === 64L)
    val back = TfRecords.read(spark, dir)
    assert(back.where(!col("ok")).isEmpty)
    val decoded = back.select("payload").collect()
      .map(r => parse(r.getAs[Array[Byte]](0)))
    assert(decoded.length === 64)
    val ids = decoded.map(_("id").asInstanceOf[Seq[Long]].head).toSet
    assert(ids === (0L until 64L).toSet)
    val one = decoded.find(_("id") == Seq(5L)).get
    assert(one("t") === Seq("doc-5"))
    assert(one("toks") === Seq(5L, 6L))
  }
}
