package graft

import graft.ingest.SafeTensors
import org.apache.spark.sql.functions._

/** safetensors shards: byte-pinned file form, write→read round trip,
  * hand-assembled FOREIGN files (the Xlsx/PDF/TokenBin discipline), and
  * the structural quarantine classes — torn header, unknown dtype,
  * non-tiling offsets, extent/shape disagreement.
  */
class SafeTensorsSpec extends SparkTestBase {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def fileBytes(dir: String): Array[Byte] = {
    val fs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".safetensors")).findFirst().get()
    java.nio.file.Files.readAllBytes(fs)
  }

  test("byte-pin: header length, deterministic JSON, LE ids, raw float bits") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0f, -2.5f)), (1L, Seq(0.0f, 3.25f)))
      .toDF("vec_id", "embedding")
    val dir = tmp("st_pin")
    val m = SafeTensors.writeVectors(df, "vec_id", "embedding", dir, shards = 1)
      .collect().head
    assert(m.getAs[Long]("n_rows") === 2L && m.getAs[Long]("dim") === 2L)
    val bytes = fileBytes(dir)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hlen = buf.getLong(0)
    val header = new String(bytes, 8, hlen.toInt, "UTF-8")
    assert(header ===
      """{"__metadata__":{"format":"graft.vectors.v1"},""" +
        """"ids":{"dtype":"I64","shape":[2],"data_offsets":[0,16]},""" +
        """"vectors":{"dtype":"F32","shape":[2,2],"data_offsets":[16,32]}}""")
    assert(bytes.length.toLong === 8L + hlen + 16 + 16)
    val dataStart = 8 + hlen.toInt
    assert(buf.getLong(dataStart) === 0L && buf.getLong(dataStart + 8) === 1L)
    assert(buf.getFloat(dataStart + 16) === 1.0f)
    assert(buf.getFloat(dataStart + 20) === -2.5f)
    assert(buf.getFloat(dataStart + 28) === 3.25f)
    assert(m.getAs[Long]("n_bytes") === bytes.length.toLong)
  }

  test("round trip across shards: every id and every float bit comes back") {
    import spark.implicits._
    val rows = (0L until 37L).map(i =>
      (i, Seq.tabulate(5)(j => (i * 10 + j).toFloat / 7.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val dir = tmp("st_rt")
    SafeTensors.writeVectors(df, "vec_id", "embedding", dir, shards = 4)
    val back = SafeTensors.readVectors(spark, dir)
    assert(back.where(!col("ok")).count() === 0L)
    val got = back.orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding")))
    assert(got.toSeq === rows.sortBy(_._1))
    // shard routing: floorMod(id, 4), ascending inside
    assert(back.select("path").distinct().count() === 4L)
    // tensor-level manifest agrees
    val man = SafeTensors.read(spark, dir)
    assert(man.where(!col("ok")).count() === 0L)
    assert(man.count() === 8L) // 2 tensors × 4 shards
  }

  test("write guards: ragged dims, duplicate ids, no rows — all loud") {
    import spark.implicits._
    // intra-shard raggedness fails inside the write pass itself (no
    // separate validation job scans the data)
    val ragged = Seq((0L, Seq(1.0f)), (1L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[org.apache.spark.SparkException] {
      SafeTensors.writeVectors(ragged, "vec_id", "embedding", tmp("st_rag"), 1) }
    val e1msgs = Iterator.iterate(e1: Throwable)(_.getCause)
      .takeWhile(_ != null).take(5)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(e1msgs.contains("ONE dimension"))
    // cross-shard raggedness (clean within each shard: floorMod routing
    // puts dim-1 ids in shard 0, dim-2 ids in shard 1) fails on the
    // shards-sized manifest — and deletes everything it wrote
    val crossDir = tmp("st_rag2")
    val cross = Seq((0L, Seq(1.0f)), (2L, Seq(2.0f)),
        (1L, Seq(1.0f, 2.0f)), (3L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val e1b = intercept[IllegalArgumentException] {
      SafeTensors.writeVectors(cross, "vec_id", "embedding", crossDir, 2) }
    assert(e1b.getMessage.contains("ONE dimension"))
    val leftover = Option(new java.io.File(crossDir).listFiles())
      .map(_.count(_.getName.endsWith(".safetensors"))).getOrElse(0)
    assert(leftover === 0, "a ragged export must not leave part files")
    val dup = Seq((5L, Seq(1.0f)), (5L, Seq(2.0f))).toDF("vec_id", "embedding")
    val e2 = intercept[org.apache.spark.SparkException] {
      SafeTensors.writeVectors(dup, "vec_id", "embedding", tmp("st_dup"), 1) }
    assert(e2.getMessage.contains("duplicate id") ||
      Option(e2.getCause).exists(_.getMessage.contains("duplicate id")))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      SafeTensors.writeVectors(empty, "vec_id", "embedding", tmp("st_emp"), 1) }
    assert(e3.getMessage.contains("no rows"))
  }

  test("one job: the dim check rides the write pass; dropped null rows " +
      "never vote; empty shards carry the agreed dim") {
    import spark.implicits._
    // a null-id row with a DEVIANT dim is dropped by the write filter —
    // it must not abort an export that never writes it
    val df = Seq((Option(0L), Seq(1.0f, 2.0f)), (Option(5L), Seq(3.0f, 4.0f)),
        (Option.empty[Long], Seq(9.0f)))
      .toDF("vec_id", "embedding")
    val dir = tmp("st_onejob")
    val (man, jobs) = countJobs {
      SafeTensors.writeVectors(df, "vec_id", "embedding", dir, shards = 4)
        .collect()
    }
    // ids 0 and 5 land in shards 0 and 1 — shards 2 and 3 are empty,
    // and the write + manifest is ONE Spark job (manifest collect); the
    // manifest materialization itself adds one more local job at most
    assert(jobs <= 2, s"writeVectors must not add a validation scan (got $jobs jobs)")
    assert(man.length === 4)
    assert(man.map(_.getAs[Long]("dim")).toSet === Set(2L))
    assert(man.map(_.getAs[Long]("n_rows")).sorted.toSeq === Seq(0L, 0L, 1L, 1L))
    // every shard — including the empty ones — parses with the export's
    // one geometry
    val back = SafeTensors.readVectors(spark, dir)
    assert(back.where(!col("ok")).count() === 0L)
    assert(back.orderBy("vec_id").collect().map(_.getAs[Long]("vec_id")).toSeq
      === Seq(0L, 5L))
    val man2 = SafeTensors.read(spark, dir)
    assert(man2.where(!col("ok")).count() === 0L)
    assert(man2.count() === 8L) // 2 tensors × 4 shards, empties included
  }

  test("FOREIGN file: a hand-assembled single-tensor file manifests; readVectors quarantines it") {
    // a minimal foreign safetensors: one F32 [3] tensor named "w",
    // header padded with a trailing space (spec allows whitespace)
    val header = """{"w":{"dtype":"F32","shape":[3],"data_offsets":[0,12]}} """
      .getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    (0 until 8).foreach(i => out.write(((header.length.toLong >> (8 * i)) & 0xff).toInt))
    out.write(header)
    val bb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1.5f, -2.0f, 99.0f).foreach(bb.putFloat)
    out.write(bb.array())
    val dir = tmp("st_foreign")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "foreign.safetensors"), out.toByteArray)
    val man = SafeTensors.read(spark, dir).collect()
    assert(man.length === 1 && man.head.getAs[Boolean]("ok"))
    assert(man.head.getAs[String]("tensor") === "w")
    assert(man.head.getAs[String]("dtype") === "F32")
    assert(man.head.getAs[Seq[Long]]("shape") === Seq(3L))
    assert(man.head.getAs[Long]("n_bytes") === 12L)
    // not the engine's two-tensor layout → vector read quarantines
    val vec = SafeTensors.readVectors(spark, dir).collect()
    assert(vec.length === 1 && !vec.head.getAs[Boolean]("ok"))
  }

  test("quarantine classes: torn header, bad JSON, unknown dtype, gap, extent lie, trailing bytes") {
    def fileFor(header: String, dataLen: Int): Array[Byte] = {
      val h = header.getBytes("UTF-8")
      val out = new java.io.ByteArrayOutputStream()
      (0 until 8).foreach(i => out.write(((h.length.toLong >> (8 * i)) & 0xff).toInt))
      out.write(h)
      out.write(new Array[Byte](dataLen))
      out.toByteArray
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      // header length beyond file
      "torn" -> Array[Byte](99, 0, 0, 0, 0, 0, 0, 0, '{', '}'),
      "badjson" -> fileFor("{not json", 0),
      "baddtype" -> fileFor(
        """{"w":{"dtype":"F128","shape":[1],"data_offsets":[0,16]}}""", 16),
      // gap: tensor starts at 4, bytes 0..4 unclaimed
      "gap" -> fileFor(
        """{"w":{"dtype":"F32","shape":[1],"data_offsets":[4,8]}}""", 8),
      // extent lie: shape says 2 floats (8 bytes) but offsets span 4
      "extent" -> fileFor(
        """{"w":{"dtype":"F32","shape":[2],"data_offsets":[0,4]}}""", 4),
      // trailing unclaimed bytes after the last tensor
      "trailing" -> fileFor(
        """{"w":{"dtype":"F32","shape":[1],"data_offsets":[0,4]}}""", 8))
    val dir = tmp("st_quar")
    cases.foreach { case (name, bytes) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$name.safetensors"), bytes)
    }
    val man = SafeTensors.read(spark, dir)
    assert(man.count() === cases.length.toLong)
    assert(man.where(col("ok")).count() === 0L,
      man.where(col("ok")).collect().mkString(", "))
  }
}
