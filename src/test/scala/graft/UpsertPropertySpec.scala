package graft

import graft.operators.Upsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based laws of the upsert kernel (SURVEY §5.2), driven by raw
  * ScalaCheck generators with a fixed seed (deterministic CI):
  *  (a) idempotence — upserting the same batch twice ≡ once;
  *  (b) mark-sweep correctness — final tenant state ≡ incoming batch for
  *      random (old, new) snapshot pairs;
  *  (c) permutation invariance — input row order never changes the result
  *      (the deterministic last-writer tie-break is total).
  */
class UpsertPropertySpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Long, String, Long)]): DataFrame =
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("k LONG, v STRING, seq LONG"))

  private def canon(d: DataFrame): Set[(Long, String)] =
    d.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private val rowGen = for {
    k <- Gen.choose(0L, 20L)
    v <- Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    seq <- Gen.choose(0L, 100L)
  } yield (k, v, seq)

  private val batchGen = Gen.listOfN(30, rowGen)

  /** Deterministic samples from a fixed seed. */
  private def samples(n: Int): Seq[List[(Long, String, Long)]] = {
    val params = Gen.Parameters.default
    (0 until n).map { i =>
      batchGen.pureApply(params, rng.Seed(42L + i))
    }
  }

  test("(a) upsert idempotence over random batches") {
    samples(8).grouped(2).foreach { case Seq(existing, incoming) =>
      val ex = Upsert.dedupeLastWriter(df(existing), Seq("k"), Seq("seq", "v"))
      val inc = Upsert.dedupeLastWriter(df(incoming), Seq("k"), Seq("seq", "v"))
      val once = Upsert.upsertNodes(ex, inc, Seq("k"))
      val twice = Upsert.upsertNodes(once, inc, Seq("k"))
      assert(canon(once) == canon(twice))
    }
  }

  test("(b) mark-sweep: tenant state equals the batch exactly") {
    samples(8).grouped(2).foreach { case Seq(oldRows, newRows) =>
      val old = Upsert.dedupeLastWriter(df(oldRows), Seq("k"), Seq("seq", "v"))
        .withColumn("tenant", lit("t1"))
      val nw = Upsert.dedupeLastWriter(df(newRows), Seq("k"), Seq("seq", "v"))
        .withColumn("tenant", lit("t1"))
      val swept = Upsert.markSweepNodes(old, nw, Seq("k"), "tenant", "t1")
      assert(canon(swept) == canon(nw))
    }
  }

  test("(c) permutation invariance of last-writer dedup") {
    val rnd = new scala.util.Random(7)
    samples(4).foreach { rows =>
      val a = Upsert.dedupeLastWriter(df(rows), Seq("k"), Seq("seq", "v"))
      val b = Upsert.dedupeLastWriter(df(rnd.shuffle(rows)), Seq("k"), Seq("seq", "v"))
      assert(canon(a) == canon(b))
    }
  }

  test("ON CREATE SET keeps existing values only on matched keys") {
    samples(8).grouped(2).foreach { case Seq(existing, incoming) =>
      val ex = Upsert.dedupeLastWriter(df(existing), Seq("k"), Seq("seq", "v"))
      val inc = Upsert.dedupeLastWriter(df(incoming), Seq("k"), Seq("seq", "v"))
      val out = Upsert.upsertNodes(ex, inc, Seq("k"), onCreateOnly = Seq("v"))
      val exMap = canon(ex).toMap
      val incMap = canon(inc).toMap
      canon(out).foreach { case (k, v) =>
        assert(v == exMap.getOrElse(k, incMap(k)),
          s"key $k: got $v, existing=${exMap.get(k)}, incoming=${incMap.get(k)}")
      }
    }
  }

  test("undirected edge upsert is orientation-invariant") {
    val rnd = new scala.util.Random(11)
    samples(2).foreach { rows =>
      val edges = rows.map { case (k, _, seq) =>
        (k, (k * 7 + seq) % 21, "REL", "t1", Map.empty[String, String])
      }
      val flipped = edges.map { e =>
        if (rnd.nextBoolean()) (e._2, e._1, e._3, e._4, e._5) else e
      }
      import spark.implicits._
      val a = Upsert.upsertEdges(
        spark.emptyDataset[(Long, Long, String, String, Map[String, String])]
          .toDF("src", "dst", "relType", "tenant", "props"),
        edges.toDF("src", "dst", "relType", "tenant", "props"), Set("REL"))
      val b = Upsert.upsertEdges(
        spark.emptyDataset[(Long, Long, String, String, Map[String, String])]
          .toDF("src", "dst", "relType", "tenant", "props"),
        flipped.toDF("src", "dst", "relType", "tenant", "props"), Set("REL"))
      val pa = a.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pb = b.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pa == pb)
    }
  }

  test("ON CREATE SET keeps a NULL existing value on match (Cypher law)") {
    // A matched key whose existing onCreateOnly column is NULL must stay
    // NULL — match is decided by key presence, never per-column isNotNull.
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k LONG, v STRING")
    def mk(rows: Seq[(Long, String)]) = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
    val ex = mk(Seq((1L, null), (2L, "kept")))
    val inc = mk(Seq((1L, "overwrite?"), (2L, "overwrite?"), (3L, "created")))
    val out = Upsert.upsertNodes(ex, inc, Seq("k"), onCreateOnly = Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> None, 2L -> Some("kept"), 3L -> Some("created")))
    // markSweepNodes obeys the same law for its tenant-scoped merge.
    val swept = Upsert.markSweepNodes(
      mk(Seq((1L, null), (2L, "kept"))).withColumn("tenant", lit("t1")),
      mk(Seq((1L, "overwrite?"), (2L, "overwrite?"), (3L, "created"))).withColumn("tenant", lit("t1")),
      Seq("k"), "tenant", "t1", onCreateOnly = Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(swept == Map(1L -> None, 2L -> Some("kept"), 3L -> Some("created")))
  }
}
