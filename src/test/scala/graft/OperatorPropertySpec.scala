package graft

import graft.llmops.Corpus
import graft.operators.{Quantiles, TemporalJoins}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based laws of the round-4 operators against driver-side
  * reference implementations, fixed-seed deterministic (the
  * UpsertPropertySpec pattern): random inputs catch the shapes
  * hand-picked fixtures miss.
  */
class OperatorPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).map(i => g.pureApply(params, rng.Seed(1234L + i)))
  }

  test("shardManifest checksum is order/partition-invariant and row-sensitive") {
    val df = Seq((1L, "a b c", 0L), (2L, "d e", 0L), (3L, "f g h i", 1L))
      .toDF("doc_id", "text", "shard")
    def m(d: org.apache.spark.sql.DataFrame) =
      Corpus.shardManifest(d, col("shard"), "doc_id", "text")
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val base = m(df)
    assert(base.map(x => (x._1, x._2, x._3)) == Seq((0L, 2L, 5L), (1L, 1L, 4L)))
    // the checksum sees SETS: reorder + repartition changes nothing.
    assert(m(df.orderBy(col("doc_id").desc).repartition(7)) == base)
    // one changed row flips ITS shard's checksum and no other column.
    val changed = Seq((1L, "a b x", 0L), (2L, "d e", 0L), (3L, "f g h i", 1L))
      .toDF("doc_id", "text", "shard")
    val cm = m(changed)
    assert(cm(0)._4 != base(0)._4 && cm(1)._4 == base(1)._4)
    assert(cm.map(x => (x._1, x._2, x._3)) == base.map(x => (x._1, x._2, x._3)))
  }

  test("asofJoin both directions equal the naive per-row reference on random frames") {
    val leftGen = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 50L)
    } yield (k, t))
    val rightGen = Gen.listOfN(25, for {
      k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 50L)
      v <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    } yield (k, t, v))
    samples(Gen.zip(leftGen, rightGen), 5).foreach { case (lRows, rRows0) =>
      // unique (k, t) on the right: the operator's documented precondition.
      val rRows = rRows0.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val left = lRows.toDF("k", "t")
      val right = rRows.toDF("k", "t", "v")
      val back = TemporalJoins.asofJoin(left, right, Seq("k"), "t")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getAs[String]("v"))).toMap
      val fwd = TemporalJoins.asofJoinForward(left, right, Seq("k"), "t")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getAs[String]("v"))).toMap
      lRows.distinct.foreach { case (k, t) =>
        val befores = rRows.filter(r => r._1 == k && r._2 <= t)
        val afters = rRows.filter(r => r._1 == k && r._2 >= t)
        val wantBack = if (befores.isEmpty) None else Some(befores.maxBy(_._2)._3)
        val wantFwd = if (afters.isEmpty) None else Some(afters.minBy(_._2)._3)
        assert(back((k, t)) == wantBack, s"backward mismatch at ($k,$t)")
        assert(fwd((k, t)) == wantFwd, s"forward mismatch at ($k,$t)")
      }
    }
  }

  test("tokenChunks covers every token exactly per the window/stride arithmetic") {
    val docGen = for {
      n <- Gen.choose(1, 40)
      window <- Gen.choose(1, 12)
      stride <- Gen.choose(1, 12)
    } yield (n, window, stride)
    samples(docGen, 12).foreach { case (n, window, stride) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = Corpus.tokenChunks(df, "doc_id", "text", window, stride)
        .collect().map(r => (r.getAs[Long]("chunk"), r.getAs[Long]("start_tok"),
          r.getAs[Long]("n_chunk_tokens")))
      // chunk count is the closed-form, starts are stride multiples, and
      // the union of [start, start+len) covers 1..n with no token missed.
      assert(chunks.length == (n - 1) / stride + 1, s"n=$n w=$window s=$stride")
      val covered = chunks.flatMap { case (_, st, len) => st until (st + len) }.toSet
      assert(covered == (1L to n.toLong).toSet || window < stride &&
        covered.subsetOf((1L to n.toLong).toSet),
        s"coverage broken for n=$n w=$window s=$stride")
      if (window >= stride) assert(covered == (1L to n.toLong).toSet)
    }
  }

  test("packSequences fragments equal the driver-side stream walk; tokens conserved") {
    val caseGen = for {
      seqLen <- Gen.choose(1L, 20L)
      ns <- Gen.listOfN(30, Gen.choose(0L, 50L))
    } yield (seqLen, ns)
    samples(caseGen, 8).foreach { case (seqLen, ns) =>
      val rows = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      val df = rows.toDF("doc", "n_tokens")
      val got = Corpus.packSequences(df, col("doc"), col("n_tokens"), seqLen,
          groupSize = 7L)
        .select("doc", "seq", "start_in_seq", "n_seq_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // reference: walk the concatenated stream doc by doc.
      var off = 0L
      val want = rows.flatMap { case (doc, n) =>
        val frags = if (n < 1) Seq.empty else
          (off / seqLen to (off + n - 1) / seqLen).map { seq =>
            val lo = math.max(off, seq * seqLen)
            (doc, seq, lo - seq * seqLen,
              math.min(off + n, (seq + 1) * seqLen) - lo)
          }
        off += n
        frags
      }.toSet
      assert(got == want, s"seqLen=$seqLen ns=$ns")
      // conservation: every token lands in exactly one fragment, and no
      // sequence overflows its budget.
      val bySeq = want.groupBy(_._2).values
      assert(bySeq.forall(_.toSeq.map(_._4).sum <= seqLen))
      assert(want.toSeq.map(_._4).sum == ns.sum)
    }
  }

  test("temperatureMixPlan targets fit the budget; mixSample is the hash rule and nests") {
    val caseGen = for {
      budget <- Gen.choose(0L, 200L)
      counts <- Gen.listOfN(4, Gen.choose(1, 60))
    } yield (budget, counts)
    samples(caseGen, 6).foreach { case (budget, counts) =>
      val rows = counts.zipWithIndex.flatMap { case (c, s) =>
        (0 until c).map(i => (s"s$s-$i", s"st$s"))
      }
      val df = rows.toDF("k", "stratum")
      val plan = Corpus.temperatureMixPlan(df, col("stratum"), budget)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(plan.values.map(_._2).sum <= budget, s"targets exceed budget $budget")
      assert(plan.values.forall { case (_, _, bps) => bps >= 0 && bps <= 10000 })
      val planDf = Corpus.temperatureMixPlan(df, col("stratum"), budget)
      val kept = Corpus.mixSample(df, col("k"), col("stratum"), planDf)
        .select("k").collect().map(_.getString(0)).toSet
      val want = rows.filter { case (k, st) =>
        graft.llmops.PortableHash.hash52Jvm(k) % 10000 < plan(st)._3
      }.map(_._1).toSet
      assert(kept == want)
      // nested: doubling the budget can only ADD rows (stable ablations).
      val plan2 = Corpus.temperatureMixPlan(df, col("stratum"), budget * 2)
      val kept2 = Corpus.mixSample(df, col("k"), col("stratum"), plan2)
        .select("k").collect().map(_.getString(0)).toSet
      assert(kept.subsetOf(kept2), "raising the budget dropped rows")
    }
  }

  test("semDedupPairs equals the driver-side assign-then-pair reference") {
    import graft.llmops.Similarity
    val vecGen = Gen.listOfN(14, Gen.listOfN(4,
      Gen.choose(-1.0, 1.0).map(_.toFloat)))
    samples(vecGen, 6).foreach { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      val df = rows.toDF("vec_id", "embedding")
      val nlist = 3
      val tau = 0.2
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
        dot / (na * nb)
      }
      val cents = rows.filter(_._1 < nlist)
      val cell = rows.map { case (id, v) =>
        id -> cents.map { case (cid, cv) => (cid, cos(v, cv)) }
          .minBy { case (cid, c) => (-c, cid) }._1
      }.toMap
      val want = (for {
        (ia, va) <- rows; (ib, vb) <- rows
        if ia < ib && cell(ia) == cell(ib) && cos(va, vb) >= tau
      } yield (ia, ib, cell(ia))).toSet
      val got = Similarity.semDedupPairs(df, threshold = tau, nlist = nlist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"vecs=${rows.map(_._1)}")
      // subset of the exact quadratic baseline at the same threshold —
      // the only loss is cross-cell pairs, never a wrong pair.
      val allPairs = Similarity.cosinePairs(df, threshold = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.map(p => (p._1, p._2)).subsetOf(allPairs))
    }
  }

  test("mixResample replays the copy rule exactly and is monotone in the budget") {
    val caseGen = for {
      budget <- Gen.choose(0L, 300L)
      counts <- Gen.listOfN(3, Gen.choose(1, 40))
    } yield (budget, counts)
    samples(caseGen, 6).foreach { case (budget, counts) =>
      val rows = counts.zipWithIndex.flatMap { case (c, s) =>
        (0 until c).map(i => (s"s$s-$i", s"st$s"))
      }
      val df = rows.toDF("k", "stratum")
      def emitted(b: Long): Map[String, Long] = {
        val plan = Corpus.temperatureMixPlan(df, col("stratum"), b)
        Corpus.mixResample(df, col("k"), col("stratum"), plan)
          .groupBy("k").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val got = emitted(budget)
      // driver replay of the plan arithmetic and per-row copy rule.
      val plan = Corpus.temperatureMixPlan(df, col("stratum"), budget)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rows.flatMap { case (k, st) =>
        val (c, target) = plan(st)
        val cb = math.floor(10000.0 * target / c).toLong
        val n = cb / 10000 +
          (if (graft.llmops.PortableHash.hash52Jvm(k) % 10000 < cb % 10000) 1L else 0L)
        if (n >= 1) Some(k -> n) else None
      }.toMap
      assert(got == want, s"budget=$budget counts=$counts")
      // per-stratum emitted totals land within one-per-row of the target.
      plan.foreach { case (st, (c, target)) =>
        val n = rows.filter(_._2 == st).map(r => got.getOrElse(r._1, 0L)).sum
        assert(math.abs(n - target) <= c, s"stratum $st: emitted $n target $target")
      }
      // doubling the budget never reduces any row's copy count.
      val got2 = emitted(budget * 2)
      assert(rows.forall { case (k, _) =>
        got2.getOrElse(k, 0L) >= got.getOrElse(k, 0L) }, "copies shrank")
    }
  }

  test("trainingOrder is the exact hash-sort permutation at every bucket count") {
    val keyGen = Gen.listOfN(50, Gen.choose(0L, 100000L)).map(_.distinct)
    samples(keyGen, 5).foreach { keys =>
      val df = keys.map(Tuple1(_)).toDF("k")
      val want = keys.sortBy(k =>
          (graft.llmops.PortableHash.hash52Jvm(k.toString), k))
        .zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
      // bucket counts from degenerate (1 = one giant bucket) to sparse
      // (far more buckets than rows): the rank must never change.
      Seq(1, 16, 1024).foreach { nb =>
        val got = Corpus.trainingOrder(df, col("k"), nBuckets = nb)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"nBuckets=$nb keys=${keys.take(5)}...")
      }
    }
  }

  test("leakageSafeSplit never straddles a cluster and degrades to withSplit") {
    val splits = Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000)
    val docs = (0L until 200L).map(Tuple1(_)).toDF("doc_id")
    // docs 0..49 grouped into clusters of 5 (rep = floor(v/5)*5), the rest
    // singletons — mixes multi-member clusters with the fallback path.
    val clusters = (0L until 50L).map(v => (v, v - v % 5)).toDF("v", "cluster")
    val out = Corpus.leakageSafeSplit(docs, "doc_id", clusters, splits)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 200)
    rows.foreach { case (doc, key, split) =>
      val expectKey = if (doc < 50) doc - doc % 5 else doc
      assert(key == expectKey, s"doc=$doc")
      val b = graft.llmops.PortableHash.hash52Jvm(expectKey.toString) % 10000
      val want = if (b < 8000) "train" else if (b < 9000) "valid" else "test"
      assert(split == want, s"doc=$doc")
    }
    // the audit invariant: one split per split_key, so cluster members
    // (sharing a key) can never straddle a boundary
    assert(out.groupBy("split_key").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).isEmpty)
    // empty cluster table ⇒ exactly withSplit
    val degen = Corpus.leakageSafeSplit(docs, "doc_id",
        Seq.empty[(Long, Long)].toDF("v", "cluster"), splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = Corpus.withSplit(docs, col("doc_id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(degen == plain)
  }

  test("winnowing equals the window-min reference; shared runs share a fingerprint") {
    import graft.llmops.{PortableHash, TextAnalysis}
    val docGen = Gen.zip(Gen.choose(0, 30), Gen.choose(0, 30))
    samples(docGen, 6).foreach { case (n1, n2) =>
      // a shared run of exactly w + k - 1 = 6 tokens at different offsets:
      // the winnowing guarantee says both docs select its window-min gram.
      val shared = (0 until 6).map(i => s"sh$i")
      val d1 = ((0 until n1).map(i => s"a$i") ++ shared).mkString(" ")
      val d2 = (shared ++ (0 until n2).map(i => s"b$i")).mkString(" ")
      val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      val got = TextAnalysis.winnowing(df, "doc_id", "text", k = 3, w = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def ref(doc: Long, toks: Seq[String]): Set[(Long, Long, Long)] = {
        val grams = toks.sliding(3).filter(_.size == 3).zipWithIndex
          .map { case (g, p) => (p.toLong, PortableHash.hash52Jvm(g.mkString(" "))) }
          .toSeq
        if (grams.isEmpty) Set.empty
        else {
          val starts = if (grams.size < 4) Seq(0) else 0 to (grams.size - 4)
          starts.map { s =>
            val (p, h) = grams.slice(s, s + 4).minBy { case (p, h) => (h, p) }
            (doc, p, h)
          }.toSet
        }
      }
      val want = ref(1L, d1.split(" ").toSeq) ++ ref(2L, d2.split(" ").toSeq)
      assert(got == want, s"n1=$n1 n2=$n2")
      val f1 = got.collect { case (1L, _, f) => f }
      val f2 = got.collect { case (2L, _, f) => f }
      assert(f1.intersect(f2).nonEmpty, "shared run produced no common fingerprint")
    }
  }

  test("heavyHitters equals the exact two-agg answer for every k") {
    import graft.functions.CountMin
    val tokGen = Gen.listOfN(400, Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      2 -> Gen.choose(0, 80).map(i => s"tail$i")))
    samples(tokGen, 4).foreach { toks =>
      val df = toks.map(Tuple1(_)).toDF("token")
      Seq(2, 8, 64).foreach { k =>
        val got = CountMin.heavyHitters(df, "token", k, w = 32)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val n = toks.size
        val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
          .filter { case (_, c) => c * k > n }.toMap
        assert(got == want, s"k=$k")
      }
    }
  }

  test("perGroup quantiles equal the driver-side sorted-rank reference") {
    val groupGen = Gen.listOfN(60, for {
      g <- Gen.choose(0L, 3L); v <- Gen.choose(-100L, 100L)
    } yield (g, v))
    samples(groupGen, 5).foreach { rows =>
      val df = rows.toDF("k", "v")
      val got = Quantiles.perGroup(df, Seq("k"), "v", Seq(0, 25, 50, 75, 100))
        .collect().map(r => r.getLong(0) ->
          Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val sorted = grp.map(_._2).sorted
        val want = Seq(0, 25, 50, 75, 100)
          .map(p => sorted(((sorted.size - 1) * p / 100.0).toInt))
        assert(got(g) == want, s"group $g: got ${got(g)} want $want")
      }
    }
  }
}
