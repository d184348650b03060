package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ScalaCheck properties over the transform/serde/fingerprint surfaces —
  * generated inputs catch the encodings hand-written cases miss (quotes,
  * newlines, unicode, negatives, empty strings).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, min: Int = 15): Unit = {
    val r = SCTest.check(p)(_.withMinSuccessfulTests(min))
    assert(r.passed, r.status.toString)
  }

  test("truncate[W] is idempotent, a lower multiple of W, within W of input") {
    check(Prop.forAll(Gen.chooseNum(-100000L, 100000L),
        Gen.chooseNum(1, 1000)) { (v, w) =>
      val t = Seq(v).toDF("v")
        .select(Transform.Truncate(w)(col("v"), LongType)).as[Long].head()
      t % w == 0 && t <= v && v - t < w
    })
  }

  test("bucket[N] is always in [0, N) for arbitrary longs") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
        Gen.chooseNum(1, 64)) { (v, n) =>
      val b = Seq(v).toDF("v")
        .select(Transform.Bucket(n)(col("v"), LongType)).as[Int].head()
      b >= 0 && b < n
    }, min = 10)
  }

  test("iceberg bucket is always in [0, N) and int/long consistent") {
    check(Prop.forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue),
        Gen.chooseNum(1, 64)) { (v, n) =>
      val bi = Seq(v).toDF("v")
        .select(IcebergBucketing.icebergBucket(spark, col("v"), n)).as[Int].head()
      val bl = Seq(v.toLong).toDF("v")
        .select(IcebergBucketing.icebergBucket(spark, col("v"), n)).as[Int].head()
      bi == bl && bi >= 0 && bi < n
    }, min = 10)
  }

  test("murmur3 kernel matches Guava's independent implementation") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    import com.google.common.hash.Hashing
    val guava = Hashing.murmur3_32_fixed(0)
    check(forAll(Gen.long) { v =>
      // Guava hashLong is little-endian over 8 bytes, seed 0 — exactly the
      // Iceberg spec's bucket hash input
      IcebergBucketing.hashLong(v) == guava.hashLong(v).asInt()
    })
    check(forAll(Gen.asciiPrintableStr) { s =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      IcebergBucketing.murmur3(bytes) == guava.hashBytes(bytes).asInt()
    })
  }

  test("splitmix64 finalizer matches published test vectors") {
    // fixed vectors cross-computed against an independent u64 reference
    // (python arbitrary-precision arithmetic); unsigned values shown in
    // comments, stored as the equivalent two's-complement longs
    assert(VectorExpressions.mix64(97L) ==
      -5836808829438595943L) // 12609935244270955673
    assert(VectorExpressions.mix64(1234567890123456789L) ==
      -4020178596217861550L) // 14426565477491690066
    assert(VectorExpressions.mix64(0L) == 0L) // splitmix64 fixed point at 0
  }

  test("json serde round-trips hostile strings (quotes, newlines, unicode)") {
    val hostile = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("""he said "hi"""", "line1\nline2", "tab\there",
        "unicode: é中文", "back\\slash", "", "{\"fake\":1}"))
    check(Prop.forAll(Gen.chooseNum(0L, 1000L), hostile) { (id, s) =>
      val serde = JsonSerDe(schema =
        Some(StructType.fromDDL("id BIGINT, txt STRING")))
      val df = Seq((id, s)).toDF("id", "txt")
      val back = serde.deserialize(serde.serialize(df))
        .as[(Long, String)].head()
      back == ((id, s))
    }, min = 25)
  }

  test("blob serde round-trips hostile strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val serde = BlobSerDe(schema = Some(StructType.fromDDL("txt STRING")))
      val df = Seq(Tuple1(s)).toDF("txt")
      serde.deserialize(serde.serialize(df)).as[String].head() == s
    }, min = 15)
  }

  test("mulmodM61 matches arbitrary-precision arithmetic over the full range") {
    val M = VectorExpressions.M61
    check(Prop.forAll(Gen.chooseNum(0L, M - 1), Gen.chooseNum(0L, M - 1)) {
      (a, b) =>
        VectorExpressions.mulmodM61(a, b) ==
          (BigInt(a) * BigInt(b) % BigInt(M)).toLong
    }, min = 500)
  }

  test("codepoint fingerprint stays in [0, 2^61-1) on arbitrary strings") {
    check(Prop.forAll(Gen.oneOf(Gen.alphaNumStr,
        Gen.oneOf("", "é中文", "a b c", "\n\t"))) { s =>
      val fp = VectorExpressions.codepointFp(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      fp >= 0 && fp < VectorExpressions.M61
    }, min = 50)
  }

  test("fingerprint is deterministic and respects the modulus") {
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val df = Seq((1L, s)).toDF("doc_id", "text")
      val a = TextAnalysis.fingerprints(df).select("fp").as[Long].head()
      val b = TextAnalysis.fingerprints(df).select("fp").as[Long].head()
      a == b && a >= 0 && a < 1000000007L
    }, min = 15)
  }

  private val eventsGen: Gen[Seq[(Long, java.sql.Timestamp, String)]] =
    Gen.listOf(for {
      u <- Gen.chooseNum(1L, 5L)
      sec <- Gen.chooseNum(0L, 86400L)
      t <- Gen.oneOf("signup", "click", "purchase", "view")
    } yield (u, new java.sql.Timestamp(1700000000000L + sec * 1000), t))

  test("funnel step counts are monotonically non-increasing") {
    check(Prop.forAll(eventsGen) { evs =>
      val df = evs.toDF("user_id", "ts", "event_type")
      val counts = EventAnalytics.funnel(df)
        .orderBy("step_idx").select("users").as[Long].collect().toSeq
      counts.size == 3 && counts.sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      }
    }, min = 10)
  }

  test("domain KL is non-negative for arbitrary corpora") {
    val docsGen = Gen.nonEmptyListOf(for {
      src <- Gen.oneOf("s1", "s2", "s3")
      toks <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
    } yield (src, toks.mkString(" ")))
    check(Prop.forAll(docsGen) { docs =>
      val df = docs.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, t, "en", s) }
        .toDF("doc_id", "text", "lang", "source")
      // mathematically >= 0; allow the 9-dp per-term rounding its dust
      TextAnalysis.domainKl(df).select("kl").as[Double].collect()
        .forall(_ >= -1e-6)
    }, min = 10)
  }

  test("semantic dedup with cells never drops a vector the exact form keeps") {
    val vecsGen = Gen.nonEmptyListOf(
      Gen.listOfN(4, Gen.chooseNum(-5, 5)).map(_.map(_.toFloat)))
      .map(_.filter(_.exists(_ != 0f)).zipWithIndex)
      .suchThat(_.size >= 2)
    check(Prop.forAll(vecsGen) { vecs =>
      val df = vecs.map { case (v, i) => (i.toLong, v.toArray, 0) }
        .toDF("vec_id", "embedding", "label")
      def keptSet(nlist: Int) =
        Dedup.semanticDedup(df, nlist = nlist, threshold = 0.9)
          .filter(col("kept")).select("vec_id").as[Long].collect().toSet
      // within-cell comparisons are a subset of all-pairs comparisons,
      // so every exact-form survivor must survive the cell form too
      keptSet(1).subsetOf(keptSet(2))
    }, min = 5)
  }

  // shared corpus generator for the text-operator properties: unique ids,
  // short docs over a tiny alphabet so duplicates/collisions actually occur
  private val corpusGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "aa", "bb")).map(_.mkString(" ")))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) })
    .suchThat(_.nonEmpty)

  test("substring dedup: counts bounded, ratio consistent, clones fully dup") {
    check(Prop.forAll(corpusGen) { docs =>
      val r = Dedup.substringDedup(docs.toDF("doc_id", "text"), w = 2)
        .select("doc_id", "n_windows", "n_dup", "dup_ratio")
        .as[(Long, Long, Long, Double)].collect()
      r.length == docs.size && r.forall { case (_, nw, nd, ratio) =>
        nw >= 1 && nd >= 0 && nd <= nw &&
          math.abs(ratio - nd.toDouble / nw) < 1e-12
      }
    }, min = 8)
    // a verbatim clone pair: every window of both docs is cross-doc shared
    val cloned = Seq((1L, "x y z w"), (2L, "x y z w"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val ratios = Dedup.substringDedup(cloned, w = 2)
      .orderBy("doc_id").select("dup_ratio").as[Double].collect().toSeq
    assert(ratios == Seq(1.0, 1.0, 0.0), s"got $ratios")
  }

  test("clean paragraphs: kept spans across the corpus = distinct fingerprints") {
    check(Prop.forAll(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val agg = Dedup.cleanParagraphs(df, maxParaTokens = 2)
        .select("n_paras", "n_kept").as[(Long, Long)].collect()
      val distinctFps = Dedup.paragraphs(df, maxParaTokens = 2)
        .select("fp").distinct().count()
      agg.forall { case (np, nk) => nk >= 0 && nk <= np } &&
        agg.map(_._2).sum == distinctFps
    }, min = 8)
  }

  test("token entropy: within [0, ln(n_distinct)], ttr exact") {
    check(Prop.forAll(corpusGen) { docs =>
      val r = TextAnalysis.tokenEntropy(docs.toDF("doc_id", "text"))
        .select("n_tokens", "n_distinct", "entropy", "ttr")
        .as[(Long, Long, Double, Double)].collect()
      r.forall { case (n, d, h, ttr) =>
        h >= -1e-9 && h <= math.log(d.toDouble) + 1e-9 &&
          math.abs(ttr - BigDecimal(d.toDouble / n).setScale(9,
            BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12
      }
    }, min = 8)
  }

  test("changelog fold reconstructs the head for random op sequences") {
    // THE changelog invariant: inserts minus deletes (keyed by id) at any
    // point equals the table the versioned commits produced. Exercises
    // randomized interleavings of appends, predicate deletes, and
    // key-list deletes that the hand-written cases cannot enumerate.
    val rnd = new scala.util.Random(421983L)
    (1 to 3).foreach { round =>
      val wh = TestSpark.tmpDir(s"chg_prop_$round")
      val sink = new TableSink(SinkConfig(tableName = "t",
        warehousePath = wh, versioned = true,
        partitionSpec = Seq(PartitionField("cat", Transform.Identity))))
      var nextId = 0L
      (1 to 8).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 | 1 => // append 1-4 rows (appends twice as likely)
            val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
              nextId += 1
              (nextId, if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(100).toDouble)
            }
            sink.append(rows.toDF("id", "cat", "v"))
          case 2 if sink.snapshotVersions().nonEmpty =>
            if (rnd.nextBoolean())
              sink.deleteWhere(s"v < ${rnd.nextInt(60)}.0")
            else if (nextId > 0)
              sink.deleteKeys(
                Seq(1L + rnd.nextInt(nextId.toInt).toLong).toDF("id"),
                Seq("id"))
          case _ => ()
        }
      }
      if (sink.snapshotVersions().nonEmpty) {
        val head = sink.snapshotVersions().last
        val chg = sink.readChangelog(spark, 0, head)
          .select($"id", $"_change_type").as[(Long, String)].collect()
        val folded = chg.groupBy(_._1).collect {
          case (id, evs)
            if evs.count(_._2 == "insert") > evs.count(_._2 == "delete") => id
        }.toSet
        val live = sink.read(spark).select($"id").as[Long].collect().toSet
        assert(folded == live,
          s"round $round: fold=$folded live=$live versions=${sink.snapshotVersions()}")
      }
    }
  }

  test("changelog fold reconstructs the head across the MoR MUTATION " +
    "family for random op sequences (round-13)") {
    // Same invariant as above — per-id insert count minus delete count at
    // the head equals the live table — but the op mix now includes the
    // merge-on-read mutations whose changelog emission is composite:
    // upsertMor (one version carrying the old row's position-delete AND
    // the replacement insert; a fresh or previously-deleted key degrades
    // to a plain append — the round-13 empty-sidecar fix), updateMor
    // (delete+insert per matched row), and consolidateDeletes (a history
    // rewrite: the fold afterwards replays the collapsed base). Random
    // interleavings reach states the deterministic specs cannot
    // enumerate: update-after-delete, upsert-of-deleted-key,
    // consolidate-mid-mutation-stack, repeated updates of one key.
    val rnd = new scala.util.Random(731942L)
    (1 to 3).foreach { round =>
      val wh = TestSpark.tmpDir(s"chg_mor_prop_$round")
      val sink = new TableSink(SinkConfig(tableName = "t",
        warehousePath = wh, versioned = true,
        partitionSpec = Seq(PartitionField("cat", Transform.Identity))))
      var nextId = 0L
      def freshRows(n: Int) = (0 until n).map { _ =>
        nextId += 1
        (nextId, if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(100).toDouble)
      }
      (1 to 9).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 => sink.append(freshRows(1 + rnd.nextInt(3)).toDF("id", "cat", "v"))
          case 2 if sink.snapshotVersions().nonEmpty =>
            if (rnd.nextBoolean())
              sink.deleteWhere(s"v < ${rnd.nextInt(60)}.0")
            else if (nextId > 0)
              sink.deleteKeys(
                Seq(1L + rnd.nextInt(nextId.toInt).toLong).toDF("id"),
                Seq("id"))
          case 3 if nextId > 0 => // keyed upsert: existing + fresh ids
            val existing = (0 until 1 + rnd.nextInt(2))
              .map(_ => 1L + rnd.nextInt(nextId.toInt).toLong).distinct
              .map(id => (id, if (rnd.nextBoolean()) "a" else "b",
                500.0 + rnd.nextInt(100)))
            sink.upsertMor(
              (existing ++ freshRows(1)).toDF("id", "cat", "v"), Seq("id"))
          case 4 if sink.snapshotVersions().nonEmpty =>
            sink.updateMor(spark, col("v") < lit(rnd.nextInt(80).toDouble),
              Seq("v" -> (col("v") + 1000.0)))
          case 5 if sink.snapshotVersions().nonEmpty =>
            sink.consolidateDeletes(spark)
          case _ => ()
        }
      }
      if (sink.snapshotVersions().nonEmpty) {
        // readChangelogAll, not readChangelog(0, head): consolidation
        // collapses history to a single sidecar-carrying base commit,
        // whose delete replay has no predecessor — the ALL surface folds
        // that base state as inserts (its documented contract); the
        // range surface refuses it by design
        val chg = sink.readChangelogAll(spark)
          .select($"id", $"_change_type").as[(Long, String)].collect()
        val folded = chg.groupBy(_._1).collect {
          case (id, evs)
            if evs.count(_._2 == "insert") > evs.count(_._2 == "delete") => id
        }.toSet
        val live = sink.read(spark).select($"id").as[Long].collect().toSet
        assert(folded == live,
          s"round $round: fold=$folded live=$live versions=${sink.snapshotVersions()}")
        // the VALUES must fold too, not just the membership: the newest
        // insert per live id equals the live row (catches a replay that
        // emits a stale replacement)
        val lastIns = sink.readChangelogAll(spark)
          .filter($"_change_type" === "insert")
          .groupBy($"id").agg(max(struct($"_change_version", $"v")).as("s"))
          .select($"id", $"s.v".as("v")).as[(Long, Double)].collect().toMap
        val liveRows = sink.read(spark).select($"id", $"v")
          .as[(Long, Double)].collect().toMap
        liveRows.foreach { case (id, v) =>
          assert(lastIns.get(id).contains(v),
            s"round $round id $id: live v=$v newest changelog insert=${lastIns.get(id)}")
        }
      }
    }
  }

  test("changelog fold reconstructs the head across the MoR mutation " +
    "family INTERLEAVED WITH SCHEMA EVOLUTION for random op sequences " +
    "(round-14)") {
    // The same two invariants as the MoR property — changelog-fold
    // membership equals live membership, and the newest insert per live
    // id carries the live value — but the op alphabet now includes the
    // SQL door's schema evolution: ADD COLUMNS, RENAME COLUMN (of the
    // value column — every subsequent op and both invariants switch to
    // the new name), WIDEN (int->bigint on an added column), and DROP
    // (of a previously-added scratch column). Three of round-13's four
    // bugs were evolution x something interactions; random interleavings
    // reach rename-over-pending-sidecar, widen-mid-history,
    // drop-after-upsert and the other cells the deterministic specs
    // cannot enumerate. Evolution ops that the engine REFUSES by
    // contract (DROP of a sidecar-referenced column) are caught and
    // skipped — the property exercises the legal alphabet.
    val rnd = new scala.util.Random(902177L)
    var specFlips = 0      // proof the spec-evolution op fires (asserted)
    var postFlipCommits = 0 // ...and that commits land on a flipped spine
    (1 to 2).foreach { round =>
      val wh = TestSpark.tmpDir(s"chg_evo_prop_$round")
      val cat = s"gevo$round"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT, cat STRING, v DOUBLE) " +
        "TBLPROPERTIES('versioned'='true')")
      // PARTITION-SPEC evolution rides in the alphabet too (round-14,
      // the verdict's "(and spec evolution)"): the sink var flips
      // between unpartitioned and identity-on-cat, so later file
      // generations land under a different directory spine — the
      // mixed-spine read/changelog/mutation paths round-13 built get
      // exercised against every other op, not just the deterministic
      // PartitionEvolutionSpec fixtures.
      val baseCfg = SinkConfig(tableName = "t",
        warehousePath = wh, versioned = true)
      var sink = new TableSink(baseCfg)
      var specIdentity = false
      var vName = "v"              // the value column's CURRENT name
      var renameGen = 0
      var addGen = 0
      // scratch columns currently declared: name -> widened?
      val scratch = scala.collection.mutable.LinkedHashMap[String, Boolean]()
      var nextId = 0L
      def freshRows(n: Int) = (0 until n).map { _ =>
        nextId += 1
        (nextId, if (rnd.nextBoolean()) "a" else "b",
          rnd.nextInt(100).toDouble)
      }
      // every batch carries the CURRENT declared shape (the keyed-apply
      // alignment contract), scratch columns included
      def mkBatch(rows: Seq[(Long, String, Double)]) =
        scratch.foldLeft(rows.toDF("id", "cat", vName)) {
          case (d, (name, wide)) => d.withColumn(name,
            lit(rnd.nextInt(1000)).cast(if (wide) "bigint" else "int"))
        }
      (1 to 14).foreach { _ =>
        rnd.nextInt(11) match {
          case 0 | 1 =>
            sink.append(mkBatch(freshRows(1 + rnd.nextInt(3))))
            if (specFlips > 0) postFlipCommits += 1
          case 2 if sink.snapshotVersions().nonEmpty =>
            if (rnd.nextBoolean())
              sink.deleteWhere(s"$vName < ${rnd.nextInt(60)}.0")
            else if (nextId > 0)
              sink.deleteKeys(
                Seq(1L + rnd.nextInt(nextId.toInt).toLong).toDF("id"),
                Seq("id"))
          case 3 if nextId > 0 =>
            val existing = (0 until 1 + rnd.nextInt(2))
              .map(_ => 1L + rnd.nextInt(nextId.toInt).toLong).distinct
              .map(id => (id, if (rnd.nextBoolean()) "a" else "b",
                500.0 + rnd.nextInt(100)))
            sink.upsertMor(mkBatch(existing ++ freshRows(1)), Seq("id"))
          case 4 if sink.snapshotVersions().nonEmpty =>
            sink.updateMor(spark,
              col(vName) < lit(rnd.nextInt(80).toDouble),
              Seq(vName -> (col(vName) + 1000.0)))
          case 5 if sink.snapshotVersions().lastOption
              .exists(sink.hasPendingDeletes) =>
            sink.consolidateDeletes(spark)
          case 6 => // ADD a scratch column
            addGen += 1
            spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (s$addGen INT)")
            scratch(s"s$addGen") = false
          case 7 if renameGen < 2 => // RENAME the value column
            renameGen += 1
            val nw = s"v$renameGen$round"
            spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN $vName TO $nw")
            vName = nw
          case 8 if scratch.exists(!_._2) => // WIDEN a scratch column
            val name = scratch.collectFirst { case (n, false) => n }.get
            spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN $name TYPE BIGINT")
            scratch(name) = true
          case 9 if scratch.nonEmpty => // DROP a scratch column
            val name = scratch.keys.toSeq(rnd.nextInt(scratch.size))
            // legal refusal when a pending sidecar references it — the
            // scratch columns never appear in predicates/keys, so this
            // drop is always sidecar-clean; refusals here would be bugs
            spark.sql(s"ALTER TABLE $cat.t DROP COLUMN $name")
            scratch.remove(name)
          case 10 => // FLIP the partition spec (mixed-spine generations)
            specIdentity = !specIdentity
            specFlips += 1
            sink = new TableSink(baseCfg.copy(partitionSpec =
              if (specIdentity)
                Seq(PartitionField("cat", Transform.Identity))
              else Nil))
          case _ => ()
        }
      }
      if (sink.snapshotVersions().nonEmpty) {
        val chg = sink.readChangelogAll(spark)
          .select($"id", $"_change_type").as[(Long, String)].collect()
        val folded = chg.groupBy(_._1).collect {
          case (id, evs)
            if evs.count(_._2 == "insert") > evs.count(_._2 == "delete") => id
        }.toSet
        val live = sink.read(spark).select($"id").as[Long].collect().toSet
        assert(folded == live,
          s"round $round: fold=$folded live=$live " +
            s"versions=${sink.snapshotVersions()} vName=$vName")
        // the VALUES fold under the CURRENT name — pre-rename inserts
        // replay under it (the rename-map fold), post-widen reads
        // upcast, and the newest insert per live id equals the live row
        val lastIns = sink.readChangelogAll(spark)
          .filter($"_change_type" === "insert")
          .groupBy($"id")
          .agg(max(struct($"_change_version", col(vName).as("vv"))).as("s"))
          .select($"id", $"s.vv".as("vv")).as[(Long, Double)]
          .collect().toMap
        val liveRows = sink.read(spark).select($"id", col(vName))
          .as[(Long, Double)].collect().toMap
        liveRows.foreach { case (id, v) =>
          assert(lastIns.get(id).contains(v),
            s"round $round id $id: live $vName=$v newest changelog " +
              s"insert=${lastIns.get(id)}")
        }
      }
    }
    // the seed must actually exercise the new alphabet cell: at least
    // one spec flip AND at least one commit landing on a flipped spine
    // (otherwise the extension silently tests nothing — change the seed)
    assert(specFlips >= 1 && postFlipCommits >= 1,
      s"seed never exercised spec evolution: flips=$specFlips " +
        s"postFlipCommits=$postFlipCommits")
  }

  test("bigram LM: every log score non-positive, oov bounded by count") {
    // scores are probabilities ≤ 1 by construction: c2(prev,cur) ≤ c1(prev)
    // (non-final occurrences of prev), and backoff 0.4·c1(cur)/total < 1
    check(Prop.forAll(corpusGen.suchThat(ds =>
        ds.exists(_._1 % 2 == 0) && ds.exists(_._1 % 2 == 1))) { docs =>
      val r = TextAnalysis.bigramLm(docs.toDF("doc_id", "text"))
        .select("n_bigrams", "oov_bigrams", "avg_logp")
        .as[(Long, Long, Double)].collect()
      r.forall { case (n, oov, lp) =>
        n >= 1 && oov >= 0 && oov <= n && lp <= 1e-9
      }
    }, min = 8)
  }
}
