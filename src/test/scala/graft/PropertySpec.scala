package graft

import java.time.LocalDate

import graft.operators.{Maintenance, Shred}
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (SURVEY §5 item 2): the merge algebra's
  * idempotency under replay — the reference's whole late-data design
  * bet — plus window-planner tiling and tz-conversion DST pins.
  */
class PropertySpec extends SparkSpec {

  private def holds(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("planWindows tiles [begin, end) exactly: no gaps, no overlap, clipped tail") {
    val gen = for {
      startDay <- Gen.choose(0L, 20000L)
      len <- Gen.choose(1L, 400L)
      break <- Gen.choose(1, 45)
    } yield (LocalDate.ofEpochDay(startDay), LocalDate.ofEpochDay(startDay + len), break)
    holds(Prop.forAll(gen) { case (b, e, brk) =>
      val ws = Ingest.planWindows(b, e, brk)
      val contiguous = ws.sliding(2).forall {
        case Seq(x, y) => x.endExclusive == y.start
        case _ => true
      }
      ws.head.start == b.toString && ws.last.endExclusive == e.toString &&
        contiguous &&
        ws.forall(w => LocalDate.parse(w.start).isBefore(LocalDate.parse(w.endExclusive)))
    }, n = 100)
  }

  test("collapseLoadTargets is idempotent and order-preserving") {
    val name = Gen.oneOf(
      Gen.choose(1, 99).map(i => s"all_contacts_$i.json"),
      Gen.oneOf("forms.json", "qa_contacts.json", "evals.json", "comments.json"))
    holds(Prop.forAll(Gen.listOf(name)) { names =>
      val once = Ingest.collapseLoadTargets(names)
      Ingest.collapseLoadTargets(once) == once && once.distinct == once
    }, n = 100)
  }

  test("insertOnlyMerge: replay-idempotent and key-unique over random batches") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(12,
      for { k <- Gen.choose(0L, 9L); v <- Gen.choose(0, 999) } yield (k, v))
    holds(Prop.forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v").dropDuplicates("k")
      val once = Maintenance.insertOnlyMerge(target, source, Seq("k"))
      val twice = Maintenance.insertOnlyMerge(once, source, Seq("k"))
      val onceRows = once.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val twiceRows = twice.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val targetRows = target.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      onceRows == twiceRows &&
        onceRows.map(_._1).size == onceRows.size && // unique keys
        targetRows.subsetOf(onceRows) // target rows always survive
    }, n = 10)
  }

  test("mergeAdditive(agg(a), agg(b)) == agg(a union b), null group keys included") {
    import graft.operators.Incremental
    import spark.implicits._
    // null keys MUST merge to one group (groupBy semantics) — the
    // null-safe-join property a plain equi-join merge violates
    val keyGen = Gen.frequency(6 -> Gen.choose(0L, 6L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    val rowsGen = Gen.listOfN(40,
      for { k <- keyGen; v <- Gen.choose(0, 99) } yield (k, v))
    holds(Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      val agg = (rows: List[(Option[Long], Int)]) => rows.toDF("k", "v")
        .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v").cast("long")).as("s"))
      val key = (r: org.apache.spark.sql.Row) =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1), r.getLong(2))
      val merged = Incremental.mergeAdditive(agg(a), agg(b), Seq("k"), Seq("n", "s"))
        .collect().map(key).toSet
      val full = agg(a ++ b).collect().map(key).toSet
      merged == full
    }, n = 10)
  }

  test("upsertKeepCols: result keys = key union; kept col from target on match") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(10,
      for { k <- Gen.choose(0L, 7L); v <- Gen.choose(0, 999); w <- Gen.choose(0, 999) }
        yield (k, v, w))
    holds(Prop.forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("k", "v", "keep").dropDuplicates("k")
      val source = s.toDF("k", "v", "keep").dropDuplicates("k")
      val out = Maintenance.upsertKeepCols(target, source, Seq("k"), Set("keep"))
      val o = out.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      val tm = target.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      val sm = source.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      o.keySet == (tm.keySet ++ sm.keySet) &&
        o.forall { case (k, (v, keep)) =>
          (tm.get(k), sm.get(k)) match {
            case (Some((_, tk)), Some((sv, _))) => v == sv && keep == tk // matched
            case (Some((tv, tk)), None) => v == tv && keep == tk // target-only
            case (None, Some((sv, sk))) => v == sv && keep == sk // inserted
            case _ => false
          }
        }
    }, n = 10)
  }

  test("rollingZScore: cold start unflaggable, spike flagged, post-spike value absorbed") {
    import java.sql.Timestamp
    import graft.operators.Queries
    import spark.implicits._
    // one user, hourly events: 6 constant values, a spike, then a
    // return to constant (whose window now CONTAINS the spike, so its
    // variance absorbs the deviation)
    val vals = Seq(10.00, 10.00, 10.00, 10.00, 10.00, 10.00, 99.99, 10.00)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), 7L, v)
    }
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    val got = Queries.rollingZScore(df).orderBy("event_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // events 0-4: fewer than 5 prior points → never flagged
    assert(got.take(5).forall(!_._3))
    assert(got(5) == (5L, 5L, false)) // constant history, constant value
    // the spike: zero prior variance, any deviation → anomalous
    assert(got(6) == (6L, 6L, true))
    // back to 10.00: the spike inflates the window variance enough
    // that an ordinary value is NOT anomalous
    assert(got(7) == (7L, 7L, false))
  }

  test("saltedJoin equals the unsalted join under heavy key skew") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i)).toDF("k", "v")
    val small = Seq((42L, "hot"), (1L, "a"), (3L, "c"), (99L, "unmatched")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = graft.operators.Skew.saltedJoin(big, small, "k", 8).select("k", "v", "name")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // left joins preserve unmatched big rows too
    val plainL = big.join(small, Seq("k"), "left").select("k", "v", "name")
    val saltedL = graft.operators.Skew.saltedJoin(big, small, "k", 8, "left").select("k", "v", "name")
    assert(saltedL.exceptAll(plainL).count() === 0)
    assert(plainL.exceptAll(saltedL).count() === 0)
    // right/full joins would replicate unmatched small rows per salt:
    // refused, not silently wrong
    intercept[IllegalArgumentException](
      graft.operators.Skew.saltedJoin(big, small, "k", 8, "right"))
  }

  test("hybridSkewJoin equals the plain join; only hot keys ride the salted path") {
    import spark.implicits._
    // one genuinely hot key (42: ~1800 rows), a uniform tail, and
    // null keys sprinkled in — nulls must take the cold path and obey
    // plain-join semantics on both join types
    val big = (1 to 2000).map { i =>
      val k: java.lang.Long =
        if (i % 10 == 0) java.lang.Long.valueOf(i.toLong % 7)
        else if (i % 501 == 0) null
        else java.lang.Long.valueOf(42L)
      (k, i)
    }.toDF("k", "v")
    val small = Seq((42L, "hot"), (1L, "a"), (3L, "c"), (99L, "unmatched")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt).select("k", "v", "name")
      val hybrid = graft.operators.Skew
        .hybridSkewJoin(big, small, "k", saltFactor = 8, hotMinRows = 100, jt)
        .select("k", "v", "name")
      assert(hybrid.exceptAll(plain).count() === 0, s"$jt: extra rows")
      assert(plain.exceptAll(hybrid).count() === 0, s"$jt: missing rows")
    }
    // threshold above every key's count → pure cold path, still equal
    val allCold = graft.operators.Skew
      .hybridSkewJoin(big, small, "k", 8, hotMinRows = 1000000L)
      .select("k", "v", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    assert(allCold.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(allCold).count() === 0)
  }

  test("cmSkewJoin: sketch-driven split equals the plain join, both routes used") {
    import spark.implicits._
    // same heavy-tailed fixture as the hybrid test: hot key 42, a
    // uniform tail, nulls sprinkled in
    val big = (1 to 2000).map { i =>
      val k: java.lang.Long =
        if (i % 10 == 0) java.lang.Long.valueOf(i.toLong % 7)
        else if (i % 501 == 0) null
        else java.lang.Long.valueOf(42L)
      (k, i)
    }.toDF("k", "v")
    val small = Seq((42L, "hot"), (1L, "a"), (3L, "c"), (99L, "unmatched")).toDF("k", "name")
    val depth = 5; val width = 64
    val cm = new graft.operators.Sketches.CountMin(depth, width)
    val sketch = big.select(col("k").cast("string")).where(col("k").isNotNull)
      .as[String].select(cm.toColumn).head()
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt).select("k", "v", "name")
      val got = graft.operators.Skew
        .cmSkewJoin(big, small, "k", sketch, depth, width,
          hotMinRows = 100, saltFactor = 8, jt)
        .select("k", "v", "name")
      assert(got.exceptAll(plain).count() === 0, s"$jt: extra rows")
      assert(plain.exceptAll(got).count() === 0, s"$jt: missing rows")
    }
    // ≥-true polarity: the sketch estimate for the hot key can never
    // undercount, so it MUST route hot at any threshold ≤ true count
    val est42 = graft.expressions.HashOps.cmEstimate(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sketch),
      org.apache.spark.unsafe.types.UTF8String.fromString("42"), depth, width)
    assert(est42 >= big.where(col("k") === 42).count(),
      "CM estimates never undercount — the no-missed-hot-key guarantee")
    // a threshold above every count degenerates to the pure cold path
    val allCold = graft.operators.Skew
      .cmSkewJoin(big, small, "k", sketch, depth, width,
        hotMinRows = 1000000L, saltFactor = 8)
      .select("k", "v", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    assert(allCold.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(allCold).count() === 0)
  }

  test("qualityFilterMultilang: fluent non-English passes, gibberish still fails") {
    import spark.implicits._
    val docs = Seq(
      // fluent German function-word text: zero English stopwords, so the
      // English-only gate rejects it; the de marker floor admits it
      (1L, "der Hund und die Katze sind im Haus und das ist gut so und der Tag ist lang"),
      // fluent English
      (2L, "the cat and the dog are in the house and it is a good day for a walk"),
      // marker-free gibberish fails every language's floor
      (3L, "zzz qqq xxx www yyy vvv kkk jjj hhh ggg fff ddd sss aaa bbb ccc")
    ).toDF("doc_id", "text")
    val en = graft.operators.TextOps.qualityFilter(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(en === Set(2L))
    val multi = graft.operators.TextOps.qualityFilterMultilang(docs)
      .select("doc_id", "lang_guess", "passes_en_floor")
      .as[(Long, String, Boolean)].collect().toSeq.sortBy(_._1)
    assert(multi.map(_._1) === Seq(1L, 2L))
    assert(multi === Seq((1L, "de", false), (2L, "en", true)))
  }

  test("qualityFilter: tightening any threshold shrinks the kept set") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").cache()
    def kept(minT: Int, maxP: Int, minS: Int): Set[Long] =
      graft.operators.TextOps.qualityFilter(docs, minT, maxP, minS)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val gen = for {
      minT <- Gen.choose(0, 40)
      maxP <- Gen.choose(0, 300)
      minS <- Gen.choose(0, 120)
      dT <- Gen.choose(0, 20)
      dP <- Gen.choose(0, 100)
      dS <- Gen.choose(0, 40)
    } yield (minT, maxP, minS, dT, dP, dS)
    holds(Prop.forAll(gen) { case (minT, maxP, minS, dT, dP, dS) =>
      val loose = kept(minT, maxP, minS)
      val tight = kept(minT + dT, maxP - dP, minS + dS)
      tight.subsetOf(loose)
    }, n = 10) // each sample runs 2 Spark jobs — keep the count sane
    docs.unpersist()
  }

  test("hammingBits: agrees with zip-count, symmetric, zero iff equal") {
    import org.apache.spark.unsafe.types.UTF8String
    val bitString = Gen.choose(1, 128).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('0', '1')).map(_.mkString))
    val pair = for {
      a <- bitString
      flips <- Gen.listOf(Gen.choose(0, a.length - 1))
    } yield (a, flips.toSet.foldLeft(a.toCharArray) { (arr, i) =>
      arr(i) = if (arr(i) == '0') '1' else '0'; arr
    }.mkString)
    holds(Prop.forAll(pair) { case (a, b) =>
      val d = graft.expressions.HashOps.hammingBits(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val ref = a.zip(b).count { case (x, y) => x != y }
      val sym = graft.expressions.HashOps.hammingBits(
        UTF8String.fromString(b), UTF8String.fromString(a))
      d == ref && sym == d && ((d == 0) == (a == b))
    }, n = 200)
  }

  test("pigeonhole blocks: any pair within Hamming h shares a block (simhashNearDup math)") {
    // the candidate-completeness bet of simhashNearDup, checked as pure
    // math: cut `bits` into h+1 contiguous blocks (first bits%(h+1)
    // take one extra), then any two strings differing in ≤ h positions
    // agree exactly on at least one block
    val gen = for {
      bits <- Gen.choose(16, 96)
      h <- Gen.choose(1, 12)
      if bits >= h + 1
      a <- Gen.listOfN(bits, Gen.oneOf('0', '1')).map(_.mkString)
      nFlips <- Gen.choose(0, h)
      flips <- Gen.pick(nFlips, 0 until bits)
    } yield (bits, h, a, flips.foldLeft(a.toCharArray) { (arr, i) =>
      arr(i) = if (arr(i) == '0') '1' else '0'; arr
    }.mkString)
    holds(Prop.forAll(gen) { case (bits, h, a, b) =>
      val blocks = h + 1
      val base = bits / blocks
      val rem = bits % blocks
      (0 until blocks).exists { i =>
        val start = i * base + math.min(i, rem)
        val len = base + (if (i < rem) 1 else 0)
        a.substring(start, start + len) == b.substring(start, start + len)
      }
    }, n = 300)
  }

  test("floatDot/floatNorm2: bit-identical to the sequential left fold they replace") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vec = Gen.choose(1, 128).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10f, 10f)))
    holds(Prop.forAll(vec, vec) { (xs, ys) =>
      val n = math.min(xs.length, ys.length)
      val a = xs.take(n)
      val b = ys.take(n)
      val ad = new GenericArrayData(a.toArray[Any])
      val bd = new GenericArrayData(b.toArray[Any])
      val dotRef = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      val n2Ref = a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      // bit-identical, not approximately-equal: the oracle hash compare
      // depends on the exact fold
      java.lang.Double.doubleToLongBits(
        graft.expressions.HashOps.floatDot(ad, bd)) ==
        java.lang.Double.doubleToLongBits(dotRef) &&
      java.lang.Double.doubleToLongBits(
        graft.expressions.HashOps.floatNorm2(ad)) ==
        java.lang.Double.doubleToLongBits(n2Ref)
    }, n = 200)
  }

  test("tokenProfile: equals the column-formulation semantics on arbitrary text") {
    import org.apache.spark.unsafe.types.UTF8String
    val stop = graft.expressions.HashOps.toSet("the,a,an,of,and,or,is,in,to,for")
    // text mixing words, stopwords, punctuation runs, and whitespace
    val word = Gen.oneOf(
      Gen.oneOf("the", "a", "of", "and", "cat", "hat", "Hund", "x1"),
      Gen.listOfN(3, Gen.alphaChar).map(_.mkString),
      Gen.oneOf("!!", ",", "a,b", "--", "(x)"))
    val text = for {
      ws <- Gen.listOf(Gen.oneOf(" ", "  ", "\t", "\n"))
      words <- Gen.listOf(word)
    } yield words.zipAll(ws, "", " ").map { case (w, s) => w + s }.mkString
    holds(Prop.forAll(text) { s =>
      val r = graft.expressions.HashOps.tokenProfile(UTF8String.fromString(s), stop)
      // reference: the original column semantics, in plain Scala
      val toks = s.split("\\s+").filter(_.nonEmpty)
      val punct = s.count(c => "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".contains(c))
      r.getInt(0) == toks.length &&
        r.getInt(1) == toks.distinct.length &&
        r.getInt(2) == toks.count(stop.contains) &&
        r.getInt(3) == punct &&
        r.getInt(4) == s.length
    }, n = 300)
  }

  test("denverTs: DST transitions convert correctly (SURVEY risk #3)") {
    import spark.implicits._
    val vectors = Seq(
      // spring forward 2024-03-10: 09:00Z jumps 01:59 MST -> 03:00 MDT
      (1710061140000L, "2024-03-10 01:59:00"), // 08:59Z, still MST (UTC-7)
      (1710064740000L, "2024-03-10 03:59:00"), // 09:59Z, MDT (UTC-6); 02:xx never exists
      // fall back 2024-11-03: 08:00Z repeats 01:00
      (1730619000000L, "2024-11-03 01:30:00"), // 07:30Z, MDT (UTC-6)
      (1730622600000L, "2024-11-03 01:30:00")) // 08:30Z, MST (UTC-7) - same wall clock
    val got = vectors.map(_._1).toDF("ms")
      .select(Shred.denverTs(col("ms")).as("d")).collect().map(_.getString(0))
    assert(got.toSeq === vectors.map(_._2))
  }

  test("asofJoin equals brute force on random keyed time series") {
    import spark.implicits._
    // narrow key/time ranges force collisions: equal times across
    // sides, shared and unshared keys, empty right partitions
    val rightGen = Gen.listOf(for {
      k <- Gen.choose(1L, 6L); t <- Gen.choose(0L, 40L)
    } yield (k, t))
    val leftGen = Gen.listOf(for {
      k <- Gen.choose(1L, 8L); t <- Gen.choose(0L, 40L)
    } yield (k, t))
    holds(Prop.forAll(leftGen, rightGen) { (lefts, rights) =>
      // operator contract: rights unique per (key, time) — dedup keeping
      // the max value, as the attribution query's max_by does
      val r = rights.map { case (k, t) => (k, t, k * 1000 + t) }
        .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toList
      val want = lefts.map { case (k, t) =>
        val m = r.filter(x => x._1 == k && x._2 <= t)
          .sortBy(x => (x._2, x._3)).lastOption
        (k, t, m.map(_._3))
      }.sorted
      lefts.isEmpty || { // toDF on an empty Seq still works, but skip trivial
        val got = operators.TemporalJoins.asofJoin(
          lefts.toDF("k", "t"),
          r.toDF("rk", "rt", "v"),
          "k", "rk", "t", "rt", Seq("v"))
          .as[(Long, Long, Option[Long])].collect().toList.sorted
        got == want
      }
    }, n = 60)
  }
}
