package graft

import org.apache.spark.sql.functions._
import graft.queries.{Sampling, Stats, Text}

/** Planted-data laws for the q131–q135 curation/monitoring statistics
  * layer. The driver corpus exercises these queries end-to-end against
  * the DuckDB oracle; the tests here pin the SEMANTIC boundaries the
  * oracle can only witness if the corpus happens to hit them — the
  * exact-z-score spike threshold, the σ = 0 degenerate, KS at the 0 and
  * 1 extremes, HHI at both concentration extremes, and the sign law of
  * the DSIR log-likelihood ratio.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (day: Int) =>
    new java.sql.Timestamp(86400000L * (20000 + day))

  test("q132 EWMA: planted 3-day sequence equals the hand-run adjusted recursion; gap decays ONE step") {
    // one event per day -> daily mean IS the value; days 0,1,3 (gap at 2)
    val ev = Seq(("A", ts(0), 1.0), ("A", ts(1), 2.0), ("A", ts(3), 3.0))
      .toDF("event_type", "ts", "value")
    val got = Stats.ewmaOf(Stats.dailyOf(ev))
      .orderBy("d").select("ewma").as[Double].collect()
    val b = Stats.EwmaDecay
    // adjusted recursion over OBSERVED days: the day-2 gap is one decay
    // step, not two — pinned here because both engines implement the
    // sequence semantics, and a calendar-step variant would differ
    val e1 = 1.0
    val e2 = (2.0 + b * 1.0) / (1.0 + b)
    val e3 = (3.0 + b * (2.0 + b * 1.0)) / (1.0 + b * (1.0 + b))
    assert(got.toSeq == Seq(e1, e2, e3), s"got ${got.toSeq}")
  }

  test("q132 EWMA bounds: smoothed value always lies within [min, max] of the observed means") {
    val ev = Seq.tabulate(40)(i => ("A", ts(i % 8), (i % 5 + 1).toDouble))
      .toDF("event_type", "ts", "value")
    val rows = Stats.ewmaOf(Stats.dailyOf(ev))
      .select("mean_value", "ewma").as[(Double, Double)].collect()
    val means = rows.map(_._1)
    rows.foreach { case (_, e) =>
      assert(e >= means.min - 1e-12 && e <= means.max + 1e-12)
    }
  }

  test("q133 spike threshold is STRICT: planted z = 2.0 exactly is not flagged; z > 2 is; sigma = 0 gives NULL z") {
    // A: counts 1,1,1,1,6 -> D=5 S=10 Q=40 var=100 z6=(30-10)/10=2.0 exactly
    def rep(t: String, day: Int, n: Int) =
      Seq.fill(n)((t, ts(day), 1.0))
    val a = (0 to 3).flatMap(d => rep("A", d, 1)) ++ rep("A", 4, 6)
    // B: counts 1,1,1,1,1,8 -> D=6 S=13 Q=69 var=245 z8=35/sqrt(245)=2.236>2
    val bR = (0 to 4).flatMap(d => rep("B", d, 1)) ++ rep("B", 5, 8)
    // C: constant counts -> sigma=0 -> NULL z, never flagged
    val c = (0 to 3).flatMap(d => rep("C", d, 2))
    val ev = (a ++ bR ++ c).toDF("event_type", "ts", "value")
    val got = Stats.spikesOf(Stats.dailyOf(ev))
      .select(col("event_type"), col("n"), col("z"), col("spike"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    val aSpike = got.filter(r => r._1 == "A" && r._2 == 6L).head
    assert(aSpike._3.contains(2.0) && !aSpike._4, s"z=2.0 must NOT flag: $aSpike")
    val bSpike = got.filter(r => r._1 == "B" && r._2 == 8L).head
    assert(bSpike._3.exists(_ > 2.0) && bSpike._4, s"z>2 must flag: $bSpike")
    got.filter(_._1 == "C").foreach { r =>
      assert(r._3.isEmpty && !r._4, s"sigma=0 must give NULL z, no flag: $r")
    }
    // the integer predicate and the float z agree everywhere they coexist
    got.foreach { case (_, _, z, spike) =>
      z.foreach(zv => assert(spike == (zv * zv > 4.0 + 1e-12) ||
        (math.abs(zv) == 2.0 && !spike)))
    }
  }

  test("q135 KS extremes: identical distributions give 0, disjoint supports give 1, ks always in [0,1]") {
    val ev = (
      Seq.tabulate(6)(i => ("A", ts(0), (i % 3 + 1).toDouble)) ++ // {1,2,3}x2
      Seq.tabulate(6)(i => ("B", ts(0), (i % 3 + 1).toDouble)) ++ // same multiset
      Seq.tabulate(4)(i => ("C", ts(0), (i % 2 + 10).toDouble))   // {10,11}x2
    ).toDF("event_type", "ts", "value")
    val got = Stats.ksOf(ev)
      .select(col("type_a"), col("type_b"), col("ks"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) == 0.0, s"identical dists must give ks=0: $got")
    assert(got(("A", "C")) == 1.0 && got(("B", "C")) == 1.0,
      s"disjoint supports must give ks=1: $got")
    got.values.foreach(k => assert(k >= 0.0 && k <= 1.0))
  }

  test("q133/q135 DECIMAL escalation: near-2^63 planted counts compute exactly where BIGINT would overflow (r11 verdict item 4)") {
    // ---- q133: daily counts ~2^32 make n^2 ~ 2^64 and (D*n-S)^2 ~ 2^67
    // — every product past signed-64. The planted frame enters at the
    // dailyOf seam; the expected z/spike come from a BigInt reference.
    val big = 4100000000L // ~2^31.9; big*big = 1.68e19 > 2^63-1 = 9.22e18
    val counts = Seq(big, big + 7L, big + 11L, 9L * big)
    val dailyDf = counts.zipWithIndex.map { case (n, i) =>
      ("A", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(20000 + i)), n, 0.0)
    }.toDF("event_type", "d", "n", "sum_v")
    val got133 = Stats.spikesOf(dailyDf)
      .select(col("n"), col("z"), col("spike"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val d = BigInt(counts.size); val s = counts.map(BigInt(_)).sum
    val q = counts.map(n => BigInt(n) * BigInt(n)).sum
    val varInt = d * q - s * s
    assert(varInt > BigInt(Long.MaxValue), "plant too small — BIGINT would not have overflowed")
    counts.foreach { n =>
      val num = d * BigInt(n) - s
      assert(num.abs * num.abs > BigInt(Long.MaxValue), s"num^2 must cross 2^63 for n=$n")
      val zRef = num.toDouble / math.sqrt(varInt.toDouble)
      val spikeRef = num * num > BigInt(Stats.SpikeZ * Stats.SpikeZ) * varInt
      val (z, spike) = got133(n)
      assert(z == zRef, s"z diverged at n=$n: $z vs $zRef")
      assert(spike == spikeRef, s"spike diverged at n=$n")
    }
    // ---- q135: per-(pair, value) counts ~10^18 push ca*n_b ~ 10^36 —
    // 120 bits, far past signed-64 (and past double's 2^53 exact window,
    // so ratio4dec's decimal quotient is also under test). Reference KS
    // computed with BigInt; ks expectation via the exact half-up formula.
    // u sized so ks_num = 3u^2 crosses 2^63 (u > 1.8e9) while staying
    // inside ratio4dec's own documented bound ks_num*20000 < 10^38
    val u = 1000000000000000L // 1e15 per cell; 3u^2 = 3e30
    val tagged = Seq(
      ("A", "B", 1.0, 2L * u, 1L * u),
      ("A", "B", 2.0, 1L * u, 2L * u)).toDF("type_a", "type_b", "value", "ca1", "cb1")
    val row = Stats.ksOfTagged(tagged).collect().head
    val (nA, nB) = (BigInt(3L) * BigInt(u), BigInt(3L) * BigInt(u))
    assert((row.getLong(2), row.getLong(3)) == (nA.toLong, nB.toLong))
    // cumulative: ca={2u,3u}, cb={u,3u}; ks_num = max|ca*nB - cb*nA| = 3u^2
    val ksNum = BigInt(3) * BigInt(u) * BigInt(u)
    assert(ksNum > BigInt(Long.MaxValue), "plant too small for the decimal products")
    val denom = nA * nB
    val kRef = ((ksNum * 20000 + denom) / (denom * 2)).toDouble / 10000.0
    assert(row.getDouble(4) == kRef, s"ks diverged: ${row.getDouble(4)} vs $kRef")
    assert(kRef == 0.3333, "plant should land on the 1/3 quotient")
    SparkEntry.clearGraftCaches(spark)
  }

  test("q134 concentration extremes: mono-token source has hhi=1; uniform two-token source has hhi=0.5 and lexicographic-min top token") {
    val docsDf = Seq(
      ("mono", "x x x x"),
      ("mono", "x x"),
      ("duo", "b a"),
      ("duo", "a b")).toDF("source", "text")
    val got = Text.tokenConcentrationOf(docsDf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got("mono") == ((6L, 1L, "x", 1.0, 1.0)))
    // tie at count 2 vs 2 -> top token is the lexicographic min "a"
    assert(got("duo") == ((4L, 2L, "a", 0.5, 0.5)))
  }

  test("q131 DSIR sign law: target-exclusive vocabulary scores positive and selected, raw-exclusive negative; weight matches the closed form") {
    val docsDf = Seq(
      (1L, "tgt", "aa aa aa"),
      (2L, "tgt", "aa bb"),
      (3L, "raw", "bb bb bb"),
      (4L, "raw", "bb aa")).toDF("doc_id", "source", "text")
    val got = Sampling.dsirWeightsOf(docsDf, Seq("tgt")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // counts: aa ct=4 cr=1, bb ct=1 cr=4; nt=nr=5, v=2
    def lam(ct: Long, cr: Long): Double = {
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r6(math.log((ct + 1.0) / 7.0)) - r6(math.log((cr + 1.0) / 7.0))
    }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lAa = lam(4, 1); val lBb = lam(1, 4)
    assert(lAa > 0 && lBb < 0 && math.abs(lAa + lBb) < 1e-9) // symmetric counts
    assert(got(1L) == ((3L, r4(3 * lAa), true)))
    assert(got(3L) == ((3L, r4(3 * lBb), false)))
    // mixed docs: equal-and-opposite lambdas cancel to ~0
    assert(math.abs(got(2L)._2) < 1e-9 && math.abs(got(4L)._2) < 1e-9)
  }

  test("q151 seasonal baseline: an exactly weekly-periodic series scores zero error; a gap day is not scored; MAE matches a planted shift") {
    import java.sql.Date
    import spark.implicits._
    import graft.queries.Stats
    def day(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // type A: 14 days, exactly periodic with period 7 -> zero error on
    // the 7 evaluated days
    val periodic = (0 until 14).map(i => ("A", day(i), (10 + i % 7).toLong))
    // type B: week 2 runs +3 above week 1 on 7 evaluated days -> MAE 3;
    // and day 8 is MISSING entirely, so day 15 (lag = the gap) must not
    // be scored even though day 15 exists
    val shifted = (0 until 7).map(i => ("B", day(i), 20L)) ++
      (7 until 14).filter(_ != 8).map(i => ("B", day(i), 23L)) :+
      (("B", day(15), 99L))
    val daily = (periodic ++ shifted).toDF("event_type", "d", "n")
    val got = Stats.seasonalBaseline(daily).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("A") == ((7L, 0L, 0.0)), "periodic series must score zero error")
    // B: evaluated days are 7..13 minus the missing day 8 = 6 days, each
    // err 3; day 15's lag (day 8) was never observed -> not scored
    assert(got("B") == ((6L, 18L, 3.0)), s"planted shift mis-scored: ${got("B")}")
  }

  test("q159 OHLC: first/last by (ts, event_id) with same-ts ties by event_id; high/low/volume exact; arbitrary-split partials merge to the whole") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:05"), "A", 5.0),
      (3L, t("2024-01-01 10:00:05"), "A", 7.0), // same ts as id 1: open ties to the LOWER event_id
      (2L, t("2024-01-01 10:30:00"), "A", 1.0), // low
      (4L, t("2024-01-01 10:59:59"), "A", 6.0), // close (latest ts)
      (5L, t("2024-01-01 11:00:00"), "A", 9.0), // next bar
      (6L, t("2024-01-01 10:15:00"), "B", 2.5))
      .toDF("event_id", "ts", "event_type", "value")
    val got = Stats.ohlcBars(ev).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))).toMap
    assert(got(("A", "2024-01-01 10:00:00.0")) == ((5.0, 7.0, 1.0, 6.0, 4L, 19.0)))
    assert(got(("A", "2024-01-01 11:00:00.0")) == ((9.0, 9.0, 9.0, 9.0, 1L, 9.0)))
    assert(got(("B", "2024-01-01 10:00:00.0")) == ((2.5, 2.5, 2.5, 2.5, 1L, 2.5)))
    // the s38 foundation: partials over an ARBITRARY split merge to the
    // whole-frame bars (every column's merge is associative+commutative)
    val p1 = Stats.barPartials(ev.filter(col("event_id") % 2 === 0))
    val p2 = Stats.barPartials(ev.filter(col("event_id") % 2 =!= 0))
    val merged = Stats.finishBars(Stats.mergeBars(p1.unionByName(p2)))
      .collect().map(_.toSeq).toSeq
    assert(merged == Stats.ohlcBars(ev).collect().map(_.toSeq).toSeq)
  }

  test("q161 calendar fill: gaps zero-filled with observed=false across the GLOBAL day span; trailing MA divides by the window's own row count") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // A observed on days 0 and 2 (gap at 1); B observed only on day 1 —
    // the span is GLOBAL (0..2), so B densifies to three rows too
    val daily = Seq(("A", day(0), 10L), ("A", day(2), 4L), ("B", day(1), 6L))
      .toDF("event_type", "d", "n")
    val got = Stats.calendarFill(daily).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getBoolean(3), r.getDouble(4)))).toMap
    assert(got.size == 6, s"2 types x 3 days expected: $got")
    assert(got(("A", "2024-01-01")) == ((10L, true, 10.0)))
    assert(got(("A", "2024-01-02")) == ((0L, false, 5.0)))    // (10+0)/2
    assert(got(("A", "2024-01-03")) == ((4L, true, 4.6667)))  // ratio4(14, 3)
    assert(got(("B", "2024-01-01")) == ((0L, false, 0.0)))
    assert(got(("B", "2024-01-02")) == ((6L, true, 3.0)))
    assert(got(("B", "2024-01-03")) == ((0L, false, 2.0)))
  }

  test("q162 MAD outliers: hand-computed DISC median/MAD fence; the monster day a z-test masks flags; MAD=0 degenerates to any-deviation") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // A: 10,10,12,14,100 -> med 12 (2*cum>=5 first at 12), devs 2,2,0,2,88
    //    -> mad 2, fence 3*2=6: ONLY the monster day flags
    val a = Seq(10L, 10L, 12L, 14L, 100L).zipWithIndex.map { case (n, i) => ("A", day(i), n) }
    // B: 5,5,5,5,9 -> med 5, devs 0,0,0,0,4 -> mad 0: fence is "any
    //    deviation" (documented degenerate) -> only the 9 flags
    val b = Seq(5L, 5L, 5L, 5L, 9L).zipWithIndex.map { case (n, i) => ("B", day(i), n) }
    val got = graft.queries.Stats.madOutliers((a ++ b).toDF("event_type", "d", "n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(("A", 100L)) == ((12L, 2L, true)))
    assert(got(("A", 14L)) == ((12L, 2L, false)))
    assert(got(("A", 12L)) == ((12L, 2L, false)))
    assert(got(("B", 9L)) == ((5L, 0L, true)))
    assert(got(("B", 5L)) == ((5L, 0L, false)))
  }

  test("q189 Theil–Sen: hand-computed pairwise-slope DISC median; gap days divide by the REAL day distance; a single-day type drops out") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // A on days 0,1,2,4 (day 3 is a gap) with counts 1,3,2,10 — six pairs:
    //   (0,1): (3-1)/1 = 2     (0,2): (2-1)/2 = 0.5   (0,4): (10-1)/4 = 2.25
    //   (1,2): (2-3)/1 = -1    (1,4): (10-3)/3 = 7/3  (2,4): (10-2)/2 = 4
    // sorted: -1, 0.5, 2, 2.25, 7/3, 4 — n_pairs 6, DISC median = first s
    // with 2*cum >= 6 -> cum(2) = 3 -> slope 2.0 (an ATTAINED slope, and
    // the gap pair (0,2,4 distances) proves the divisor is datediff, not
    // an index)
    val a = Seq((0, 1L), (1, 3L), (2, 2L), (4, 10L)).map { case (i, n) => ("A", day(i), n) }
    // B has one day — no pairs, must drop out entirely
    val b = Seq(("B", day(0), 5L))
    val got = graft.queries.Stats.theilSenOf((a ++ b).toDF("event_type", "d", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map("A" -> ((4L, 6L, 2.0))), s"got $got")
    // a perfectly linear series reads its exact slope (every pair agrees)
    val lin = (0 to 4).map(i => ("L", day(i), 7L + 3L * i))
    val gl = graft.queries.Stats.theilSenOf(lin.toDF("event_type", "d", "n"))
      .collect()(0)
    assert((gl.getLong(2), gl.getDouble(3)) == ((10L, 3.0)))
  }

  test("q190 Kendall tau-a: hand-counted concordant/discordant pairs; ties count as neither; inner day alignment; <2 common days drops out") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(i))
    // A: 1,2,3  B: 3,1,2 on days 0,1,2 — pairs (01): A up B down = D;
    // (02): A up B down = D; (12): A up B up = C -> nc 1, nd 2,
    // tau4 = ratio4(-1, 3) = -0.3333
    // C: 5,5,9 vs A — (01): A up C TIE = neither; (02): C; (12): C
    //   -> nc 2, nd 0, tau4 = ratio4(2,3) = 0.6667
    // D shares only day 0 with the others -> every D pair has 1 common
    //   day, 0 day pairs -> drops out
    val rows = Seq(
      ("A", day(0), 1L), ("A", day(1), 2L), ("A", day(2), 3L),
      ("B", day(0), 3L), ("B", day(1), 1L), ("B", day(2), 2L),
      ("C", day(0), 5L), ("C", day(1), 5L), ("C", day(2), 9L),
      ("D", day(0), 4L))
    val got = graft.queries.Stats.kendallOf(rows.toDF("event_type", "d", "n"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")), s"got ${got.keySet}")
    assert(got(("A", "B")) == ((3L, 3L, 1L, 2L, -0.3333)), s"got ${got(("A", "B"))}")
    assert(got(("A", "C")) == ((3L, 3L, 2L, 0L, 0.6667)), s"got ${got(("A", "C"))}")
    // B vs C: B 3,1,2 / C 5,5,9 — (01): B down C tie = neither;
    // (02): B down C up = D; (12): B up C up = C -> nc 1, nd 1, tau 0
    assert(got(("B", "C")) == ((3L, 3L, 1L, 1L, 0.0)), s"got ${got(("B", "C"))}")
  }

  test("q191 Mann-Kendall: hand-computed S and tie-corrected var18; the squared fence; monotone-but-short is NOT trending; direction signs") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i))
    def series(t: String, ns: Seq[Long]) = ns.zipWithIndex.map { case (n, i) => (t, day(i), n) }
    // U: 10 strictly increasing days — S = 45, no ties (tt = 0),
    //    var18 = 10*9*25 = 2250; fence 180000*44^2 = 348,480,000 >
    //    38416*2250 = 86,436,000 -> trending up
    // D: 8 strictly decreasing — S = -28, var18 = 8*7*21 = 1176;
    //    180000*27^2 = 131,220,000 > 38416*1176 = 45,177,216 -> down
    // W: 1,2,1,2,1 — S = 0 (3 up-pairs, 3 down); ties t=3 (66) + t=2
    //    (18) -> tt = 84, var18 = 300-84 = 216; |S| <= 1 -> none
    // P: 1,2,3 — monotone but short: S = 3, var18 = 3*2*11 = 66;
    //    180000*4 = 720,000 < 38416*66 = 2,535,456 -> none (the
    //    continuity-corrected fence holds back a 3-day run)
    val rows = series("U", (1L to 10L)) ++ series("D", (1L to 8L).map(9L - _)) ++
      series("W", Seq(1L, 2L, 1L, 2L, 1L)) ++ series("P", Seq(1L, 2L, 3L))
    val got = graft.queries.Stats.mannKendallOf(rows.toDF("event_type", "d", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5))))
      .toMap
    assert(got("U") == ((10L, 45L, 2250L, true, "up")), s"got ${got("U")}")
    assert(got("D") == ((8L, -28L, 1176L, true, "down")), s"got ${got("D")}")
    assert(got("W") == ((5L, 0L, 216L, false, "none")), s"got ${got("W")}")
    assert(got("P") == ((3L, 3L, 66L, false, "none")), s"got ${got("P")}")
  }

  test("q165 A/B chi-square: hand-computed 2x2 statistic and exact significance fence; zero margin degenerates to NULL/not-significant") {
    import graft.queries.Stats
    // variant = user_id % 2. Even users 0,2,4,6 (A): 3 of 4 convert;
    // odd users 1,3,5,7 (B): 0 of 4 convert. a=3 b=1 c=0 d=4:
    // adbc = 3*4 - 1*0 = 12; chi2 = 8*144/(4*4*3*5) = 1152/240 = 4.8
    // > 3.8416 -> significant
    def e(u: Long, id: Long, typ: String) = (u, id, ts(0), typ, 1.0)
    val ev = Seq(
      e(0L, 1L, "purchase"), e(2L, 2L, "purchase"), e(4L, 3L, "purchase"),
      e(6L, 4L, "view"),
      e(1L, 5L, "view"), e(3L, 6L, "view"), e(5L, 7L, "click"), e(7L, 8L, "view"))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Stats.abChisq(ev).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 3L, 4L, 0L)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)) ==
      ((0.75, 0.0, 4.8, true)), s"got $r")
    // balanced conversion -> chi2 0, not significant
    val bal = Seq(e(0L, 1L, "purchase"), e(1L, 2L, "purchase"),
      e(2L, 3L, "view"), e(3L, 4L, "view"))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val rb = Stats.abChisq(bal).collect()(0)
    assert(rb.getDouble(6) == 0.0 && !rb.getBoolean(7))
    // zero margin (nobody converts): NULL chi2, not significant
    val zm = Seq(e(0L, 1L, "view"), e(1L, 2L, "view"))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val rz = Stats.abChisq(zm).collect()(0)
    assert(rz.isNullAt(6) && !rz.getBoolean(7))
  }

  test("q166 CUSUM: a planted step series peaks at the last day of the first regime; a constant series reads zero with the earliest-day tie") {
    import graft.queries.Stats
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // A: 10,10,10,10,10 then 20,20,20,20,20 -> D=10, S=150; peak
    // |D*prefix_k - k*S| at k=5: |500-750| = 250; stat 250/1500 = 0.1667
    val a = ((0 until 5).map(i => ("A", day(i), 10L)) ++
      (5 until 10).map(i => ("A", day(i), 20L)))
    // B constant: every deviation 0 -> earliest day wins the tie
    val b = (0 until 4).map(i => ("B", day(i), 7L))
    val got = Stats.cusumChangepoint((a ++ b).toDF("event_type", "d", "n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getLong(4), r.getDouble(5)))).toMap
    assert(got("A") == ((10L, 150L, "2024-01-05", 250L, 0.1667)), s"got ${got("A")}")
    assert(got("B") == ((4L, 28L, "2024-01-01", 0L, 0.0)), s"got ${got("B")}")
  }

  test("q167 Holt trend: planted 3-day sequence equals the hand-run recursion (l1=m1, b1=0); a gap decays ONE step") {
    import graft.queries.Stats
    // one event per day -> daily mean IS the value; days 0,1,3 (gap at 2)
    val ev = Seq(("A", ts(0), 1.0), ("A", ts(1), 2.0), ("A", ts(3), 3.0))
      .toDF("event_type", "ts", "value")
    val got = Stats.holtOf(Stats.dailyOf(ev))
      .orderBy("d").select("level", "trend", "forecast_next")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // k1: l=1, b=0; k2: l=0.5*2+0.5*1=1.5, b=0.25*0.5=0.125;
    // k3 (the gap is ONE step): l=0.5*3+0.5*1.625=2.3125,
    //   b=0.25*0.8125+0.75*0.125=0.296875 — all binary-exact
    assert(got.toSeq == Seq(
      (1.0, 0.0, 1.0),
      (1.5, 0.125, 1.625),
      (2.3125, 0.296875, 2.609375)), s"got ${got.toSeq}")
  }

  test("q168 IQR outliers: hand-computed DISC quartiles and exact 1.5*IQR fences; a clean distribution counts zero outliers") {
    import graft.queries.Stats
    // A: cents 100x4, 200x2, 300x2, 10000x1 (N=9): cum(100)=4 (4*4>=9 ->
    // q1=100), cum(200)=6 (24>=18 -> med=200), cum(300)=8 (32>=27 ->
    // q3=300); IQR=200; high fence 2v > 600+600 -> only 10000 flags
    val a = Seq.fill(4)(1.00) ++ Seq(2.00, 2.00, 3.00, 3.00, 100.00)
    // B: 1,2,3,4 -> q1=100, med=200, q3=300, no outliers
    val b = Seq(1.00, 2.00, 3.00, 4.00)
    val ev = (a.map(("A", _)) ++ b.map(("B", _))).toDF("event_type", "value")
    val got = Stats.iqrOutliers(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got("A") == ((9L, 100L, 200L, 300L, 200L, 0L, 1L)), s"got ${got("A")}")
    assert(got("B") == ((4L, 100L, 200L, 300L, 200L, 0L, 0L)), s"got ${got("B")}")
  }

  test("q182 winsorized stats: hand-computed DISC p05/p95 clamp; heavy tails collapse to the mid value; a clean tail clips exactly one point") {
    import graft.queries.Stats
    // A: one extreme low (0.01), 38 mid (1.00), one extreme high (100.00),
    // N=40: lo = smallest cents with 20*cum >= 40 -> cum >= 2 -> 100;
    // hi = 20*cum >= 760 -> cum >= 38 -> 100. Both tails clip onto the mid
    // value: n_lo=1, n_hi=1, wsum = 40*100 = 4000, mean 1.00
    val a = Seq(0.01) ++ Seq.fill(38)(1.00) ++ Seq(100.00)
    // B: cents 1..20 once each, N=20: lo = cum>=1 -> 1, hi = cum>=19 -> 19;
    // only 20 clips (n_hi=1), wsum = (1..19).sum + 19 = 209, ratio4 ->
    // 10.45 (the exact mean of the clipped histogram)
    val b = (1 to 20).map(_ / 100.0)
    val ev = (a.map(("A", _)) ++ b.map(("B", _))).toDF("event_type", "value")
    val got = Stats.winsorizedStats(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    assert(got("A") == ((40L, 100L, 100L, 1L, 1L, 4000L, 100.0)), s"got ${got("A")}")
    assert(got("B") == ((20L, 1L, 19L, 0L, 1L, 209L, 10.45)), s"got ${got("B")}")
  }

  test("q184 bootstrap CI: a constant series collapses to a zero-width interval at the mean; a spread series brackets it; all 40 replicates realize") {
    import graft.queries.Stats
    // A: 50 rows of 2.00 — every replicate mean is exactly 200.0 cents
    // regardless of the Poisson weights, so the DISC 2.5/97.5 order
    // stats BOTH read 200.0 (the bootstrap's scale-invariance smoke)
    val a = (0L until 50L).map(i => ("A", i, 2.00))
    // B: half 1.00 / half 3.00 — replicate means spread around 200
    val b = (0L until 25L).map(i => ("B", 100L + i, 1.00)) ++
      (0L until 25L).map(i => ("B", 200L + i, 3.00))
    val ev = (a ++ b).toDF("event_type", "event_id", "value")
    val got = Stats.bootstrapCi(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    val (na, ma, loA, hiA, ra) = got("A")
    assert((na, ma, loA, hiA) == ((50L, 200.0, 200.0, 200.0)), s"A: ${got("A")}")
    assert(ra == Stats.BootB.toLong, s"A realized $ra of ${Stats.BootB} replicates")
    val (nb, mb, loB, hiB, rb) = got("B")
    assert(nb == 50L && mb == 200.0 && rb == Stats.BootB.toLong, s"B: ${got("B")}")
    assert(loB < hiB, s"B interval has no width: ${got("B")}")
    assert(loB >= 100.0 && hiB <= 300.0 && loB <= mb && mb <= hiB,
      s"B interval does not bracket the mean: ${got("B")}")
  }

  test("q184 width A/B (r15 verdict item 6): the one-hash rotation's CI width agrees with the fully independent per-(row,b) hash spec at planted scale") {
    import graft.queries.Stats
    // 20k rows, values uniform-ish on [10.00, 19.99] via a coprime walk —
    // big enough that both specs' 40 replicate means are CLT-normal, so
    // a material cross-replicate correlation penalty would move the
    // order-statistic spread visibly
    val ev = (0L until 20000L)
      .map(i => ("T", i, 10.0 + (i * 7919L % 1000L) / 100.0))
      .toDF("event_type", "event_id", "value")
    def ci(indep: Boolean) = {
      val r = Stats.bootstrapCi(ev, indepMix = indep).collect()(0)
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))
    }
    val (meanR, loR, hiR, nrR) = ci(indep = false)
    val (meanI, loI, hiI, nrI) = ci(indep = true)
    assert(meanR == meanI, "the point estimate must not depend on the mix")
    assert(nrR == Stats.BootB.toLong && nrI == Stats.BootB.toLong,
      s"unrealized replicates: rot=$nrR indep=$nrI")
    // both brackets cover the true mean
    assert(loR <= meanR && meanR <= hiR, s"rotation CI [$loR, $hiR] misses $meanR")
    assert(loI <= meanI && meanI <= hiI, s"indep CI [$loI, $hiI] misses $meanI")
    val (wR, wI) = (hiR - loR, hiI - loI)
    info(f"rotation width $wR%.4f vs independent width $wI%.4f (ratio ${wR / wI}%.3f)")
    assert(wR > 0 && wI > 0, s"degenerate widths: rot=$wR indep=$wI")
    // the licensing bound: the cheap spec's width within 2x either way
    assert(wR / wI > 0.5 && wR / wI < 2.0,
      f"rotation CI width diverged from the independent spec: ratio ${wR / wI}%.3f")
  }

  test("q188 median+MAD: hand-computed panel on planted histograms — DISC attained values, symmetric-deviation merge, 3*MAD outliers non-vacuous") {
    import graft.queries.Stats
    // A: values 1,2,2,3,100 (cents 100,200,200,300,10000). n=5; DISC
    // median = smallest cents with 2*cum >= 5 -> cum(200)=3 -> 200.
    // deviations |c-200|: 100,0,0,100,9800 -> dev hist {0:2, 100:2,
    // 9800:1}; 2*cum >= 5 -> cum(100)=4 -> MAD=100. 3*MAD=300: only
    // 9800 exceeds -> n_far=1.
    val a = Seq(1.00, 2.00, 2.00, 3.00, 100.00).map(("A", _))
    // B: constant 7 -> med=700, MAD=0, n_far=0 (nothing exceeds 0*3=0?
    // |c-700|=0 > 0 is false -> 0)
    val b = Seq.fill(4)(("B", 7.00))
    // C: even count 1,1,3,3 -> 2*cum>=4 at cents=100 (cum=2) -> med=100
    // (the DISC lower-median rule); devs {0:2, 200:2} -> MAD attained at
    // 0 (cum=2, 2*2>=4) -> mad=0; n_far counts devs > 0 -> 2
    val c = Seq(1.00, 1.00, 3.00, 3.00).map(("C", _))
    val got = Stats.madStats((a ++ b ++ c).toDF("event_type", "value")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got("A") == ((5L, 200L, 100L, 1L)), s"A: ${got("A")}")
    assert(got("B") == ((4L, 700L, 0L, 0L)), s"B: ${got("B")}")
    assert(got("C") == ((4L, 100L, 0L, 2L)), s"C: ${got("C")}")
  }

  test("q187 bucketed bootstrap == q184 row for row: the replicate sums factor through the 10^4 hash buckets integer-exactly") {
    import graft.queries.Stats
    // the q184 planted frames (constant + spread types) AND a bigger
    // mixed frame so bucket collisions actually occur (20k rows over
    // 10^4 buckets — ~2 rows/bucket, the factorization's real case)
    val ev = ((0L until 50L).map(i => ("A", i, 2.00)) ++
      (0L until 25L).map(i => ("B", 100L + i, 1.00)) ++
      (0L until 25L).map(i => ("B", 200L + i, 3.00)) ++
      (0L until 20000L).map(i => ("C", 1000L + i, 10.0 + (i * 7919L % 1000L) / 100.0)))
      .toDF("event_type", "event_id", "value")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    val want = rows(Stats.bootstrapCi(ev))
    val got = rows(Stats.bootstrapCiBucketed(ev))
    assert(want.nonEmpty && got == want,
      s"bucketed bootstrap diverged from the per-row fold:\n  got  $got\n  want $want")
  }

  test("q185 decayed engagement: power-of-two weights land exactly (day 0/7/70 all contribute 100c); the half-life boundary steps at day 7, not 6") {
    import graft.queries.Stats
    def day(s: String) = java.sql.Date.valueOf(s)
    def d18(v: Double) = new java.math.BigDecimal(v).setScale(4)
    // ref = global max d = 2024-03-01. A: 1.00 at dd=0 (w=1), 2.00 at
    // dd=7 (w=1/2), 1024.00 at dd=70 (k=10, w=2^-10): each contributes
    // exactly 100 cents -> 300.0
    val rows = Seq(
      ("A", day("2024-03-01"), d18(1.00)),
      ("A", day("2024-02-23"), d18(2.00)),
      ("A", day("2023-12-22"), d18(1024.00)),
      // B: dd=6 keeps FULL weight (k = 6 div 7 = 0), dd=7 halves
      ("B", day("2024-02-24"), d18(1.00)),
      ("B", day("2024-02-23"), d18(1.00)))
    val got = Stats.decayedEngagement(rows.toDF("event_type", "d", "sum_v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDate(2).toString, r.getDouble(3)))).toMap
    assert(got("A") == ((3L, "2024-03-01", 300.0)), s"A: ${got("A")}")
    assert(got("B") == ((2L, "2024-03-01", 150.0)), s"B: ${got("B")}")
  }

  test("q171 type correlation: perfectly tracking series read r=1, mirrored series r=-1, a constant series reads NULL; only shared days count") {
    import graft.queries.Stats
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val daily =
      (0 until 4).map(i => ("A", day(i), (10 + i).toLong)) ++   // 10,11,12,13
      (0 until 4).map(i => ("B", day(i), (20 + 2 * i).toLong)) ++ // tracks A
      (0 until 4).map(i => ("C", day(i), (13 - i).toLong)) ++   // mirrors A
      (0 until 4).map(i => ("D", day(i), 5L)) ++                // constant
      Seq(("E", day(0), 99L))                                   // one shared day only
    val got = Stats.typeCorrelation(daily.toDF("event_type", "d", "n")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    // the sqrt-product denominator makes r deterministic but not exactly
    // +-1 on perfect correlation (sqrt(vx)*sqrt(vy) != sqrt(vx*vy) in
    // IEEE) — the oracle mirrors the identical expression, so the
    // cross-engine compare is still bit-exact; here we pin the ULP band
    assert(got(("A", "B"))._1 == 4L && math.abs(got(("A", "B"))._2 - 1.0) < 1e-12)
    assert(got(("A", "C"))._1 == 4L && math.abs(got(("A", "C"))._2 + 1.0) < 1e-12)
    assert(got(("A", "D"))._1 == 4L && got(("A", "D"))._2.isNaN,
      "zero variance must read NULL")
    // E shares one day with each other type: n=1 -> both variances 0 -> NULL
    assert(got(("A", "E"))._1 == 1L && got(("A", "E"))._2.isNaN)
  }

  test("q177 lag correlation: a series and its one-day-shifted copy read r~1 exactly at lag 1, not at lag 0; direction is ordered") {
    import graft.queries.Stats
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val a = Seq(1L, 4L, 2L, 8L, 5L).zipWithIndex.map { case (n, i) => ("A", day(i), n) }
    // B is A delayed by one day: B_{d+1} = A_d
    val b = Seq(1L, 4L, 2L, 8L, 5L).zipWithIndex.map { case (n, i) => ("B", day(i + 1), n) }
    val got = Stats.lagCorrelation((a ++ b).toDF("event_type", "d", "n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        ((r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    val atLag1 = got(("A", "B", 1))
    assert(atLag1._1 == 5L && math.abs(atLag1._2 - 1.0) < 1e-12,
      s"A leads B by exactly one day: $atLag1")
    val atLag0 = got(("A", "B", 0))
    assert(atLag0._2 < 0.99, s"contemporaneous correlation must NOT read 1: $atLag0")
    // the transpose direction exists and differs (B does not lead A)
    assert(got.contains(("B", "A", 1)) && math.abs(got(("B", "A", 1))._2 - 1.0) > 0.01)
  }

  test("q179 value bands: hand-computed DISC p10/p50/p90 per (type, day)") {
    import graft.queries.Stats
    def t(i: Int) = new java.sql.Timestamp(86400000L * 20000 + i * 1000L)
    // one day, type A: cents 100 x8, 200 x1, 1000 x1 -> p10=100 (cum 8 covers
    // 1), p50=100 (cum 8 >= 5), p90=200 (cum 9 >= 9)
    val vals = Seq.fill(8)(1.00) ++ Seq(2.00, 10.00)
    val ev = vals.zipWithIndex.map { case (v, i) => ("A", t(i), v) }
      .toDF("event_type", "ts", "value")
    val r = Stats.valueBands(ev).collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((10L, 100L, 100L, 200L)), s"got $r")
  }

  test("q172 drawdown: planted peak-decline series bottoms where hand-computed; a monotone series reads zero at the earliest day") {
    import graft.queries.Stats
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // A: 10,20,15,5,25 -> runmax 10,20,20,20,25; dd 0,0,5,15,0 ->
    //   max_dd 15 at day 4 (2024-01-04), peak 25
    val a = Seq(10L, 20L, 15L, 5L, 25L).zipWithIndex.map { case (n, i) => ("A", day(i), n) }
    // B monotone up: dd all 0 -> earliest day wins the tie
    val b = Seq(1L, 2L, 3L).zipWithIndex.map { case (n, i) => ("B", day(i), n) }
    val got = Stats.trafficDrawdown((a ++ b).toDF("event_type", "d", "n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toString))).toMap
    assert(got("A") == ((5L, 25L, 15L, "2024-01-04")), s"got ${got("A")}")
    assert(got("B") == ((3L, 3L, 0L, "2024-01-01")), s"got ${got("B")}")
  }

  test("q173 Gini: hand-computed concentration values — all-equal reads 0, one-takes-all reads (n-1)/n, ties group exactly") {
    import graft.queries.Stats
    def gini(revs: Seq[Long]): Double = {
      val rows = revs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("o_custkey", "cents")
      val r = Stats.revenueGini(rows).collect()(0)
      assert(r.getLong(0) == revs.length && r.getLong(1) == revs.sum)
      r.getDouble(2)
    }
    assert(gini(Seq(500L, 500L, 500L, 500L)) == 0.0, "all-equal must read 0")
    // one customer takes everything: G = (n-1)/n = 0.75
    assert(gini(Seq(0L, 0L, 0L, 1000L)) == 0.75)
    // sorted 10,20,30,40: 2*sum(i*x) = 2*(10+40+90+160)=600; (n+1)S=500;
    // G = 100/400 = 0.25 — and the tie-grouped form must agree
    assert(gini(Seq(40L, 10L, 30L, 20L)) == 0.25)
    // ties: 10,10,20 -> 2*(10+20+60)=180, 4*40=160, G=20/120 -> 0.1667
    assert(gini(Seq(20L, 10L, 10L)) == 0.1667)
  }

  test("q180 equi-depth stats: uniform distinct values fill equal buckets with exact boundaries; a massive tie collapses to one bucket; rows conserved") {
    import graft.queries.ZOrder
    def stats(vs: Seq[Long]) = {
      val got = ZOrder.equiDepthStats(vs.toDF("v")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.map(_._3).sum == vs.length, "rows conserved")
      got.toSeq
    }
    // 1..16 once each, B=8: boundary_k = 2k, every bucket exactly 2 rows
    val uni = stats((1L to 16L))
    assert(uni == (1 to 8).map(k => (k, 2L * k, 2L, 2L)), s"got $uni")
    // a massive tie cannot split: all-one-value input is ONE bucket
    val tie = stats(Seq.fill(5)(7L))
    assert(tie == Seq((1, 7L, 5L, 1L)), s"got $tie")
    // skew: 9x one value + 7 distinct still covers everything, boundaries
    // monotone, first bucket absorbs the tie mass
    val skew = stats(Seq.fill(9)(1L) ++ (2L to 8L))
    assert(skew.head._2 == 1L && skew.head._3 == 9L, s"got $skew")
    assert(skew.map(_._2) == skew.map(_._2).sorted, "boundaries monotone")
  }

  test("q174 Lorenz deciles: distinct values fill one customer per decile; a tied group splits across boundaries exactly; revenue conserved") {
    import graft.queries.Stats
    def deciles(revs: Seq[Long]) = {
      val rows = revs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("o_custkey", "cents")
      Stats.revenueDeciles(rows).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    }
    // 10 distinct values 100..1000: decile d holds exactly customer d+1
    // with revenue (d+1)*100 of S = 5500
    val ten = deciles((1 to 10).map(_ * 100L))
    assert(ten.length == 10)
    assert(ten.map(_._2._1).forall(_ == 1L), "one customer per decile")
    assert(ten.map(_._2._2).toSeq == (1 to 10).map(_ * 100L), "ascending revenue")
    assert(ten.map(_._2._2).sum == 5500L, "revenue conserved")
    // 4 equal customers: ranks 0..3 land in deciles 0,2,5,7 — the tied
    // group splits by rank-range intersection, skipped deciles absent
    val tied = deciles(Seq.fill(4)(500L))
    assert(tied.map(_._1).toSeq == Seq(0L, 2L, 5L, 7L), s"got ${tied.toSeq}")
    assert(tied.forall { case (_, (nc, rev, sh)) => nc == 1L && rev == 500L && sh == 0.25 })
  }
}
