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
}
