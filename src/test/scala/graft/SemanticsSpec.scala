package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-computed semantics on tiny in-memory data for the operators with
  * boundary conditions the oracle can't isolate (SURVEY.md §5.2.2/§5.2.3):
  * exact-gap session boundaries, as-of strictness at equal timestamps,
  * last-writer-wins tiebreaks, rollup totals, dedup idempotence.
  */
class SemanticsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("q87 binning is complete and meets-exactly-once for pre-1970 timestamps (floor-div boundary)") {
    // The generator never emits negative epoch micros, so the oracle
    // cannot probe sign-boundary binning. Plant a grid of purchases and
    // clicks straddling the epoch (bin boundaries at multiples of W on
    // both sides of zero, offsets just inside/outside the window) and
    // compare against the brute-force inequality-join semantics computed
    // driver-side.
    val W = 1000000L // 1 s window for the test
    val micros = Seq(-2500000L, -2000001L, -2000000L, -1999999L, -1000001L,
      -1000000L, -999999L, -1L, 0L, 1L, 999999L, 1000000L, 1500000L)
    // exact micros, negative-epoch safe: floor-split into ms + nanos
    def tsOfMicros(us: Long): Timestamp = {
      val ms = Math.floorDiv(us, 1000000L) * 1000L
      val t = new Timestamp(ms)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val events =
      micros.zipWithIndex.map { case (us, i) => (s"p$i", "purchase", tsOfMicros(us)) } ++
      micros.zipWithIndex.map { case (us, i) => (s"c$i", "click", tsOfMicros(us + 137L)) }
    val df = events.toDF("event_id", "event_type", "ts")
    val got = graft.queries.Events.timeRangeJoin(df, W).collect()
      .map(r => r.getString(0) -> (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val clickUs = micros.map(_ + 137L)
    micros.zipWithIndex.foreach { case (pUs, i) =>
      val near = clickUs.filter(c => Math.abs(c - pUs) <= W)
      val want = (near.size.toLong, if (near.isEmpty) -1L else near.map(c => Math.abs(c - pUs)).min)
      assert(got(s"p$i") == want, s"p$i at $pUs: got ${got(s"p$i")}, want $want")
    }
  }

  test("session_window: exactly-30-minute gap MERGES; only a strictly larger gap splits (q25 boundary)") {
    // Pins the boundary the q25 oracle must reproduce: Spark merges an event
    // whose ts equals the previous session's end (prev_ts + gap), so the
    // gaps-and-islands oracle starts a new session iff gap > 30 min.
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:29:59")),  // 29:59 gap → merges
      (1L, ts("2024-01-01 10:59:59")),  // exactly 30:00 after previous → MERGES (boundary)
      (1L, ts("2024-01-01 11:30:00"))   // 30:01 gap → new session
    ).toDF("user_id", "ts")
    val sessions = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"), col("n"))
      .orderBy(col("s")).collect()
    assert(sessions.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(sessions(0).getTimestamp(0) == ts("2024-01-01 10:00:00"))
    assert(sessions(1).getTimestamp(0) == ts("2024-01-01 11:30:00"))
  }

  test("as-of semantics: click at the same instant as the purchase is NOT matched (q09 strictness)") {
    // Runs the REAL q09 plan (Events.asOf union+window), not a re-statement
    // of it — the strict-< boundary lives in the (ts, tag) sort tiebreak.
    val events = Seq(
      (1L, "click",    10L, ts("2024-01-01 10:00:00")),
      (2L, "purchase", 10L, ts("2024-01-01 10:00:00")), // same ts as click 1
      (3L, "click",    10L, ts("2024-01-01 11:00:00")),
      (4L, "purchase", 10L, ts("2024-01-01 12:00:00")),
      (5L, "purchase", 99L, ts("2024-01-01 12:00:00"))  // user with no clicks
    ).toDF("event_id", "event_type", "user_id", "ts")
    val res = graft.queries.Events.asOf(events).collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(2L, 4L, 5L))
    assert(res(0).isNullAt(3))                                // strict <: same-ts click excluded
    assert(res(1).getTimestamp(3) == ts("2024-01-01 11:00:00")) // most recent earlier click
    assert(res(2).isNullAt(3))                                // no clicks at all → NULL
  }

  test("native as-of join is row-equal to the window-composition spec (AsOfJoinExec vs Events.asOf)") {
    // The same proof discipline as the custom expressions: the operator's
    // executable specification is the union+window plan; the native exec
    // must agree row-for-row on the real event log (clicks with NULL
    // user_id deliberately NOT pre-filtered on the native side — NULL keys
    // never match by operator contract).
    val events = graft.tables.Tables.events(spark, sf001)
    val spec = graft.queries.Events.asOf(events)
    val native = SparkEntry.queries("q09_join_asof")(spark, sf001)
    assert(native.count() == spec.count())
    assert(native.except(spec).isEmpty && spec.except(native).isEmpty)
  }

  test("native as-of: strict/inclusive boundary, no-match, NULL keys and times (AsOfJoinExec laws)") {
    val l = Seq(
      (Option(1L), Option(10L), "a"),
      (Option(1L), Option(20L), "b"),
      (Option(2L), Option(5L), "c"),
      (Option(3L), Option(7L), "d"),   // key with no right rows
      (None: Option[Long], Option(9L), "e"), // NULL key never matches
      (Option(1L), None: Option[Long], "f")  // NULL time never matches
    ).toDF("k", "t", "name")
    val r = Seq(
      (Option(1L), Option(10L)),
      (Option(1L), Option(15L)),
      (Option(2L), Option(6L)),
      (None: Option[Long], Option(1L)),  // NULL-key right row matches nothing
      (Option(1L), None: Option[Long])   // NULL-time right row matches nothing
    ).toDF("k", "t")
    def run(inclusive: Boolean): Map[String, Option[Long]] =
      graft.ops.AsOf.join(l, r, "k", "t", "t", Seq("t" -> "m"), inclusive)
        .collect()
        .map(row => row.getString(2) ->
          (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
    val strict = run(inclusive = false)
    assert(strict == Map("a" -> None, "b" -> Some(15L), "c" -> None,
      "d" -> None, "e" -> None, "f" -> None))
    val incl = run(inclusive = true)
    assert(incl == Map("a" -> Some(10L), "b" -> Some(15L), "c" -> None,
      "d" -> None, "e" -> None, "f" -> None))
  }

  test("rolling window frame: exactly one hour earlier is OUT, 59:59 earlier is IN (q60 boundary)") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 10:59:59"), 20.0), // 3599 s after e1 → e1 in frame
      (3L, 1L, ts("2024-01-01 11:00:00"), 40.0)  // 3600 s after e1 → e1 OUT, e2 in
    ).toDF("event_id", "user_id", "ts", "value")
    val got = graft.queries.Windows.rolling(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) == (1L, 10.0))
    assert(got(2L) == (2L, 30.0))
    assert(got(3L) == (2L, 60.0))
  }

  test("funnel stages must be STRICTLY after the previous stage (q62 ordering)") {
    // u1: full in-order funnel. u2: viewed BEFORE signing up and never
    // after → stalls at stage 1 even though both event types exist.
    // u3: view at the exact signup instant → not strictly after → stalls.
    val df = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 10:01:00")),
      (1L, "click", ts("2024-01-01 10:02:00")),
      (1L, "purchase", ts("2024-01-01 10:03:00")),
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (3L, "signup", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = graft.queries.Events.funnel(df).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(got == Map(1L -> 4, 2L -> 1, 3L -> 1))
    // and the full-funnel user's stage times are the planted ones, in order
    val u1 = graft.queries.Events.funnel(df).filter(col("user_id") === 1L).collect()(0)
    assert((1 to 4).map(u1.getTimestamp).sliding(2).forall { case Seq(a, b) => a.before(b) })
  }

  test("as-of never matches across NULL user_ids (q09 join-semantics parity)") {
    // a NULL-user click must not be adopted by a NULL-user purchase: the
    // oracle's LEFT JOIN ON equal user_id never matches NULL keys, but a
    // window partitionBy groups NULLs together — the click filter pins it
    val df = Seq(
      (Option.empty[Long], "click", ts("2024-01-01 09:00:00"), 1L),
      (Option.empty[Long], "purchase", ts("2024-01-01 10:00:00"), 2L),
      (Some(7L), "click", ts("2024-01-01 09:30:00"), 3L),
      (Some(7L), "purchase", ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = graft.queries.Events.asOf(df).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(got(2L).isEmpty, "NULL-user purchase adopted a NULL-user click")
    assert(got(4L).contains(ts("2024-01-01 09:30:00")))
  }

  test("exact-dup groups: planted identical docs form one group, rep = min doc_id (q29 non-vacuous)") {
    // The parquet corpus has no exact duplicates at the checked scale
    // factors (the q29 oracle row passes at 0 rows), so the operator's
    // group/filter behavior is pinned here on planted input instead.
    val docs = Seq(
      (5L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),  // exact copy — one group, rep doc_id 2
      (3L, "alpha beta GAMMA"),  // case differs → different md5, no group
      (4L, "delta")              // singleton → filtered out
    ).toDF("doc_id", "text")
    val res = graft.queries.Text.exactDupGroups(docs).collect()
    assert(res.length == 1)
    assert(res(0).getLong(1) == 2L) // n_copies
    assert(res(0).getLong(2) == 2L) // rep_doc = min doc_id of the group
  }

  test("forward fill: NULL before first purchase, carries across gaps, ts tie broken by event_id (q140)") {
    // one user: click, purchase 10.0, click, click, purchase 20.0, click —
    // plus a same-ts purchase pair where the HIGHER event_id must win
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
      (2L, ts("2024-01-01 10:01:00"), 7L, "purchase", 10.0),
      (3L, ts("2024-01-01 10:02:00"), 7L, "click", 0.0),
      (4L, ts("2024-01-01 10:03:00"), 7L, "click", 0.0),
      (5L, ts("2024-01-01 10:04:00"), 7L, "purchase", 20.0),
      (6L, ts("2024-01-01 10:04:00"), 7L, "purchase", 30.0), // ts tie: id 6 is later
      (7L, ts("2024-01-01 10:05:00"), 7L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = rows.select(col("event_id"),
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w).as("fill"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == null, "fill before the first purchase must be NULL")
    assert(got(2L) == 10.0 && got(3L) == 10.0 && got(4L) == 10.0)
    assert(got(5L) == 20.0, "a purchase row carries its own value")
    assert(got(6L) == 30.0 && got(7L) == 30.0,
      "same-ts purchases: the higher event_id is the later observation")
  }

  test("gaps-and-islands: planted streaks measured exactly; length tie → earliest start (q141)") {
    // user 7: A A B A A A B B  → longest run is the A-triple (len 3)
    // user 8: A A B B          → 2-vs-2 tie; the A run starts first
    val seq7 = Seq("A", "A", "B", "A", "A", "A", "B", "B")
    val seq8 = Seq("A", "A", "B", "B")
    val rows = (seq7.zipWithIndex.map { case (t, i) => (i.toLong, ts(f"2024-01-01 10:${i}%02d:00"), 7L, t, 0.0) } ++
      seq8.zipWithIndex.map { case (t, i) => (100L + i, ts(f"2024-01-01 10:${i}%02d:00"), 8L, t, 0.0) })
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.queries.Windows.streaksOn(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(7L) == (("A", 3L, 3L)), s"user 7: ${got(7L)}")
    assert(got(8L) == (("A", 2L, 100L)), s"user 8 tie must pick the earlier start: ${got(8L)}")
  }

  test("sweep-line concurrency: half-open boundary, overlap count, month-start carry-in (q142)") {
    import graft.queries.Events.peakConcurrency
    // p0 active [Jan 10, Feb 9), p1 [Jan 20, Feb 19), p2 starts EXACTLY
    // when p0 expires (Feb 9) — half-open: never 3 concurrent.
    // Jan peak = 2 (from Jan 20). Feb's first real boundary is p0's
    // expiration, but TWO promises are still active at Feb 1 — the
    // month-start sentinel must report the carry-in peak of 2.
    val rows = Seq(
      (0L, "purchase", ts("2024-01-10 00:00:00")),
      (1L, "purchase", ts("2024-01-20 00:00:00")),
      (2L, "purchase", ts("2024-02-09 00:00:00")), // == p0's due instant
      (3L, "click", ts("2024-01-05 00:00:00"))     // non-purchase ignored
    ).toDF("event_id", "event_type", "ts")
    val got = peakConcurrency(rows).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getTimestamp(2)))).toMap
    assert(got("2024-01-01") == ((2L, ts("2024-01-20 00:00:00"))),
      s"January: ${got.get("2024-01-01")}")
    assert(got("2024-02-01") == ((2L, ts("2024-02-01 00:00:00"))),
      s"February must carry 2 in at the sentinel: ${got.get("2024-02-01")}")
    // March: p1 expired Feb 19, p2 alone until Mar 10 — carry-in 1
    assert(got("2024-03-01") == ((1L, ts("2024-03-01 00:00:00"))),
      s"March: ${got.get("2024-03-01")}")
  }

  test("projection latest: ts tie broken by event_id desc (q27 / R8 last-writer-wins)") {
    val t = ts("2024-01-01 10:00:00")
    val df = Seq(
      (1L, 10L, "unpaid", t),
      (2L, 10L, "paid", t),       // same ts, higher event_id → wins
      (1L, 20L, "unpaid", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "status", "ts")
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val latest = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"status").orderBy($"user_id").collect()
    assert(latest.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((10L, "paid"), (20L, "unpaid")))
  }

  test("rollup: leaf groups sum to subtotals sum to grand total (q11 algebra)") {
    val res = graft.queries.Aggregates.q11(spark, sf001).collect()
    val leaves   = res.filter(r => r.getInt(0) == 0 && r.getInt(1) == 0)
    val subs     = res.filter(r => r.getInt(0) == 0 && r.getInt(1) == 1)
    val total    = res.filter(r => r.getInt(0) == 1 && r.getInt(1) == 1)
    assert(total.length == 1)
    assert(leaves.map(_.getLong(4)).sum == total.head.getLong(4))
    assert(subs.map(_.getLong(4)).sum == total.head.getLong(4))
    assert(math.abs(leaves.map(_.getDouble(5)).sum - total.head.getDouble(5)) < 1e-6)
  }

  test("dedup idempotence: dedup(dedup(x)) == dedup(x) (q26 law)") {
    // Compared on the dedup keys only: dropDuplicates picks an arbitrary
    // surviving row for non-key columns, so the full-row comparison is
    // nondeterministic across recomputations.
    val keys = Seq("user_id", "event_type", "ts")
    val ev = graft.tables.Tables.events(spark, sf001)
    val once = ev.dropDuplicates(keys).select(keys.map(col): _*)
    val twice = once.dropDuplicates(keys).select(keys.map(col): _*)
    assert(once.count() == twice.count())
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("set algebra: union = intersect + both excepts over the same sets (q15-q17)") {
    val u = SparkEntry.queries("q15_set_union")(spark, sf001).count()
    val i = SparkEntry.queries("q16_set_intersect")(spark, sf001).count()
    val e = SparkEntry.queries("q17_set_except")(spark, sf001).count()
    val ev = graft.tables.Tables.events(spark, sf001)
    val purchaseOnly = ev.filter($"event_type" === "purchase").select($"user_id")
      .except(ev.filter($"event_type" === "click").select($"user_id")).count()
    assert(u == i + e + purchaseOnly)
  }

  test("sliding windows assign every event to exactly two 1h/30m windows (q24 invariant)") {
    val n = graft.tables.Tables.events(spark, sf001).count()
    val windowed = graft.queries.Windows.q24(spark, sf001)
      .agg(sum($"n")).collect()(0).getLong(0)
    assert(windowed == 2 * n)
  }

  test("cosine: self-similarity rounds to 1.0 (q31 arithmetic sanity)") {
    val e = graft.tables.Tables.embeddings(spark, sf001).limit(5)
    val self = e.select(graft.ops.Dsl.round4(
      graft.ops.Dsl.cosine($"embedding", $"embedding")).as("s")).collect()
    assert(self.forall(_.getDouble(0) == 1.0))
  }

  test("dq audit counts planted violations; clean corpus is all-zero (q109)") {
    import graft.queries.Quality
    import org.apache.spark.sql.functions.{col, lit}
    // the driver corpus is clean — the oracle row alone would pass
    // vacuously at 0 violations, so plant one of each class
    val sf = sf001
    val t = graft.tables.Tables
    val clean = SparkEntry.queries("q109_dq_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.values.forall(_ == 0L), s"clean corpus has violations: $clean")
    assert(clean.size == 10)
    val badLineitem = t.lineitem(spark, sf).limit(1)
      .select(lit(-999999L).as("l_orderkey") +: t.lineitem(spark, sf).columns.toSeq
        .filter(_ != "l_orderkey").map(col): _*)
      .withColumn("l_quantity", lit(-5.0))
      .unionByName(t.lineitem(spark, sf), allowMissingColumns = false)
    val badEvents = t.events(spark, sf).limit(1)
      .withColumn("event_type", lit("mystery"))
      .withColumn("user_id", lit(null).cast("long"))
      .unionByName(t.events(spark, sf))
    val badEmb = t.embeddings(spark, sf).limit(1)
      .withColumn("embedding", org.apache.spark.sql.functions.slice(col("embedding"), 1, 3))
      .unionByName(t.embeddings(spark, sf))
    val planted = Quality.dqAudit(badLineitem, t.orders(spark, sf),
      t.customer(spark, sf), t.nation(spark, sf), badEvents,
      t.documents(spark, sf), badEmb).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(planted("lineitem_orphans") == 1L)
    assert(planted("lineitem_nonpositive_qty") == 1L)
    assert(planted("events_unknown_type") == 1L)
    assert(planted("events_null_user") == 1L)
    assert(planted("embeddings_dim_drift") == 1L)
    assert(planted("orders_orphans") == 0L)
  }

  test("SCD2 history: consecutive same-status events collapse, open interval has NULL valid_to (q113)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ts = (s: Int) => new java.sql.Timestamp(1700000000000L + s * 1000L)
    // user 1: A, A (collapses), B, A — three intervals, last one open;
    // user 2: one event — a single open interval from its own ts
    val ev = Seq(
      (1L, 10L, "A", ts(0)), (1L, 11L, "A", ts(1)),
      (1L, 12L, "B", ts(2)), (1L, 13L, "A", ts(3)),
      (2L, 20L, "X", ts(5))).toDF("user_id", "event_id", "event_type", "ts")
    val got = graft.queries.Events.scd2(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
    assert(got.toSeq == Seq(
      (1L, 10L, "A", ts(0), Some(ts(2))),
      (1L, 12L, "B", ts(2), Some(ts(3))),
      (1L, 13L, "A", ts(3), None),
      (2L, 20L, "X", ts(5), None)))
    // intervals tile: each user's valid_from chain is contiguous (next
    // valid_from == previous valid_to) — the SCD2 invariant a reader
    // joins on
    // same-instant change: ties order by event_id, so the later event_id
    // wins the open interval and the earlier one closes at the SAME ts
    // (zero-width interval, never lost)
    val tied = Seq((3L, 30L, "P", ts(7)), (3L, 31L, "Q", ts(7)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val gotTied = graft.queries.Events.scd2(tied).collect()
      .map(r => (r.getLong(1), r.getString(2), Option(r.getTimestamp(4))))
    assert(gotTied.toSeq == Seq((30L, "P", Some(ts(7))), (31L, "Q", None)))
  }

  test("q114 aging: every bucket boundary (0/1/7/8/14/15/30/31) and the log-clock anchor, on planted promises") {
    import spark.implicits._
    // Horizon is a CLICK at 2024-06-30 (the log clock, not the purchase
    // clock) → ref_date = 2024-07-16; age = ref − (ts_date + 30) =
    // maxdate − ts_date − 14. One planted promise per boundary age,
    // including the over-30 bucket the synthetic 30-day log can never
    // reach (vacuity discipline), and same-user pairs so n_users <
    // n_promises in every bucket that has them.
    val ev = Seq(
      (9L, "click", ts("2024-06-30 23:00:00"), 0.0),
      (1L, "purchase", ts("2024-06-30 10:00:00"), 10.00), // age -14: current
      (1L, "purchase", ts("2024-06-16 09:00:00"), 5.50),  // age 0: due == ref is still current
      (2L, "purchase", ts("2024-06-15 01:00:00"), 1.25),  // age 1
      (3L, "purchase", ts("2024-06-09 23:59:59"), 2.75),  // age 7
      (2L, "purchase", ts("2024-06-08 00:00:00"), 3.00),  // age 8
      (2L, "purchase", ts("2024-06-02 12:00:00"), 4.00),  // age 14
      (4L, "purchase", ts("2024-06-01 00:00:01"), 6.00),  // age 15
      (4L, "purchase", ts("2024-05-17 00:00:00"), 7.00),  // age 30
      (5L, "purchase", ts("2024-05-16 00:00:00"), 8.00),  // age 31
      (5L, "purchase", ts("2024-01-01 00:00:00"), 9.00)   // age 167
    ).toDF("user_id", "event_type", "ts", "value")
    val got = graft.queries.Events.aging(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5),
        r.getDate(6).toString))).toMap
    assert(got.keySet == Set("0_current", "1_past_1_7", "2_past_8_14",
      "3_past_15_30", "4_past_over_30"))
    assert(got("0_current") == ((2L, 1L, 15.50, -14L, 0L, "2024-07-16")))
    assert(got("1_past_1_7") == ((2L, 2L, 4.00, 1L, 7L, "2024-07-16")))
    assert(got("2_past_8_14") == ((2L, 1L, 7.00, 8L, 14L, "2024-07-16")))
    assert(got("3_past_15_30") == ((2L, 1L, 13.00, 15L, 30L, "2024-07-16")))
    assert(got("4_past_over_30") == ((2L, 1L, 17.00, 31L, 167L, "2024-07-16")))
  }

  test("q152 snapshot diff: unchanged users absent; insert/update images exact; ties and late arrivals resolve by LWW") {
    val cutoff = "2020-01-06 00:00:00"
    val ev = Seq(
      // user 1: both events inside the snapshot -> winner did not move -> absent
      (1L, 1L, ts("2020-01-01 10:00:00"), "click", 1.0),
      (1L, 2L, ts("2020-01-02 10:00:00"), "view", 2.0),
      // user 2: first seen after the cutoff -> insert with NULL old image
      (2L, 3L, ts("2020-01-10 10:00:00"), "signup", 3.0),
      // user 3: plain update
      (3L, 4L, ts("2020-01-01 10:00:00"), "click", 4.0),
      (3L, 5L, ts("2020-01-10 10:00:00"), "purchase", 5.0),
      // user 4: same-ts tie inside the snapshot -> event_id breaks it (7 wins)
      (4L, 6L, ts("2020-01-01 10:00:00"), "click", 6.0),
      (4L, 7L, ts("2020-01-01 10:00:00"), "view", 7.0),
      (4L, 8L, ts("2020-01-20 10:00:00"), "error", 8.0),
      // user 5: the post-cutoff event is EARLIER than the snapshot winner
      // (a late arrival) -> the LWW winner never moves -> absent
      (5L, 9L, ts("2020-01-05 10:00:00"), "view", 9.0),
      (5L, 10L, ts("2020-01-02 10:00:00"), "click", 10.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.ChangeData.snapshotDiff(ev, cutoff).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(2L, 3L, 4L), s"changed-key set wrong: ${got.keySet}")
    val ins = got(2L)
    assert(ins.getString(1) == "insert" && ins.isNullAt(2) && ins.isNullAt(3) &&
      ins.isNullAt(4) && ins.isNullAt(5))
    assert(ins.getLong(6) == 3L && ins.getString(7) == "signup" && ins.getDouble(8) == 3.0)
    val up3 = got(3L)
    assert(up3.getString(1) == "update" && up3.getLong(2) == 4L && up3.getLong(6) == 5L)
    val up4 = got(4L)
    assert(up4.getLong(2) == 7L, "same-ts tie must resolve to the higher event_id (q27 LWW)")
    assert(up4.getString(3) == "view" && up4.getLong(6) == 8L)
  }

  test("q153 transitions: per-user consecutive pairs in (ts, event_id) order; no cross-user pair; probabilities row-normalize") {
    val ev = Seq(
      (1L, 1L, ts("2020-01-01 10:00:00"), "A", 0.0),
      (1L, 2L, ts("2020-01-01 11:00:00"), "B", 0.0),
      (1L, 3L, ts("2020-01-01 12:00:00"), "A", 0.0),
      (2L, 4L, ts("2020-01-01 10:00:00"), "B", 0.0),
      (2L, 5L, ts("2020-01-01 11:00:00"), "B", 0.0),
      // user 3: same-ts pair -> event_id order decides X -> Y
      (3L, 6L, ts("2020-01-01 10:00:00"), "X", 0.0),
      (3L, 7L, ts("2020-01-01 10:00:00"), "Y", 0.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.Behavior.transitionProbs(
        graft.queries.Behavior.transitionCounts(ev)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("A", "B") -> ((1L, 1.0)),
      ("B", "A") -> ((1L, 0.5)),
      ("B", "B") -> ((1L, 0.5)),
      ("X", "Y") -> ((1L, 1.0))), s"got $got")
  }

  test("q154 attribution: window boundary inclusive, same-ts touch excluded (strict as-of), same-ts touches LWW by event_id") {
    import graft.queries.Behavior.AttributionWindowMicros
    assert(AttributionWindowMicros == 21600000000L)
    val ev = Seq(
      // u1: touch 1h before -> attributed to view
      (1L, 1L, ts("2020-01-01 09:00:00"), "view", 0.0),
      (1L, 2L, ts("2020-01-01 10:00:00"), "purchase", 10.0),
      // u2: touch 10h before -> outside the 6h window -> direct
      (2L, 3L, ts("2020-01-01 00:00:00"), "click", 0.0),
      (2L, 4L, ts("2020-01-01 10:00:00"), "purchase", 20.0),
      // u3: no touch at all -> direct
      (3L, 5L, ts("2020-01-01 10:00:00"), "purchase", 30.0),
      // u4: touch at the purchase instant -> strict < excludes it -> direct
      (4L, 6L, ts("2020-01-01 10:00:00"), "click", 0.0),
      (4L, 7L, ts("2020-01-01 10:00:00"), "purchase", 40.0),
      // u5: two touches at the same ts -> the higher event_id (view) gets credit
      (5L, 8L, ts("2020-01-01 09:00:00"), "click", 0.0),
      (5L, 9L, ts("2020-01-01 09:00:00"), "view", 0.0),
      (5L, 10L, ts("2020-01-01 10:00:00"), "purchase", 50.0),
      // u6: touch exactly 6h before -> boundary is INCLUSIVE -> attributed
      (6L, 11L, ts("2020-01-01 04:00:00"), "signup", 0.0),
      (6L, 12L, ts("2020-01-01 10:00:00"), "purchase", 60.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.Behavior.attribution(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      "view" -> ((2L, 60.0)),
      "signup" -> ((1L, 60.0)),
      "direct" -> ((3L, 90.0))), s"got $got")
  }

  test("q155 TWAP: right-open integral over holding durations; same-ts order by event_id; single-event user unscored") {
    val ev = Seq(
      // u1: 1.0 held 10 s, 3.0 held 30 s, last event holds nothing
      // -> (1*10 + 3*30) / 40 = 2.5
      (1L, 1L, ts("2020-01-01 10:00:00"), "A", 1.0),
      (1L, 2L, ts("2020-01-01 10:00:10"), "A", 3.0),
      (1L, 3L, ts("2020-01-01 10:00:40"), "A", 2.0),
      // u2: same-ts pair ordered by event_id: id 4 holds 0 s, id 5 holds
      // 2 s -> twap = 5.0 (1.0 if the tie broke the other way)
      (2L, 4L, ts("2020-01-01 10:00:00"), "A", 1.0),
      (2L, 5L, ts("2020-01-01 10:00:00"), "A", 5.0),
      (2L, 6L, ts("2020-01-01 10:00:02"), "A", 0.0),
      // u3: single event -> empty span, NULL twap
      (3L, 7L, ts("2020-01-01 10:00:00"), "A", 9.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.Behavior.twap(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 40000000L, 2.5)))
    assert(got(2L) == ((3L, 2000000L, 5.0)))
    assert(got(3L) == ((1L, 0L, null)))
  }

  test("q156 RFM: planted monotone metrics land in hand-computed quintiles; recency anchors on the log clock") {
    // user u (1..10) has u events, all value 1.00, all on day 2020-01-u:
    // frequency = u, monetary = u dollars, recency = 10 - u days (the log
    // clock is user 10's day). All three histograms have N = 10 rows of
    // count 1, so the disc boundaries (5·cum >= k·N <=> cum >= 2k) are the
    // 2nd/4th/6th/8th distinct values, and every quintile is derivable by
    // hand: f_q = m_q = ceil(u/2), r_q = 1 + #{1,3,5,7 < 10-u}.
    val ev = (1 to 10).flatMap { u =>
      (0 until u).map { i =>
        (u.toLong, (u * 100 + i).toLong,
          ts(f"2020-01-$u%02d 10:$i%02d:00"), "click", 1.00)
      }
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.Behavior.rfm(ev).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    def rq(u: Int) = 1 + Seq(1, 3, 5, 7).count(_ < 10 - u)
    def fq(u: Int) = (u + 1) / 2
    val want = (1 to 10).groupBy(u => (rq(u), fq(u), fq(u))).map { case (k, us) =>
      k -> ((us.size.toLong, us.map(_.toDouble).sum,
        us.map(_.toDouble).sum / us.size))
    }
    assert(got.keySet == want.keySet, s"segment grid wrong: ${got.keySet}")
    for ((k, (n, tv, af)) <- want) {
      assert(got(k)._1 == n && got(k)._2 == tv, s"segment $k: ${got(k)} want ($n, $tv)")
      assert(math.abs(got(k)._3 - af) < 1e-9, s"segment $k avg_freq: ${got(k)._3} want $af")
    }
  }

  test("q157 position attribution: first/last split, single-touch double credit, boundary inclusive, credit conserved") {
    val ev = Seq(
      // u1: two touches in window -> A first half, B last half
      (1L, 1L, ts("2020-01-01 09:00:00"), "A", 0.0),
      (1L, 2L, ts("2020-01-01 09:30:00"), "B", 0.0),
      (1L, 3L, ts("2020-01-01 10:00:00"), "purchase", 10.00),
      // u2: one touch -> C takes BOTH halves (first and last roles)
      (2L, 4L, ts("2020-01-01 09:00:00"), "C", 0.0),
      (2L, 5L, ts("2020-01-01 10:00:00"), "purchase", 20.00),
      // u3: no touch at all -> direct
      (3L, 6L, ts("2020-01-01 10:00:00"), "purchase", 30.00),
      // u4: touch 8h before -> outside the 6h window -> direct
      (4L, 7L, ts("2020-01-01 02:00:00"), "A", 0.0),
      (4L, 8L, ts("2020-01-01 10:00:00"), "purchase", 40.00),
      // u5: same-ts touch pair dedupes to the higher event_id (D), which
      // then takes both halves; odd cents halve exactly (5.005 + 5.005)
      (5L, 9L, ts("2020-01-01 09:00:00"), "Cx", 0.0),
      (5L, 10L, ts("2020-01-01 09:00:00"), "D", 0.0),
      (5L, 11L, ts("2020-01-01 10:00:00"), "purchase", 10.01),
      // u6: first touch EXACTLY 6h before (inclusive boundary) + a later
      // touch -> E first half, F last half
      (6L, 12L, ts("2020-01-01 04:00:00"), "E", 0.0),
      (6L, 13L, ts("2020-01-01 09:00:00"), "F", 0.0),
      (6L, 14L, ts("2020-01-01 10:00:00"), "purchase", 60.00)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.Behavior.positionAttribution(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got == Map(
      "A" -> ((1L, 0L, 0L, 5.00)),
      "B" -> ((0L, 1L, 0L, 5.00)),
      "C" -> ((1L, 1L, 0L, 20.00)),
      "D" -> ((1L, 1L, 0L, 10.01)),
      "E" -> ((1L, 0L, 0L, 30.00)),
      "F" -> ((0L, 1L, 0L, 30.00)),
      "direct" -> ((0L, 0L, 2L, 70.00))), s"got $got")
    // conservation: the split never mints or loses revenue
    val totalCredit = got.values.map(_._4).sum
    assert(math.abs(totalCredit - 170.01) < 1e-9, s"credit not conserved: $totalCredit")
  }

  test("q160 basket pairs: per-order brand membership dedupes; counts, confidence and lift match the hand-computed rules") {
    // orders: o1 {X, Y}, o2 {X, Y} (Y twice -> dedupes), o3 {X}, o4 {Z}
    val li = Seq(
      (1L, 101L), (1L, 102L),
      (2L, 103L), (2L, 104L), (2L, 105L), // X + Y + Y -> {X, Y}
      (3L, 106L),
      (4L, 107L)).toDF("l_orderkey", "l_partkey")
    val brands = Seq(
      (101L, "X"), (102L, "Y"), (103L, "X"), (104L, "Y"), (105L, "Y"),
      (106L, "X"), (107L, "Z")).toDF("p_partkey", "p_brand")
    val got = graft.queries.Basket.basketPairs(li, brands).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
    // only the co-occurring pair appears; n_orders=4, n_X=3, n_Y=2, n_XY=2
    // conf P(Y|X) = 2/3 -> 0.6667; lift = 2*4/(3*2) = 4/3 -> 1.3333
    assert(got.toSeq == Seq((("X", "Y"), (2L, 3L, 2L, 0.6667, 1.3333))), s"got ${got.toSeq}")
  }

  test("q163 skyline: no output point is dominated, every input is weakly dominated by an output point, and the planted frontier is exact") {
    // points (qty, price): frontier under (max qty, min price) must be
    // (1, 1.0), (3, 2.0), (5, 4.0):
    //  - (1, 1.0) survives: nothing with qty >= 1 has price <= 1.0
    //  - (2, 3.0) dominated by (3, 2.0); (3, 5.0) dominated by (3, 2.0)
    //  - (4, 4.0) dominated by (5, 4.0) (equal price, higher qty: strict)
    //  - duplicate (5, 4.0) keeps both supporting rows -> n_best = 2
    val rows = Seq(
      (1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (3.0, 5.0),
      (4.0, 4.0), (5.0, 4.0), (5.0, 4.0))
      .toDF("qty", "price")
    val got = graft.queries.Skyline.skyline(rows).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq((1.0, 1.0, 1L), (3.0, 2.0, 1L), (5.0, 4.0, 2L)), s"got $got")
    // dominance laws against the raw input
    val pts = rows.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def dominates(a: (Double, Double), b: (Double, Double)) =
      a._1 >= b._1 && a._2 <= b._2 && (a._1 > b._1 || a._2 < b._2)
    got.foreach { case (q, p, _) =>
      assert(!pts.exists(x => dominates(x, (q, p))), s"frontier point ($q,$p) dominated") }
    pts.foreach { x =>
      assert(got.exists { case (q, p, _) => (q, p) == x || dominates((q, p), x) },
        s"input $x not covered by the frontier") }
  }

  test("q164 survival: censored users stay at risk through their window but never count as failures; hazards hand-computed; cumhaz sums exactly") {
    // u1, u2: convert on day 2; u4: converts on day 5; u3: censored at
    // day 5 (no purchase); u5: censored at day 1. At-risk at t=2 is
    // {u1,u2,u3,u4} (u5's window ended) = 4; at t=5 it is {u3,u4} = 2.
    def e(u: Long, id: Long, day: Int, typ: String) =
      (u, id, ts(f"2020-01-0${day + 1}%d 12:00:00"), typ, 1.0)
    val ev = Seq(
      e(1L, 1L, 0, "view"), e(1L, 2L, 2, "purchase"),
      e(2L, 3L, 0, "view"), e(2L, 4L, 2, "purchase"),
      e(3L, 5L, 0, "view"), e(3L, 6L, 5, "click"),
      e(4L, 7L, 0, "view"), e(4L, 8L, 5, "purchase"),
      e(5L, 9L, 0, "view"), e(5L, 10L, 1, "click"))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.Behavior.survivalHazard(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    // t=2: d=2, n=4 -> hazard 0.5; t=5: d=1, n=2 -> hazard 0.5, cum 1.0
    assert(got == Seq((2, 4L, 2L, 0.5, 0.5), (5, 2L, 1L, 0.5, 1.0)), s"got $got")
  }

  test("q169 conversion latency: purchase before signup never counts, same-instant counts as zero hours, DISC p50/p90 hand-computed") {
    // u1: signup 10:00, purchase 10:00 (same instant -> 0h) — boundary IN
    // u2: purchase 09:00 BEFORE signup 10:00, then purchase 13:30 -> 3h
    // u3: signup 10:00, purchase next day 12:00 -> 26h
    // u4: purchase only, never signed up -> excluded entirely
    val ev = Seq(
      (1L, 1L, ts("2020-01-01 10:00:00"), "signup", 0.0),
      (1L, 2L, ts("2020-01-01 10:00:00"), "purchase", 1.0),
      (2L, 3L, ts("2020-01-01 09:00:00"), "purchase", 1.0),
      (2L, 4L, ts("2020-01-01 10:00:00"), "signup", 0.0),
      (2L, 5L, ts("2020-01-01 13:30:00"), "purchase", 1.0),
      (3L, 6L, ts("2020-01-01 10:00:00"), "signup", 0.0),
      (3L, 7L, ts("2020-01-02 12:00:00"), "purchase", 1.0),
      (4L, 8L, ts("2020-01-01 11:00:00"), "purchase", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = graft.queries.Behavior.conversionLatency(ev).collect()(0)
    // latencies {0, 3, 26}: N=3; p50 = smallest h with 2cum>=3 -> 3;
    // p90 = smallest h with 10cum>=27 -> 26; mean = 29/3 -> 9.6667
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((3L, 3L, 26L, 9.6667)), s"got $r")
  }

  test("q170 ship-lag quantiles: hand-computed DISC p50/p90 per priority") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val o = Seq(
      (1L, d("1996-01-01"), "1-URGENT"),
      (2L, d("1996-01-01"), "1-URGENT"),
      (3L, d("1996-01-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    // URGENT lags {1, 1, 5, 9}: p50 -> cum(1)=2, 2*2>=4 -> 1;
    //   p90 -> 10*cum>=36: cum(5)=3 (30<36), cum(9)=4 -> 9
    // HIGH lags {7}: p50 = p90 = 7
    val li = Seq(
      (1L, d("1996-01-02")), (1L, d("1996-01-02")), (1L, d("1996-01-06")),
      (2L, d("1996-01-10")),
      (3L, d("1996-01-08")))
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.queries.Relational.shipLagQuantiles(li, o).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toSeq
    assert(got == Seq("1-URGENT" -> ((4L, 1, 9)), "2-HIGH" -> ((1L, 7, 7))), s"got $got")
  }

  test("q178 session flow: entry/exit by the (ts, event_id) order, bounces are single-event sessions, durations exact") {
    val ev = Seq(
      // u1 session 1: view -> click -> purchase over 20 min
      (1L, 1L, ts("2020-01-01 10:00:00"), "view", 0.0),
      (1L, 2L, ts("2020-01-01 10:10:00"), "click", 0.0),
      (1L, 3L, ts("2020-01-01 10:20:00"), "purchase", 0.0),
      // u1 session 2: 70 min after the last event -> new single-view
      // session -> a bounce
      (1L, 4L, ts("2020-01-01 11:30:00"), "view", 0.0),
      // u2: lone error -> bounce with entry == exit
      (2L, 5L, ts("2020-01-01 12:00:00"), "error", 0.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.queries.Windows.sessionFlow(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got == Map(
      ("error", "error") -> ((1L, 1L, 1.0, 0.0)),
      ("view", "purchase") -> ((1L, 0L, 0.0, 1200.0)),
      ("view", "view") -> ((1L, 1L, 1.0, 0.0))), s"got $got")
  }

  test("q176 frame sampling: midpoint indices land in range, K rows per item, too-short items absent") {
    // doc 0: 1000 chars, fps 24 -> total 24 frames; midpoint indices
    // 24*(1,3,5,7)/8 = 3, 9, 15, 21
    // doc 1: 10 chars, fps 25 -> total 10*25 div 1000 = 0 -> absent
    val docs = Seq((0L, "x" * 1000), (1L, "y" * 10))
      .toDF("doc_id", "text")
    val got = graft.queries.MediaQ.frameSamplePlan(docs).collect()
    assert(got.map(_.getLong(0)).distinct.toSeq == Seq(0L), "short item must be absent")
    assert(got.length == graft.queries.MediaQ.FrameSamples)
    assert(got.map(_.getLong(4)).toSeq == Seq(3L, 9L, 15L, 21L), "midpoint indices")
    got.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(3), "index in range")
      assert(r.getString(5).length == 32, "pointed read digested") }
  }
}
