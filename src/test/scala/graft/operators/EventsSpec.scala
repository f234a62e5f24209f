package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property test for the session-window semantics beyond the harness's one
  * events distribution (r9 VERDICT item 6): generated corpora whose gaps
  * deliberately straddle the 30-minute boundary (29:59.999999, exactly
  * 30:00, 30:00.000001) plus ts ties, driven through the PRODUCTION
  * aggregation ([[Events.sessionize]] — the same code q27 runs) and
  * compared against an independent gaps-and-islands model computed in
  * plain Scala.
  *
  * The session contract under test — pinned EMPIRICALLY by this spec's
  * first run, which falsified the previous doc comment: Spark merges
  * windows that TOUCH. An event at exactly `last + 30min` JOINS the
  * session (gap <= 30min merges, including a tie at gap 0; gap > 30min
  * breaks). The q27 oracle encodes the same inclusive `<=` merge
  * condition; harness data never lands on the exact microsecond
  * boundary, which is why only a generated corpus could decide this.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 30L * 60L * 1000000L
  private val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in micros

  private def cents(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong

  /** Independent model: sort per user, break where the gap from the
    * previous event EXCEEDS 30 minutes (inclusive touch-merge), emit
    * (user, start-string, count, cent-sum) per island. */
  private def islands(rows: Seq[(Long, Long, Double)])
      : Set[(Long, String, Long, Long)] = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    rows.groupBy(_._1).iterator.flatMap { case (user, evs) =>
      val sorted = evs.map(e => (e._2, e._3)).sortBy(_._1)
      val sessions = Seq.newBuilder[(Long, String, Long, Long)]
      var start = 0L; var prev = Long.MinValue
      var n = 0L; var sum = 0L
      def flush(): Unit = if (n > 0) sessions += ((user,
        fmt.format(java.time.Instant.ofEpochSecond(
          Math.floorDiv(start, 1000000L))), n, sum))
      sorted.foreach { case (ts, v) =>
        if (n == 0 || ts - prev > gapUs) { flush(); start = ts; n = 0; sum = 0 }
        prev = ts; n += 1; sum += cents(v)
      }
      flush()
      sessions.result()
    }.toSet
  }

  private def run(rows: Seq[(Long, Long, Double)])
      : Set[(Long, String, Long, Long)] = {
    val df = Random.shuffle(rows) // arrival order must not matter
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    Events.sessionize(df, "30 minutes").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("constructed boundary corpus: exactly-30min gap MERGES (touching " +
       "windows), one-microsecond more splits, ties merge") {
    val rows = Seq(
      // user 1: second event at exactly +30min → windows touch → ONE session
      (1L, baseUs, 1.0), (1L, baseUs + gapUs, 1.0),
      // user 2: +30min − 1µs → one session of 2
      (2L, baseUs, 1.0), (2L, baseUs + gapUs - 1L, 1.0),
      // user 3: +30min + 1µs → TWO sessions
      (3L, baseUs, 1.0), (3L, baseUs + gapUs + 1L, 1.0),
      // user 4: tie on ts (gap 0) then a chain of exactly-30:00 hops — the
      // session extends from the LAST event, so all five stay one session
      (4L, baseUs, 0.5), (4L, baseUs, 0.5),
      (4L, baseUs + gapUs, 1.0),
      (4L, baseUs + 2L * gapUs, 1.0),
      (4L, baseUs + 3L * gapUs, 1.0),
      // user 5: singleton
      (5L, baseUs + 12345L, 9.99))
    val got = run(rows)
    val want = islands(rows)
    assert(got === want)
    assert(got.count(_._1 == 1L) == 1 && got.count(_._1 == 2L) == 1 &&
           got.count(_._1 == 3L) == 2 && got.count(_._1 == 4L) == 1,
      s"boundary split/merge shape wrong: $got")
  }

  test("seeded random corpora: production sessionize == gaps-and-islands model") {
    (1 to 3).foreach { trial =>
      val rnd = new Random(1000 + trial)
      val rows = (1L to 20L).flatMap { user =>
        var ts = baseUs + rnd.nextInt(1000000)
        (1 to 30 + rnd.nextInt(50)).map { _ =>
          // gap mix concentrated on the boundary: dead-on 30:00, ±1µs,
          // ±1s, ties, plus ordinary short/long gaps
          val gap = rnd.nextInt(8) match {
            case 0 => gapUs
            case 1 => gapUs - 1L
            case 2 => gapUs + 1L
            case 3 => gapUs - 1000000L
            case 4 => gapUs + 1000000L
            case 5 => 0L
            case 6 => rnd.nextInt(600).toLong * 1000000L
            case _ => (gapUs / 1000000L + rnd.nextInt(3600)) * 1000000L
          }
          ts += gap
          (user, ts, rnd.nextDouble() * 100.0)
        }
      }
      assert(run(rows) === islands(rows), s"trial $trial diverged")
    }
  }

  /** Independent sliding-window model: an event at micros `us` belongs to
    * the windows whose start s is a 15-minute mark with
    * s ≤ us < s + 1 h — half-open [start, end), the membership the q106
    * oracle derives arithmetically. */
  private def slidingModel(rows: Seq[(Long, String, Double)])
      : Set[(String, String, Long, Long)] = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val slide = 15L * 60L * 1000000L
    val win = 4L * slide
    rows.flatMap { case (us, et, v) =>
      val b0 = math.floorDiv(us, slide) * slide
      (0L until 4L).map(k => b0 - k * slide)
        .filter(s => s <= us && us < s + win)
        .map(s => (fmt.format(java.time.Instant.ofEpochSecond(
          s / 1000000L, (s % 1000000L) * 1000L)), et, v))
    }.groupBy(r => (r._1, r._2)).map { case ((w, et), g) =>
      (w, et, g.size.toLong, g.map(r => cents(r._3)).sum)
    }.toSet
  }

  test("sliding-window boundary corpus: on-the-mark events obey half-open " +
       "[start, end) membership through the production aggregation") {
    // events at exact 15-minute marks, ±1 µs, and mid-bucket — including
    // one exactly at a window END (base + 1h), which must be OUT of the
    // window starting at base and IN the four windows starting at
    // base+15m .. base+1h
    val marks = Seq(0L, 1L, -1L, slideProbe, slideProbe - 1L,
      4L * slideProbe, 4L * slideProbe + 1L, 7L * slideProbe / 2L)
    val rows = marks.zipWithIndex.map { case (off, i) =>
      (baseUs + off, if (i % 2 == 0) "click" else "view", 1.0 + i)
    }
    val got = Events.slidingCore(rows.toDF("us", "event_type", "value")
        .select(timestamp_micros(col("us")).as("ts"), col("event_type"),
          col("value")))
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("sum_value_cents"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === slidingModel(rows), s"sliding membership diverged:\n$got")
  }
  private val slideProbe = 15L * 60L * 1000000L

  test("q98 cap: a constructed 100k-event bot session truncates the path " +
       "at the cap with a count-preserving marker; session metadata " +
       "reflects the FULL session") {
    val n = 100000
    val cap = Events.SessionPathCap
    // one user, one event per second → a single 100k-event session: the
    // input a bot or an instrumentation loop produces, where an uncapped
    // per-session collect is the memory failure mode
    val rows = (0 until n).map(i =>
      (1L, baseUs + i * 1000000L, i.toLong, if (i % 2 == 0) "a" else "b"))
    val df = rows.toDF("user_id", "us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("event_type"))
    val out = Events.sessionPathFrame(df).collect()
    assert(out.length === 1, s"expected one session, got ${out.length}")
    val r = out.head
    val expectPath = (0 until cap)
      .map(i => if (i % 2 == 0) "a" else "b").mkString(">") +
      s">...+${n - cap}"
    assert(r.getAs[String]("path") === expectPath)
    assert(r.getAs[Long]("session_start") === baseUs)
    // session_end = max ts over ALL events + gap — truncation must not
    // shorten the session's clock
    assert(r.getAs[Long]("session_end") ===
      baseUs + (n - 1) * 1000000L + gapUs)
  }

  test("q98 cap: sessions at and below the cap carry no marker") {
    val rows = (0 until Events.SessionPathCap).map(i =>
      (1L, baseUs + i * 1000000L, i.toLong, "a"))
    val df = rows.toDF("user_id", "us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("event_type"))
    val p = Events.sessionPathFrame(df).collect().head.getAs[String]("path")
    assert(p === Seq.fill(Events.SessionPathCap)("a").mkString(">"))
  }

  // ── q119 resample + forward fill ─────────────────────────────────────────

  private val hourUs = 3600000000L

  /** Independent model of [[Events.resampleGrid]]: per user, collapse to
    * hours electing the (us, event_id)-last event's cents, then emit every
    * hour from first to last observation, carrying the previous value
    * forward with n_obs = 0 on synthesized hours. */
  private def ffillModel(rows: Seq[(Long, Long, Long, Long)]) // u, eid, us, v
      : Set[(Long, Long, Long, Long)] = // u, hour, v_cents, n_obs
    rows.groupBy(_._1).iterator.flatMap { case (u, evs) =>
      val obs = evs.groupBy(e => e._3 / hourUs).toSeq.map { case (h, es) =>
        val last = es.maxBy(e => (e._3, e._2))
        (h, last._4, es.size.toLong)
      }.sortBy(_._1)
      val byHour = obs.map(o => o._1 -> o).toMap
      var carry = 0L
      (obs.head._1 to obs.last._1).map { h =>
        byHour.get(h) match {
          case Some((_, v, n)) => carry = v; (u, h, v, n)
          case None            => (u, h, carry, 0L)
        }
      }
    }.toSet

  private def runGrid(rows: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long)] =
    Events.resampleGrid(Random.shuffle(rows) // arrival order must not matter
        .toDF("user_id", "event_id", "us", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("q119 boundary corpus: gaps fill forward with n_obs=0, exact-hour " +
       "events land in their own hour, same-us ties elect by event_id") {
    val rows = Seq(
      // user 1: obs at hours 0 and 3 → hours 1,2 synthesized from hour 0
      (1L, 10L, baseUs + 100L, 500L),
      (1L, 11L, baseUs + 3 * hourUs + 5L, 700L),
      // user 2: event at EXACTLY an hour boundary belongs to that hour
      (2L, 20L, baseUs + hourUs, 900L),
      // user 3: two events in one hour at the SAME microsecond — the
      // higher event_id wins the election
      (3L, 30L, baseUs + 42L, 111L),
      (3L, 31L, baseUs + 42L, 222L),
      // user 4: single event → single-row grid, no fill
      (4L, 40L, baseUs + 7L, 333L))
    val got = runGrid(rows)
    assert(got === ffillModel(rows))
    val base = baseUs / hourUs
    assert(got.contains((1L, base + 1L, 500L, 0L)), "hour 1 fills from hour 0")
    assert(got.contains((1L, base + 2L, 500L, 0L)), "hour 2 fills from hour 0")
    assert(got.contains((2L, base + 1L, 900L, 1L)), "boundary event owns its hour")
    assert(got.contains((3L, base, 222L, 2L)), "same-us tie elects max event_id")
    assert(got.count(_._1 == 4L) == 1, "single observation emits one grid row")
  }

  test("q119 seeded random corpora: production resample == ffill model") {
    val rnd = new Random(119)
    for (_ <- 1 to 3) {
      val rows = (1 to 400).map { i =>
        (rnd.nextInt(8).toLong + 1L, i.toLong,
          baseUs + rnd.nextInt(48 * 3600) * 1000000L + rnd.nextInt(1000000),
          rnd.nextInt(100000).toLong)
      }
      assert(runGrid(rows) === ffillModel(rows))
    }
  }

  // ── q120 rolling features over the grid ──────────────────────────────────

  /** Independent model of [[Events.rollingOnGrid]]: per user sorted by
    * hour, a trailing window of the last ≤24 grid rows — sum / truncating
    * mean / min / max of v, sum of n_obs — plus the row-over-row delta
    * (None on each user's first grid row). */
  private def rollingModel(grid: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long, Long, Long, Long, Long, Option[Long])] =
    grid.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      val s = rows.sortBy(_._2)
      s.zipWithIndex.map { case ((_, h, v, _), i) =>
        val win = s.slice(math.max(0, i - 23), i + 1)
        val vs = win.map(_._3)
        val delta = if (i == 0) None else Some(v - s(i - 1)._3)
        (u, h, v, vs.sum, vs.sum / vs.length, vs.min, vs.max,
          win.map(_._4).sum, delta)
      }
    }.toSet

  test("q120 seeded grids: production rolling == trailing-24 model " +
       "(window edge at exactly 24 rows, truncating integer mean, " +
       "NULL first delta)") {
    val rnd = new Random(120)
    for (trial <- 1 to 3) {
      // users with spans straddling the 24-row frame edge (short, exactly
      // 24, and multi-frame spans), n_obs 0 rows included like a real grid
      val grid = (1 to 6).flatMap { u =>
        val span = Seq(3, 23, 24, 25, 60, 90)(u - 1)
        (0 until span).map { h =>
          (u.toLong, 1000L + h, rnd.nextInt(100000).toLong,
            rnd.nextInt(3).toLong)
        }
      }
      val got = Events.rollingOnGrid(
          Random.shuffle(grid)
            .toDF("user_id", "hour_id", "v_cents", "n_obs"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          if (r.isNullAt(8)) None else Some(r.getLong(8))))
        .toSet
      assert(got === rollingModel(grid), s"trial $trial")
    }
  }

  // ── q121 level-shift changepoints ────────────────────────────────────────

  /** Independent model of [[Events.shiftsOnGrid]]: rows with a FULL 24
    * before and after (pre excludes, post includes the current row),
    * scored |post_sum − pre_sum|, top 50 by (shift desc, user, hour). */
  private def shiftsModel(grid: Seq[(Long, Long, Long, Long)])
      : Seq[(Long, Long, Long, Long, Long)] =
    grid.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      val s = rows.sortBy(_._2)
      s.indices.collect {
        case i if i >= 24 && i + 23 < s.length =>
          val pre = s.slice(i - 24, i).map(_._3).sum
          val post = s.slice(i, i + 24).map(_._3).sum
          (u, s(i)._2, pre, post, math.abs(post - pre))
      }
    }.toSeq.sortBy(t => (-t._5, t._1, t._2)).take(50)

  test("q121 planted step change: the shift peaks AT the step hour, edge " +
       "rows with a truncated side are ineligible, ties break by " +
       "(user, hour)") {
    // user 1: flat 100 for 48h then flat 500 for 48h → max shift 24*400
    // exactly at the step row; user 2: constant series → all shifts 0
    // (tie-ordered after user 1's nonzero rows); user 3: span 40 < 48 →
    // no eligible row at all
    val grid =
      (0 until 96).map(h => (1L, 2000L + h, if (h < 48) 100L else 500L, 1L)) ++
      (0 until 60).map(h => (2L, 2000L + h, 7L, 1L)) ++
      (0 until 40).map(h => (3L, 2000L + h, 9L, 1L))
    val got = Events.shiftsOnGrid(
        Random.shuffle(grid).toDF("user_id", "hour_id", "v_cents", "n_obs"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got === shiftsModel(grid))
    assert(got.head === ((1L, 2048L, 2400L, 12000L, 9600L)),
      "the step hour must carry the maximal shift 24*400")
    assert(!got.exists(_._1 == 3L), "a 40-hour span has no eligible row")
    // user 2's zero-shift rows appear in (user, hour) order after all of
    // user 1's nonzero shifts
    val zeros = got.filter(_._5 == 0L)
    assert(zeros === zeros.sortBy(t => (t._1, t._2)))
  }

  test("q121 seeded random grids: production shifts == two-sided model") {
    val rnd = new Random(121)
    val grid = (1 to 5).flatMap { u =>
      (0 until 30 + u * 15).map { h =>
        (u.toLong, 3000L + h, rnd.nextInt(100000).toLong, 1L)
      }
    }
    val got = Events.shiftsOnGrid(
        Random.shuffle(grid).toDF("user_id", "hour_id", "v_cents", "n_obs"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got === shiftsModel(grid))
  }
}
