package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Boundary + property pins for the attribution family (q97 linear, q102
  * time-decay) — the EventsSpec methodology: the harness events never land
  * a click exactly ON the purchase timestamp or exactly 2 h before it, so
  * only a constructed corpus can pin the inclusive-both-ends horizon, and
  * seeded random corpora drive the PRODUCTION core against an independent
  * plain-Scala model (integer credit arithmetic reproduced exactly). */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in micros
  private val hourUs = 3600L * 1000000L
  private val halfUs = 1800L * 1000000L

  /** rows: (event_id, user, us, type, value). */
  private def frame(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "user_id", "us", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"),
        col("value"))

  private def run(rows: Seq[(Long, Long, Long, String, Double)],
                  decay: Boolean): Set[(Long, Long, Long, Long)] =
    Events.attributionCore(frame(rows), decay)
      .as[(Long, Long, Long, Long)].collect().toSet

  /** Independent model of both credit rules. */
  private def model(rows: Seq[(Long, Long, Long, String, Double)],
                    decay: Boolean): Set[(Long, Long, Long, Long)] = {
    val purchases = rows.filter(_._4 == "purchase")
    val clicks = rows.filter(_._4 == "click")
    val credits = purchases.flatMap { case (_, pu, pUs, _, v) =>
      val vCents = math.floor(v * 100.0 + 0.5).toLong
      val touches = clicks.filter { case (_, cu, cUs, _, _) =>
        cu == pu && cUs >= pUs - 2 * hourUs && cUs <= pUs }
      if (touches.isEmpty) Nil
      else if (decay) {
        val ws = touches.map { case (cid, _, cUs, _, _) =>
          (cid, 10000L >> math.min((pUs - cUs) / halfUs, 13L).toInt) }
        val wSum = ws.map(_._2).sum
        ws.map { case (cid, w) => (cid, pu, vCents * 10000L * w / wSum) }
      } else
        touches.map { case (cid, _, _, _, _) =>
          (cid, pu, vCents * 10000L / touches.size) }
    }
    credits.groupBy(c => (c._1, c._2)).map { case ((cid, u), g) =>
      (cid, u, g.size.toLong, g.map(_._3).sum)
    }.toSet
  }

  test("horizon ends are inclusive; outside by 1µs is out (both models)") {
    val rows = Seq(
      (100L, 1L, baseUs + 2 * hourUs, "purchase", 50.0),
      (1L, 1L, baseUs, "click", 0.0),                 // exactly -2h: IN
      (2L, 1L, baseUs - 1L, "click", 0.0),            // 2h + 1µs: OUT
      (3L, 1L, baseUs + 2 * hourUs, "click", 0.0),    // exactly at p: IN
      (4L, 1L, baseUs + 2 * hourUs + 1L, "click", 0.0)) // after p: OUT
    for (decay <- Seq(false, true)) {
      val got = run(rows, decay)
      assert(got === model(rows, decay), s"decay=$decay diverged")
      assert(got.map(_._1) === Set(1L, 3L),
        s"decay=$decay: wrong click set credited: $got")
    }
    // linear: the two in-horizon touches split 5000 cents in half
    assert(run(rows, decay = false).forall(_._4 == 5000L * 10000L / 2))
    // decay: the at-purchase click (shift 0) out-earns the -2h one
    // (shift 4) 16:1, floor division on the 10625-bp weight sum
    val byClick = run(rows, decay = true).map(t => t._1 -> t._4).toMap
    assert(byClick(3L) > 15 * byClick(1L) && byClick(3L) < 17 * byClick(1L),
      s"decay ratio wrong: $byClick")
  }

  test("seeded random corpora: production core == independent model, " +
       "both credit rules") {
    (1 to 3).foreach { trial =>
      val rnd = new Random(7000 + trial)
      var id = 0L
      val rows = (1L to 15L).flatMap { user =>
        (1 to 20 + rnd.nextInt(20)).map { _ =>
          id += 1
          val off = rnd.nextInt(10) match {
            case 0 => 0L                       // exact tie with something
            case 1 => 2 * hourUs               // exactly on the horizon
            case 2 => 2 * hourUs + 1L
            case 3 => halfUs                   // exact decay boundary
            case _ => rnd.nextInt(3 * 3600).toLong * 1000000L
          }
          val et = rnd.nextInt(3) match {
            case 0 => "purchase"; case 1 => "click"; case _ => "view"
          }
          (id, user, baseUs + off + rnd.nextInt(7200).toLong * 1000000L,
            et, rnd.nextDouble() * 200.0)
        }
      }
      for (decay <- Seq(false, true))
        assert(run(rows, decay) === model(rows, decay),
          s"trial $trial decay=$decay diverged")
    }
  }
}
