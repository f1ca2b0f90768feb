package graft

import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Physical-plan audit for the media codec chains (q231-q237): the
  * 100-TB property that matters most is that PAYLOAD BYTES never
  * cross an exchange — fingerprints (16-24 bytes/row) shuffle, media
  * payloads stay partition-local from synthesis to decode. Checked
  * programmatically on the plan tree (every Shuffle/Broadcast
  * exchange's child output is payload-free), plus the catalog-wide
  * no-cartesian/no-nested-loop rules. */
class MediaPlanSpec extends SparkSpec {

  private val media = Seq(
    "q231_image_dhash", "q232_multimodal_pack",
    "q234_image_dhash_vardims", "q235_audio_features",
    "q236_audio_neardup", "q237_video_scene_cuts")

  test("media plans: payload bytes never cross an exchange; banded " +
      "joins keyed (no cartesian / nested-loop)") {
    val dir = sf("sf0.001")
    val qs = graft.queries.Catalog.all.filter(q => media.contains(q.name))
    assert(qs.size == media.size, "audit list went stale")
    graft.streaming.EventsStream.withConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
      qs.foreach { q =>
        val plan = q.fn(spark, dir).queryExecution.executedPlan
        val s = plan.toString
        assert(!s.contains("CartesianProduct"),
          s"${q.name}: cartesian product in plan")
        assert(!s.contains("BroadcastNestedLoopJoin"),
          s"${q.name}: nested-loop join in plan")
        val exchanges = plan.collect {
          case e: ShuffleExchangeExec => ("shuffle", e.child.output)
          case e: BroadcastExchangeExec => ("broadcast", e.child.output)
        }
        // map-only (zero exchanges) is the ideal — q235's feature
        // extraction never shuffles at all; when exchanges exist they
        // must carry fingerprints, not payloads
        exchanges.foreach { case (kind, out) =>
          assert(!out.exists(_.name == "payload"),
            s"${q.name}: media payload crosses a $kind exchange — " +
              s"[${out.map(_.name).mkString(", ")}]")
        }
      }
    }
  }
}
