package graft.streaming

import graft.{SparkSuite, StreamState}

/** Harness pin for the [[graft.StreamState]] probe (r16): the probe's
  * own machinery — feed materialization, file-source stream, noop sink,
  * peak stateOperators readout — must report REAL state, not an empty
  * recentProgress quirk. One window-class and one keys-class probe run
  * at sf0.001; rows must be nonzero and the probe registry must cover
  * every stateful `s_stream_*` entry it claims to.
  */
class StreamStateSpec extends SparkSuite {

  private lazy val scratch =
    java.nio.file.Files.createTempDirectory("graft_ss_spec").toString

  private def probe(name: String): StreamState.Peak = {
    val p = StreamState.probes.find(_.name == name).get
    val feed = StreamState.prepFeed(spark, sf001, p.feed, scratch)
    StreamState.run(spark, feed, p)
  }

  test("probe harness reports nonzero peak state for a window-class stream") {
    val peak = probe("s_stream_tumbling")
    assert(peak.rows > 0, s"no state rows observed: $peak")
    assert(peak.bytes > 0 && peak.batches > 0, peak.toString)
  }

  test("probe harness reports nonzero peak state for a keys-class stream") {
    val peak = probe("s_stream_cdc_latest")
    assert(peak.rows > 0, s"no state rows observed: $peak")
    // cdc state is one row per distinct user — sf0.001's user count
    val users = graft.Tables
      .events(spark, sf001)
      .select("user_id")
      .distinct()
      .count()
    assert(peak.rows == users, s"cdc state rows ${peak.rows} != distinct users $users")
  }

  test("probe registry: every declared probe names a registered s_stream entry") {
    val registered = graft.Registry.all.map(_._1).toSet
    val unknown = StreamState.probes.map(_.name).filterNot(registered)
    assert(unknown.isEmpty, s"probes naming unregistered entries: $unknown")
  }
}
