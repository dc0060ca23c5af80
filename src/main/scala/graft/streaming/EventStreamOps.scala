package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming counterparts of the batch operators, per the
  * driver brief (the reference itself is batch-only — SURVEY §2.10 — so
  * these extend, not port): the same event-time aggregations run under
  * `readStream` with watermarks, plus a stateful sessionizer built on
  * `flatMapGroupsWithState`, the streaming sibling of the batch
  * change-ratio sampler's carry state.
  *
  * Scale stance: state is bounded — windowed aggs expire by watermark;
  * sessions carry O(1) state per key and emit on gap timeout.
  */
object EventStreamOps {

  /** Windowed counts per key with late-data handling. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(s"window.start").as("window_start"),
        col(s"window.end").as("window_end"), col(keyCol), col("n_events"))

  /** Stream-static enrichment join + windowed per-tier aggregation:
    * every micro-batch joins the live stream against a STATIC dimension
    * and aggregates into event-time windows. The dim side holds no
    * streaming state — unlike a stream-stream join there is no
    * watermark buffer for it, and broadcast keeps it off the shuffle
    * path entirely; the static relation re-plans per micro-batch, so a
    * refreshed dimension table is picked up between batches (the
    * slowly-changing-metadata pattern for attaching user/doc tiers to
    * a live event feed). Left join: an unknown key flows through with a
    * null tier instead of silently dropping events. */
  def enrichedWindowedSums(events: DataFrame, dim: DataFrame, key: String,
                           tierCol: String, tsCol: String, win: String,
                           valueCol: String = "value"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), win),
        col(tierCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col(tierCol),
        col("n_events"), col("sum_value"))

  /** Streaming count-min sketch: per event-time window, the finalized
    * depth×width cell counts of the key stream — the stream-side half of
    * the lambda pattern. Cells use the SAME seed-suffixed FNV bucket
    * family as the batch sketch (`SketchOps.countMin`), so a closed
    * window's cells merge cell-wise (sum) with — or stand in for — the
    * batch sketch of the same hours. State per open window is ≤
    * depth×width counter cells REGARDLESS of key cardinality (the whole
    * point: a per-key streaming count would hold every hot key in state),
    * and watermark expiry bounds the number of open windows. Append mode
    * emits only finalized windows — the mergeable, immutable cells a
    * downstream profile job reads. */
  def countMinCells(events: DataFrame, tsCol: String, keyCol: String,
                    window: String, watermark: String,
                    depth: Int = 2, width: Int = 256): DataFrame = {
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    require(depth >= 1, s"depth must be positive, got $depth")
    graft.plans.GraftSparkExtensions.install(events.sparkSession)
    val buckets = (0 until depth).map { j =>
      call_function("fnv64",
        concat(col(keyCol).cast("string"), lit(s"#$j")))
        .bitwiseAND(lit((width - 1).toLong))
    }
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), posexplode(array(buckets: _*)).as(Seq("j", "bucket")))
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("j"),
        col("bucket"), col("cnt"))
  }

  /** Streaming HLL registers per finalized event-time window: bucket →
    * max rho with the IDENTICAL hash/rho chain as
    * `SketchOps.hllRegisters`, so a window's registers max-merge with
    * neighbouring windows and with the batch sketch — the
    * distinct-count half of the lambda pattern ([[countMinCells]] is
    * the frequency half). State per open window is ≤ 2^p registers
    * regardless of key cardinality; append mode emits each window's
    * finalized registers once. */
  def hllCells(events: DataFrame, tsCol: String, keyCol: String,
               window: String, watermark: String, p: Int = 6): DataFrame = {
    require(p >= 2 && p <= 12, s"hll precision p must be in [2,12], got $p")
    graft.plans.GraftSparkExtensions.install(events.sparkSession)
    val m = 1L << p
    val h = pmod(call_function("fnv64",
      concat(col(keyCol).cast("string"), lit("#hll"))), lit(4294967296L))
    events
      .withWatermark(tsCol, watermark)
      .filter(col(keyCol).isNotNull)
      .select(col(tsCol), h.bitwiseAND(lit(m - 1)).as("bucket"),
        shiftright(h, p).as("rest"))
      .select(col(tsCol), col("bucket"),
        when(col("rest") === 0, lit(33 - p))
          .otherwise(lit(33 - p) - length(bin(col("rest")))).as("rho"))
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("bucket"))
      .agg(max(col("rho")).as("rho"))
      .select(col("window.start").as("window_start"), col("bucket"),
        col("rho"))
  }

  /** Streaming data-quality monitor: per finalized event-time window,
    * the violation counts of a declarative check list — the streaming
    * sibling of `ValidationOps.expectations`, watching the same
    * constraints at INGEST time so a broken upstream feed pages before
    * the nightly batch job ever sees it. Row-level checks only (each is
    * a conditional-count aggregate; state per open window = one counter
    * per check); uniqueness-style checks need per-key state and live
    * with [[dedupWithinWatermark]]. Append mode emits each window's
    * counts once, after the watermark closes it. */
  def windowedExpectations(events: DataFrame, tsCol: String,
                           window: String, watermark: String,
                           checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.map { case (n, viol) =>
      sum(when(viol, lit(1L)).otherwise(lit(0L))).as(n)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +:
        checks.map { case (n, _) => col(n) }: _*)
  }

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Per-key EWMA state: (event count, smoothed level). */
  case class EwmaState(n: Long, level: Double)
  case class EwmaRow(user_id: Long, n_events: Long, level: Double)

  /** Streaming per-key EWMA (α = 1/2): the continuous metric smoother —
    * O(1) state per key (count + level), each micro-batch folds its
    * rows in EVENT-TIME order (the iterator's arrival order is
    * unspecified, so the batch buffer sorts by ts first — determinism
    * within a batch), and the updated level emits every batch (Update
    * mode: the serving read keeps each key's latest row). α = 1/2 keeps
    * every level an exact dyadic rational of the inputs, so a golden
    * trace replays bit-identically. Cross-batch ordering follows batch
    * arrival (state is a fold, not a sort buffer): the deterministic
    * gate feeds batches in event-time order, which is also the
    * production contract for a monotone source. */
  def ewmaByKey(events: Dataset[Event]): Dataset[EwmaRow] = {
    implicit val rowEnc = Encoders.product[EwmaRow]
    implicit val stEnc = Encoders.product[EwmaState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[EwmaState, EwmaRow](GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[EwmaState]) =>
          val batch = it.toSeq.sortBy(_.ts.getTime)
          val st0 = state.getOption.getOrElse(EwmaState(0L, 0.0))
          val st = batch.foldLeft(st0) { (acc, e) =>
            if (acc.n == 0L) EwmaState(1L, e.value)
            else EwmaState(acc.n + 1, 0.5 * e.value + 0.5 * acc.level)
          }
          state.update(st)
          EwmaRow(userId, st.n, st.level)
      }
  }
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                     n_events: Int, sum_value: Double)
  /** Event-time sessionizer state: the key's not-yet-closed events
    * (parallel ts/value arrays — bounded by the watermark horizon). */
  case class SessionBuffer(ts: Seq[Long], vs: Seq[Double])

  /** Gap-based sessionization: a session closes when a later event for
    * the key falls outside `gapMs`, or (with `idleTimeout`, the
    * production default) when the processing-time timeout fires for an
    * idle key — the timeout path both emits the final session and
    * removes the key's state, so state stays bounded by the set of
    * currently-active keys. Deterministic tests disable the timeout
    * (timer-driven no-data micro-batches busy-loop under a 0 ms
    * trigger); pair it with a real trigger interval in production. */
  /** Event-time sessionization — the replayable variant of
    * [[sessionize]]: a session is emitted only once the WATERMARK passes
    * its close (last event + gap), never on a wall-clock timer. Closing
    * is STRICT (last + gap < watermark): treat an event at ts ==
    * watermark as potentially admissible — observed Spark 4 behavior on
    * this path actually DROPS the boundary event (see the st_throttle
    * trace lesson in the verify skill), but strict closing stays correct
    * under either filter, which is the point of choosing it. With the
    * strict rule any event that could
    * extend an emitted session has ts ≤ last+gap < watermark and is
    * dropped, so the emitted session set is a pure function of the event
    * times, independent of how the stream is chopped into micro-batches
    * or which order batches deliver (in-watermark out-of-order events
    * buffer in state and sort by event time). State per key = the open
    * tail plus sessions awaiting watermark passage: bounded by the
    * watermark horizon × per-key event rate.
    *
    * Mechanics: buffered events sessionize by `gapMs` in event-time
    * order; the closable prefix (session end + gap < watermark) emits;
    * the remainder re-buffers with an `EventTimeTimeout` at the first
    * unclosed session's end + gap, so the flush fires exactly when the
    * watermark crosses it even if the key never sees data again. */
  def sessionizeEventTime(events: Dataset[Event], gapMs: Long,
                          watermark: String): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val bufEnc = Encoders.product[SessionBuffer]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionBuffer, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionBuffer]) =>
          val prev = state.getOption
            .map(b => b.ts.zip(b.vs)).getOrElse(Seq.empty)
          val all = (prev ++ it.map(e => (e.ts.getTime, e.value)))
            .sortBy(_._1)
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            // split the sorted buffer into gap-delimited sessions
            val sessions = scala.collection.mutable.ArrayBuffer
              .empty[Seq[(Long, Double)]]
            var cur = scala.collection.mutable.ArrayBuffer((all.head))
            all.tail.foreach { e =>
              if (e._1 - cur.last._1 <= gapMs) cur += e
              else { sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(e) }
            }
            sessions += cur.toSeq
            // session k+1 starts > session k's end + gap, so closability
            // (end + gap < watermark, strict — ts == wm is still
            // admissible input) is a prefix property
            val (closed, open) = sessions.partition(s => s.last._1 + gapMs < wm)
            if (open.isEmpty) state.remove()
            else {
              val rest = open.flatten.toSeq
              state.update(SessionBuffer(rest.map(_._1), rest.map(_._2)))
              // ≥ wm by construction of `open` (setTimeoutTimestamp only
              // rejects timestamps EARLIER than the watermark); the
              // timeout fires once the watermark passes it, which is
              // exactly when the strict close condition starts holding
              state.setTimeoutTimestamp(open.head.last._1 + gapMs)
            }
            closed.iterator.map(s => Session(userId, s.head._1, s.last._1,
              s.length, s.map(_._2).sum))
          }
      }
  }

  case class Admitted(user_id: Long, w_start_ms: Long, seq: Int,
                      ts_ms: Long, value: Double)

  /** Event-time admission control: at most `maxPerWindow` events per
    * (key, tumbling window) are admitted, chosen in EVENT-TIME order —
    * the ingest throttle / per-tenant quota operator. Emission follows
    * the [[sessionizeEventTime]] replayability contract: a window's
    * admissions emit only once the watermark passes its end, so the
    * admitted set is a pure function of the event times — invariant
    * under micro-batch re-splits and arrival reorderings — not of
    * arrival order (the usual processing-order token bucket admits
    * whatever raced in first; that is neither replayable nor fair).
    * Close is safe at w_end ≤ wm: any event that could still arrive
    * has ts ≥ wm ≥ w_end, which lands in a later window by
    * construction.
    *
    * State per key = the events of still-open windows (bounded by the
    * watermark horizon × per-key rate); an `EventTimeTimeout` at the
    * first open window's end guarantees the flush even if the key goes
    * quiet. Ties on ts break by value — the full sort key is (ts,
    * value), deterministic for any trace without exact duplicates. */
  def throttleEventTime(events: Dataset[Event], windowMs: Long,
                        maxPerWindow: Int, watermark: String)
      : Dataset[Admitted] = {
    implicit val admitEnc = Encoders.product[Admitted]
    implicit val bufEnc = Encoders.product[SessionBuffer]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionBuffer, Admitted](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionBuffer]) =>
          val prev = state.getOption
            .map(b => b.ts.zip(b.vs)).getOrElse(Seq.empty)
          val all = (prev ++ it.map(e => (e.ts.getTime, e.value))).sorted
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val byWindow = all.groupBy(e => (e._1 / windowMs) * windowMs)
              .toSeq.sortBy(_._1)
            val (closed, open) = byWindow
              .partition { case (ws, _) => ws + windowMs <= wm }
            if (open.isEmpty) state.remove()
            else {
              val rest = open.flatMap(_._2)
              state.update(SessionBuffer(rest.map(_._1), rest.map(_._2)))
              state.setTimeoutTimestamp(open.head._1 + windowMs)
            }
            closed.iterator.flatMap { case (ws, evs) =>
              evs.take(maxPerWindow).zipWithIndex.map { case ((t, v), i) =>
                Admitted(userId, ws, i + 1, t, v) }
            }
          }
      }
  }

  /** Streaming exact dedup — the ingest-time sibling of the batch
    * `DedupOps.exactGroups`: keep the first row seen per `keyCols`
    * while its key is inside the watermark horizon. State is bounded:
    * a key's entry evicts once the watermark passes its event time, so
    * memory is horizon × key rate, never corpus size — the property
    * that makes this runnable forever on a 100 TB/day feed. A
    * duplicate arriving after its key evicted is re-emitted (by
    * design: within-horizon dedup, not global); pair with the batch
    * dedup family for corpus-wide uniqueness.
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** Streaming MinHash NEAR-dup dedup — the ingest-time sibling of the
    * batch `DedupOps.minhashCandidates`, sharing its exact signature
    * kernel (`minhash_sig` → banded bucket keys): an arriving document
    * drops when ANY of its `bands` band buckets matches one claimed by
    * an earlier in-horizon document — catching reordered/lightly-edited
    * and normalization-level near-dups that exact-key dedup
    * ([[dedupWithinWatermark]]) misses.
    *
    * Mechanics: the signature computes once per row inside codegen; the
    * band buckets become `bands` key columns and the OR-match chains
    * `bands` `dropDuplicatesWithinWatermark` operators (multiple
    * stateful operators in one append-mode query — supported since
    * Spark 3.5). Claim semantics are sequential: a document dropped at
    * band i never registers its later bands, so each bucket's claimant
    * is the first SURVIVING document that carried it — deterministic
    * for any arrival order across micro-batches.
    *
    * State: `bands` stores × horizon × doc rate, each entry one
    * (bucket-hash, timestamp) pair — bounded exactly like the exact
    * dedup, never corpus-sized. A near-dup arriving after its buckets
    * evicted re-emits (within-horizon semantics by design; corpus-wide
    * near-dup is the batch family's job). */
  def neardupWithinWatermark(docs: DataFrame, textCol: String,
                             tsCol: String, watermark: String,
                             shingleK: Int = 2, bands: Int = 4,
                             rowsPerBand: Int = 2): DataFrame = {
    val num = bands * rowsPerBand
    val sig = graft.GraftFunctions.minhashSig(
      graft.operators.TermOps.tokens(col(textCol)), lit(shingleK), lit(num))
    val bks = graft.GraftFunctions.bandBuckets(
      col("_sig"), lit(bands), lit(rowsPerBand))
    var df = docs.withColumn("_sig", sig).withColumn("_bks", bks)
    for (i <- 0 until bands)
      df = df.withColumn(s"_b$i", element_at(col("_bks"), i + 1))
    df = df.drop("_sig", "_bks").withWatermark(tsCol, watermark)
    for (i <- 0 until bands)
      df = df.dropDuplicatesWithinWatermark(Seq(s"_b$i"))
    df.drop((0 until bands).map(i => s"_b$i"): _*)
  }

  /** Streaming SUBSTRING dedup — the stream form of the batch
    * window-MinHash tier (`DedupOps.windowMinhashSpans`), completing
    * the batch/stream symmetry the exact and MinHash tiers already
    * have (st_dedup / st_neardup): each arriving document explodes
    * into strided `w`-token windows, each sketched by the bottom-1
    * MinHash over its `shingleK`-shingles (the batch kernel — ONE
    * 8-byte key per window), and a window DROPS when its sketch is
    * already claimed by an earlier in-horizon window, in this doc or
    * any other (first-carrier-wins, the established claim semantics).
    * The emitted stream is the NOVEL spans: a fully-duplicated doc
    * contributes nothing, a partial overlap emits only its new tail,
    * and `win_idx` says where in the doc the novelty sits.
    *
    * State: one (sketch, ts) entry per DISTINCT in-horizon sketch —
    * O(windows-in-horizon), bounded by rate × horizon / stride, never
    * corpus-sized; eviction re-admits (within-horizon semantics by
    * design — corpus-wide substring dedup is the batch tier's job).
    * Near-duplicate windows collide in proportion to their shingle
    * Jaccard, exactly as in the batch tier. */
  def substringNovelWindows(docs: DataFrame, textCol: String,
                            tsCol: String, watermark: String,
                            w: Int = 16, stride: Int = 8,
                            shingleK: Int = 4): DataFrame = {
    require(w > shingleK, s"window width $w must exceed shingle size")
    val wins = docs
      .withColumn("_tk", graft.operators.TermOps.tokens(col(textCol)))
      .filter(size(col("_tk")) >= w)
      .select(col("*"), posexplode(expr(
        s"transform(sequence(1, size(_tk) - ${w - 1}, $stride)," +
          s" i -> slice(_tk, i, $w))")).as(Seq("_wi", "_warr")))
      .withColumn("_mh", array_min(
        graft.GraftFunctions.shingleHashes(col("_warr"), shingleK)))
      .withColumn("win_idx", col("_wi").cast("long"))
      .drop("_tk", "_warr", "_wi")
    wins.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_mh"))
      .drop("_mh")
  }

  case class Change(key: Long, op: String, value: Double, version: Long)
  case class CdcState(version: Long, value: Double, deleted: Boolean)
  case class CurrentRow(key: Long, value: Double, version: Long,
                        deleted: Boolean)

  /** Streaming CDC APPLY — the ingest side of the batch `k18_cdc` diff:
    * a change stream (upsert/delete rows carrying a monotone per-key
    * version) folds into latest-version-wins state, and each batch
    * emits the CURRENT row of every touched key (Update mode — the
    * serving read keeps the newest). Late/stale changes (version ≤ the
    * applied one) are ignored, so replays and out-of-order delivery
    * cannot regress a key; deletes are tombstones that keep the
    * version (the merge-on-read convention k24 uses on the batch
    * side). State is one (version, value, flag) per live key. */
  def cdcApply(changes: Dataset[Change]): Dataset[CurrentRow] = {
    implicit val rowEnc = Encoders.product[CurrentRow]
    implicit val stEnc = Encoders.product[CdcState]
    changes.groupByKey(_.key)(Encoders.scalaLong)
      .mapGroupsWithState[CdcState, CurrentRow](
        GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[Change], state: GroupState[CdcState]) =>
          val sorted = it.toSeq.sortBy(_.version)
          var cur = state.getOption
          sorted.foreach { c =>
            if (cur.forall(_.version < c.version))
              cur = Some(CdcState(c.version, c.value, c.op == "delete"))
          }
          val st = cur.get // iterator non-empty, so state exists now
          state.update(st)
          CurrentRow(key, st.value, st.version, st.deleted)
      }
  }

  case class FunnelEvent(user_id: Long, etype: String,
                         ts: java.sql.Timestamp)
  /** Funnel per-key state: entry ms of the view/click stages (−1 =
    * not reached) + the purchase latch — 17 bytes per live user. */
  case class FunnelState(vTs: Long, cTs: Long, purchased: Boolean)
  case class StageRow(user_id: Long, stage: String, ts_ms: Long)

  /** Streaming ordered-funnel progression (view → click → purchase),
    * the ingest-time sibling of the batch `w10_funnel`: a user advances
    * a stage only with an event AT OR AFTER their entry into the
    * previous stage, each stage fires exactly once, and the batch
    * iterator sorts by event time (then type) so within-batch disorder
    * cannot reorder a user's own funnel. Update-mode
    * flatMapGroupsWithState; state is O(1) per live user (production
    * deployments add an event-time timeout to retire idle users — the
    * sessionizeEventTime pattern — omitted here so the golden trace
    * stays timeout-free). */
  def funnelStages(events: Dataset[FunnelEvent]): Dataset[StageRow] = {
    implicit val rowEnc = Encoders.product[StageRow]
    implicit val stEnc = Encoders.product[FunnelState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, StageRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          // equal-ts tiebreak must follow STAGE order (view before
          // click before purchase) — alphabetical etype is its exact
          // reverse, which would drop same-instant progressions when
          // they land in one batch but honor them across batches
          def stageIdx(t: String): Int = t match {
            case "view" => 0; case "click" => 1; case "purchase" => 2
            case _ => 3
          }
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, stageIdx(e.etype)))
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, false))
          val out = scala.collection.mutable.ArrayBuffer.empty[StageRow]
          sorted.foreach { e =>
            val t = e.ts.getTime
            e.etype match {
              case "view" if st.vTs < 0 =>
                st = st.copy(vTs = t); out += StageRow(uid, "view", t)
              case "click" if st.vTs >= 0 && st.cTs < 0 && t >= st.vTs =>
                st = st.copy(cTs = t); out += StageRow(uid, "click", t)
              case "purchase"
                  if st.cTs >= 0 && !st.purchased && t >= st.cTs =>
                st = st.copy(purchased = true)
                out += StageRow(uid, "purchase", t)
              case _ => () // out-of-order stage or repeat: no advance
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Composed streaming curation — the ingest-time sibling of the batch
    * `curate_e2e` chain, as ONE append-mode query:
    *
    *  1. QUALITY GATE: stateless length screen (plus the carried
    *     `n_chars` metric) — garbage is rejected before it costs any
    *     dedup state, the order a production ingest uses;
    *  2. EXACT DEDUP: `dropDuplicatesWithinWatermark` on the content
    *     hash — state is one (hash, ts) entry per live doc, bounded by
    *     the watermark horizon;
    *  3. NEAR-DUP DEDUP: the banded MinHash chain of
    *     [[neardupWithinWatermark]] (same signature kernel as the batch
    *     family), `bands` stateful operators each bounded exactly like
    *     the exact stage.
    *
    * Emitted rows are the ADMITTED corpus (verdict "keep") with their
    * quality metrics; rejected rows never emit — the same
    * absence-semantics the other streaming dedup gates pin. Per-stage
    * state is bounded by horizon × doc rate; nothing is corpus-sized,
    * so the pipeline runs forever (corpus-wide dedup stays the batch
    * family's job). */
  def curateStream(docs: DataFrame, textCol: String, tsCol: String,
                   watermark: String, minChars: Int,
                   shingleK: Int = 2, bands: Int = 4,
                   rowsPerBand: Int = 2): DataFrame = {
    val num = bands * rowsPerBand
    var df = docs
      .withColumn("n_chars", length(col(textCol)))
      .filter(col("n_chars") >= minChars)
      .withColumn("_h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_h"))
    // the MinHash signature computes only for rows that SURVIVED the
    // exact stage (an exact dup never needed banding); the banded
    // chain itself shares [[neardupWithinWatermark]]'s kernel and
    // claim semantics — change the two together
    val sig = graft.GraftFunctions.minhashSig(
      graft.operators.TermOps.tokens(col(textCol)), lit(shingleK), lit(num))
    val bks = graft.GraftFunctions.bandBuckets(
      col("_sig"), lit(bands), lit(rowsPerBand))
    df = df.withColumn("_sig", sig).withColumn("_bks", bks)
    for (i <- 0 until bands)
      df = df.withColumn(s"_b$i", element_at(col("_bks"), i + 1))
    df = df.drop("_sig", "_bks")
    for (i <- 0 until bands)
      df = df.dropDuplicatesWithinWatermark(Seq(s"_b$i"))
    df.drop("_h" +: (0 until bands).map(i => s"_b$i"): _*)
  }

  /** Watermarked stream-stream interval join: each right-side row
    * matches left-side rows with the same `key` whose event time is at
    * most `maxDelay` older (click-attribution shape: click joins the
    * impressions of the preceding window). The time-range predicate is
    * what lets Spark evict join state — without it both sides buffer
    * forever; with it each side's state is bounded by
    * watermark + maxDelay. Inner matches emit as soon as both rows are
    * present, so the output set is replay-deterministic.
    *
    * Output columns: `key`, `left_ts`, `right_ts`, `left_value`,
    * `right_value`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String, valueCol: String,
                   watermark: String, maxDelay: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
        col(s"l.$key") === col(s"r.$key") &&
          col(s"r.$tsCol") >= col(s"l.$tsCol") &&
          col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $maxDelay"))
      .select(col(s"l.$key").as(key),
        col(s"l.$tsCol").as("left_ts"), col(s"r.$tsCol").as("right_ts"),
        col(s"l.$valueCol").as("left_value"), col(s"r.$valueCol").as("right_value"))
  }

  def sessionize(events: Dataset[Event], gapMs: Long,
                 idleTimeout: Boolean = true): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle key: flush the open session and drop the state
            val out = state.getOption
              .map(s => Session(userId, s.start, s.last, s.n, s.sum)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (idleTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }
}
