package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.core.Canonicalize

/** Structured Streaming surface — SURVEY.md §2 ops 43-46.
  *
  * The crawl loop itself is a deterministic batch driver (CrawlLoop — exact
  * resume + reproducible ordering beat streaming for a static source). This
  * module is the streaming flavor for a LIVE pages feed: the same
  * canonicalize/host algebra over `readStream`, event-time windowed
  * throughput with a watermark-backed late-data policy, session windows, and
  * custom per-host crawl state via mapGroupsWithState.
  *
  * Tested against the fixture pages directory with a memory sink +
  * processAllAvailable (StreamingSpec).
  */
object StreamingIngest {

  val PageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** File-stream source over a pages directory (one file per micro-batch by
    * default — deterministic drain in tests via processAllAvailable). */
  def pagesStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(PageSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Event-time tumbling per-host throughput with a late-data watermark
    * (ops 44/45): pages later than 2h behind the max seen warc_ts are
    * dropped by the engine — the explicit streaming late-data policy. */
  def hourlyHostThroughput(pages: DataFrame): DataFrame =
    pages
      .withColumn("host", Canonicalize.hostOf(col("url")))
      .withWatermark("warc_ts", "2 hours")
      .groupBy(window(col("warc_ts"), "1 hour").as("win"), col("host"))
      .agg(
        count(lit(1)).as("n_pages"),
        sum(octet_length(col("html"))).as("bytes"))
      .select(col("win.start").as("window_start"), col("host"), col("n_pages"), col("bytes"))

  /** Session windows per host (30-minute capture-gap sessions). */
  def captureSessions(pages: DataFrame): DataFrame =
    pages
      .withColumn("host", Canonicalize.hostOf(col("url")))
      .withWatermark("warc_ts", "2 hours")
      .groupBy(session_window(col("warc_ts"), "30 minutes").as("sess"), col("host"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("sess.start").as("session_start"), col("sess.end").as("session_end"),
        col("host"), col("n_pages"))

  /** Streaming URL-dedup (op 12's streaming flavor): emit the FIRST capture
    * per canonical url, keyed by xxhash64, with dedup state bounded by the
    * watermark horizon (`dropDuplicatesWithinWatermark` — the unbounded
    * `dropDuplicates` would grow state forever on an infinite feed). A
    * re-capture arriving after its key's state was evicted re-emits; the
    * DURABLE tier of the seen-set remains the batch loop's partitioned
    * bloom + exact store — this operator is the in-flight guard in front of
    * it, exactly the two-tier split the north rule's 10^10 design needs. */
  def dedupStream(pages: DataFrame, horizon: String = "48 hours"): DataFrame =
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(Canonicalize.canonicalUrl(col("url")).as("url"), col("warc_ts"))
      .filter(col("url").isNotNull)
      .withColumn("url_hash", Canonicalize.urlHash(col("url")))
      .withWatermark("warc_ts", horizon)
      .dropDuplicatesWithinWatermark("url_hash")

  /** Streaming exact-DOCUMENT dedup — the pipeline family's streaming tier
    * (op 30 / q30's streaming flavor): emit the FIRST capture per text
    * content, keyed by xxhash64(text), with dedup state bounded by the
    * watermark horizon. Hash-keyed (a 2⁻⁶⁴ collision would drop a distinct
    * doc) — the DURABLE batch tier (Dedup.exactByText) re-groups by the
    * text itself for multi-hash groups, so the end-to-end pipeline stays
    * exact under collisions; this operator is the in-flight guard in front
    * of it, the same two-tier split as the URL seen-set. */
  def docDedupStream(pages: DataFrame, horizon: String = "48 hours"): DataFrame =
    pages
      .select(col("url"), col("warc_ts"), col("text"))
      .withColumn("text_hash",
        xxhash64(coalesce(col("text"), lit("\u0000<null>"))))
      .withWatermark("warc_ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")

  private val linksUdf = udf((html: Array[Byte]) => graft.core.Parsers.extractLinks(html))

  /** Streaming link-extraction frontier growth (op 48's streaming flavor —
    * the round-3 gap): listing pages arriving on the live feed yield new
    * frontier candidates (url, host, url_hash, discovered_ts),
    * canonicalized and first-seen-deduped within the watermark horizon
    * (same two-tier split as [[dedupStream]]: this is the in-flight guard;
    * the durable seen-set tier stays with the batch store). Article pages
    * contribute nothing (extractLinks yields no links for them), so the
    * stage composes directly onto the raw feed; downstream the candidates
    * enter the SAME scheduling algebra the batch loop uses. */
  def frontierGrowthStream(pages: DataFrame, horizon: String = "48 hours"): DataFrame =
    pages
      .select(explode(linksUdf(col("html"))).as("raw_link"),
        col("warc_ts").as("discovered_ts"))
      .filter(Canonicalize.isHttpScheme(col("raw_link")))
      .select(Canonicalize.canonicalUrl(col("raw_link")).as("url"), col("discovered_ts"))
      .filter(col("url").isNotNull)
      .withColumn("host", Canonicalize.hostOf(col("url")))
      .withColumn("url_hash", Canonicalize.urlHash(col("url")))
      .withWatermark("discovered_ts", horizon)
      .dropDuplicatesWithinWatermark("url_hash")

  final case class HostEvent(host: String, warcTsSec: Long)
  final case class HostState(seen: Long, lastTsSec: Long)
  final case class HostUpdate(host: String, seen: Long, lastTsSec: Long)

  final case class RateEvent(host: String, url: String)
  final case class RateState(deferred: Vector[String])
  final case class RateEmit(host: String, url: String, waited: Boolean)

  /** Per-host token-bucket rate limiter across micro-batches — the
    * politeness cap in the STREAMING flavor: each host may emit at most
    * `perBatch` urls per trigger; the overflow carries in
    * flatMapGroupsWithState state and drains FIFO ahead of newer urls on
    * the host's next trigger (`waited` marks urls that sat in the
    * deferred queue ≥ 1 batch). Matches the batch scheduler's rank ≤
    * budget semantics batch-by-batch, with the deferred queue playing
    * the frontier's role.
    *
    * Determinism: within one trigger the fresh urls sort
    * lexicographically before queueing (the iterator's arrival order is
    * partition-dependent); dedup against the carried queue keeps a url
    * from occupying two slots. State is bounded by the host's
    * outstanding backlog — the per-host politeness budget itself bounds
    * growth in steady state; a production deployment adds a state TTL
    * (GroupStateTimeout) for hosts that go quiet with a backlog. */
  def rateLimitStream(spark: SparkSession, pages: DataFrame,
      perBatch: Int): Dataset[RateEmit] = {
    import spark.implicits._
    require(perBatch >= 1, "need a positive per-batch budget")
    pages
      .withColumn("host", Canonicalize.hostOf(col("url")))
      .select(col("host"), col("url")).as[RateEvent]
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (host: String, events: Iterator[RateEvent], state: GroupState[RateState]) =>
          val carried = state.getOption.map(_.deferred).getOrElse(Vector.empty)
          val carriedSet = carried.toSet // O(1) membership; contains on Vector is O(backlog²)
          val fresh = events.map(_.url).toVector.distinct.sorted
            .filterNot(carriedSet.contains)
          val queue = carried ++ fresh
          val (emit, keep) = queue.splitAt(perBatch)
          state.update(RateState(keep))
          emit.iterator.map(u => RateEmit(host, u, carriedSet.contains(u)))
      }
  }

  /** Custom cross-batch state (op 46 streaming flavor): per-host running
    * capture count + latest capture ts via mapGroupsWithState. */
  def hostStateStream(spark: SparkSession, pages: DataFrame): Dataset[HostUpdate] = {
    import spark.implicits._
    pages
      .withColumn("host", Canonicalize.hostOf(col("url")))
      .select(col("host"), unix_timestamp(col("warc_ts")).as("warcTsSec"))
      .as[HostEvent]
      .groupByKey(_.host)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (host: String, events: Iterator[HostEvent], state: GroupState[HostState]) =>
          val prev = state.getOption.getOrElse(HostState(0L, Long.MinValue))
          var seen = prev.seen
          var last = prev.lastTsSec
          events.foreach { e => seen += 1; if (e.warcTsSec > last) last = e.warcTsSec }
          val next = HostState(seen, last)
          state.update(next)
          HostUpdate(host, next.seen, next.lastTsSec)
      }
  }

  /** Live indexing — the reference's actual deployment loop (poll feeds
    * → dedup → index articles → searchable): every micro-batch of
    * deduped documents folds into the persisted inverted index via
    * [[graft.ml.Search.indexBatch]] (segment append, manifest commit).
    * Compose after [[docDedupStream]] so each text indexes once within
    * the watermark horizon. Exactly-once across foreachBatch retries:
    * the manifest records the committed epoch, so a replayed batch id
    * (commit-then-crash-before-checkpoint) is a no-op — see indexBatch.
    * `docs` must carry (doc_id, text). */
  def liveIndexStream(docs: DataFrame, indexPath: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.ml.Search.indexBatch(batch, indexPath, epochId): Unit
      }

  /** Live takedowns — the streaming flavor of the index DELETE lifecycle
    * (op 106), completing the streaming CRUD story next to
    * [[liveIndexStream]]: each micro-batch of doc_ids tombstones via
    * [[graft.ml.Search.deleteDocs]] (O(deleted), manifest commit;
    * readers hide the docs immediately, the next compaction reclaims).
    * Replay safety needs no epoch guard here: tombstoning is IDEMPOTENT —
    * a foreachBatch retry re-writes the same doc_id set and the readers'
    * distinct union is unchanged (unlike segment appends, which would
    * double). Empty batches skip the manifest churn. Single-writer
    * contract: takedowns and index appends must not run concurrently
    * against one index path (deleteDocs and updateIndex both
    * read-modify-write the manifest). */
  def liveTakedownStream(docIds: DataFrame, indexPath: String): DataStreamWriter[Row] =
    docIds.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.ml.Search.deleteDocs(batch.sparkSession, indexPath, batch)
      }

  /** Streaming trending terms — the live flavor of the batch burst
    * detector (Search.trendingTerms): per event-time window, each term's
    * document frequency, with late data bounded by the watermark. The
    * stream emits the PER-WINDOW term counts (the expensive,
    * corpus-touching half: per-doc distinct explode → windowed
    * two-level agg, watermark-bounded state); the burst RATIO against
    * each term's trailing mean is a cheap vocabulary-sized batch
    * computation over the emitted counts table — splitting there keeps
    * the streaming state bounded (a ratio-in-stream would need every
    * term's full history in state). Update mode; counts for a window
    * finalize once the watermark passes it (StreamingSpec takes the max
    * per key, == the batch windowed aggregation). */
  def trendingStream(pages: DataFrame, window: String = "1 hour",
      horizon: String = "2 hours"): DataFrame =
    pages
      .withWatermark("warc_ts", horizon)
      .select(col("warc_ts"),
        explode(array_distinct(split(coalesce(col("text"), lit("")), " ")))
          .as("term"))
      .filter(col("term") =!= "")
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window).as("win"),
        col("term"))
      .agg(count(lit(1)).as("df_window"))
      .select(col("win.start").as("window_start"), col("term"), col("df_window"))

  /** Live alerting — the other half of the reference's deployment loop
    * next to [[liveIndexStream]] (poll feeds → match standing queries →
    * notify): every micro-batch of documents is evaluated against the
    * saved-alert table ([[graft.ml.Search.matchAlerts]] — one batch scan,
    * one broadcast alert-term dim, one hash agg) and the hits land under
    * `outDir/e=<epoch>`. Alert matching is a PER-DOCUMENT decision, so
    * batch boundaries cannot change the result (each doc matches from
    * its own tokens alone — no cross-batch state, no watermark needed;
    * streamed hits == the batch operator over the union, pinned in
    * StreamingSpec). Idempotent across foreachBatch retries: a replayed
    * epoch OVERWRITES its own e=<epoch> directory — the same
    * epoch-keyed-commit discipline as indexBatch, without needing a
    * manifest because directories are independent. Compose after
    * [[docDedupStream]] so a re-captured text cannot re-alert within the
    * horizon. */
  def liveAlertStream(docs: DataFrame, alerts: DataFrame,
      outDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.ml.Search.matchAlerts(batch, alerts)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$outDir/e=$epochId"): Unit
      }

  /** Drain a streaming frame through a named memory sink; returns the sink
    * table name. Update mode suits the stateful/windowed queries here. */
  def drainToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Update()): String = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    name
  }
}
