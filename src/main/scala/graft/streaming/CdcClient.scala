package graft.streaming

import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Blocking, forward-only iteration over a CDC change stream — the
  * programmatic equivalent of the reference's JDBC `ResultSet` surface
  * (J4, `jdbc.clj:205-331`): `next()` blocks until the database writes
  * more rows, forever, with backpressure.
  *
  * Implementation: a `foreachBatch` sink feeds a bounded queue (capacity
  * mirrors the reference's `LinkedBlockingQueue 10`, `jdbc.clj:41-48` —
  * a full queue blocks the micro-batch, which is the reference's
  * backpressure behavior). `close()` stops the streaming query
  * (`Connection.close` stops CDC, `jdbc.clj:601-606`).
  *
  * Unlike the JDBC singleton (one connection/statement/resultset at a
  * time, `CDCDriver.clj:54-59`), any number of cursors can run — each is
  * its own streaming query.
  */
class CdcCursor private[streaming] (query: StreamingQuery,
                                    queue: ArrayBlockingQueue[AnyRef])
  extends Iterator[Row] with AutoCloseable {

  // nextRow is confined to the consumer thread (hasNext/next); `closed`
  // is ALSO written by close() from other threads — the AutoCloseable
  // escape hatch for a consumer blocked in the poll loop — so it must be
  // volatile for the write to become visible to the poller promptly
  private var nextRow: Row = _
  @volatile private var closed = false

  /** Blocks until a row arrives (or the cursor/query is closed). A FAILED
    * query surfaces as an exception — never as a clean end-of-stream: a
    * consumer of a never-ending cursor that sees `false` would conclude
    * "no more changes" and proceed over silently missing data.
    */
  override def hasNext: Boolean = {
    while (nextRow == null && !closed) {
      queue.poll(100, TimeUnit.MILLISECONDS) match {
        case null =>
          if (!query.isActive && queue.isEmpty) {
            query.exception.foreach { e =>
              throw new IllegalStateException(s"CDC stream failed: ${e.getMessage}", e)
            }
            closed = true
          }
        case r: Row => nextRow = r
        case _ =>
      }
    }
    nextRow != null
  }

  override def next(): Row = {
    if (!hasNext) throw new NoSuchElementException("cursor closed")
    val r = nextRow; nextRow = null; r
  }

  override def close(): Unit = {
    closed = true
    if (query.isActive) query.stop()
  }
}

object CdcClient {

  /** Open a never-ending cursor over a streaming DataFrame. `capacity`
    * bounds buffered ROWS: the sink blocks once `capacity` rows sit
    * unconsumed, which stalls the micro-batch — backpressure. (The
    * reference bounds batches — `LinkedBlockingQueue 10`, `jdbc.clj:41-48`
    * — but a batch has unbounded row count, so a row bound is the stricter
    * memory guarantee; 10k rows ≈ its 10 typical batches.)
    */
  def cursor(stream: DataFrame, capacity: Int = 10240,
             trigger: Trigger = Trigger.ProcessingTime("1 second"),
             checkpoint: Option[String] = None): CdcCursor = {
    val queue = new ArrayBlockingQueue[AnyRef](capacity)
    var writer = stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // toLocalIterator keeps driver memory bounded for huge batches;
        // put() blocks when the consumer lags = backpressure
        batch.toLocalIterator().forEachRemaining(r => queue.put(r))
      }
    checkpoint.foreach(c => writer = writer.option("checkpointLocation", c))
    val q = writer.start()
    new CdcCursor(q, queue)
  }

  /** The reference client's session (`JdbcClient.java:35-63`): connect to a
    * binlog dir/index and iterate `select * from <db>.<table> [where
    * _delta_type = '<t>']` forever.
    */
  def openChanges(spark: SparkSession, path: String, payloadDdl: String,
                  db: String, table: String,
                  deltaType: Option[String] = None): CdcCursor = {
    import org.apache.spark.sql.functions.col
    var df = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", payloadDdl)
      .load(path)
      .filter(col("db") === db && col("table") === table)
    deltaType.foreach(t => df = df.filter(col("_delta_type") === t))
    cursor(df)
  }
}
