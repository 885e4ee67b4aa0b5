package graft.serve

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}

/** Distributed key-value serving sink (S8) — the engine-side replacement
  * for the reference's driver-side boto3 loop
  * (`scripts/load_dynamodb.py:125-181`): items flow out of executors via
  * `foreachPartition`, in batches of 25, with per-batch exponential
  * backoff (base 1 s, ≤ 5 retries) on throttling, and last-writer-wins
  * semantics on the (id, timestamp) composite key.
  *
  * The store behind the batch call is pluggable ([[KvStore]]); tests use
  * [[InMemoryKvStore]], a real deployment would wrap a DynamoDB-style
  * client. Item values are coerced exactly as the reference's
  * `convert_to_dynamodb_format` (`:110-122`): floats become
  * `BigDecimal(value.toString)` (the `Decimal(str(x))` idiom), null
  * attributes are omitted from the item, non-scalar values degrade to
  * strings.
  */
object KpiSink {

  type Item = Map[String, Any]

  /** One batch write, ≤ `BatchSize` items. Throw [[ThrottledException]]
    * to signal a retryable throttle.
    */
  trait KvStore extends Serializable {
    def putBatch(items: Seq[Item]): Unit
  }

  final class ThrottledException(msg: String) extends RuntimeException(msg)

  val BatchSize   = 25 // DynamoDB limit — scripts/load_dynamodb.py:135
  val MaxRetries  = 5  // :137
  val BaseDelayMs = 1000L // :138

  /** `Decimal(str(x))` / skip-None coercion — `scripts/load_dynamodb.py:110-122`. */
  def toItem(row: Row): Item =
    row.schema.fieldNames.iterator.zipWithIndex.flatMap { case (name, i) =>
      row.get(i) match {
        case null                      => None // skip nulls, like the reference
        case d: Double                 => Some(name -> BigDecimal(d.toString))
        case f: Float                  => Some(name -> BigDecimal(f.toString))
        case v @ (_: Int | _: Long | _: Boolean | _: String) => Some(name -> v)
        case other                     => Some(name -> other.toString)
      }
    }.toMap

  /** Write a whole item table: executors batch rows (25 at a time) and
    * retry throttled batches with exponential backoff. `sleep` is
    * injectable so tests don't wait out real backoff.
    */
  def write(items: DataFrame, store: KvStore,
            maxRetries: Int = MaxRetries, baseDelayMs: Long = BaseDelayMs,
            sleep: Long => Unit = Thread.sleep): Unit =
    items.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(BatchSize).foreach { batch =>
        val converted = batch.map(toItem)
        var retries = 0
        var done    = false
        while (!done) {
          try { store.putBatch(converted); done = true }
          catch {
            case e: ThrottledException =>
              if (retries >= maxRetries) throw e
              sleep((1L << retries) * baseDelayMs) // 2^retries * base — :160
              retries += 1
          }
        }
      }
    }

  /** Test/reference implementation: a JVM-shared map keyed by
    * (id, timestamp) — overwrite-by-pkeys semantics
    * (`scripts/load_dynamodb.py:140`). Optionally throttles the first
    * `throttleFirstN` batch attempts to exercise the retry path.
    */
  class InMemoryKvStore(throttleFirstN: Int = 0) extends KvStore {
    import InMemoryKvStore._
    /** Stable handle for addressing this store across the DSv2 path. */
    val id: String = java.util.UUID.randomUUID().toString
    private def storeId: String = id
    registry.putIfAbsent(storeId, new ConcurrentHashMap[(String, String), Item]())
    attempts.putIfAbsent(storeId, new java.util.concurrent.atomic.AtomicInteger(0))
    batchSizes.putIfAbsent(storeId, new ConcurrentHashMap[Int, Integer]())

    def putBatch(items: Seq[Item]): Unit = {
      require(items.size <= BatchSize, s"batch of ${items.size} exceeds $BatchSize")
      val n = attempts.get(storeId).incrementAndGet()
      if (n <= throttleFirstN) throw new ThrottledException(s"throttled attempt $n")
      batchSizes.get(storeId).merge(items.size, 1, (a, b) => a + b)
      val m = registry.get(storeId)
      items.foreach { it =>
        m.put((it("id").toString, it("timestamp").toString), it)
      }
    }

    def size: Int = registry.get(storeId).size
    def get(id: String, ts: String): Option[Item] =
      Option(registry.get(storeId).get((id, ts)))
    def batchAttempts: Int = attempts.get(storeId).get()
    def batchSizeHistogram: Map[Int, Int] = {
      import scala.jdk.CollectionConverters._
      batchSizes.get(storeId).asScala.map { case (k, v) => k -> v.intValue() }.toMap
    }
  }

  object InMemoryKvStore {
    // local-mode executors share the JVM; keyed statics make the store
    // visible across the serialized closure copies
    private val registry   = new ConcurrentHashMap[String, ConcurrentHashMap[(String, String), Item]]()
    private val attempts   = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    private val batchSizes = new ConcurrentHashMap[String, ConcurrentHashMap[Int, Integer]]()

    /** Batch put addressed by store id — the DSv2 writer's entry point
      * (`KvDataSource`). Same overwrite-by-(id, timestamp) semantics.
      */
    private[serve] def putById(storeId: String, items: Seq[Item]): Unit = {
      require(items.size <= BatchSize, s"batch of ${items.size} exceeds $BatchSize")
      val m = registry.get(storeId)
      require(m != null, s"unknown store id $storeId — create the InMemoryKvStore first")
      batchSizes.get(storeId).merge(items.size, 1, (a, b) => a + b)
      items.foreach(it => m.put((it("id").toString, it("timestamp").toString), it))
    }
  }
}
