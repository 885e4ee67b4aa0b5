package graft.serve

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face of the KV serving sink (S8's "or DataSource V2"
  * alternative to `foreachPartition`):
  *
  * {{{
  *   items.write.format("graft.serve.kv")
  *        .option("store", store.id)
  *        .mode("append").save()
  * }}}
  *
  * Each task's `DataWriter` buffers 25 rows and flushes a batch to the
  * store — the same batching contract as [[KpiSink.write]], but planned
  * as a proper V2 `BatchWrite` (shows up in the physical plan, gets
  * Spark's task-retry/abort lifecycle instead of hand-rolled
  * `foreachPartition` semantics). Writes are idempotent under task
  * retry because the store overwrites by (id, timestamp).
  */
class KvDataSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException("graft.serve.kv is write-only")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KvDataSource.KvTable(schema, properties.asScala.toMap)
}

object KvDataSource {

  val Format = "graft.serve.kv"

  private class KvTable(tableSchema: StructType, props: Map[String, String])
      extends Table with SupportsWrite {
    override def name(): String = Format
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        // truncate = overwrite mode; the store's overwrite-by-pkeys
        // semantics make it a no-op distinction here
        override def truncate(): WriteBuilder = this
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new KvBatchWrite(info.schema(),
            props.getOrElse("store",
              throw new IllegalArgumentException("option 'store' (a store id) is required")))
        }
      }
  }

  private class KvBatchWrite(schema: StructType, storeId: String) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      KvWriterFactory(schema, storeId)
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  private case class KvWriterFactory(schema: StructType, storeId: String)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new KvDataWriter(schema, storeId)
  }

  private object Done extends WriterCommitMessage

  private class KvDataWriter(schema: StructType, storeId: String)
      extends DataWriter[InternalRow] {
    private val deser =
      ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind().createDeserializer()
    private val buf = scala.collection.mutable.ArrayBuffer[KpiSink.Item]()

    override def write(record: InternalRow): Unit = {
      buf += KpiSink.toItem(deser(record.copy()))
      if (buf.size >= KpiSink.BatchSize) flush()
    }
    private def flush(): Unit = if (buf.nonEmpty) {
      KpiSink.InMemoryKvStore.putById(storeId, buf.toSeq)
      buf.clear()
    }
    override def commit(): WriterCommitMessage = { flush(); Done }
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}
