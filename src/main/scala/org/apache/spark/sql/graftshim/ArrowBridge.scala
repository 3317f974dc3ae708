package org.apache.spark.sql.graftshim

import org.apache.arrow.vector.{VectorLoader, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.ReadChannel
import org.apache.arrow.vector.ipc.message.{ArrowRecordBatch, MessageSerializer}
import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.util.ArrowUtils

/**
 * Columnar (Arrow) batch access for JVM-side vectorized decoders — the
 * production twin of a batched `mapPartitions`: rows are serialized
 * ONCE into Arrow record batches (`spark.sql.execution.arrow.
 * maxRecordsPerBatch` rows each, the same batches `mapInPandas` /
 * `mapInArrow` ship to Python), and the decode callback reads column
 * vectors directly — contiguous off-heap buffers, the memory layout a
 * SIMD/GPU decoder or an FFI library wants, with zero per-row object
 * churn on the ingest side.
 */
object ArrowBridge {

  /**
   * Run `decode` over every Arrow batch of `df` and collect its
   * per-batch results. The callback receives a loaded
   * [[VectorSchemaRoot]] whose vectors are valid until it returns
   * (the root is reused across batches — materialize outputs, don't
   * hold vector references).
   */
  def decodeBatches[T: scala.reflect.ClassTag](df: DataFrame)(
      decode: VectorSchemaRoot => Iterator[T]): RDD[T] = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val schema = df.schema
    val timeZoneId = df.sparkSession.conf.get("spark.sql.session.timeZone")
    ds.toArrowBatchRdd.mapPartitions { batches =>
      val allocator = ArrowUtils.rootAllocator
        .newChildAllocator("graftArrowDecode", 0, Long.MaxValue)
      val arrowSchema = ArrowUtils.toArrowSchema(schema, timeZoneId,
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val loader = new VectorLoader(root)
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        root.close(); allocator.close()
      })
      batches.flatMap { bytes =>
        // each element is one IPC-encoded record batch (the format
        // toArrowBatchRdd emits); deserialize with the stock Arrow API
        val channel = new ReadChannel(java.nio.channels.Channels.newChannel(
          new java.io.ByteArrayInputStream(bytes)))
        val batch: ArrowRecordBatch =
          MessageSerializer.deserializeRecordBatch(channel, allocator)
        try loader.load(batch)
        finally batch.close()
        // materialize: the root's buffers are overwritten by the next batch
        decode(root).toVector
      }
    }
  }
}
