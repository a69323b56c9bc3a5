package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

import scala.collection.concurrent.TrieMap

/**
 * P5 — the opaque-guest escape hatch: arbitrary user per-item transforms
 * as pipeline stages, the Spark-native analogue of the reference's WASM
 * guest contract (reference: host-go/engine/module/instance.go:9-34).
 *
 * Contract mapping:
 *  - `open()` ≅ `NewInstance` + `Alloc`: called once per PARTITION per
 *    query, returning the per-item transform closed over fresh instance
 *    state. Partition-fresh state is the Spark analogue of `Reset` — a
 *    re-run never sees a previous run's state.
 *  - the returned `Row => Row` ≅ `Transform(next)`: items are pulled one
 *    at a time in partition order, exactly the reference's pull loop
 *    (reference: host-go/engine/pipes/fromPipe.go:36-140).
 *  - shared-instance state across appended stages (reference:
 *    host-go/engine/tests/wasm32_pipeline_with_state_test.go:16-100):
 *    consecutive `builtin:opaque` stages naming the same `instance` fuse
 *    into ONE mapPartitions over ONE guest instance applied k times per
 *    item — item i passes through all k stages before item i+1 starts,
 *    reproducing the reference's interleaving (counter appended 3× yields
 *    ids 3, 6, 9).
 *
 * 100 TB shape: a narrow map stage — no shuffle, no driver involvement;
 * state is partition-local so parallelism is unconstrained. `serial=true`
 * (coalesce to one partition) exists for reference-parity tests and
 * genuinely sequential contracts only — it is the single-threaded
 * reference execution model, not a scale path.
 */
trait RowGuest extends Serializable {
  /** Schema after one application (stable across items). */
  def outputSchema(in: StructType): StructType

  /** Fresh instance state, bound to the stage's input schema (≅ the
   *  reference's configure-then-transform split — instance.go's module is
   *  parameterized before items flow); returns the per-item transform.
   *  Under stage fusion the instance is opened once with the FIRST stage's
   *  input schema; applications 2..k see the guest's own output shape. */
  def open(in: StructType): Row => Row
}

/**
 * Process-wide guest registry — the analogue of the reference's module
 * cache by path (reference: host-go/config/config.go:70-82). A lens file
 * refers to a guest by name (`{"path":"builtin:opaque","arguments":
 * {"guest":"<name>"}}`); the hosting application registers the
 * implementation before running the pipeline, as the reference fetches a
 * module from its URL before instantiation
 * (reference: host-go/engine/engine.go:59-104).
 */
object GuestRegistry {
  private val guests = TrieMap.empty[String, RowGuest]

  def register(name: String, guest: RowGuest): Unit = guests.put(name, guest)

  def resolve(name: String): RowGuest =
    guests.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown guest transform: '$name' (register it via GuestRegistry.register)"))
}

object OpaqueOp {

  /** Build the (possibly fused) opaque stage. `times` > 1 = the same
   *  instance appended `times` consecutive stages (see RowGuest scaladoc). */
  def apply(guestName: String, times: Int, serial: Boolean): LensOp = new LensOp {
    override def name: String =
      if (times == 1) s"opaque($guestName)" else s"opaque($guestName x$times)"

    // The guest must see exactly the document schema — host bookkeeping
    // columns (the CLI ordinal) are dropped at this boundary.
    override def ownsRowSet: Boolean = true

    override def forward(df: DataFrame): DataFrame = run(df, permissive = false)

    /** P9 per-ROW error capture: a guest throwing on an item yields an
     *  `__error` row (data columns null, message carries op + cause)
     *  instead of failing the job — the per-item half of error-as-data
     *  that plan-time catches cannot see. Rows already carrying a
     *  non-null `__error` bypass the guest unchanged (first cause wins,
     *  like the reference passing error items through). */
    override def forwardPermissive(df: DataFrame): DataFrame =
      run(df, permissive = true)

    private def run(df: DataFrame, permissive: Boolean): DataFrame = {
      val guest = GuestRegistry.resolve(guestName)
      val base = if (serial) df.coalesce(1) else df
      val inSchema = base.schema
      var outSchema = inSchema
      for (_ <- 0 until times) outSchema = guest.outputSchema(outSchema)
      val k = times
      val opName = name
      if (!permissive) {
        val enc = org.apache.spark.sql.Encoders.row(outSchema)
        base.mapPartitions { rows =>
          val f = guest.open(inSchema) // one instance per partition, shared by the k stages
          rows.map { r =>
            var cur = r; var i = 0
            while (i < k) { cur = f(cur); i += 1 }
            cur
          }
        }(enc)
      } else {
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        // The guest sees only DATA columns — `__error` is host bookkeeping
        // (an already-errored row bypasses the guest, first cause wins).
        val errIdxIn = inSchema.fieldNames.indexOf("__error")
        val dataIdx = inSchema.fieldNames.indices.filter(_ != errIdxIn)
        val dataSchema = StructType(dataIdx.map(inSchema.fields(_)).toArray)
        var guestOut = dataSchema
        for (_ <- 0 until times) guestOut = guest.outputSchema(guestOut)
        val nData = guestOut.length
        val permSchema = StructType(guestOut.fields :+
          StructField("__error", StringType, nullable = true))
        val enc = org.apache.spark.sql.Encoders.row(permSchema)
        base.mapPartitions { rows =>
          val f = guest.open(dataSchema)
          def errRow(err: Any): org.apache.spark.sql.Row =
            org.apache.spark.sql.Row.fromSeq(Seq.fill[Any](nData)(null) :+ err)
          rows.map { r =>
            val priorErr = if (errIdxIn >= 0) r.get(errIdxIn) else null
            if (priorErr != null) errRow(priorErr)
            else {
              try {
                var cur = org.apache.spark.sql.Row.fromSeq(dataIdx.map(r.get))
                var i = 0
                while (i < k) { cur = f(cur); i += 1 }
                org.apache.spark.sql.Row.fromSeq(
                  cur.toSeq.padTo(nData, null).take(nData) :+ null)
              } catch {
                case e: Exception =>
                  errRow(s"lens op '$opName' failed: ${e.getMessage}")
              }
            }
          }
        }(enc)
      }
    }
  }
}
