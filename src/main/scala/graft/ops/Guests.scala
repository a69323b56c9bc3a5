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

  /** P6 — the `set_param` export: called once at configure time with the
   *  stage's `arguments` JSON (host keys guest/instance/serial removed;
   *  None when no parameters were given), returning the parameterized
   *  guest. The default models a module WITHOUT the export: parameters
   *  error, absence of parameters is identity (reference:
   *  tests/integration/cli/with_params_test.go — a parameterized module
   *  conversely rejects None with "Parameters have not been set."). */
  def configured(params: Option[String]): RowGuest = {
    require(params.isEmpty, "guest does not export set_param")
    this
  }

  /** P11 — the optional `inverse` export (reference:
   *  tests/integration/cli/with_inverse_test.go): None models a module
   *  compiled without it; `builtin:opaque` with `"inverse": true` then
   *  fails exactly like the reference's "Export `inverse` does not
   *  exist". */
  def inverseGuest: Option[RowGuest] = None
}

/**
 * The PULL form of the guest contract — for len-changing modules. The
 * reference's `Transform(next)` does not receive an item: the module
 * PULLS source items itself (zero, one, or many per call) and returns one
 * output item per call, or end-of-stream (reference:
 * host-go/engine/module/instance.go:16, pull loop
 * host-go/engine/pipes/fromPipe.go:36-140). A filter pulls until an item
 * passes (1:≤1); a normalize pulls one item, buffers its pages, and
 * returns them on subsequent calls WITHOUT pulling (1:N) — exactly the
 * reference's with_len_change CLI cases.
 *
 * 100 TB shape: still a narrow per-partition stage — the pull loop runs
 * inside mapPartitions, items stream through without materializing the
 * partition; buffering is bounded by the guest's own window (one document
 * of pages), never the partition.
 */
trait PartitionGuest extends Serializable {
  /** Schema after one application (stable across items). */
  def outputSchema(in: StructType): StructType

  /** Fresh instance per partition: the returned iterator transform IS the
   *  reference's Transform-until-EOS pull loop over this partition. */
  def open(in: StructType): Iterator[Row] => Iterator[Row]

  /** P6 `set_param`, as in [[RowGuest.configured]]. */
  def configured(params: Option[String]): PartitionGuest = {
    require(params.isEmpty, "guest does not export set_param")
    this
  }

  /** P11 optional `inverse` export, as in [[RowGuest.inverseGuest]]. */
  def inverseGuest: Option[PartitionGuest] = None

  /** `times` consecutive fused applications over this partition (P7).
   *  The default chains `times` INDEPENDENT instances; implementations
   *  whose guest carries shared mutable state (the wasm runtime)
   *  override to drive every stage through ONE instance — the
   *  reference's shared-instance contract (reference:
   *  host-go/runtimes/wasmtime/runtime.go:192-205 "multiple pipeline
   *  stages to share the same wasm instance"). */
  def openChain(in: StructType, times: Int): Iterator[Row] => Iterator[Row] =
    rows0 => {
      var out = rows0
      var schema = in
      var i = 0
      while (i < times) {
        out = open(schema)(out)
        schema = outputSchema(schema)
        i += 1
      }
      out
    }
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
  private val guests = TrieMap.empty[String, Either[RowGuest, PartitionGuest]]

  def register(name: String, guest: RowGuest): Unit =
    guests.put(name, Left(guest))

  /** Register a pull-mode (len-changing) guest under the same namespace —
   *  a lens file addresses both kinds as `builtin:opaque`. */
  def register(name: String, guest: PartitionGuest): Unit =
    guests.put(name, Right(guest))

  def resolveAny(name: String): Either[RowGuest, PartitionGuest] =
    guests.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown guest transform: '$name' (register it via GuestRegistry.register)"))

  def resolve(name: String): RowGuest = resolveAny(name) match {
    case Left(g) => g
    case Right(_) => throw new IllegalArgumentException(
      s"guest '$name' is a pull-mode (len-changing) guest")
  }

  private[ops] def lookup(name: String): Option[Either[RowGuest, PartitionGuest]] =
    guests.get(name)
}

object OpaqueOp {

  def apply(guestName: String, times: Int, serial: Boolean): LensOp =
    apply(guestName, times, serial, params = None)

  /** Build the (possibly fused) opaque stage. `times` > 1 = the same
   *  instance appended `times` consecutive stages (see RowGuest scaladoc).
   *  `params` is the stage's arguments JSON minus host keys — handed to
   *  the guest's `set_param` export at configure time (P6). */
  def apply(guestName: String, times: Int, serial: Boolean,
      params: Option[String]): LensOp =
    make(guestName, times, serial, params, invert = false)

  private def make(guestName: String, times: Int, serial: Boolean,
      params: Option[String], invert: Boolean): LensOp = new LensOp {
    override def name: String = {
      val base = if (times == 1) guestName else s"$guestName x$times"
      if (invert) s"opaque($base):inverse" else s"opaque($base)"
    }

    // The guest must see exactly the document schema — host bookkeeping
    // columns (the CLI ordinal) are dropped at this boundary.
    override def ownsRowSet: Boolean = true

    /** Configure (set_param) then select the forward or inverse export —
     *  the reference's instantiation order (parameterize the module, then
     *  pick the export to drive). */
    private def resolved(): Either[RowGuest, PartitionGuest] = {
      def noInverse = new UnsupportedOperationException(
        s"lens op 'opaque($guestName)' does not export an inverse")
      GuestRegistry.resolveAny(guestName) match {
        case Left(g) =>
          val conf = g.configured(params)
          Left(if (invert) conf.inverseGuest.getOrElse(throw noInverse) else conf)
        case Right(g) =>
          val conf = g.configured(params)
          Right(if (invert) conf.inverseGuest.getOrElse(throw noInverse) else conf)
      }
    }

    /** P11: present iff the guest exports an inverse (checked against the
     *  registry at derivation time, like the reference failing on a
     *  missing `inverse` export at config time). */
    override def inverseOp: Option[LensOp] =
      if (invert) Some(make(guestName, times, serial, params, invert = false))
      else GuestRegistry.lookup(guestName) match {
        case Some(Left(g)) if g.inverseGuest.isDefined =>
          Some(make(guestName, times, serial, params, invert = true))
        case Some(Right(g)) if g.inverseGuest.isDefined =>
          Some(make(guestName, times, serial, params, invert = true))
        case _ => None
      }

    override def forward(df: DataFrame): DataFrame = run(df, permissive = false)

    /** P9 per-ROW error capture: a guest throwing on an item yields an
     *  `__error` row (data columns null, message carries op + cause)
     *  instead of failing the job — the per-item half of error-as-data
     *  that plan-time catches cannot see. Rows already carrying a
     *  non-null `__error` bypass the guest unchanged (first cause wins,
     *  like the reference passing error items through). */
    override def forwardPermissive(df: DataFrame): DataFrame =
      run(df, permissive = true)

    private def run(df: DataFrame, permissive: Boolean): DataFrame =
      resolved() match {
        case Left(guest) => runRow(df, guest, permissive)
        case Right(guest) => runPartition(df, guest, permissive)
      }

    private def runRow(
        df: DataFrame, guest: RowGuest, permissive: Boolean): DataFrame = {
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

    /** Pull-mode (len-changing) guests: the per-partition iterator
     *  transform IS the Transform-until-EOS loop. `times` > 1 chains
     *  application i's pull loop over application i-1's output iterator
     *  (appended len-change stages chain the same way in the reference's
     *  pipe composition). Permissive capture wraps the LOOP, not the
     *  item: a guest failure emits one `__error` row and ends the
     *  partition — after an unknown amount of internal buffering the
     *  stream cannot safely continue (in-band error items remain the pull
     *  contract's own channel, as in the reference protocol). */
    private def runPartition(
        df: DataFrame, guest: PartitionGuest, permissive: Boolean): DataFrame = {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val base = if (serial) df.coalesce(1) else df
      val inSchema = base.schema
      val k = times
      val opName = name
      if (!permissive) {
        var outSchema = inSchema
        for (_ <- 0 until times) outSchema = guest.outputSchema(outSchema)
        val enc = org.apache.spark.sql.Encoders.row(outSchema)
        base.mapPartitions(rows => guest.openChain(inSchema, k)(rows))(enc)
      } else {
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
          // Already-errored rows bypass the guest: stashed as the guest
          // pulls past them, re-emitted ahead of the next output (order
          // within a len-changing stage carries no contract).
          val stash = scala.collection.mutable.Queue.empty[Row]
          val dataIter = new Iterator[Row] {
            private var pending: Row = null
            def hasNext: Boolean = {
              while (pending == null && rows.hasNext) {
                val r = rows.next()
                val prior = if (errIdxIn >= 0) r.get(errIdxIn) else null
                if (prior != null)
                  stash.enqueue(Row.fromSeq(Seq.fill[Any](nData)(null) :+ prior))
                else pending = Row.fromSeq(dataIdx.map(r.get))
              }
              pending != null
            }
            def next(): Row = { val r = pending; pending = null; r }
          }
          val out: Iterator[Row] = guest.openChain(dataSchema, k)(dataIter)
          new Iterator[Row] {
            private var pending: Row = null
            private var failed = false
            def hasNext: Boolean = stash.nonEmpty || pending != null ||
              (!failed && {
                try {
                  if (out.hasNext) {
                    pending = Row.fromSeq(
                      out.next().toSeq.padTo(nData, null).take(nData) :+ null)
                    true
                  } else false
                } catch {
                  case e: Exception =>
                    failed = true
                    pending = Row.fromSeq(Seq.fill[Any](nData)(null) :+
                      s"lens op '$opName' failed: ${e.getMessage}")
                    true
                }
              })
            def next(): Row =
              if (stash.nonEmpty) stash.dequeue()
              else { val r = pending; pending = null; r }
          }
        }(enc)
      }
    }
  }
}
