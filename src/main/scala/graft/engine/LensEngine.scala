package graft.engine

import graft.model.PipelineConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/**
 * Session-scoped registry of persisted pipelines — the analogue of the
 * reference's Store/Repository service layer
 * (reference: host-go/store/store.go:29-59, host-go/node/node.go:23-104):
 *
 *   - `add` persists a lens config keyed by its content id; identical
 *     configs dedupe to one entry (reference: host-go/store/store.go:30-33,
 *     131-155),
 *   - `transform` / `inverse` are the two top-level verbs
 *     (reference: host-go/store/store.go:194-218),
 *   - `list` enumerates stored configs (reference: store.go:157-192),
 *   - `reload` re-hydrates from a directory on startup
 *     (reference: store.go:220-237, called from node.go:96-101).
 *
 * Unlike the reference there are no instance pools: building a Pipeline is
 * a pure, cheap plan construction (the reference pools because WASM
 * instantiation is "pretty expensive" — host-go/repository/repository.go:284-286).
 * Transactions (WithTxn) are unnecessary: registry writes are atomic file
 * writes.
 */
final class LensEngine(persistDir: Option[Path] = None) {

  private val configs = TrieMap.empty[String, PipelineConfig]
  private val pipelines = TrieMap.empty[String, Pipeline]
  // CIDv1 aliases (see [[Cid]]): cid -> primary sha256 id and back. The
  // reference keys its whole store by this CID (store.go:131-155); here
  // it rides alongside the engine's sha256-of-canonical-JSON id so BOTH
  // address the same pipeline.
  private val cidToId = TrieMap.empty[String, String]
  private val idToCid = TrieMap.empty[String, String]

  /** Stage paths like `sha256:<id>` resolve against this engine's registry,
   *  so stored pipelines can reference each other (reference fetch
   *  semantics, host-go/engine/engine.go:67-104). A referenced id must be
   *  added BEFORE the pipeline that uses it — content ids cannot cycle. */
  private val resolver: Pipeline.Resolver = new Pipeline.Resolver {
    override def byId(id: String): Option[Pipeline] = pipelines.get(id)
  }

  /** Fetch a lens file by scheme-dispatched reference (`file:`, `data:`,
   *  `http(s):` — see ModuleFetch) and add it; returns its content id.
   *  The reference's fetch-then-register path
   *  (reference: host-go/engine/engine.go:59-104). */
  def addRef(ref: String): String = add(ModuleFetch.fetch(ref))

  /** Persist a lens file; returns its content id. Idempotent. */
  def add(json: String): String = {
    val cfg = PipelineConfig.fromJson(json)
    val id = cfg.contentId
    // Validate at add time, like the reference warming its pools on Add.
    // The compile's module-byte fetches are captured so CID derivation
    // hashes the exact bytes this pipeline executes, fetch-free.
    val fetched = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val pipe = Pipeline.fromConfig(cfg, resolver, fetched)
    publishAll(Seq((id, cfg, pipe)), fetched)
    id
  }

  def list: Seq[(String, PipelineConfig)] = configs.toSeq.sortBy(_._1)

  /** Stored configs keyed by their CIDv1 — the reference's `list` shape
   *  (store.go:157-192 keys by configLink.String()). Configs whose CID
   *  could not be computed (unfetchable stage path at add time) are
   *  absent here but still listed by [[list]]. */
  def listCids: Seq[(String, PipelineConfig)] =
    cidToId.toSeq.sortBy(_._1).flatMap { case (cid, id) =>
      configs.get(id).map(cid -> _)
    }

  /** The CIDv1(sha2-256, dag-cbor) of a stored pipeline, per the
   *  reference's block layout — the id a reference node would assign the
   *  same config (see [[Cid]] for the interop boundary). */
  def cidOf(id: String): Option[String] = idToCid.get(id)

  /** Unknown-but-well-formed id ⇒ identity pass-through, matching the
   *  reference's repository behavior
   *  (reference: host-go/repository/repository.go:244-254, test
   *  tests/integration/node/transform_test.go:69-101); malformed id ⇒
   *  error, matching CID-parse failures
   *  (reference: tests/integration/node/transform_test.go:16-67).
   *
   *  Accepted-id contract (matches a reference node's parser,
   *  host-go/repository/repository.go:244-254): `sha256:<64 hex>`, or
   *  ANY well-formed CID. A graft-profile CID (CIDv1/dag-cbor/
   *  sha2-256 — the only kind this engine MINTS) resolves whatever
   *  multibase it is spelled in (base32/base36/base16/base58btc,
   *  canonicalized via [[Cid.parseAnyCid]]); a well-formed FOREIGN CID
   *  (CIDv0, another codec/hash) is unknown-by-construction and passes
   *  data through as identity, exactly the reference's no-migration
   *  path; only an unparseable id errors. */
  def transform(df: DataFrame, id: String): DataFrame = resolve(id) match {
    case Some(p) => p.forward(df)
    case None    => df
  }

  def inverse(df: DataFrame, id: String): DataFrame = resolve(id) match {
    case Some(p) => p.inverseTransform(df)
    case None    => df
  }

  private def resolve(id: String): Option[Pipeline] = {
    if (id.matches("sha256:[0-9a-f]{64}") || Cid.looksLikeCid(id))
      pipelines.get(id).orElse(cidToId.get(id).flatMap(pipelines.get))
    else Cid.parseAnyCid(id) match {
      case Some(raw) if Cid.isGraftProfile(raw) =>
        // Graft-profile CID spelled in a foreign multibase (base36/
        // base16/base58): canonicalize to the minted base32 form and
        // resolve — the id names real content this engine may hold.
        cidToId.get(Cid.cidString(raw)).flatMap(pipelines.get)
      case Some(_) =>
        // Well-formed but foreign (CIDv0, another codec/hash): this
        // engine cannot have minted it ⇒ unknown ⇒ identity, the
        // reference's no-migration pass-through.
        None
      case None =>
        throw new IllegalArgumentException(s"malformed pipeline id: '$id'")
    }
  }

  /**
   * L6 — transactions: stage several lens-file adds and publish them
   * all-or-nothing, the analogue of the reference's per-txn pool overlay
   * merged into the shared repository on commit and dropped on error
   * (reference: host-go/repository/repository.go:123-170 — `txnCtx`
   * staged pools, `OnSuccess` merge, `OnError`/`OnDiscard` delete).
   *
   * `f` stages adds against a private overlay; ids staged earlier in the
   * SAME txn are visible to later `sha256:` references (the reference's
   * txnCtx-before-shared lookup order). If `f` throws, nothing is
   * published or persisted. The guarantee is all-or-nothing DURABILITY
   * (files are written before any in-memory publication, so a persist
   * failure commits nothing); publication into the live registry is
   * sequential, so a concurrent reader may briefly observe a prefix of a
   * committing txn's entries — same as the reference, whose OnSuccess
   * merge iterates its staged pools entry by entry.
   */
  def withTxn[A](f: LensTxn => A): A = {
    val txn = new LensTxn(this)
    val result = f(txn) // any throw discards the staged overlay wholesale
    txn.publish()
    result
  }

  private[engine] def publishAll(
      entries: Seq[(String, PipelineConfig, Pipeline)],
      fetched: collection.Map[String, Array[Byte]] = Map.empty): Unit = {
    // CID derivation prefers the bytes the pipeline compile JUST fetched
    // (`fetched`, from Pipeline.fromConfig's sink) — no second fetch per
    // add, and for a MUTABLE http ref the CID describes the exact bytes
    // the pipeline executes, not whatever a re-fetch returns a moment
    // later. Paths outside the sink (engine-internal stand-ins; a config
    // republished by reload with no compile fetch) fall back to
    // Cid.payloadOf, which may fetch — so derivation stays OUTSIDE the
    // publish lock: a slow or hung ref must not stall other adds. Best
    // effort: an unfetchable stage path must not fail the add (the
    // sha256 id stands alone then).
    def payload(path: String): Array[Byte] =
      fetched.getOrElse(path, Cid.payloadOf(path))
    val cids = entries.map { case (id, cfg, _) =>
      id -> (if (idToCid.contains(id)) None
      else scala.util.Try(Cid.configBlocks(cfg, payload)._1).toOption)
    }.toMap
    synchronized {
      // Durability first: if any file write fails, the in-memory registry
      // is untouched and the whole publish (txn or single add) aborts
      // clean.
      persistDir.foreach { dir =>
        Files.createDirectories(dir)
        entries.foreach { case (id, cfg, _) =>
          val file = dir.resolve(id.replace(":", "_") + ".json")
          if (!Files.exists(file)) Files.writeString(file, cfg.canonicalJson)
        }
      }
      entries.foreach { case (id, cfg, pipe) =>
        configs.putIfAbsent(id, cfg)
        pipelines.putIfAbsent(id, pipe)
        cids.get(id).flatten.foreach { cid =>
          idToCid.putIfAbsent(id, cid)
          cidToId.putIfAbsent(cid, id)
        }
      }
    }
  }

  private[engine] def lookup(id: String): Option[Pipeline] = pipelines.get(id)

  private[engine] def configOf(id: String): Option[PipelineConfig] = configs.get(id)

  /**
   * L5 — SyncLens: ensure `id` exists locally, fetching it from connected
   * peers if absent (reference: host-go/p2p/p2p.go:19-88 — "keep trying to
   * fetch the lens until it either succeeds, or the context times out").
   * The reference's transport is libp2p + IPLD block exchange; the JVM
   * analogue is a pull from peer REGISTRIES (other engines in-process or
   * on shared storage), which preserves every property the contract
   * actually promises:
   *
   *   - content-addressed integrity: the fetched config's recomputed
   *     contentId must equal the requested id — a peer serving altered
   *     bytes is rejected, exactly what CIDv1 verification buys the
   *     reference;
   *   - transitive resolution: a lens whose stages reference other
   *     `sha256:` ids pulls those blocks first (the linked-block walk of
   *     store.LoadLensModel), depth-safe because content ids cannot
   *     cycle;
   *   - retry-until-deadline: peers that don't (yet) hold the id are
   *     polled until `timeoutMs` elapses, mirroring the context-timeout
   *     loop — a peer may acquire the lens between polls.
   *
   * Fetched lenses persist via the normal `add` path (durable if this
   * engine has a persistDir). Idempotent: a locally-present id returns
   * immediately.
   */
  def syncLens(id: String, peers: Seq[LensEngine], timeoutMs: Long = 5000): Unit = {
    require(id.matches("sha256:[0-9a-f]{64}"), s"malformed pipeline id: '$id'")
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def pull(wanted: String): Unit = {
      if (pipelines.contains(wanted)) return
      var fetched: Option[PipelineConfig] = None
      while (fetched.isEmpty) {
        fetched = peers.iterator.flatMap(_.configOf(wanted).iterator).nextOption()
        if (fetched.isEmpty) {
          if (System.nanoTime() > deadline)
            throw new java.util.concurrent.TimeoutException(
              s"lens $wanted not available on any of ${peers.size} peer(s)")
          Thread.sleep(20)
        }
      }
      val cfg = fetched.get
      require(cfg.contentId == wanted,
        s"peer served corrupt block: wanted $wanted, got ${cfg.contentId}")
      // linked blocks first (content ids cannot cycle ⇒ finite recursion)
      cfg.lenses.map(_.path).filter(_.startsWith("sha256:"))
        .foreach(pull)
      add(cfg.canonicalJson)
    }
    pull(id)
  }

  /**
   * Serialize a stored lens as a CARv1 archive of its DAG-CBOR block DAG
   * (see [[Car]]) — the block-exchange face of [[syncLens]]: the bytes a
   * reference node's blockstore would hold for the same config, framed in
   * the standard IPLD transport. `id` may be either the engine's
   * `sha256:` id or the CIDv1. Fails if the config's CID was never
   * computable (an unfetchable stage ref at add time — there is no block
   * DAG to export then).
   */
  def exportCar(id: String): Array[Byte] = {
    val primary = if (id.startsWith("sha256:")) id
      else cidToId.getOrElse(id,
        throw new NoSuchElementException(s"no stored lens with CID $id"))
    val cfg = configs.getOrElse(primary,
      throw new NoSuchElementException(s"no stored lens $id"))
    require(idToCid.contains(primary),
      s"lens $id has no CID (a stage ref was unfetchable at add time)")
    Car.writeConfig(cfg)
  }

  /** The whole registry as one multi-root CARv1 — every stored lens
   *  whose CID is known, roots in CID order (deterministic), shared
   *  blocks stored once. The full-store sync/backup payload. */
  def exportAllCar(): Array[Byte] = {
    val cfgs = listCids.map(_._2)
    require(cfgs.nonEmpty, "no CID-addressable lenses to export")
    Car.writeConfigs(cfgs)
  }

  /** Import every root of a (possibly multi-root) lens CAR; returns the
   *  `sha256:` ids in root order. All-or-nothing across ALL roots: blocks
   *  are hash-verified up front, and every root's config must also
   *  COMPILE — the roots stage through one [[withTxn]] overlay, so a
   *  later root whose payload is hash-valid but uncompilable aborts the
   *  import before any earlier root publishes durably. */
  def importAllCar(bytes: Array[Byte]): Seq[String] = {
    val cfgs = Car.readConfigs(bytes) // verifies every root up front
    withTxn { txn => cfgs.map { case (_, cfg) => txn.add(cfg.canonicalJson) } }
  }

  /** [[importCar]] by scheme-dispatched reference (`file:`, `data:`,
   *  `http(s):` — the same dispatcher lens refs use): fetch the CAR
   *  bytes, then the normal verified import. With [[exportCar]] served
   *  over any HTTP endpoint this IS the wire-level lens exchange — the
   *  hash verification inside [[Car.read]] makes the transport
   *  untrusted by construction, exactly what content addressing buys
   *  the reference's libp2p block exchange. */
  def importCarRef(ref: String): String =
    importCar(ModuleFetch.fetchBytes(ref))

  /** [[importAllCar]] by scheme-dispatched reference: the whole-registry
   *  sync verb — fetch a peer's [[exportAllCar]] payload and stage every
   *  root through one transaction. One fetch + one txn IS the reference's
   *  full-store replication story minus the libp2p session. */
  def importAllCarRef(ref: String): Seq[String] =
    importAllCar(ModuleFetch.fetchBytes(ref))

  /**
   * Import a CARv1 lens archive: blocks are hash-verified, the config is
   * reconstructed (wasm payloads become self-contained `data:` stages —
   * see [[Car]]'s stand-in rule), its re-derived CID must equal the CAR
   * root, and the result publishes through the normal [[add]] path
   * (durable if this engine persists). Returns the `sha256:` id; the CAR
   * root CID addresses the same pipeline via [[transform]]/[[inverse]].
   */
  def importCar(bytes: Array[Byte]): String = {
    val (_, cfg) = Car.readConfig(bytes)
    add(cfg.canonicalJson)
  }

  /** Re-hydrate persisted lens files from `persistDir`. Files may contain
   *  `sha256:` references to each other and directory order is arbitrary,
   *  so adds retry until a fixpoint: each pass admits every file whose
   *  references now resolve; a pass with no progress surfaces the first
   *  remaining error (genuinely dangling reference or corrupt file). */
  def reload(): Int = persistDir match {
    case Some(dir) if Files.isDirectory(dir) =>
      // Files.list must be closed (it holds a directory handle); materialize
      // before closing.
      val stream = Files.list(dir)
      val files =
        try stream.iterator().asScala.filter(_.toString.endsWith(".json")).toSeq
        finally stream.close()
      var pending = files.map(Files.readString(_))
      var loaded = 0
      var progress = true
      while (pending.nonEmpty && progress) {
        val results = pending.map(json => json -> scala.util.Try(add(json)))
        val failed = results.collect { case (json, scala.util.Failure(_)) => json }
        progress = failed.size < pending.size
        loaded += pending.size - failed.size
        if (!progress) {
          results.collectFirst { case (_, scala.util.Failure(e)) => throw e }
        }
        pending = failed
      }
      loaded
    case _ => 0
  }
}

object LensEngine {
  def apply(): LensEngine = new LensEngine(None)
  def apply(dir: String): LensEngine = new LensEngine(Some(Paths.get(dir)))
}

/** A transaction's staged overlay (see LensEngine.withTxn). */
final class LensTxn private[engine] (engine: LensEngine) {
  private val staged =
    scala.collection.mutable.LinkedHashMap.empty[String, (PipelineConfig, Pipeline)]
  private val fetched = scala.collection.mutable.Map.empty[String, Array[Byte]]

  /** Stage a lens file: validated now (build fails the txn), visible to
   *  later same-txn `sha256:` references, published only on commit. */
  def add(json: String): String = {
    val cfg = PipelineConfig.fromJson(json)
    val id = cfg.contentId
    val resolver: Pipeline.Resolver = new Pipeline.Resolver {
      override def byId(refId: String): Option[Pipeline] =
        staged.get(refId).map(_._2).orElse(engine.lookup(refId))
    }
    val pipe = Pipeline.fromConfig(cfg, resolver, fetched)
    staged.getOrElseUpdate(id, (cfg, pipe))
    id
  }

  private[engine] def publish(): Unit =
    engine.publishAll(
      staged.map { case (id, (cfg, pipe)) => (id, cfg, pipe) }.toSeq, fetched)
}
