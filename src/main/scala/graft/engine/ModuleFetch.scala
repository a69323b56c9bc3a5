package graft.engine

import java.net.URLDecoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/**
 * Scheme-dispatched lens-file fetch — the analogue of the reference
 * resolving a module reference by URL scheme at config time
 * (reference: host-go/engine/engine.go:67-104, which dispatches on
 * `file:`, `http(s):` and raw content). Fetching returns the lens-file
 * JSON; validation (parse, stage resolution, content id) happens in the
 * caller exactly as for inline JSON, so a fetched file gets no trust the
 * inline path wouldn't.
 *
 *  - `file:<path>` — local file read.
 *  - `data:[<mediatype>][;base64],<payload>` — inline content (RFC 2397):
 *    base64 when the header says so, percent-decoded otherwise. Pure and
 *    offline — the transport for embedding a lens file in a config/test.
 *  - `http:`/`https:` — plain GET, 200-or-fail. Driver-side config-time
 *    fetch of a few KB of JSON, never on executors or in a query plan.
 */
object ModuleFetch {

  def supports(ref: String): Boolean =
    Seq("file:", "data:", "http:", "https:").exists(ref.startsWith)

  def fetch(ref: String): String = new String(fetchBytes(ref), UTF_8)

  /** Raw-bytes fetch — the reference's `GetWasmBytes`
   *  (host-go/engine/engine.go:67-104): the same references can carry a
   *  binary `.wasm` module (magic-sniffed by the caller) or lens-file
   *  JSON. */
  def fetchBytes(ref: String): Array[Byte] =
    if (ref.startsWith("file:")) {
      Files.readAllBytes(
        Paths.get(ref.stripPrefix("file:")).toAbsolutePath.normalize)
    } else if (ref.startsWith("data:")) {
      val body = ref.stripPrefix("data:")
      val comma = body.indexOf(',')
      require(comma >= 0, s"malformed data: reference (no comma): '$ref'")
      val header = body.substring(0, comma)
      val payload = body.substring(comma + 1)
      if (header.endsWith(";base64"))
        java.util.Base64.getDecoder.decode(payload)
      else URLDecoder.decode(payload, "UTF-8").getBytes(UTF_8)
    } else if (ref.startsWith("http:") || ref.startsWith("https:")) {
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(java.net.URI.create(ref)).GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      require(resp.statusCode() == 200,
        s"module fetch '$ref' failed: HTTP ${resp.statusCode()}")
      resp.body()
    } else {
      throw new IllegalArgumentException(
        s"unsupported module reference scheme: '$ref'")
    }

  /** Cycle-detection key: files canonicalize to their absolute path (two
   *  spellings of one file must collide); other schemes key on the raw
   *  reference. `data:` cannot cycle (its content would have to contain
   *  itself) but keying it is harmless. */
  def visitKey(ref: String): String =
    if (ref.startsWith("file:"))
      Paths.get(ref.stripPrefix("file:")).toAbsolutePath.normalize.toString
    else ref
}
