package graft.operators

import scala.collection.mutable

/**
 * URL canonicalization + registered-domain extraction — the identity
 * layer of a web-curation pipeline (SURVEY.md §2.6 north-star addition;
 * the reference has no URL surface — its docs are opaque JSON). Dedup,
 * host ranking (Common Crawl-style, [[Pagerank]]) and per-site quotas
 * all need URLs normalized to a stable key first.
 *
 * Deterministic rule set (replayable / predictable by an oracle):
 *  - scheme and host lowercase (punycode `xn--` labels pass through —
 *    lowercasing is a no-op on them);
 *  - default ports strip (http:80, https:443, ftp:21, ws:80, wss:443),
 *    as does a bare trailing `:`;
 *  - path dot-segments resolve per RFC 3986 §5.2.4 (`.` drops, `..`
 *    pops, never above root; a trailing `.`/`..` leaves a trailing
 *    slash); empty path becomes `/`;
 *  - tracking params drop (names in [[TrackingParams]] or starting
 *    with a [[TrackingPrefixes]] prefix, matched case-insensitively);
 *    surviving params keep their original order and bytes; an emptied
 *    query drops its `?`;
 *  - the fragment drops;
 *  - percent-escapes and userinfo are kept VERBATIM (no decode — a
 *    decode step can only merge keys that servers treat as distinct);
 *  - a string without `://` is not an absolute URL: returned trimmed,
 *    unchanged (callers filter or resolve relative refs upstream).
 *
 * 100 TB shape: both functions are per-row linear scans (native
 * expressions [[org.apache.spark.sql.graft.CanonicalizeUrl]] /
 * [[org.apache.spark.sql.graft.RegisteredDomain]]) — they fuse into
 * the scan, no shuffle; the downstream host aggregate shuffles slim
 * (host, count) pairs only.
 */
object Urls {

  /** Exact tracking-param names dropped by canonicalization. */
  val TrackingParams: Set[String] = Set(
    "gclid", "fbclid", "msclkid", "igshid", "mc_cid", "mc_eid",
    "ref_src", "spm", "yclid", "dclid", "wbraid", "gbraid")

  /** Name prefixes dropped by canonicalization. */
  val TrackingPrefixes: Seq[String] = Seq("utm_")

  private val DefaultPorts: Map[String, String] = Map(
    "http" -> "80", "https" -> "443", "ftp" -> "21",
    "ws" -> "80", "wss" -> "443")

  /** Multi-label public suffixes this snapshot recognizes — a compact
   *  deterministic subset of the Mozilla public-suffix list (the full
   *  list is a data file in production; the ALGORITHM is what matters
   *  here and is what the oracle replays). */
  val MultiLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tw",
    "com.sg", "co.za", "com.ar", "co.nz")

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  private def toLowerAscii(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    b.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path. */
  private def resolveDots(path: String): String = {
    val segs = path.split("/", -1)
    val out = mutable.ArrayBuffer.empty[String]
    var trailingSlash = path.endsWith("/")
    var i = 1 // segs(0) is "" before the leading '/'
    while (i < segs.length) {
      val s = segs(i)
      val last = i == segs.length - 1
      s match {
        case "." => if (last) trailingSlash = true
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (last) trailingSlash = true
        case "" =>
          // RFC 3986 remove_dot_segments PRESERVES empty segments —
          // '/a//b' and '/a/b' are distinct resources; only the final
          // "" (the trailing slash) is structural
          if (!last) out += ""
        case seg =>
          out += seg
      }
      i += 1
    }
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "")
  }

  private def isTracking(name: String): Boolean = {
    val n = toLowerAscii(name)
    TrackingParams.contains(n) || TrackingPrefixes.exists(n.startsWith)
  }

  /** Canonicalize an absolute URL per the object Scaladoc. */
  def canonicalizeUrl(url: String): String = {
    val u = url.trim
    val schemeEnd = u.indexOf("://")
    if (schemeEnd <= 0 || !u.substring(0, schemeEnd).forall(isSchemeChar))
      return u
    val scheme = toLowerAscii(u.substring(0, schemeEnd))
    var i = schemeEnd + 3
    val authStart = i
    while (i < u.length && u.charAt(i) != '/' && u.charAt(i) != '?' &&
      u.charAt(i) != '#') i += 1
    val authority = u.substring(authStart, i)
    // userinfo verbatim; host lowercase; default/empty port strips
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = authority.substring(at + 1)
    // IPv6 literals: the port colon is after the closing bracket
    val colon =
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close >= 0 && close + 1 < hostPort.length &&
          hostPort.charAt(close + 1) == ':') close + 1 else -1
      } else hostPort.lastIndexOf(':')
    val (host0, port) =
      if (colon >= 0) (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, null)
    val host = toLowerAscii(host0)
    val keepPort = port != null && port.nonEmpty &&
      !DefaultPorts.get(scheme).contains(port)
    // path / query / fragment
    var pathEnd = i
    while (pathEnd < u.length && u.charAt(pathEnd) != '?' &&
      u.charAt(pathEnd) != '#') pathEnd += 1
    val rawPath = u.substring(i, pathEnd)
    val path = if (rawPath.isEmpty) "/" else resolveDots(rawPath)
    var queryEnd = pathEnd
    if (queryEnd < u.length && u.charAt(queryEnd) == '?') {
      queryEnd += 1
      while (queryEnd < u.length && u.charAt(queryEnd) != '#') queryEnd += 1
    }
    val rawQuery =
      if (pathEnd < u.length && u.charAt(pathEnd) == '?')
        u.substring(pathEnd + 1, queryEnd)
      else null
    val query =
      if (rawQuery == null || rawQuery.isEmpty) null
      else {
        val kept = rawQuery.split("&", -1).filter { p =>
          p.nonEmpty && !isTracking {
            val eq = p.indexOf('=')
            if (eq >= 0) p.substring(0, eq) else p
          }
        }
        if (kept.isEmpty) null else kept.mkString("&")
      }
    val b = new java.lang.StringBuilder(u.length)
    b.append(scheme).append("://").append(userinfo).append(host)
    if (keepPort) b.append(':').append(port)
    b.append(path)
    if (query != null) b.append('?').append(query)
    b.toString
  }

  /** The registrable domain of a HOST (already lowercase): the public
   *  suffix plus one label — `a.b.example.co.uk` → `example.co.uk`,
   *  `www.example.com` → `example.com`. Hosts with fewer labels than
   *  suffix+1, IP literals and bracketed IPv6 pass through unchanged. */
  def registeredDomain(host: String): String = {
    if (host.isEmpty || host.startsWith("[")) return host
    val h = if (host.endsWith(".")) host.substring(0, host.length - 1) else host
    val labels = h.split("\\.", -1)
    if (labels.length < 2) return h
    if (labels.forall(l => l.nonEmpty && l.forall(c => c >= '0' && c <= '9')))
      return h // IPv4 literal
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    if (MultiLabelSuffixes.contains(toLowerAscii(lastTwo))) {
      if (labels.length < 3) h
      else labels(labels.length - 3) + "." + lastTwo
    } else lastTwo
  }
}
