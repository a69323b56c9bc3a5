package graft.operators

import scala.collection.mutable

/**
 * Sitemap XML walk (sitemaps.org protocol) — the discovery-side
 * complement of [[Robots]] (whose `Sitemap:` lines point here): crawl
 * pipelines triage `<urlset>` page entries (loc / lastmod / changefreq
 * / priority) and `<sitemapindex>` shard pointers before any fetch
 * spend. Machine-generated XML, so a small tag scanner suffices: block
 * elements `<url>` / `<sitemap>`, child text of `loc` / `lastmod` /
 * `changefreq` / `priority`, XML entity decode for the five predefined
 * entities, comments/CDATA/PI skipped. Priority is surfaced in exact
 * MILLI units (0..1000) so oracles compare integers, lastmod as the
 * raw W3C datetime string.
 *
 * 100 TB shape: per-row linear scan + partition-local 1:N explode, no
 * shuffle; a sitemap is ≤ 50k entries by protocol cap, so per-row
 * output is bounded.
 */
object Sitemap {

  final case class Entry(kind: String, loc: String, lastmod: String,
      changefreq: String, priorityMilli: Long)

  private val XmlEntities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'")

  private def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val name = if (semi > i && semi - i <= 8) s.substring(i + 1, semi) else null
        val dec =
          if (name == null) null
          else if (name.startsWith("#x") || name.startsWith("#X"))
            scala.util.Try(new String(Character.toChars(
              Integer.parseInt(name.substring(2), 16)))).toOption.orNull
          else if (name.startsWith("#"))
            scala.util.Try(new String(Character.toChars(
              Integer.parseInt(name.substring(1))))).toOption.orNull
          else XmlEntities.getOrElse(name, null)
        if (dec == null) { b.append('&'); i += 1 }
        else { b.append(dec); i = semi + 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** All `<url>` and `<sitemap>` entries, in document order. */
  def parse(xml: String): Seq[Entry] = {
    val out = mutable.ArrayBuffer.empty[Entry]
    var kind: String = null
    var loc = ""; var lastmod = ""; var changefreq = ""; var prio = -1L
    var i = 0
    val s = xml
    def flush(): Unit = {
      if (kind != null && loc.nonEmpty)
        out += Entry(kind, loc, lastmod, changefreq, prio)
      kind = null; loc = ""; lastmod = ""; changefreq = ""; prio = -1L
    }
    def childText(closeTag: String, from: Int): (String, Int) = {
      val end = s.indexOf("</" + closeTag, from)
      if (end < 0) (decodeXml(s.substring(from).trim), s.length)
      else {
        val gt = s.indexOf('>', end)
        // gt < 0 = truncated inside the close tag: resume at EOF, never
        // backwards (indexOf(-1)+1 = 0 would rescan from the start)
        (decodeXml(s.substring(from, end).trim),
          if (gt < 0) s.length else gt + 1)
      }
    }
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = s.length
      else if (s.startsWith("<!--", lt)) {
        val e = s.indexOf("-->", lt + 4); i = if (e < 0) s.length else e + 3
      } else if (s.startsWith("<![CDATA[", lt)) {
        val e = s.indexOf("]]>", lt + 9); i = if (e < 0) s.length else e + 3
      } else if (s.startsWith("<?", lt) || s.startsWith("<!", lt)) {
        val e = s.indexOf('>', lt + 2); i = if (e < 0) s.length else e + 1
      } else {
        val close = s.charAt(math.min(lt + 1, s.length - 1)) == '/'
        val nameStart = if (close) lt + 2 else lt + 1
        var j = nameStart
        while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == ':')) j += 1
        val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        val gt = s.indexOf('>', j)
        val after = if (gt < 0) s.length else gt + 1
        if (!close) name match {
          case "url" => flush(); kind = "url"; i = after
          case "sitemap" => flush(); kind = "sitemap"; i = after
          case "loc" if kind != null =>
            val (t, n) = childText("loc", after); loc = t; i = n
          case "lastmod" if kind != null =>
            val (t, n) = childText("lastmod", after); lastmod = t; i = n
          case "changefreq" if kind != null =>
            val (t, n) = childText("changefreq", after); changefreq = t; i = n
          case "priority" if kind != null =>
            val (t, n) = childText("priority", after)
            // valid priority is a finite double in [0,1] — junk that
            // still parses ('NaN'→0, 'Infinity'→MaxValue, '9e9') must
            // fall back to the -1 absent sentinel, not a garbage milli
            prio = scala.util.Try(t.toDouble).toOption
              .filter(d => !d.isNaN && d >= 0.0 && d <= 1.0)
              .map(d => math.round(d * 1000)).getOrElse(-1L)
            i = n
          case _ => i = after
        } else {
          if (name == "url" || name == "sitemap") flush()
          i = after
        }
      }
    }
    flush()
    out.toSeq
  }

  /** Explode a sitemap-XML column into one row per entry:
   *  (kept cols..., entry_idx, kind, loc, lastmod, changefreq,
   *  priority_milli). Partition-local 1:N, no shuffle. */
  def entries(df: org.apache.spark.sql.DataFrame,
      xmlCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val xIdx = inSchema.fieldIndex(xmlCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != xIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("entry_idx", IntegerType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("loc", StringType, nullable = false),
      StructField("lastmod", StringType, nullable = false),
      StructField("changefreq", StringType, nullable = false),
      StructField("priority_milli", LongType, nullable = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        require(!r.isNullAt(xIdx),
          s"null $xmlCol value — filter nulls before the sitemap walk")
        parse(r.getString(xIdx)).zipWithIndex.map { case (e, ei) =>
          Row.fromSeq(keptIdx.toSeq.map(r.get) ++
            Seq[Any](ei, e.kind, e.loc, e.lastmod, e.changefreq,
              e.priorityMilli))
        }
      }
    }(encoder)
  }
}
