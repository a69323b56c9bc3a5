package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.operators.ZlibPool
import org.scalatest.funsuite.AnyFunSuite

/** Pins ZlibPool (thread-local reused codecs) byte-for-byte against the
 *  JDK stream classes it replaces. The zipnum/CDX offset contracts hash
 *  the encoded byte GEOMETRY, so gzipMember must be bit-identical to
 *  GZIPOutputStream, and gunzip must mirror GZIPInputStream's multi-
 *  member + error semantics exactly. */
class ZlibPoolSpec extends AnyFunSuite {

  private def jdkGzip(b: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(o)
    gz.write(b); gz.finish()
    o.toByteArray
  }

  private def jdkGunzip(p: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(p))
    val o = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n >= 0) { o.write(buf, 0, n); n = in.read(buf) }
    o.toByteArray
  }

  private val rnd = new scala.util.Random(421742)
  private def payloads: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    Array.fill[Byte](1)(7),
    Array.fill[Byte](100000)(65), // highly compressible
    ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" * 40).getBytes("UTF-8"),
    Array.fill[Byte](65536)(0).map(_ => rnd.nextInt(256).toByte), // incompressible
    Array.tabulate[Byte](30000)(i => (i % 23).toByte)
  )

  test("gzipMember is byte-identical to GZIPOutputStream, including reuse") {
    // twice over the same payload list: the SECOND pass exercises the
    // reused (reset) deflater state, which must not change one bit
    (1 to 2).foreach { _ =>
      payloads.foreach { p =>
        val o = new ByteArrayOutputStream()
        ZlibPool.gzipMember(o, p)
        assert(java.util.Arrays.equals(o.toByteArray, jdkGzip(p)),
          s"mismatch for payload of ${p.length} bytes")
      }
    }
  }

  test("gunzip matches GZIPInputStream on single and concatenated members") {
    payloads.filter(_.nonEmpty).foreach { p =>
      val one = jdkGzip(p)
      assert(java.util.Arrays.equals(ZlibPool.gunzip(one), jdkGunzip(one)))
    }
    // multi-member: the record-per-member WARC layout
    val o = new ByteArrayOutputStream()
    payloads.filter(_.nonEmpty).foreach(p => o.write(jdkGzip(p)))
    val cat = o.toByteArray
    assert(java.util.Arrays.equals(ZlibPool.gunzip(cat), jdkGunzip(cat)))
  }

  test("gunzip honors RFC 1952 optional header fields like the JDK") {
    // hand-build a member with FTEXT|FHCRC|FEXTRA|FNAME|FCOMMENT set
    val body = "optional-header member".getBytes("UTF-8")
    val plain = jdkGzip(body)
    val header = new ByteArrayOutputStream()
    header.write(0x1f); header.write(0x8b); header.write(8)
    header.write(1 | 2 | 4 | 8 | 16) // FTEXT FHCRC FEXTRA FNAME FCOMMENT
    header.write(Array[Byte](1, 2, 3, 4)) // MTIME (arbitrary)
    header.write(2); header.write(3) // XFL, OS (arbitrary)
    header.write(3); header.write(0) // XLEN = 3 (LE)
    header.write(Array[Byte](9, 9, 9)) // extra field
    header.write("name.warc".getBytes("UTF-8")); header.write(0)
    header.write("a comment".getBytes("UTF-8")); header.write(0)
    val hb = header.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(hb, 0, hb.length)
    header.write((crc.getValue & 0xff).toInt)
    header.write(((crc.getValue >> 8) & 0xff).toInt)
    val member = header.toByteArray ++ plain.drop(10)
    assert(java.util.Arrays.equals(ZlibPool.gunzip(member), body))
    assert(java.util.Arrays.equals(jdkGunzip(member), body))
    // corrupt the header CRC16: both reject
    val bad = member.clone()
    bad(hb.length) = (bad(hb.length) ^ 0x5a).toByte
    intercept[java.io.IOException](ZlibPool.gunzip(bad))
    intercept[java.io.IOException](jdkGunzip(bad))
  }

  test("gunzip error semantics mirror GZIPInputStream") {
    val good = jdkGzip("payload under test".getBytes("UTF-8"))
    // corrupt trailer CRC: both throw IOException
    val badCrc = good.clone()
    badCrc(badCrc.length - 6) = (badCrc(badCrc.length - 6) ^ 1).toByte
    intercept[java.io.IOException](jdkGunzip(badCrc))
    intercept[java.io.IOException](ZlibPool.gunzip(badCrc))
    // truncated mid-deflate: both throw
    val trunc = good.take(good.length - 12)
    intercept[java.io.IOException](jdkGunzip(trunc))
    intercept[java.io.IOException](ZlibPool.gunzip(trunc))
    // trailing garbage that is not a member header: both stop silently
    val garbage = good ++ "NOT-A-GZIP-HEADER".getBytes("UTF-8")
    assert(java.util.Arrays.equals(jdkGunzip(garbage), ZlibPool.gunzip(garbage)))
    // a second member truncated mid-HEADER: JDK swallows (end of stream)
    val twoTrunc = good ++ good.take(4)
    assert(java.util.Arrays.equals(jdkGunzip(twoTrunc), ZlibPool.gunzip(twoTrunc)))
  }

  test("pool round-trips across threads") {
    val body = Array.tabulate[Byte](50000)(i => (i * 31).toByte)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        val o = new ByteArrayOutputStream()
        (1 to 8).foreach(_ => ZlibPool.gzipMember(o, body))
        results.add(ZlibPool.gunzip(o.toByteArray))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.size() == 4)
    results.forEach { r =>
      assert(r.length == body.length * 8)
      assert(java.util.Arrays.equals(r.take(50000), body))
    }
  }
}
