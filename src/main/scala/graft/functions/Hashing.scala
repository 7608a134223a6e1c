package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Shared token-hash core for MinHash/SimHash: the first 60 bits (15 hex
  * digits) of md5, the same value `conv(substring(md5(s),1,15),16,10)`
  * produces in SQL — so JVM-loop and expression implementations agree
  * bit-for-bit. One MessageDigest + an interning cache per partition:
  * vocabulary is much smaller than token count, so most lookups skip the
  * digest entirely.
  */
private[graft] final class TokenHasher {
  private val md = MessageDigest.getInstance("MD5")
  private val cache = new java.util.HashMap[String, java.lang.Long](1 << 14)

  /** 60-bit md5 prefix as a non-negative long. */
  def h60(s: String): Long = {
    val hit = cache.get(s)
    if (hit != null) hit.longValue()
    else {
      md.reset()
      val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits = 7.5 bytes: top nibble of d(7) is the last digit
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      cache.put(s, v)
      v
    }
  }
}
