package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** In-memory twin of the logfile source's record assembly (SURVEY.md §2.2
  * "UDTF" row): split a whole multi-line text into records whose first line
  * fully matches `pattern`, exactly as [[graft.sources.logfile.LogfilePartitionReader]]
  * does on streams — lines before the first head are dropped, continuation
  * lines join with "\n". Exposed as an array-returning function to compose
  * with `explode` (Spark's generator contract); parity with the DSv2 source
  * is pinned in ScalaTest.
  */
object RecordSplitter {

  def split(text: String, patternRe: String): Seq[String] = {
    val m = Pattern.compile(patternRe).matcher("")
    val out = Seq.newBuilder[String]
    var cur: java.lang.StringBuilder = null
    text.split("\n", -1).foreach { line =>
      if (m.reset(line).matches()) {
        if (cur != null) out += cur.toString
        cur = new java.lang.StringBuilder(line)
      } else if (cur != null) {
        cur.append('\n').append(line)
      } // else: leading junk before first head — dropped
    }
    if (cur != null) {
      // trailing newline artifact: a final empty "line" after the last \n is
      // a real (empty) continuation only if the text didn't end with \n
      val s = cur.toString
      out += (if (s.endsWith("\n")) s.dropRight(1) else s)
    }
    out.result()
  }

  /** Column form: `explode(splitRecords(col, pattern))` gives the UDTF shape. */
  def splitRecords(text: Column, patternRe: String): Column = {
    val f = udf((t: String) => split(t, patternRe))
    f(text)
  }
}
