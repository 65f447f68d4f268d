package graft.tools

import org.apache.spark.sql.DataFrame

/** Canonical result hash shared by the certification tools
  * (FaultInjection, SpillCertify, ConcurrentServe): collect, render each
  * row with `Row.toString`, sort, md5. Row rendering is stable across the
  * JVMs these tools compare (same JDK, same machine, UTC session
  * timezone), so hashes computed in a parent and a spawned child JVM are
  * directly comparable. */
object ResultHash {
  def of(df: DataFrame): (String, Long) = {
    val rows = df.collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map(_.toString).sorted.foreach(r => md.update(r.getBytes("UTF-8")))
    (md.digest().map("%02x".format(_)).mkString, rows.length.toLong)
  }
}
