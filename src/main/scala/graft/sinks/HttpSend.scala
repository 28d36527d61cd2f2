package graft.sinks

/** The one HTTP request body shared by the protocol stores
  * ([[HttpObjectStore]] S3-REST PUT, [[GcsObjectStore]] JSON-API media
  * POST): fixed-length streaming upload, response drain (so the
  * connection is keep-alive reusable), and the non-2xx → IOException
  * contract that feeds [[ObjectSink]]'s per-record retry/swallow policy.
  * Extracted r15 (self-review): the two stores had diverging copies of
  * this plumbing — a fix to the drain loop or status contract had to be
  * applied twice.
  */
private[sinks] object HttpSend {

  def send(
      url: java.net.URL,
      method: String,
      headers: Seq[(String, String)],
      bytes: Array[Byte],
      timeoutMs: Int,
      what: String): Unit = {
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestMethod(method)
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(bytes.length)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val out = conn.getOutputStream
      try out.write(bytes)
      finally out.close()
      val code = conn.getResponseCode
      // drain so the connection is reusable, then judge the status
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (stream != null) {
        val buf = new Array[Byte](4096)
        while (stream.read(buf) >= 0) ()
        stream.close()
      }
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"$what -> HTTP $code")
    } finally conn.disconnect()
  }
}
