package graft.extract

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream}

/** Minimal in-memory ZIP reader for the OOXML/EPUB container formats
  * (docx/pptx/xlsx/epub are all ZIP archives of XML parts). Pure JDK
  * (`java.util.zip`), byte-array in / byte-array out — usable inside
  * executor-side UDF kernels over `binary` columns with no filesystem
  * round-trip and no shuffle.
  *
  * Reads the archive sequentially via local file headers (ZipInputStream),
  * which every writer the engine accepts produces (including Python's
  * stdlib `zipfile`, used to author the cross-implementation test vectors).
  * Fails loudly on truncated/corrupt containers and on entries above
  * [[ZipArchive.MaxEntryBytes]] — a decompression-bomb guard sized far
  * above any legitimate document part.
  */
object ZipArchive {

  /** Per-entry inflated-size cap (zip-bomb guard, fail-loud). */
  val MaxEntryBytes: Int = 256 << 20

  /** All entries, in archive order. Directory entries are skipped. */
  def entries(bytes: Array[Byte]): Vector[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[(String, Array[Byte])]
    try {
      var e: ZipEntry = zin.getNextEntry
      if (e == null)
        throw new IllegalArgumentException("zip: no entries (not a zip archive?)")
      while (e != null) {
        if (!e.isDirectory) out += e.getName -> readEntry(zin, e.getName)
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Entry payload by exact name; fails loudly when absent. Streams and
    * buffers ONLY the matching entry — non-matching entries (embedded
    * media can dwarf the XML part) are skipped without materialization,
    * which matters on the hot per-row extraction kernels.
    */
  def entry(bytes: Array[Byte], name: String): Array[Byte] =
    entryOpt(bytes, name)
      .getOrElse(throw new IllegalArgumentException(
        s"zip: required entry '$name' not found"))

  def entryOpt(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e: ZipEntry = zin.getNextEntry
      if (e == null)
        throw new IllegalArgumentException("zip: no entries (not a zip archive?)")
      while (e != null) {
        if (!e.isDirectory && e.getName == name)
          return Some(readEntry(zin, name))
        zin.closeEntry()
        e = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  private def readEntry(zin: ZipInputStream, name: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 << 10)
    var n = zin.read(chunk)
    while (n >= 0) {
      buf.write(chunk, 0, n)
      if (buf.size > MaxEntryBytes)
        throw new IllegalArgumentException(
          s"zip: entry '$name' exceeds ${MaxEntryBytes} inflated bytes")
      n = zin.read(chunk)
    }
    buf.toByteArray
  }
}
