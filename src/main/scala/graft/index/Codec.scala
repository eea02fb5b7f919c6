package graft.index

import java.io.ByteArrayOutputStream

/** Posting-list block codec: delta + unsigned LEB128 varint.
  *
  * Physical layout of one packed posting list (per (shard, term)):
  * an array of blocks, each holding up to `blockSize` postings sorted by
  * docId with
  *   - docs: varint(delta(docId))   (first delta is docId - blockBase)
  *   - tfs:  varint(tf)
  *   - dls:  varint(dl)             (doc length inline — keeps blocks
  *                                   self-contained for scoring; costs
  *                                   ~1 byte/posting vs a per-shard dl
  *                                   sidecar, trades bytes for zero extra
  *                                   lookups and simpler resume)
  *   - maxDocId: skip pointer (block-level skipping)
  *   - maxTf / minDl: the BM25 tf-norm tf/(tf + k1*(1-b+b*dl/avgdl)) is
  *     increasing in tf and decreasing in dl, so norm(maxTf, minDl) bounds
  *     every posting in the block under ANY (k1, b, avgdl) supplied at
  *     query time. Storing these primitives instead of a baked norm keeps
  *     the pack stage free of df/idf joins AND keeps bounds valid after
  *     incremental appends change the corpus avgdl.
  *
  * The long-posting-list splitting required by the north rule falls out of
  * this structure: a hot term's postings within a shard are split into many
  * independent blocks, and across shards by doc-partitioning.
  */
object Codec {

  final val DefaultBlockSize = 128

  // ---- varint ----------------------------------------------------------

  def writeVarLong(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    require(v >= 0, s"varint requires non-negative, got $v")
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Decode all varints in a byte array into `n` longs. */
  def readVarLongs(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xFF
        v |= (b & 0x7FL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v
      i += 1
    }
    out
  }

  // ---- blocks ----------------------------------------------------------

  /** One packed block. `baseDocId` is the first docId (deltas start there). */
  final case class Block(
      baseDocId: Long,
      maxDocId: Long,
      count: Int,
      maxTf: Long,
      minDl: Long,
      docs: Array[Byte],
      tfs: Array[Byte],
      dls: Array[Byte]) {

    def decodeDocIds: Array[Long] = {
      val deltas = readVarLongs(docs, count)
      val out = new Array[Long](count)
      var acc = baseDocId
      var i = 0
      while (i < count) {
        acc += deltas(i) // deltas(0) == 0
        out(i) = acc
        i += 1
      }
      out
    }
    def decodeTfs: Array[Long] = readVarLongs(tfs, count)
    def decodeDls: Array[Long] = readVarLongs(dls, count)
  }

  /** Pack sorted postings (docId asc) into blocks. */
  def pack(docIds: Array[Long], tfs: Array[Long], dls: Array[Long],
           blockSize: Int = DefaultBlockSize): IndexedSeq[Block] = {
    require(docIds.length == tfs.length && tfs.length == dls.length)
    val n = docIds.length
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    var start = 0
    while (start < n) {
      val end = math.min(start + blockSize, n)
      val base = docIds(start)
      val docsB = new ByteArrayOutputStream()
      val tfsB = new ByteArrayOutputStream()
      val dlsB = new ByteArrayOutputStream()
      var maxTf = 0L
      var minDl = Long.MaxValue
      var prev = base
      var i = start
      while (i < end) {
        val d = docIds(i)
        require(i == start || d > prev, s"docIds must be strictly increasing: $prev -> $d")
        writeVarLong(docsB, d - (if (i == start) base else prev))
        prev = d
        writeVarLong(tfsB, tfs(i))
        writeVarLong(dlsB, dls(i))
        if (tfs(i) > maxTf) maxTf = tfs(i)
        if (dls(i) < minDl) minDl = dls(i)
        i += 1
      }
      blocks += Block(base, docIds(end - 1), end - start, maxTf, minDl,
        docsB.toByteArray, tfsB.toByteArray, dlsB.toByteArray)
      start = end
    }
    blocks.toIndexedSeq
  }

  // ---- positional blocks ----------------------------------------------

  /** One packed POSITIONS block — the optional positional arm of the index
    * (term occurrence offsets within each doc's token array, for phrase /
    * proximity queries). Same block granularity as [[Block]]:
    *   - docs: varint(delta(docId)) exactly like the scoring blocks
    *   - cnts: varint(positions per posting)  (== tf by construction)
    *   - poss: per posting, its sorted positions delta-encoded (first
    *     absolute, then gaps) — a posting's positions never split across
    *     blocks, so a block is self-contained for phrase verification.
    */
  final case class PosBlock(
      baseDocId: Long,
      maxDocId: Long,
      count: Int,
      docs: Array[Byte],
      cnts: Array[Byte],
      poss: Array[Byte]) {

    def decodeDocIds: Array[Long] = {
      val deltas = readVarLongs(docs, count)
      val out = new Array[Long](count)
      var acc = baseDocId
      var i = 0
      while (i < count) { acc += deltas(i); out(i) = acc; i += 1 }
      out
    }

    def decodeCounts: Array[Long] = readVarLongs(cnts, count)

    /** Per-posting position arrays (sorted ascending). */
    def decodePositions: Array[Array[Long]] = {
      val counts = decodeCounts
      val total = counts.sum.toInt
      val flat = readVarLongs(poss, total)
      val out = new Array[Array[Long]](count)
      var fi = 0
      var i = 0
      while (i < count) {
        val c = counts(i).toInt
        val arr = new Array[Long](c)
        var acc = 0L
        var j = 0
        while (j < c) { acc += flat(fi); arr(j) = acc; fi += 1; j += 1 }
        out(i) = arr
        i += 1
      }
      out
    }
  }

  /** Pack sorted postings (docId asc) with their per-doc sorted position
    * arrays into positional blocks.
    */
  def packPositions(docIds: Array[Long], positions: Array[Array[Long]],
                    blockSize: Int = DefaultBlockSize): IndexedSeq[PosBlock] = {
    require(docIds.length == positions.length)
    val n = docIds.length
    val blocks = scala.collection.mutable.ArrayBuffer.empty[PosBlock]
    var start = 0
    while (start < n) {
      val end = math.min(start + blockSize, n)
      val base = docIds(start)
      val docsB = new ByteArrayOutputStream()
      val cntsB = new ByteArrayOutputStream()
      val possB = new ByteArrayOutputStream()
      var prev = base
      var i = start
      while (i < end) {
        val d = docIds(i)
        require(i == start || d > prev, s"docIds must be strictly increasing: $prev -> $d")
        writeVarLong(docsB, d - (if (i == start) base else prev))
        prev = d
        val ps = positions(i)
        writeVarLong(cntsB, ps.length.toLong)
        var pprev = 0L
        var j = 0
        while (j < ps.length) {
          require(j == 0 || ps(j) > pprev,
            s"positions must be strictly increasing: $pprev -> ${ps(j)}")
          writeVarLong(possB, ps(j) - (if (j == 0) 0L else pprev))
          pprev = ps(j)
          j += 1
        }
        i += 1
      }
      blocks += PosBlock(base, docIds(end - 1), end - start,
        docsB.toByteArray, cntsB.toByteArray, possB.toByteArray)
      start = end
    }
    blocks.toIndexedSeq
  }
}
