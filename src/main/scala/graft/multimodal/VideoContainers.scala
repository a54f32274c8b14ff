package graft.multimodal

/** Pure-JDK video CONTAINER metadata: MP4 (ISO-BMFF `moov/mvhd`,
  * `trak/tkhd`, `stbl/stsd+stsz`) and WebM (Matroska EBML `Info` +
  * `Tracks`) readers, plus minimal writers used by the roundtrip gate.
  *
  * No codec is involved — container headers carry duration, timescale,
  * track dimensions, frame counts, and the codec fourcc in plain
  * big-endian/EBML structures, all parseable without decoding a single
  * frame (reference analog: the tensor/image loaders,
  * dislib/data/tensor.py:973-1036, which likewise read array headers
  * without touching payload semantics). This closes the last labeled
  * stub in the multimodal path: [[Multimodal.decode]] now returns REAL
  * dimensions/frame counts for MP4/WebM payloads and stubs only
  * payloads no container reader accepts (truncated/foreign bytes).
  *
  * Scale posture: parsing is a bounded scan of the header boxes (the
  * readers never walk `mdat` payload bytes beyond skipping the box), so
  * it runs embarrassingly parallel inside the scan stage like the
  * image/audio kernels.
  */
object VideoContainers {

  final case class VideoMeta(container: String, width: Int, height: Int,
      nFrames: Int, durationMs: Long, codec: String)

  /** Parse MP4 or WebM container metadata; None when the payload is not
    * a well-formed container (the caller falls back to the stub). */
  def parseVideoMeta(bytes: Array[Byte]): Option[VideoMeta] =
    if (bytes.length >= 8 && boxType(bytes, 0) == "ftyp") parseMp4(bytes)
    else if (bytes.length >= 4 && be32(bytes, 0) == 0x1a45dfa3L) parseWebm(bytes)
    else if (bytes.length >= 12 && new String(bytes, 0, 4, "ISO-8859-1") == "RIFF" &&
      new String(bytes, 8, 4, "ISO-8859-1") == "AVI ") parseAvi(bytes)
    else None

  // ================= ISO-BMFF (MP4) =================

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, "ISO-8859-1")

  /** Child boxes of [start, end): (type, payloadStart, boxEnd). Stops at
    * the first malformed header so truncated payloads parse to "missing
    * required box" rather than throwing. */
  private def childBoxes(b: Array[Byte], start: Int, end: Int): List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      val size = be32(b, off)
      val typ = boxType(b, off)
      val (payStart, boxEnd) =
        if (size == 1L && off + 16 <= end) (off + 16, off + be64(b, off + 8))
        else if (size == 0L) (off + 8, end.toLong)
        else (off + 8, off + size)
      if (boxEnd > end || boxEnd <= off || payStart > boxEnd) ok = false
      else { out += ((typ, payStart, boxEnd.toInt)); off = boxEnd.toInt }
    }
    out.result()
  }

  private def find(b: Array[Byte], start: Int, end: Int, typ: String): Option[(Int, Int)] =
    childBoxes(b, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

  private def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    val top = childBoxes(b, 0, b.length)
    for {
      (moovS, moovE) <- top.collectFirst { case ("moov", s, e) => (s, e) }
      (mvhdS, mvhdE) <- find(b, moovS, moovE, "mvhd")
      (timescale, duration) <- parseMvhd(b, mvhdS, mvhdE)
      if timescale > 0
      trak <- childBoxes(b, moovS, moovE).collectFirst {
        // first trak whose tkhd carries nonzero dimensions = video track
        case ("trak", s, e) if tkhdDims(b, s, e).exists(d => d._1 > 0 && d._2 > 0) => (s, e)
      }
      (w, h) <- tkhdDims(b, trak._1, trak._2)
    } yield {
      val stbl = for {
        (mdS, mdE) <- find(b, trak._1, trak._2, "mdia")
        (mnS, mnE) <- find(b, mdS, mdE, "minf")
        st <- find(b, mnS, mnE, "stbl")
      } yield st
      val frames = stbl.flatMap { case (s, e) => find(b, s, e, "stsz") }
        .filter { case (s, e) => e - s >= 12 }
        .map { case (s, _) => be32(b, s + 8).toInt }
        .getOrElse(0)
      val codec = stbl.flatMap { case (s, e) => find(b, s, e, "stsd") }
        .filter { case (s, e) => e - s >= 16 }
        .map { case (s, _) => new String(b, s + 12, 4, "ISO-8859-1") }
        .getOrElse("")
      VideoMeta("mp4", w, h, frames, duration * 1000L / timescale, codec)
    }
  }

  /** (timescale, duration) from mvhd, either version. */
  private def parseMvhd(b: Array[Byte], s: Int, e: Int): Option[(Long, Long)] = {
    if (e - s < 4) return None
    val ver = b(s) & 0xff
    if (ver == 1 && e - s >= 32) Some((be32(b, s + 20), be64(b, s + 24)))
    else if (ver == 0 && e - s >= 20) Some((be32(b, s + 12), be32(b, s + 16)))
    else None
  }

  /** (width, height) from a trak's tkhd (16.16 fixed-point). */
  private def tkhdDims(b: Array[Byte], trakS: Int, trakE: Int): Option[(Int, Int)] =
    find(b, trakS, trakE, "tkhd").flatMap { case (s, e) =>
      if (e - s < 4) None
      else {
        val ver = b(s) & 0xff
        val wOff = if (ver == 1) s + 88 else s + 76
        if (e - s < (wOff - s) + 8) None
        else Some(((be32(b, wOff) >> 16).toInt, (be32(b, wOff + 4) >> 16).toInt))
      }
    }

  // ================= Matroska / WebM (EBML) =================

  // element IDs (stored with marker bits, as they appear on the wire)
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimecodeScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdDefaultDuration = 0x23e383L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL

  /** (value, bytesRead) of an EBML vint at `o`; ID keeps the marker bit
    * (`keepMarker`), sizes strip it. None on truncation/invalid. */
  private def vint(b: Array[Byte], o: Int, end: Int, keepMarker: Boolean): Option[(Long, Int)] = {
    if (o >= end) return None
    val first = b(o) & 0xff
    if (first == 0) return None
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1 // leading zeros within 8 bits + 1
    if (o + len > end || len > 8) return None
    var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    Some((v, len))
  }

  /** Child elements of [start, end): (id, payloadStart, payloadEnd). */
  private def ebmlChildren(b: Array[Byte], start: Int, end: Int): List[(Long, Int, Int)] = {
    val out = List.newBuilder[(Long, Int, Int)]
    var off = start
    var ok = true
    while (ok && off < end) {
      (for {
        (id, idLen) <- vint(b, off, end, keepMarker = true)
        (size, szLen) <- vint(b, off + idLen, end, keepMarker = false)
      } yield (id, size, szLen, idLen + szLen)) match {
        case Some((id, size, szLen, hdr)) =>
          val payS = off + hdr
          // all-ones size = "unknown, extends to parent end"
          val payE = if (size == (1L << (7 * szLen)) - 1 || payS + size > end) end
            else (payS + size).toInt
          if (payE < payS) ok = false
          else { out += ((id, payS, payE)); off = math.max(payE, payS + 1) }
        case None => ok = false
      }
    }
    out.result()
  }

  private def ebmlUint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L; var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(be32(b, s).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(be64(b, s))
    case _ => 0.0
  }

  private def parseWebm(b: Array[Byte]): Option[VideoMeta] = {
    val top = ebmlChildren(b, 0, b.length)
    top.collectFirst { case (IdSegment, s, e) => (s, e) }.flatMap { case (segS, segE) =>
      val seg = ebmlChildren(b, segS, segE)
      val info = seg.collectFirst { case (IdInfo, s, e) => ebmlChildren(b, s, e) }
        .getOrElse(Nil)
      val tcs = info.collectFirst { case (IdTimecodeScale, s, e) => ebmlUint(b, s, e) }
        .getOrElse(1000000L) // Matroska default: 1 ms
      val durTicks = info.collectFirst { case (IdDuration, s, e) => ebmlFloat(b, s, e) }
        .getOrElse(0.0)
      val durationNs = durTicks * tcs
      seg.collectFirst { case (IdTracks, s, e) => ebmlChildren(b, s, e) }
        .flatMap(_.collectFirst { case (IdTrackEntry, s, e) => ebmlChildren(b, s, e) })
        .flatMap { entry =>
          val video = entry.collectFirst { case (IdVideo, s, e) => ebmlChildren(b, s, e) }
            .getOrElse(Nil)
          val w = video.collectFirst { case (IdPixelWidth, s, e) => ebmlUint(b, s, e).toInt }
          val h = video.collectFirst { case (IdPixelHeight, s, e) => ebmlUint(b, s, e).toInt }
          val codec = entry.collectFirst { case (IdCodecId, s, e) =>
            new String(b, s, e - s, "ISO-8859-1") }.getOrElse("")
          val defDur = entry.collectFirst { case (IdDefaultDuration, s, e) => ebmlUint(b, s, e) }
            .getOrElse(0L)
          val frames = if (defDur > 0) Math.round(durationNs / defDur).toInt else 0
          (w, h) match {
            case (Some(wv), Some(hv)) if wv > 0 && hv > 0 =>
              Some(VideoMeta("webm", wv, hv, frames,
                Math.round(durationNs / 1e6), codec))
            case _ => None
          }
        }
    }
  }

  // ================= minimal writers (roundtrip gate + fixtures) ======

  private def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def cat(parts: Array[Byte]*): Array[Byte] = Array.concat(parts: _*)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val p = Array.concat(payload: _*)
    cat(u32(p.length + 8L), typ.getBytes("ISO-8859-1"), p)
  }
  private val identityMatrix: Array[Byte] = cat(
    u32(0x10000), u32(0), u32(0), u32(0), u32(0x10000), u32(0),
    u32(0), u32(0), u32(0x40000000))

  /** Minimal well-formed MP4 header (ftyp + moov; no mdat) carrying the
    * given dimensions and frame count at 25 fps, timescale 1000. */
  def buildMp4(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val durMs = nFrames.toLong * 40L
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(1000), u32(durMs),
      u32(0x10000), u16(0x100), new Array[Byte](10), identityMatrix,
      new Array[Byte](24), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(durMs),
      new Array[Byte](8), u16(0), u16(0), u16(0), u16(0), identityMatrix,
      u32(w.toLong << 16), u32(h.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(1000), u32(durMs),
      u16(0x55c4), u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12), new Array[Byte](1))
    val stsd = box("stsd", u32(0), u32(1),
      u32(16), "avc1".getBytes("ISO-8859-1"), new Array[Byte](8))
    val stsz = box("stsz", u32(0), u32(100), u32(nFrames.toLong))
    val stbl = box("stbl", stsd, stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0),
      "isommp42".getBytes("ISO-8859-1"))
    cat(ftyp, moov)
  }

  private def ebmlId(id: Long): Array[Byte] = {
    val len = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (1 to len).map(i => ((id >> (8 * (len - i))) & 0xff).toByte).toArray
  }
  private def ebmlSize(n: Int): Array[Byte] =
    if (n < 127) Array((0x80 | n).toByte)
    else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte) // n < 2^14-1
  private def elem(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val p = Array.concat(payload: _*)
    cat(ebmlId(id), ebmlSize(p.length), p)
  }
  private def elemUint(id: Long, v: Long): Array[Byte] = {
    val len = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    elem(id, (1 to len).map(i => ((v >> (8 * (len - i))) & 0xff).toByte).toArray)
  }
  private def elemFloat(id: Long, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    elem(id, cat(u32(bits >>> 32), u32(bits & 0xffffffffL)))
  }

  /** Minimal well-formed WebM header (EBML + Segment{Info,Tracks}) at
    * 25 fps (DefaultDuration 40 ms), TimecodeScale 1 ms. */
  def buildWebm(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val header = elem(0x1a45dfa3L,
      elemUint(0x4286L, 1), elemUint(0x42f7L, 1), elemUint(0x42f2L, 4),
      elemUint(0x42f3L, 8), elem(0x4282L, "webm".getBytes("ISO-8859-1")),
      elemUint(0x4287L, 2), elemUint(0x4285L, 2))
    val info = elem(IdInfo,
      elemUint(IdTimecodeScale, 1000000L),
      elemFloat(IdDuration, nFrames.toDouble * 40.0))
    val tracks = elem(IdTracks, elem(IdTrackEntry,
      elemUint(0xd7L, 1), elemUint(0x73c5L, 1), elemUint(0x83L, 1),
      elemUint(IdDefaultDuration, 40000000L),
      elem(IdCodecId, "V_VP9".getBytes("ISO-8859-1")),
      elem(IdVideo, elemUint(IdPixelWidth, w.toLong), elemUint(IdPixelHeight, h.toLong))))
    cat(header, elem(IdSegment, info, tracks))
  }

  // ================= RIFF AVI (MJPEG) =================
  // AVI is the one container whose video payload the JDK can decode
  // end-to-end: MJPEG frames are baseline JPEGs, ImageIO's native
  // kernels. Everything little-endian; chunks pad to even length.
  // Reference analog: the tensor frame loaders, dislib/data/tensor.py:
  // 973-1036 (per-frame arrays from container files).

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def rdFourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")
  private def riffChunk(id: String, payload: Array[Byte]*): Array[Byte] = {
    val p = Array.concat(payload: _*)
    val pad = if (p.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    cat(id.getBytes("ISO-8859-1"), le32(p.length.toLong), p, pad)
  }
  private def riffList(listType: String, payload: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", cat(listType.getBytes("ISO-8859-1"), Array.concat(payload: _*)))

  /** RIFF sub-chunks of [start, end): (fourcc, payloadStart, payloadEnd).
    * Stops at the first malformed header (truncated payloads parse to
    * "missing required chunk", never throw). */
  private def riffChunks(b: Array[Byte], start: Int, end: Int): List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      val id = rdFourcc(b, off)
      val size = rdLe32(b, off + 8 - 4) // size field at off+4
      val payStart = off + 8
      val payEnd = payStart + size
      if (payEnd > end || size < 0) ok = false
      else {
        out += ((id, payStart, payEnd.toInt))
        off = payEnd.toInt + (size.toInt & 1) // even padding
      }
    }
    out.result()
  }

  /** Parse an AVI (RIFF 'AVI '): dimensions + stream fourcc from
    * hdrl/strl's BITMAPINFOHEADER, frame count + frame period from avih. */
  private[multimodal] def parseAvi(b: Array[Byte]): Option[VideoMeta] = {
    if (b.length < 12 || rdFourcc(b, 0) != "RIFF" || rdFourcc(b, 8) != "AVI ")
      return None
    val riffEnd = math.min(b.length.toLong, 8L + rdLe32(b, 4)).toInt
    val top = riffChunks(b, 12, riffEnd)
    val hdrl = top.collectFirst {
      case ("LIST", s, e) if e - s >= 4 && rdFourcc(b, s) == "hdrl" => (s + 4, e)
    }
    hdrl.flatMap { case (hs, he) =>
      val inHdrl = riffChunks(b, hs, he)
      val avih = inHdrl.collectFirst { case ("avih", s, e) if e - s >= 40 => s }
      val strf = inHdrl.collectFirst {
        case ("LIST", s, e) if e - s >= 4 && rdFourcc(b, s) == "strl" =>
          riffChunks(b, s + 4, e).collectFirst {
            case ("strf", fs, fe) if fe - fs >= 40 => fs
          }
      }.flatten
      for (a <- avih; f <- strf) yield {
        val usPerFrame = rdLe32(b, a)
        val nFrames = rdLe32(b, a + 16).toInt
        val w = rdLe32(b, f + 4).toInt
        val h = rdLe32(b, f + 8).toInt
        val codec = rdFourcc(b, f + 16)
        VideoMeta("avi", w, h, nFrames, usPerFrame * nFrames / 1000L, codec)
      }
    }
  }

  /** The video frame payloads ('00dc'/'00db' chunks of the movi list) in
    * stream order — for MJPEG each payload is a standalone baseline
    * JPEG, decodable by ImageIO. */
  def aviFrames(b: Array[Byte]): Seq[Array[Byte]] = {
    if (b.length < 12 || rdFourcc(b, 0) != "RIFF" || rdFourcc(b, 8) != "AVI ")
      return Nil
    val riffEnd = math.min(b.length.toLong, 8L + rdLe32(b, 4)).toInt
    riffChunks(b, 12, riffEnd).collect {
      case ("LIST", s, e) if e - s >= 4 && rdFourcc(b, s) == "movi" =>
        riffChunks(b, s + 4, e).collect {
          case (id, fs, fe) if id.endsWith("dc") || id.endsWith("db") =>
            java.util.Arrays.copyOfRange(b, fs, fe)
        }
    }.flatten
  }

  /** Minimal well-formed MJPEG AVI around the given encoded frames. */
  def buildAvi(w: Int, h: Int, usPerFrame: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
    val n = frames.length
    val maxF = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = riffChunk("avih",
      le32(usPerFrame), le32(0), le32(0), le32(0), le32(n.toLong), le32(0),
      le32(1), le32(maxF.toLong), le32(w.toLong), le32(h.toLong),
      new Array[Byte](16))
    val strh = riffChunk("strh",
      "vids".getBytes("ISO-8859-1"), "MJPG".getBytes("ISO-8859-1"),
      le32(0), le16(0), le16(0), le32(0), le32(usPerFrame), le32(1000000L),
      le32(0), le32(n.toLong), le32(maxF.toLong), le32(0xffffffffL), le32(0),
      le16(0), le16(0), le16(w), le16(h))
    val strf = riffChunk("strf",
      le32(40), le32(w.toLong), le32(h.toLong), le16(1), le16(24),
      "MJPG".getBytes("ISO-8859-1"), le32(w.toLong * h * 3),
      le32(0), le32(0), le32(0), le32(0))
    val hdrl = riffList("hdrl", avih, riffList("strl", strh, strf))
    val movi = riffList("movi",
      frames.map(f => riffChunk("00dc", f)): _*)
    val body = cat("AVI ".getBytes("ISO-8859-1"), hdrl, movi)
    cat("RIFF".getBytes("ISO-8859-1"), le32(body.length.toLong), body)
  }
}

