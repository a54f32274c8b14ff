package graft.multimodal

/** Minimal TIFF baseline writer + IFD metadata reader — TIFF is the
  * container EXIF rides in, so this is the image-metadata face of the
  * multimodal column family (reference anchor: dislib treats binary
  * blobs opaquely; the metadata extraction is the training-pipeline
  * extension). Pure byte arithmetic, no javax.imageio involvement:
  * header (II/MM byte order, magic 42, IFD offset), then a single IFD
  * whose 12-byte entries carry SHORT/LONG values inline and RATIONAL
  * values via a data-area offset — BOTH endiannesses are written and
  * parsed, since real EXIF in the wild is split roughly evenly.
  *
  * Scale: parsing is a per-row byte scan over a handful of header
  * bytes — embarrassingly parallel over the binary column, no decode
  * buffer, the same posture as the MP4/WebM readers. */
object TiffExif {
  final case class TiffMeta(byteOrder: String, width: Long, height: Long,
      orientation: Int, dpi: Long)

  private val TagWidth = 256
  private val TagHeight = 257
  private val TagOrientation = 274
  private val TagXResolution = 282

  /** Build a minimal single-IFD TIFF: 4 ascending-tag entries
    * (width LONG, height LONG, orientation SHORT, x-resolution
    * RATIONAL dpi/1), data area holding the rational. */
  def buildTiff(w: Long, h: Long, orientation: Int, dpi: Long,
      littleEndian: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(70)
    def p16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def p32(v: Long): Unit =
      if (littleEndian) { out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt) }
      else { out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
    out.write(if (littleEndian) 'I' else 'M'); out.write(if (littleEndian) 'I' else 'M')
    p16(42); p32(8L) // magic + first-IFD offset
    p16(4)           // entry count
    // LONG entries: value inline in the 4-byte slot
    p16(TagWidth); p16(4); p32(1L); p32(w)
    p16(TagHeight); p16(4); p32(1L); p32(h)
    // SHORT entry: value in the FIRST TWO bytes of the slot, pad 0
    p16(TagOrientation); p16(3); p32(1L); p16(orientation); p16(0)
    // RATIONAL entry: slot is an offset into the data area
    val dataOff = 8 + 2 + 4 * 12 + 4 // = 62, right after next-IFD
    p16(TagXResolution); p16(5); p32(1L); p32(dataOff.toLong)
    p32(0L)          // next-IFD = none
    p32(dpi); p32(1L) // rational numerator / denominator
    out.toByteArray
  }

  /** Parse the first IFD of a TIFF/EXIF byte array; None on anything
    * that is not a well-formed single-IFD TIFF prefix. */
  def parseTiff(bytes: Array[Byte]): Option[TiffMeta] = {
    if (bytes.length < 8) return None
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return None
    def u8(i: Int): Long = bytes(i) & 0xffL
    def u16(i: Int): Int =
      (if (le) (u8(i) | (u8(i + 1) << 8)) else ((u8(i) << 8) | u8(i + 1))).toInt
    def u32(i: Int): Long =
      if (le) u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      else (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (u16(2) != 42) return None
    val ifd = u32(4).toInt
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd)
    if (ifd + 2 + n * 12 + 4 > bytes.length) return None
    var width = -1L; var height = -1L; var orient = 1; var dpi = -1L
    var k = 0
    while (k < n) {
      val e = ifd + 2 + k * 12
      val tag = u16(e); val typ = u16(e + 2)
      tag match {
        case TagWidth => width = if (typ == 3) u16(e + 8).toLong else u32(e + 8)
        case TagHeight => height = if (typ == 3) u16(e + 8).toLong else u32(e + 8)
        case TagOrientation => orient = u16(e + 8)
        case TagXResolution if typ == 5 =>
          val off = u32(e + 8).toInt
          if (off >= 0 && off + 8 <= bytes.length) {
            val num = u32(off); val den = u32(off + 4)
            if (den != 0) dpi = num / den
          }
        case _ =>
      }
      k += 1
    }
    if (width < 0 || height < 0) None
    else Some(TiffMeta(if (le) "II" else "MM", width, height, orient, dpi))
  }
}
