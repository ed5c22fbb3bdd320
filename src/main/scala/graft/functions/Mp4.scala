package graft.functions

import java.nio.ByteBuffer

/** Minimal ISO BMFF (MP4) box-level reader/writer — pure JDK, no codec.
  *
  * Real video DECODE needs a codec the JDK doesn't ship, but the metadata a
  * 100 TB media pipeline partitions and filters on — brand, timescale,
  * duration, track dimensions — lives in plain big-endian box headers
  * (ISO/IEC 14496-12 §4.2: `[u32 size][4cc type][payload]`, `moov/mvhd`
  * carrying timescale+duration, `moov/trak/tkhd` carrying 16.16-fixed
  * width/height). Parsing those is string-free binary walking, which this
  * object implements for [[graft.operators.Multimodal.extractVideoMeta]];
  * [[build]] emits a spec-shaped minimal file so tests and the driver
  * fixture exercise the parser on genuine box structure rather than a
  * hash-derived fake.
  */
object Mp4 {

  case class Meta(brand: String, timescale: Long, duration: Long,
      width: Int, height: Int) {
    def durationSeconds: Double =
      if (timescale == 0) 0.0 else duration.toDouble / timescale
  }

  private val Matrix: Array[Byte] = {
    // Identity transform matrix (9 × 32-bit fixed-point, 0x00010000 diag).
    val b = ByteBuffer.allocate(36)
    b.putInt(0x00010000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x00010000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
    b.array()
  }

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8 + payload.map(_.length).sum
    val b = ByteBuffer.allocate(n)
    b.putInt(n).put(tpe.getBytes("ISO-8859-1"))
    payload.foreach(b.put)
    b.array()
  }

  /** A minimal valid file: ftyp + moov(mvhd, trak(tkhd)). Big-endian
    * version-0 boxes; width/height stored 16.16 fixed like the spec. */
  def build(brand: String, timescale: Int, duration: Int,
      width: Int, height: Int): Array[Byte] = {
    require(brand.length == 4, s"brand must be a 4cc, got '$brand'")
    val ftyp = box("ftyp", brand.getBytes("ISO-8859-1"),
      ByteBuffer.allocate(4).putInt(0).array(),
      brand.getBytes("ISO-8859-1"), "mp41".getBytes("ISO-8859-1"))
    val mvhd = {
      val b = ByteBuffer.allocate(100)
      b.putInt(0)                       // version + flags
      b.putInt(0).putInt(0)             // creation/modification time
      b.putInt(timescale).putInt(duration)
      b.putInt(0x00010000)              // rate 1.0
      b.putShort(0x0100.toShort)        // volume 1.0
      b.putShort(0).putInt(0).putInt(0) // reserved
      b.put(Matrix)
      (1 to 6).foreach(_ => b.putInt(0))  // pre_defined
      b.putInt(2)                       // next_track_ID
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = ByteBuffer.allocate(84)
      b.putInt(0x00000007)              // version 0, flags: enabled+in-movie
      b.putInt(0).putInt(0)             // creation/modification time
      b.putInt(1)                       // track_ID
      b.putInt(0)                       // reserved
      b.putInt(duration)
      b.putInt(0).putInt(0)             // reserved
      b.putShort(0).putShort(0)         // layer, alternate_group
      b.putShort(0).putShort(0)         // volume (video track: 0), reserved
      b.put(Matrix)
      b.putInt(width << 16).putInt(height << 16) // 16.16 fixed
      box("tkhd", b.array())
    }
    val moov = box("moov", mvhd, box("trak", tkhd))
    ByteBuffer.allocate(ftyp.length + moov.length)
      .put(ftyp).put(moov).array()
  }

  private def fourcc(buf: ByteBuffer): String = {
    val t = new Array[Byte](4); buf.get(t); new String(t, "ISO-8859-1")
  }

  /** Walk `[from, until)` yielding (type, payloadFrom, payloadUntil).
    * Size 0 ("to end of file") and truncated boxes terminate the walk —
    * parsing never throws on garbage, it just finds no boxes. */
  private def boxes(bytes: Array[Byte], from: Int, until: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var at = from
      def hasNext: Boolean = at + 8 <= until && {
        val size = ByteBuffer.wrap(bytes, at, 4).getInt
        // long compare: a hostile size near Int.MaxValue wraps `at + size`
        // negative and would walk out of bounds (found by review, repro'd)
        size >= 8 && at.toLong + size <= until
      }
      def next(): (String, Int, Int) = {
        val b = ByteBuffer.wrap(bytes, at, 8)
        val size = b.getInt
        val tpe = fourcc(b)
        val r = (tpe, at + 8, at + size)
        at += size
        r
      }
    }

  private def find(bytes: Array[Byte], from: Int, until: Int,
      tpe: String): Option[(Int, Int)] =
    boxes(bytes, from, until).collectFirst { case (`tpe`, s, e) => (s, e) }

  /** Parse the metadata boxes; None when the payload isn't box-structured
    * (the NonFatal-guard contract the image/audio codecs follow). */
  def parse(bytes: Array[Byte]): Option[Meta] =
    for {
      (fs, fe) <- find(bytes, 0, bytes.length, "ftyp")
      if fe - fs >= 4
      brand = new String(bytes, fs, 4, "ISO-8859-1")
      (ms, me) <- find(bytes, 0, bytes.length, "moov")
      (hs, he) <- find(bytes, ms, me, "mvhd")
      if he - hs >= 20
      mv = ByteBuffer.wrap(bytes, hs, he - hs)
      version = mv.get() & 0xff
      if version == 0 // v1 would carry 64-bit times; build() emits v0
      _ = { val skip = new Array[Byte](11); mv.get(skip) } // flags + times
      timescale = mv.getInt.toLong & 0xffffffffL
      duration = mv.getInt.toLong & 0xffffffffL
      (ts, te) <- find(bytes, ms, me, "trak")
      (ks, ke) <- find(bytes, ts, te, "tkhd")
      if ke - ks >= 84
      tk = ByteBuffer.wrap(bytes, ks, ke - ks)
      // wrap(array, off, len) positions at `off`, so offsets stay absolute
      w = { tk.position(ks + 76); tk.getInt >>> 16 }
      h = tk.getInt >>> 16
    } yield Meta(brand, timescale, duration, w, h)
}
