package graft.multimodal

/** Minimal REAL baseline JPEG codec (ITU-T T.81, public spec), pure JDK —
  * the JPEG sibling of [[Multimodal.decodePng]]/[[Multimodal.encodePng]],
  * closing the "header-only JPEG" gap: [[decode]] is a full entropy-coded
  * pixel decoder (marker walk → DQT/DHT/SOF0/SOS parse → canonical Huffman
  * decode with byte-unstuffing and restart markers → dequantize → inverse
  * zigzag → IDCT → level shift), not a header skim.
  *
  * Supported subset, chosen for honesty over breadth:
  *  - baseline sequential DCT (SOF0), 8-bit precision;
  *  - any component count with 1×1 sampling (no chroma subsampling) — the
  *    decoded output is the raw interleaved component samples (no YCbCr →
  *    RGB conversion: the pipeline treats channels as opaque planes, the
  *    same contract as the PNG path);
  *  - DRI/RSTn restart intervals (DC predictors reset, bit alignment);
  *  - anything else (progressive SOF2, 12-bit, subsampled, arithmetic
  *    coding) returns None and callers fall through, exactly like
  *    decodePng on foreign payloads.
  *
  * Determinism note: the IDCT is double-precision, which the JPEG spec
  * permits to vary across decoders by ±1 — EXCEPT for DC-only blocks,
  * where every term is a power-of-two-exact product and the reconstruction
  * is bit-exact in any IEEE implementation (the dedicated fast path makes
  * that explicit). The fixture images ([[Multimodal]] block images with a
  * flat q=16 table) quantize to DC-only blocks, so the full encode →
  * decode roundtrip is EXACT and the decoded pixels are oracle-checkable
  * in closed form; MultimodalSpec additionally differentials the general
  * AC path against the JDK's independent ImageIO decoder.
  */
object Jpeg {

  /** Zigzag scan order (T.81 Figure 5): zigzag(i) = natural index of the
    * i-th coefficient in scan order. */
  private[multimodal] val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Flat quantization table: DC step 16 makes the fixture block values
    * (48/112 → shifted DC −640/−128) divide EXACTLY, so quantization is
    * lossless on DC-only images; AC 16 zeroes the ~1e-13 forward-DCT
    * residue of constant blocks. A custom table is fully legal JPEG — it
    * travels in DQT. */
  private[multimodal] val flatQ: Array[Int] = Array.fill(64)(16)

  // Standard Huffman tables (T.81 Annex K.3.3) — luminance DC and AC.
  // BITS[i] = number of codes of length i+1; VALS = symbols in code order.
  private val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman code assignment (T.81 Annex C): returns
    * symbol → (code, length) for the encoder. */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1
        k += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Decoder-side canonical table: per code length, the smallest code and
    * the index of its first symbol — O(16) lookup per symbol. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val symbols: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1; valPtr(len) = 0 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1)
          k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
  }

  /** MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing.
    * Stops (returns -1 bits) at any marker; RSTn markers are consumed by
    * [[decode]] via [[alignToMarker]]. */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) { hitMarker = true; return -1 }
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= p.length) { hitMarker = true; return -1 }
          val nxt = p(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed byte: literal 0xFF
          else { pos -= 1; hitMarker = true; return -1 } // real marker
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }

    def decodeSym(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.symbols(t.valPtr(len) + code - t.minCode(len))
      }
      -1
    }

    /** Byte-align and consume an expected RSTn marker; true on success. */
    def restart(): Boolean = {
      nbits = 0
      if (pos + 1 >= p.length) return false
      if ((p(pos) & 0xff) != 0xff) return false
      val m = p(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      hitMarker = false
      true
    }
  }

  /** Sign extension of a t-bit magnitude value (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private val cosTab: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val invSqrt2 = 1.0 / math.sqrt(2.0)

  /** 8×8 IDCT (T.81 A.3.3), separable double-precision, with the exact
    * DC-only fast path: a DC-only block reconstructs to the constant
    * DC/8 + 128 — every operation a power-of-two-exact IEEE step, so the
    * fixture images decode bit-identically on any platform. */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var allZero = true
    var i = 1
    while (i < 64 && allZero) { if (coef(i) != 0) allZero = false; i += 1 }
    if (allZero) {
      val v0 = coef(0) / 8.0 + 128.0
      val v = math.max(0, math.min(255, math.round(v0).toInt))
      java.util.Arrays.fill(out, v)
      return
    }
    val tmp = new Array[Double](64)
    // rows: for each y, 1-D over u
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) invSqrt2 else 1.0
          s += cu * coef(y * 8 + u) * cosTab(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // cols: for each x, 1-D over v
    var x2 = 0
    while (x2 < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) invSqrt2 else 1.0
          s += cv * tmp(v * 8 + x2) * cosTab(y2 * 8 + v)
          v += 1
        }
        val px = math.round(s / 2.0 + 128.0).toInt
        out(y2 * 8 + x2) = math.max(0, math.min(255, px))
        y2 += 1
      }
      x2 += 1
    }
  }

  /** Forward 8×8 DCT (encoder side), double precision. */
  private def fdctBlock(px: Array[Int], coef: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += (px(y * 8 + x) - 128) * cosTab(x * 8 + u) * cosTab(y * 8 + v)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) invSqrt2 else 1.0
        val cv = if (v == 0) invSqrt2 else 1.0
        coef(v * 8 + u) = s * cu * cv / 4.0
        v += 1
      }
      u += 1
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1-bits per the spec
      put(0x7f, 8 - nbits)
    }
  }

  /** Encode an 8-bit GRAYSCALE image as a baseline JFIF JPEG: real forward
    * DCT, flat q=16 quantization, standard Annex-K Huffman tables. Any
    * dims (edge blocks replicate the last row/column — standard practice,
    * keeps edge DC exact for block-constant content). */
  def encodeGray(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h, "bad grayscale buffer")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, data: Array[Int]): Unit = {
      marker(m)
      val len = data.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      data.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ zigzag.map(flatQ(_))) // DQT table 0, zigzag order
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      1, /*comp id*/ 1, 0x11, 0)) // SOF0: 1 component, 1x1 sampling, q-table 0
    seg(0xc4, Array(0x00) ++ dcBits ++ dcVals) // DHT DC class 0 id 0
    seg(0xc4, Array(0x10) ++ acBits ++ acVals) // DHT AC class 1 id 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcCodes = buildCodes(dcBits, dcVals)
    val acCodes = buildCodes(acBits, acVals)
    val bw = new BitWriter(out)
    val blk = new Array[Int](64)
    val coef = new Array[Double](64)
    var prevDc = 0
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        var yy = 0
        while (yy < 8) {
          val sy = math.min(h - 1, by * 8 + yy)
          var xx = 0
          while (xx < 8) {
            val sx = math.min(w - 1, bx * 8 + xx)
            blk(yy * 8 + xx) = pixels(sy * w + sx) & 0xff
            xx += 1
          }
          yy += 1
        }
        // Constant-block fast path — bitstream-identical to the general
        // path: for a constant block the double FDCT's DC is the exact
        // 8·(c−128) (a sum of equal integers through cos(0)=1 terms and
        // power-of-two scales) and every AC is a ~1e-13 cancellation
        // residue that quantizes to 0 under any step ≥ 1. The fixture's
        // MCU-aligned block images are all-constant, so this turns the
        // encode from 4096 mults/block into a comparison scan.
        var isConst = true
        var ci = 1
        while (ci < 64 && isConst) { if (blk(ci) != blk(0)) isConst = false; ci += 1 }
        val q = new Array[Int](64)
        if (isConst) {
          q(0) = math.round(8.0 * (blk(0) - 128) / flatQ(0)).toInt
        } else {
          fdctBlock(blk, coef)
          var i = 0
          while (i < 64) {
            q(i) = math.round(coef(zigzag(i)) / flatQ(zigzag(i))).toInt
            i += 1
          }
        }
        // DC difference
        val diff = q(0) - prevDc
        prevDc = q(0)
        val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (dcC, dcL) = dcCodes(t)
        bw.put(dcC, dcL)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC run-length
        var run = 0
        var k = 1
        while (k < 64) {
          if (q(k) == 0) run += 1
          else {
            while (run >= 16) { val (c, l) = acCodes(0xf0); bw.put(c, l); run -= 16 }
            val sz = 32 - Integer.numberOfLeadingZeros(math.abs(q(k)))
            val (c, l) = acCodes((run << 4) | sz)
            bw.put(c, l)
            bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acCodes(0x00); bw.put(c, l) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Full baseline JPEG decode. Returns (width, height, components,
    * interleaved raw samples) or None for unsupported/foreign payloads. */
  def decode(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0; var nc = 0
    var compQ: Array[Int] = null
    var compId: Array[Int] = null
    var restartInterval = 0
    var i = 2
    while (i + 3 < p.length) {
      if (u8(i) != 0xff) return None
      var j = i
      while (j + 1 < p.length && u8(j + 1) == 0xff) j += 1
      val m = u8(j + 1)
      if (m >= 0xd0 && m <= 0xd7) { i = j + 2 } // stray RST outside scan
      else if (m == 0xd9) return None // EOI before SOS
      else {
        if (j + 3 >= p.length) return None
        val len = u16(j + 2)
        if (len < 2) return None
        val seg = j + 4
        m match {
          case 0xdb => // DQT: one or more tables
            var off = seg
            while (off < seg + len - 2) {
              val pq = u8(off) >> 4
              val tq = u8(off) & 0x0f
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(zigzag(k)) = u8(off + 1 + k); k += 1 }
              qt(tq) = t
              off += 65
            }
          case 0xc4 => // DHT: one or more tables
            var off = seg
            while (off < seg + len - 2) {
              val tc = u8(off) >> 4
              val th = u8(off) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = (0 until 16).map(k => u8(off + 1 + k)).toArray
              val n = bits.sum
              val vals = (0 until n).map(k => u8(off + 17 + k)).toArray
              if (tc == 0) dcT(th) = new HuffTable(bits, vals)
              else acT(th) = new HuffTable(bits, vals)
              off += 17 + n
            }
          case 0xc0 | 0xc1 => // baseline / extended sequential SOF
            if (u8(seg) != 8) return None
            h = u16(seg + 1); w = u16(seg + 3); nc = u8(seg + 5)
            if (w <= 0 || h <= 0 || nc <= 0 || nc > 4) return None
            if (w > 65500 || h > 65500) return None
            compQ = new Array[Int](nc)
            compId = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compId(c) = u8(seg + 6 + 3 * c)
              if (u8(seg + 7 + 3 * c) != 0x11) return None // 1x1 sampling only
              compQ(c) = u8(seg + 8 + 3 * c)
              c += 1
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive/hierarchical/arithmetic: unsupported
          case 0xdd => // DRI
            restartInterval = u16(seg)
          case 0xda => // SOS — decode the scan and finish
            if (w == 0 || compQ == null) return None
            val ns = u8(seg)
            if (ns != nc) return None
            val compDc = new Array[Int](nc)
            val compAc = new Array[Int](nc)
            var c = 0
            while (c < ns) {
              val cs = u8(seg + 1 + 2 * c)
              val idx = compId.indexOf(cs)
              if (idx < 0) return None
              compDc(idx) = u8(seg + 2 + 2 * c) >> 4
              compAc(idx) = u8(seg + 2 + 2 * c) & 0x0f
              c += 1
            }
            val br = new BitReader(p, seg + 1 + 2 * ns + 3)
            val out = new Array[Byte](w * h * nc)
            val coef = new Array[Int](64)
            val px = new Array[Int](64)
            val prevDc = new Array[Int](nc)
            val bw8 = (w + 7) / 8
            val bh8 = (h + 7) / 8
            var mcu = 0
            var by = 0
            while (by < bh8) {
              var bx = 0
              while (bx < bw8) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                  if (!br.restart()) return None
                  java.util.Arrays.fill(prevDc, 0)
                }
                var ci = 0
                while (ci < nc) {
                  val dct = dcT(compDc(ci)); val act = acT(compAc(ci))
                  val q = qt(compQ(ci))
                  if (dct == null || act == null || q == null) return None
                  java.util.Arrays.fill(coef, 0)
                  val t = br.decodeSym(dct)
                  if (t < 0 || t > 15) return None
                  val diffBits = if (t == 0) 0 else br.bits(t)
                  if (diffBits < 0) return None
                  prevDc(ci) += extend(diffBits, t)
                  coef(0) = prevDc(ci) * q(0)
                  var k = 1
                  var eob = false
                  while (k < 64 && !eob) {
                    val rs = br.decodeSym(act)
                    if (rs < 0) return None
                    val run = rs >> 4
                    val sz = rs & 0x0f
                    if (sz == 0) {
                      if (run == 15) k += 16 // ZRL
                      else eob = true // EOB
                    } else {
                      k += run
                      if (k > 63) return None
                      val vb = br.bits(sz)
                      if (vb < 0) return None
                      coef(zigzag(k)) = extend(vb, sz) * q(zigzag(k))
                      k += 1
                    }
                  }
                  idctBlock(coef, px)
                  // write the in-bounds pixels of this block
                  var yy = 0
                  while (yy < 8) {
                    val oy = by * 8 + yy
                    if (oy < h) {
                      var xx = 0
                      while (xx < 8) {
                        val ox = bx * 8 + xx
                        if (ox < w) out((oy * w + ox) * nc + ci) = px(yy * 8 + xx).toByte
                        xx += 1
                      }
                    }
                    yy += 1
                  }
                  ci += 1
                }
                mcu += 1
                bx += 1
              }
              by += 1
            }
            return Some((w, h, nc, out))
          case _ => () // APPn / COM / others: skip
        }
        i = j + 2 + len
      }
    }
    None
  }
}
