package graft

import graft.operators.{Behavior, Sketches}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (scalacheck) for the pure driver-side algebra the
  * distributed operators rely on: sketch state must be a commutative,
  * associative, idempotent monoid or map-side partial aggregation silently
  * produces partition-count-dependent results; decay tables must be
  * monotone or recency weighting inverts. No SparkSession — these run in
  * milliseconds. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val hash40Gen = Gen.chooseNum(0L, (1L << 40) - 1)
  private val hashesGen = Gen.listOfN(60, hash40Gen)

  private def sketchOf(hs: List[Long]): Array[Long] = {
    val agg = new Sketches.HllRegisterAgg
    hs.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
  }

  test("GIF/LZW: decode(encode(x)) reproduces arbitrary pixel grids exactly") {
    import graft.operators.Multimodal
    val dimGen = Gen.chooseNum(1, 40)
    check("lzw-roundtrip", Prop.forAll(dimGen, dimGen, Gen.long) { (w, h, seed) =>
      // arbitrary pixel content from the seed — exercises literal runs,
      // repeats, and (at larger grids) multi-width code growth
      def px(x: Int, y: Int): Int =
        (((x * 2654435761L + y * 40503L + seed) >>> 7) & 0xff).toInt
      val s = Multimodal.gifDecode(Multimodal.gifEncode(w, h, px))
      var (sr, sg, sb, wr) = (0L, 0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = px(x, y)
          sr += i; sg += (2 * i) % 256; sb += (5 * i + 1) % 256
          wr += (y + 1).toLong * i
          x += 1
        }
        y += 1
      }
      s.width == w && s.height == h && s.nPixels == w.toLong * h &&
        s.sumR == sr && s.sumG == sg && s.sumB == sb && s.wsumR == wr
    })
  }

  test("pHash banding pigeonhole: any pair within Hamming 3 shares a 16-bit band") {
    val hashGen = Gen.chooseNum(0L, (1L << 62) - 1)
    val flipsGen = Gen.listOfN(3, Gen.chooseNum(0, 62))
    check("band-pigeonhole", Prop.forAll(hashGen, flipsGen) { (h, flips) =>
      // flip at most 3 bits (duplicate positions flip back — still <= 3)
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val dist = java.lang.Long.bitCount(h ^ h2)
      val shared = (0 until 4).exists(i =>
        ((h >> (i * 16)) & 0xffff) == ((h2 >> (i * 16)) & 0xffff))
      dist > 3 || shared
    })
  }

  test("PNG: decode(encode(x)) reproduces arbitrary pixel grids through all five filters") {
    import graft.operators.Multimodal
    val dimGen = Gen.chooseNum(1, 24)
    check("png-roundtrip", Prop.forAll(dimGen, dimGen, Gen.long) { (w, h, seed) =>
      def ch(x: Int, y: Int, salt: Int): Int =
        (((x * 2654435761L + y * 40503L + seed + salt * 97L) >>> 7) & 0xff).toInt
      val s = Multimodal.pngDecode(Multimodal.pngEncode(w, h,
        (x, y) => (ch(x, y, 0), ch(x, y, 1), ch(x, y, 2))))
      var (sr, sg, sb, wr) = (0L, 0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sr += ch(x, y, 0); sg += ch(x, y, 1); sb += ch(x, y, 2)
          wr += (y + 1).toLong * ch(x, y, 0)
          x += 1
        }
        y += 1
      }
      s.width == w && s.height == h &&
        s.sumR == sr && s.sumG == sg && s.sumB == sb && s.wsumR == wr
    })
  }

  test("sniffHeader: agrees with every encoder's dims, never throws on junk or truncation") {
    import graft.operators.Multimodal
    // sniff vs each real encoder: header fields must equal the encode args
    val bmp = Multimodal.sniffHeader(Multimodal.bmpEncode(13, 9, (x, y) => (x, y, x + y)))
    assert(bmp == (("bmp", 13L, 9L, 3L, 0L)), bmp.toString)
    val png = Multimodal.sniffHeader(Multimodal.pngEncode(21, 5, (x, y) => (x, y, 7)))
    assert(png == (("png", 21L, 5L, 3L, 0L)), png.toString)
    val jpg = Multimodal.sniffHeader(Multimodal.jpegEncode(16, 24, (_, _) => 128))
    assert(jpg == (("jpeg", 16L, 24L, 1L, 0L)), jpg.toString)
    val jpgC = Multimodal.sniffHeader(Multimodal.jpegEncodeColor(17, 18, (_, _) => (1, 2, 3)))
    assert(jpgC == (("jpeg", 17L, 18L, 3L, 0L)), jpgC.toString)
    val wav = Multimodal.sniffHeader(Multimodal.wavEncode(44100, 2, new Array[Short](10)))
    assert(wav == (("wav", 5L, 1L, 2L, 44100L)), wav.toString)
    // odd-length data chunk: the word-aligned hop must still terminate
    val wavOdd = Multimodal.sniffHeader(Multimodal.wavEncode(8000, 1, new Array[Short](3)))
    assert(wavOdd == (("wav", 3L, 1L, 1L, 8000L)), wavOdd.toString)
    // junk, truncation, and empty input: unknown, never an exception
    val junks = Seq(
      Array.empty[Byte], Array[Byte]('B', 'M'), "plain text".getBytes("UTF-8"),
      Multimodal.pngEncode(8, 8, (_, _) => (0, 0, 0)).take(20),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte), // JPEG SOI then cut
      "RIFFxxxxWAVE".getBytes("US-ASCII"))                // RIFF with no chunks
    junks.foreach { j =>
      val r = Multimodal.sniffHeader(j)
      assert(r._1 == "unknown" || j.length >= 26, s"junk must sniff unknown: $r")
    }
    assert(Multimodal.sniffHeader("plain text".getBytes("UTF-8"))._1 == "unknown")
  }

  test("JPEG: decode(encode(x)) equals the quant pipeline on arbitrary grids (bitstream exactness)") {
    import graft.operators.Multimodal
    // JPEG is lossy, so the property compares the decoder against an
    // INDEPENDENT replay of fdct -> quantize -> dequantize -> idct per
    // block: any defect in the BITSTREAM layer (Huffman codes, zigzag,
    // DC differential chain, byte stuffing, marker lengths) breaks
    // equality on some random grid — the layer where the GIF end-of-stream
    // bug taught us fixture gates sample too thinly
    val dimGen = Gen.chooseNum(1, 24)
    check("jpeg-roundtrip", Prop.forAll(dimGen, dimGen, Gen.long) { (w, h, seed) =>
      def pix(x: Int, y: Int): Int =
        (((x * 2654435761L + y * 40503L + seed) >>> 7) & 0xff).toInt
      val (dw, dh, got) = Multimodal.jpegPixels(Multimodal.jpegEncode(w, h, pix))
      val qt = Multimodal.jpegQt(75)
      val bx = (w + 7) / 8
      val by = (h + 7) / 8
      val want = new Array[Int](w * h)
      for (b <- 0 until bx * by) {
        val x0 = (b % bx) * 8
        val y0 = (b / bx) * 8
        val block = Array.tabulate(64)(i =>
          pix(math.min(x0 + i % 8, w - 1), math.min(y0 + i / 8, h - 1)))
        val f = Multimodal.jpegFdct(block)
        val fd = Array.tabulate(64)(i =>
          math.floor(f(i).toDouble / qt(i) + 0.5).toLong * qt(i))
        val rec = Multimodal.jpegIdct(fd)
        for (yy <- 0 until 8; xx <- 0 until 8; if y0 + yy < h && x0 + xx < w)
          want((y0 + yy) * w + (x0 + xx)) = rec(yy * 8 + xx)
      }
      dw == w && dh == h && java.util.Arrays.equals(got, want)
    })
  }

  test("color JPEG: decode(encode(x)) equals the per-plane quant pipeline on arbitrary grids") {
    import graft.operators.Multimodal
    // same bitstream-exactness contract as the grayscale property, now over
    // THREE interleaved component chains: any defect in MCU interleaving,
    // per-component DC prediction, chroma subsample/upsample geometry or the
    // fixed-point color matrices breaks equality on some random grid
    val dimGen = Gen.chooseNum(1, 40)
    check("jpeg-color-roundtrip", Prop.forAll(dimGen, dimGen, Gen.long) { (w, h, seed) =>
      def rgb(x: Int, y: Int): (Int, Int, Int) = {
        val v = x * 2654435761L + y * 40503L + seed
        ((((v >>> 7) & 0xff)).toInt, (((v >>> 17) & 0xff)).toInt, (((v >>> 27) & 0xff)).toInt)
      }
      val (dw, dh, rA, gA, bA) =
        Multimodal.jpegPixelsColor(Multimodal.jpegEncodeColor(w, h, rgb))
      val qt = Multimodal.jpegQt(75)
      def chain(block: Array[Int]): Array[Int] = {
        val f = Multimodal.jpegFdct(block)
        val fd = Array.tabulate(64)(i =>
          math.floor(f(i).toDouble / qt(i) + 0.5).toLong * qt(i))
        Multimodal.jpegIdct(fd)
      }
      val mx = (w + 15) / 16
      val my = (h + 15) / 16
      val yW = mx * 16
      val cwP = mx * 8
      val yP = new Array[Int](yW * my * 16)
      val cbP = new Array[Int](cwP * my * 8)
      val crP = new Array[Int](cwP * my * 8)
      def yAt(x: Int, y: Int): Int = {
        val (r, g, b) = rgb(math.min(x, w - 1), math.min(y, h - 1))
        Multimodal.rgbToYcc(r, g, b)._1
      }
      val cw = (w + 1) / 2
      val ch = (h + 1) / 2
      def chromaAt(cx: Int, cy: Int): (Int, Int) = {
        val sx = math.min(cx, cw - 1) * 2
        val sy = math.min(cy, ch - 1) * 2
        val (r, g, b) = rgb(math.min(sx, w - 1), math.min(sy, h - 1))
        val ycc = Multimodal.rgbToYcc(r, g, b)
        (ycc._2, ycc._3)
      }
      for (m <- 0 until mx * my) {
        val x0 = (m % mx) * 16
        val y0 = (m / mx) * 16
        for (yb <- 0 until 4) {
          val bx0 = x0 + (yb % 2) * 8
          val by0 = y0 + (yb / 2) * 8
          val rec = chain(Array.tabulate(64)(i => yAt(bx0 + i % 8, by0 + i / 8)))
          for (i <- 0 until 64) yP((by0 + i / 8) * yW + bx0 + i % 8) = rec(i)
        }
        val cx0 = (m % mx) * 8
        val cy0 = (m / mx) * 8
        val recCb = chain(Array.tabulate(64)(i => chromaAt(cx0 + i % 8, cy0 + i / 8)._1))
        val recCr = chain(Array.tabulate(64)(i => chromaAt(cx0 + i % 8, cy0 + i / 8)._2))
        for (i <- 0 until 64) {
          cbP((cy0 + i / 8) * cwP + cx0 + i % 8) = recCb(i)
          crP((cy0 + i / 8) * cwP + cx0 + i % 8) = recCr(i)
        }
      }
      var ok = dw == w && dh == h
      var y = 0
      while (ok && y < h) {
        var x = 0
        while (ok && x < w) {
          val (er, eg, eb) = Multimodal.yccToRgb(
            yP(y * yW + x), cbP((y / 2) * cwP + x / 2), crP((y / 2) * cwP + x / 2))
          ok = rA(y * w + x) == er && gA(y * w + x) == eg && bA(y * w + x) == eb
          x += 1
        }
        y += 1
      }
      ok
    })
  }

  test("WAV: decode(encode(x)) reproduces arbitrary interleaved PCM16 streams") {
    import graft.operators.Multimodal
    check("wav-roundtrip", Prop.forAll(
      Gen.chooseNum(1, 2), Gen.chooseNum(1, 300), Gen.long) { (chans, frames, seed) =>
      val samples = Array.tabulate(frames * chans)(i =>
        (((i * 2654435761L + seed) >> 9) & 0xffff).toShort)
      val s = Multimodal.wavDecode(Multimodal.wavEncode(8000, chans, samples))
      var (sa, en, wc) = (0L, 0L, 0L)
      var i = 0
      while (i < samples.length) {
        val v = samples(i).toLong
        sa += math.abs(v); en += v * v
        if (i % chans == 0) wc += (i / chans + 1).toLong * v
        i += 1
      }
      s.channels == chans && s.nFrames == frames.toLong &&
        s.sumAbs == sa && s.energy == en && s.wsumC0 == wc
    })
  }

  test("BMP: decode(encode(x)) reproduces arbitrary pixel grids (stride padding, flip)") {
    import graft.operators.Multimodal
    val dimGen = Gen.chooseNum(1, 24)
    check("bmp-roundtrip", Prop.forAll(dimGen, dimGen, Gen.long) { (w, h, seed) =>
      def ch(x: Int, y: Int, salt: Int): Int =
        (((x * 48271L + y * 69621L + seed + salt * 131L) >>> 5) & 0xff).toInt
      val s = Multimodal.bmpDecode(Multimodal.bmpEncode(w, h,
        (x, y) => (ch(x, y, 0), ch(x, y, 1), ch(x, y, 2))))
      var (sr, wr) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) { sr += ch(x, y, 0); wr += (y + 1).toLong * ch(x, y, 0) }
      s.width == w && s.height == h && s.sumR == sr && s.wsumR == wr
    })
  }

  test("HLL registers: order-independent reduce (the map-side-combine contract)") {
    check("order-independence", Prop.forAll(hashesGen, Gen.long) { (hs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(hs)
      sketchOf(hs).toSeq == sketchOf(shuffled).toSeq
    })
  }

  test("HLL registers: merge is commutative, associative, idempotent, zero-identity") {
    val agg = new Sketches.HllRegisterAgg
    def m(a: Array[Long], b: Array[Long]) = agg.merge(a.clone(), b.clone())
    check("merge-laws", Prop.forAll(hashesGen, hashesGen, hashesGen) { (xs, ys, zs) =>
      val (a, b, c) = (sketchOf(xs), sketchOf(ys), sketchOf(zs))
      m(a, b).toSeq == m(b, a).toSeq &&
        m(m(a, b), c).toSeq == m(a, m(b, c)).toSeq &&
        m(a, a).toSeq == a.toSeq &&
        m(a, agg.zero).toSeq == a.toSeq
    })
    // split-merge == direct: the exact property partial aggregation needs
    check("split-merge", Prop.forAll(hashesGen, Gen.chooseNum(0, 60)) { (hs, cut) =>
      val (l, r) = hs.splitAt(math.min(cut, hs.length))
      m(sketchOf(l), sketchOf(r)).toSeq == sketchOf(hs).toSeq
    })
  }

  test("KMV: reduce/merge equal the naive k-smallest-distinct reference") {
    val k = 8
    val agg = new Sketches.KMinValues(k)
    val valsGen = Gen.listOf(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    check("kmv-reference", Prop.forAll(valsGen, Gen.chooseNum(0, 1000)) { (vs, cut) =>
      val (l, r) = vs.splitAt(math.min(cut, vs.length))
      val direct = vs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val naive = vs.distinct.sorted.take(k)
      direct.toSeq == naive && merged.toSeq == naive
    })
  }

  test("CDC chunks: lossless reassembly, no empty chunks, on arbitrary ascii") {
    import org.apache.spark.unsafe.types.UTF8String
    val textGen = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    check("cdc-lossless", Prop.forAll(textGen) { s =>
      val arr = graft.functions.Kernels.cdcChunks(UTF8String.fromString(s), 16, 64)
      val chunks = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      chunks.mkString == s && chunks.forall(_.nonEmpty)
    })
  }

  test("Luhn kernel agrees with a reference implementation on random digit runs") {
    import org.apache.spark.unsafe.types.UTF8String
    def refLuhn(run: String): Boolean =
      run.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
      }.sum % 10 == 0
    val runGen = Gen.chooseNum(10, 21).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    check("luhn-ref", Prop.forAll(Gen.listOfN(4, runGen)) { runs =>
      val text = runs.mkString(" x ")
      val parts = graft.functions.Kernels.luhnCounts(UTF8String.fromString(text))
      val cards = runs.filter(r => r.length >= 13 && r.length <= 19)
      parts.getLong(0) == cards.size &&
        parts.getLong(1) == cards.count(refLuhn)
    })
  }

  test("BPE segment count: bounded by word length, non-increasing as merges append") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val wordGen = Gen.chooseNum(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val mergeGen = Gen.listOfN(2, Gen.oneOf("a", "b", "c", "ab", "bc"))
      .map(p => s"${p.head} ${p(1)}")
    check("bpe-bounds", Prop.forAll(wordGen, Gen.listOfN(5, mergeGen)) { (w, ms) =>
      def count(merges: Seq[String]): Long =
        graft.functions.Kernels.bpeSegmentCount(UTF8String.fromString(w),
          new GenericArrayData(merges.map(UTF8String.fromString).toArray[Any]))
      val counts = ms.indices.map(i => count(ms.take(i + 1)))
      val full = count(ms)
      full >= 1 && full <= w.length &&
        counts.sliding(2).forall(p => p.length < 2 || p(1) <= p(0))
    })
  }

  test("char entropy parts: totals exact, entropy within [0, ln(distinct)]") {
    import org.apache.spark.unsafe.types.UTF8String
    val textGen = Gen.chooseNum(1, 300).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', ' ')).map(_.mkString))
    check("entropy-bounds", Prop.forAll(textGen) { s =>
      val parts = graft.functions.Kernels.charEntropyParts(UTF8String.fromString(s))
      val n = parts.getLong(0)
      val h = (math.floor(math.log(n.toDouble) * 1e6 + 0.5) * n - parts.getLong(1)) / (n * 1e6)
      val bound = math.log(s.distinct.length.toDouble)
      n == s.length && h >= -1e-5 && h <= bound + 1e-5
    })
  }

  test("PQ: ADC of a vector's own assignment equals the per-subspace minima") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val mSub = 4; val ksub = 4; val sub = 4
    val vGen = Gen.listOfN(mSub * sub, Gen.chooseNum(-1000000L, 1000000L))
    val bGen = Gen.listOfN(mSub * ksub * sub, Gen.chooseNum(-125000L, 125000L))
    check("pq-adc-min", Prop.forAll(vGen, bGen) { (v, b) =>
      val qv = new GenericArrayData(v.toArray[Any])
      val books = new GenericArrayData(b.toArray[Any])
      val codes = graft.functions.Kernels.pqAssign(qv, books, mSub, ksub)
      val tab = graft.functions.Kernels.pqDistTable(qv, books, mSub, ksub)
      val adc = graft.functions.Kernels.pqAdc(tab, codes, ksub)
      val minSum = (0 until mSub).map(m =>
        (0 until ksub).map(c => tab.getLong(m * ksub + c)).min).sum
      adc == minSum
    })
  }

  test("decay weights: bounded, monotone non-increasing, exact at whole half-lives") {
    val hlGen = Gen.chooseNum(1, 60)
    check("decay", Prop.forAll(hlGen, Gen.chooseNum(1, 365)) { (hl, maxAge) =>
      val w = Behavior.decayWeights(hl.toDouble, maxAge)
      // the derived table length must always END at a zero weight — the
      // age-clamp soundness invariant decayedValue's default relies on
      val derived = Behavior.decayWeights(hl.toDouble, Behavior.defaultMaxAge(hl.toDouble))
      w.length == maxAge + 1 &&
        w(0) == 1000000000L &&
        w.forall(x => x >= 0 && x <= 1000000000L) &&
        w.sliding(2).forall(p => p.length < 2 || p(1) <= p(0)) &&
        (maxAge < hl || w(hl) == 500000000L) &&
        derived.last == 0L
    })
  }
}
