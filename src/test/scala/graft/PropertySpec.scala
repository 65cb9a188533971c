package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharCountsKernel, Hash32Kernel}

/** Property-style checks (seeded, deterministic) of the pure kernels
  * and the mathematical guarantees the scale paths rely on. */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x67726166L) // "graf"

  /** d05's band split: 11 + 11 + 10 bits of a 32-bit fingerprint. */
  private def bands(fp: Long): Seq[Long] =
    Seq(fp & 2047L, (fp >> 11) & 2047L, (fp >> 22) & 1023L)

  test("x09 DiversityStats kernel equals the brute-force histogram on random word arrays") {
    // 2000 random arrays: skewed small alphabets (forcing runs),
    // duplicates, empty strings, multi-byte code points, singletons —
    // [types, hapax, Σc²] must match a histogram computed the dumb way
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val alphabet = Vector("a", "b", "ab", "", "café", "©", "wordword", "x9")
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(40)
      val words = Vector.fill(n)(alphabet(rnd.nextInt(
        1 + rnd.nextInt(alphabet.size)))) // skew: small prefixes more likely
      val got = graft.functions.DiversityStatsKernel.compute(
        new GenericArrayData(words.map(UTF8String.fromString).toArray[Any]))
      val hist = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exp = Array(hist.size.toLong,
        hist.values.count(_ == 1L).toLong,
        hist.values.map(c => c * c).sum)
      assert(got.toSeq == exp.toSeq, s"words=$words got=${got.toSeq} exp=${exp.toSeq}")
    }
  }

  test("pigeonhole: hamming <= 2 implies at least one identical band") {
    // the exact-recall guarantee d05's equi-join banding rests on:
    // flipping at most 2 of 32 bits can touch at most 2 of 3 bands
    (1 to 2000).foreach { _ =>
      val fp = rnd.nextLong() & 0xffffffffL
      val flipped = fp ^ (1L << rnd.nextInt(32)) ^ (1L << rnd.nextInt(32))
      val shared = bands(fp).zip(bands(flipped)).count { case (a, b) => a == b }
      assert(shared >= 1, f"fp=$fp%08x flipped=$flipped%08x")
    }
  }

  /** The k-min set of a hash multiset: sorted distinct, first k. */
  private def kmin(k: Int, hs: Seq[Long]): Seq[Long] =
    hs.distinct.sorted.take(k)

  test("KMV union law: k-min of merged sketches equals k-min of the union (d73's algebra)") {
    // the guarantee d73's pairwise array merge rests on: for any two
    // multisets A and B, taking the k smallest of (kmin(A) ++ kmin(B))
    // — which is all the operator ever sees — yields EXACTLY
    // kmin(A ∪ B). Holds because every element of kmin(A∪B) is ≤ the
    // k-th smallest of its own side, hence present in that side's
    // sketch. Checked over random multisets with duplicates, skew,
    // and fills both under and over k.
    val k = 16
    (1 to 500).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(80))(rnd.nextLong() & 0xffffL)
      val b = Seq.fill(rnd.nextInt(80))(rnd.nextLong() & 0xffffL)
      val merged = kmin(k, kmin(k, a) ++ kmin(k, b))
      val direct = kmin(k, a ++ b)
      assert(merged == direct, s"|a|=${a.length} |b|=${b.length}")
    }
  }

  test("KMV estimator is exact below fill and within bounds above (d26/d73's law)") {
    val k = 16
    (1 to 300).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(200))(rnd.nextLong() & 0xffffffffL)
      val sketch = kmin(k, xs)
      val nd = xs.distinct.length
      if (nd < k) assert(sketch.length == nd) // exact regime
      else {
        val est = (k - 1).toDouble * 4294967296.0 / sketch.last.toDouble
        // KMV's relative error concentrates at ~1/sqrt(k-2); allow a
        // wide deterministic band (seeded draws — no flake)
        assert(est > 0 && est < 40.0 * nd, s"est=$est nd=$nd")
      }
    }
  }

  private def randomString(): String = {
    val pools = Seq("abcXYZ 0123", "!?,;-—©é日本", " \t\nmixed 42 ©")
    val pool = pools(rnd.nextInt(pools.length))
    (1 to rnd.nextInt(60)).map(_ => pool(rnd.nextInt(pool.length))).mkString
  }

  test("CharCountsKernel equals the code-point reference on arbitrary strings") {
    (1 to 500).foreach { _ =>
      val s = randomString()
      val Array(digits, punct) = CharCountsKernel.compute(s.getBytes("UTF-8"))
      val expDigits = s.codePoints().filter(c => c >= '0' && c <= '9').count()
      val expPunct = s.codePoints().filter(c =>
        !(c >= '0' && c <= '9') && !(c >= 'a' && c <= 'z')
          && !(c >= 'A' && c <= 'Z') && c != ' ').count()
      assert(digits == expDigits, s"digits of '${s.take(40)}'")
      assert(punct == expPunct, s"punct of '${s.take(40)}'")
    }
  }

  test("Hash32Kernel is an unsigned 32-bit value, stable across calls") {
    (1 to 500).foreach { _ =>
      val bytes = randomString().getBytes("UTF-8")
      val h = Hash32Kernel.compute(bytes)
      assert(h >= 0L && h <= 0xffffffffL)
      assert(h == Hash32Kernel.compute(bytes)) // thread-local digest reset
    }
  }

  test("SortedHitCountKernel counts exactly the set intersection (UTF8 binary ordering)") {
    // d43's bench probe: the binary search is only correct if the
    // sorted side really is ascending under UTF8String.compareTo — the
    // same ordering array_sort produces — including mixed-script and
    // surrogate-heavy strings where Java String ordering differs
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.SortedHitCountKernel
    (1 to 300).foreach { _ =>
      val pool = (1 to rnd.nextInt(40)).map(_ => randomString()).distinct
      val probe = ((1 to rnd.nextInt(20)).map(_ => randomString()) ++
        rnd.shuffle(pool).take(rnd.nextInt(pool.length + 1))).distinct
      val sorted = pool.map(UTF8String.fromString)
        .sortWith(_.compareTo(_) < 0)
      val got = SortedHitCountKernel.count(
        new GenericArrayData(probe.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(sorted.toArray[Any]))
      val want = probe.count(pool.contains)
      assert(got == want.toLong, s"probe=$probe pool=$pool")
    }
  }

  test("lshBits/ivfCells are monotone and bounded") {
    import graft.operators.Similarity
    (1 to 2000).foreach { _ =>
      val x = math.abs(rnd.nextLong() % (1L << 50)) + 1
      val y = math.abs(rnd.nextLong() % (1L << 50)) + 1
      val (lo, hi) = (math.min(x, y), math.max(x, y))
      assert(Similarity.lshBits(lo) <= Similarity.lshBits(hi))
      assert(Similarity.ivfCells(lo) <= Similarity.ivfCells(hi))
      assert(Similarity.lshBits(lo) >= 4)
      assert(Similarity.ivfCells(lo) >= 1)
    }
  }

  test("bloomBits is the next power of two ≥ 16n, monotone, and DuckDB-formula-identical") {
    import graft.operators.Curation
    (1 to 2000).foreach { _ =>
      val n = math.abs(rnd.nextLong() % (1L << 40)) + 1
      val m = Curation.bloomBits(n)
      // power of two
      assert(java.lang.Long.bitCount(m) == 1, s"m=$m not a power of two")
      // tight: ≥ 16n but the half below is not
      assert(m >= 16 * n, s"m=$m < 16n for n=$n")
      assert(m / 2 < 16 * n, s"m=$m not tight for n=$n")
      // the oracle's POWER(2, bitlen(16n - 1)) computes the same value
      val duck = math.pow(2, java.lang.Long.toBinaryString(16 * n - 1).length).toLong
      assert(m == duck, s"engine/oracle m law diverges at n=$n")
      assert(Curation.bloomBits(n) <= Curation.bloomBits(n + 1))
    }
  }

  test("GRFT pack/unpack round-trips arbitrary payloads and rejects any single-byte corruption") {
    import graft.sources.MediaContainer
    (1 to 200).foreach { _ =>
      val payload = Array.fill(rnd.nextInt(400))(rnd.nextInt().toByte)
      val (w, h) = (rnd.nextInt(4096), rnd.nextInt(4096))
      val blob = MediaContainer.pack(payload, w, h)
      val dec = MediaContainer.unpack(blob)
      assert(dec.width == w && dec.height == h)
      assert(java.util.Arrays.equals(dec.payload, payload))
      // integrity: flip one random byte anywhere in the container —
      // decode must either throw (header/structure/CRC damage) or, in
      // the one undetectable case (a bit of the 8 header-dim bytes),
      // still reproduce the payload verbatim; CRC-protected payload
      // bytes can never silently change
      if (blob.length > 0) {
        val i = rnd.nextInt(blob.length)
        val bad = blob.clone(); bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
        try {
          val d2 = MediaContainer.unpack(bad)
          assert(java.util.Arrays.equals(d2.payload, payload),
            s"silent payload corruption at byte $i")
        } catch { case _: IllegalArgumentException => () }
      }
    }
  }

  test("GRFT tolerant decode is TOTAL: no input can make it throw") {
    // the 100 TB ingest guarantee behind d44/s14: whatever bytes arrive
    // — arbitrary garbage, a null object, or EVERY single-byte
    // corruption of a valid container — unpackEither returns a
    // classified Left or a payload-faithful Right; it never escalates
    // to an exception (which would fail the task, then the stage, then
    // the job)
    import graft.sources.MediaContainer
    assert(MediaContainer.unpackEither(null).isLeft)
    assert(MediaContainer.unpackEither(Array.empty[Byte]).isLeft)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(600))(rnd.nextInt().toByte)
      MediaContainer.unpackEither(junk).foreach { dec =>
        assert(dec.payload != null) // a Right on junk must still be well-formed
      }
    }
    val payload = Array.tabulate(150)(i => (i * 37 + 11).toByte)
    val good = MediaContainer.pack(payload, 320, 240)
    for (i <- good.indices; bit <- 0 until 8) {
      val bad = good.clone(); bad(i) = (bad(i) ^ (1 << bit)).toByte
      MediaContainer.unpackEither(bad) match {
        case Left(e) => assert(e.kind.nonEmpty)
        case Right(dec) => // undetectable header-dim flips only
          assert(java.util.Arrays.equals(dec.payload, payload),
            s"silent payload corruption at byte $i bit $bit")
      }
    }
  }

  test("GRFT header peek is total and agrees with the full decode") {
    // d47's contract: the metadata-only read never throws on any
    // input, and on a valid container reports exactly what the full
    // decode would — without touching a frame (frame-level damage is
    // by definition invisible to a peek; the full decode is the
    // integrity check)
    import graft.sources.MediaContainer
    assert(MediaContainer.peekHeader(null).isLeft)
    assert(MediaContainer.peekHeader(Array.empty[Byte]).isLeft)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(600))(rnd.nextInt().toByte)
      MediaContainer.peekHeader(junk).foreach(h => assert(h.nFrames >= 0))
    }
    val payload = Array.tabulate(200)(i => (i * 31 + 7).toByte)
    val good = MediaContainer.pack(payload, 512, 384)
    val h = MediaContainer.peekHeader(good).toOption.get
    val d = MediaContainer.unpack(good)
    assert(h.width == d.width && h.height == d.height)
    assert(h.width == 512 && h.height == 384)
    assert(h.nFrames == (payload.length + MediaContainer.FrameLen - 1) / MediaContainer.FrameLen)
    for (i <- good.indices; bit <- 0 until 8) {
      val bad = good.clone(); bad(i) = (bad(i) ^ (1 << bit)).toByte
      MediaContainer.peekHeader(bad) match {
        case Left(e) => assert(e.kind.nonEmpty)
        case Right(_) => () // body damage: invisible to a header peek by design
      }
    }
  }
}
