package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.IndexParams

class IndexParamsSpec extends AnyFunSuite {

  test("ceilLog2: exact on powers of two, rounds up between them") {
    assert(IndexParams.ceilLog2(1) === 0)
    assert(IndexParams.ceilLog2(2) === 1)
    assert(IndexParams.ceilLog2(3) === 2)
    assert(IndexParams.ceilLog2(4) === 2)
    assert(IndexParams.ceilLog2(5) === 3)
    assert(IndexParams.ceilLog2(1L << 40) === 40)
    assert(IndexParams.ceilLog2((1L << 40) + 1) === 41)
  }

  test("lshPlanes: keyspace tracks n/targetOcc, clamped at both ends") {
    // the driver corpora: sf0.01 = 500 vectors, sf0.1 = 2000
    assert(IndexParams.lshPlanes(500) === 5)
    assert(IndexParams.lshPlanes(2000) === 7)
    // scaling law: +10x corpus → +ceil(log2 10) = 3-4 planes, occupancy flat
    assert(IndexParams.lshPlanes(20000) === 11)
    assert(IndexParams.lshPlanes(200000) === 14)
    // a billion-vector corpus hits the 24-plane ceiling (16M buckets/table)
    assert(IndexParams.lshPlanes(1000000000L) === 24)
    // floor: a toy corpus never degenerates below 5 planes / 32 buckets
    assert(IndexParams.lshPlanes(1) === 5)
    // monotone non-decreasing in n
    val pts = Seq(1L, 100L, 1000L, 10000L, 100000L, 10000000L, 1000000000L)
    pts.zip(pts.tail).foreach { case (a, b) =>
      assert(IndexParams.lshPlanes(a) <= IndexParams.lshPlanes(b))
    }
  }

  test("ivfK: ~sqrt(n), clamped to the Lloyd driver-collect bound") {
    assert(IndexParams.ivfK(500) === 23)
    assert(IndexParams.ivfK(2000) === 45)
    // past the r19 ladder bound (256): the argmax matrix kernel carries
    // assignment, so k keeps tracking sqrt(n)...
    assert(IndexParams.ivfK(1000000) === 1000)
    assert(IndexParams.ivfK(16000000) === 4000)
    // ...to the r20 ceiling (4096): the ivfCentroids Lloyd collect
    // (k x dim averaged components) is the next driver-side bound
    assert(IndexParams.ivfK(1000000000L) === 4096)
    assert(IndexParams.ivfK(4) === 4)
    assert(IndexParams.ivfK(1) === 4)
  }

  test("indexBuckets: ~n·tables/1M, floored at 64 and capped at 65536") {
    // the driver corpora stay at the floor — the plan pins' "out of 64"
    assert(IndexParams.indexBuckets(500, 4) === 64)
    assert(IndexParams.indexBuckets(2000, 4) === 64)
    // a billion-vector corpus: 4,000 file-sized buckets
    assert(IndexParams.indexBuckets(1000000000L, 4) === 4000)
    // cap: past ~16B index rows, widen targetRows instead of file count
    assert(IndexParams.indexBuckets(100000000000L, 4) === 65536)
    // monotone non-decreasing
    val pts = Seq(1L, 100000L, 100000000L, 1000000000L, 1000000000000L)
    pts.zip(pts.tail).foreach { case (a, b) =>
      assert(IndexParams.indexBuckets(a, 4) <= IndexParams.indexBuckets(b, 4))
    }
  }

  test("simhashBandBits: narrow bands while the keyspace dwarfs the corpus, wide after") {
    assert(IndexParams.simhashBandBits(500) === 8)
    assert(IndexParams.simhashBandBits(5500) === 8)
    assert(IndexParams.simhashBandBits(65535) === 8)
    assert(IndexParams.simhashBandBits(65536) === 16)
    assert(IndexParams.simhashBandBits(1000000000L) === 16)
    assert(IndexParams.simhashBands(500) === 8)
    assert(IndexParams.simhashBands(100000) === 4)
    // both widths divide the 64-bit fingerprint exactly
    Seq(500L, 100000L).foreach(n => assert(64 % IndexParams.simhashBandBits(n) === 0))
  }
}
