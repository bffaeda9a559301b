package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.grids.{IntList, RectQuadTree}

/** The rewritten (round-5) reference-ratio quadtree, held to the one
  * property that matters: for every query point, the candidate SET
  * equals brute-force bbox containment — over random boxes, grid-aligned
  * boxes (the degenerate case that motivated the rewrite), duplicates,
  * and degenerate zero-extent piles (the any-quadrant split guard). */
class QuadTreeSpec extends AnyFunSuite {

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => s * 48271 % 2147483647L)
      .drop(1).map(_.toDouble / 2147483647.0)

  private def check(boxes: IndexedSeq[(Double, Double, Double, Double)],
                    queries: Seq[(Double, Double)]): Unit = {
    val minx = boxes.map(_._1).min; val miny = boxes.map(_._2).min
    val maxx = boxes.map(_._3).max; val maxy = boxes.map(_._4).max
    val t = new RectQuadTree(minx, miny, maxx, maxy)
    boxes.zipWithIndex.foreach { case ((a, b, c, d), i) => t.insert(i, a, b, c, d) }
    val out = new IntList(8)
    for ((x, y) <- queries) {
      out.clear()
      t.search(x, y, out)
      val got = (0 until out.length).map(out(_)).toSet
      val want = boxes.zipWithIndex.collect {
        case ((a, b, c, d), i) if x >= a && x <= c && y >= b && y <= d => i
      }.toSet
      assert(got == want, s"at ($x,$y): got ${got.size}, want ${want.size}")
    }
  }

  test("random boxes: candidate set equals brute force at every query") {
    val r = lcg(7)
    val boxes = IndexedSeq.fill(500) {
      val x = r.next() * 1000; val y = r.next() * 1000
      val w = r.next() * 60; val h = r.next() * 60
      (x, y, x + w, y + h)
    }
    val queries = Seq.fill(2000)((r.next() * 1100 - 50, r.next() * 1100 - 50))
    check(boxes, queries)
  }

  test("grid-aligned boxes (the degenerate split case) stay exact") {
    // a 20x20 grid of touching boxes — every internal edge sits on what
    // an exact-0.5 split would choose as a cut line
    val boxes = for (j <- 0 until 20; i <- 0 until 20)
      yield (i * 10.0, j * 10.0, i * 10.0 + 10.0, j * 10.0 + 10.0)
    val r = lcg(11)
    val queries = Seq.fill(2000)((r.next() * 200, r.next() * 200)) ++
      // points exactly ON grid lines and corners (multi-box membership)
      (for (i <- 0 to 20; j <- 0 to 20 if (i + j) % 3 == 0)
        yield (i * 10.0, j * 10.0))
    check(boxes.toIndexedSeq, queries)
  }

  test("coincident and zero-extent boxes never wedge the insert loop") {
    // 50 identical zero-extent boxes at one point: the any-quadrant
    // degenerate guard must refuse self-identical splits and just grow
    // the bucket (an unbounded split loop here would hang the build)
    val pile = IndexedSeq.fill(50)((5.0, 5.0, 5.0, 5.0))
    check(pile, Seq((5.0, 5.0), (4.9, 5.0), (5.1, 5.1)))
    // and mixed: a pile plus normal boxes around it
    val r = lcg(13)
    val mixed = pile ++ IndexedSeq.fill(100) {
      val x = r.next() * 10; val y = r.next() * 10
      (x, y, x + r.next(), y + r.next())
    }
    check(mixed, Seq.fill(500)((r.next() * 11 - 0.5, r.next() * 11 - 0.5)))
  }
}
