package graft.geo.pipeline

import graft.geo.kernels._

/** Build-time pipeline algebra — the Spark-side analogue of PROJ's
  * PROJStringFormatter peephole rewrites (SURVEY.md §4.2, reference:
  * /root/reference/src/iso19111/io.cpp:8890-9060, 10309-10356): identity
  * steps are elided and adjacent mutually-inverse steps cancel, at plan
  * construction, before the composed kernel ever reaches Catalyst.
  *
  * Catalyst then handles generic constant folding / CSE; only these
  * domain rewrites (fwd o inv = id on the same operation) need the
  * builder because the optimizer cannot see inside an opaque kernel. */
object PipelineBuilder {

  /** Is this step an identity for every input? */
  def isIdentity(k: PointKernel): Boolean = k match {
    case NoopKernel => true
    case SetKernel(vs) if vs.isEmpty => true
    case u: UnitConvertKernel =>
      // a time conversion is NOT an identity even when the spatial
      // factors are 1 — including the ONE-SIDED forms (only t_in or only
      // t_out set), which convert to/from MJD like the reference
      u.fxy == 1.0 && u.fz == 1.0 &&
        ((u.tIn < 0 && u.tOut < 0) || u.tIn == u.tOut)
    case h: HelmertKernel =>
      !h.fourParam && h.x == 0 && h.y == 0 && h.z == 0 && h.rx == 0 &&
        h.ry == 0 && h.rz == 0 && h.s == 0 && h.dx == 0 && h.dy == 0 &&
        h.dz == 0 && h.drx == 0 && h.dry == 0 && h.drz == 0 && h.ds == 0
    case OffsetKernel(0, 0, 0) => true
    case AxisSwapKernel(order) =>
      order.zipWithIndex.forall { case (o, i) => o == i + 1 }
    case InverseKernel(inner) => isIdentity(inner)
    case _ => false
  }

  /** Structural kernel equality: case-class == is REFERENCE equality for
    * Array fields, so two separately parsed axisswap steps with the same
    * order would never compare equal. */
  private def sameKernel(a: PointKernel, b: PointKernel): Boolean = (a, b) match {
    case (x: AxisSwapKernel, y: AxisSwapKernel) => x.order.sameElements(y.order)
    case _ => a == b
  }

  /** Are these steps exact mutual inverses (cancel to identity)? */
  def cancels(a: PointKernel, b: PointKernel): Boolean = (a, b) match {
    case (InverseKernel(x), y) if sameKernel(x, y) => true
    case (x, InverseKernel(y)) if sameKernel(x, y) => true
    // self-inverse operations cancel with themselves
    case (x: AxisSwapKernel, y: AxisSwapKernel)
      if x.order.sameElements(y.order) && selfInverse(x) => true
    case _ => false
  }

  private def selfInverse(k: AxisSwapKernel): Boolean = {
    // a permutation+sign is self-inverse iff applying it twice is identity
    val v = Array(1.0, 2.0, 3.0, 4.0)
    val w = v.clone()
    k.fwd(w); k.fwd(w)
    v.sameElements(w)
  }

  /** Simplify a step list: drop identities, cancel adjacent inverses to a
    * fixed point, then build the kernel (a single step unwraps without the
    * pipeline shell). */
  def build(steps: Seq[PointKernel]): PointKernel = {
    var cur = steps.filterNot(isIdentity).toList
    var changed = true
    while (changed) {
      changed = false
      val out = scala.collection.mutable.ListBuffer.empty[PointKernel]
      var i = 0
      while (i < cur.length) {
        if (i + 1 < cur.length && cancels(cur(i), cur(i + 1))) {
          changed = true
          i += 2 // both cancel
        } else {
          out += cur(i)
          i += 1
        }
      }
      cur = out.toList
    }
    cur match {
      case Nil      => NoopKernel
      case k :: Nil => k
      case ks       => PipelineKernel(ks.toArray)
    }
  }

  /** Parse + simplify a proj-string pipeline. */
  def fromProjString(s: String): PointKernel =
    graft.geo.proj.ProjString.parse(s) match {
      case PipelineKernel(steps) => build(steps.toSeq)
      case k                     => k
    }
}
