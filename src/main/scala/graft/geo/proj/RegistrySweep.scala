package graft.geo.proj

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.expr.geo

/** Registry-wide sweep THROUGH the DataFrame/Catalyst path.
  *
  * Every operation name in the reference registry
  * (/root/reference/src/pj_list.h, 186 names) is instantiated from one
  * representative proj-string and driven over a small deterministic probe
  * grid via [[graft.geo.expr.PointTransformExpr]] — i.e. through kernel
  * serialization into the physical plan and whole-stage codegen, the
  * layer the gie fixtures (which call kernels JVM-direct) do not touch.
  * Emits one row per operation: (op, n_ok, checksum), where checksum is
  * an integer fold of the forward outputs that RegistrySweepSpec
  * recomputes JVM-direct and compares bit-for-bit.
  *
  * Sample strings are the first instantiation of each operation in the
  * reference's own builtins.gie where one exists, hand-completed for the
  * ~38 names builtins.gie exercises only inside pipelines (datum ops,
  * grid ops, aliases).  Grid/model files resolve on the same search path
  * the gie fixtures use.
  */
object RegistrySweep {

  /** One registry entry: op name, a valid proj-string, a probe-grid
    * center + half-width (degrees or metres, matching the op's input
    * units), an optional fixed z, and optional explicit probe points for
    * cartesian-input ops. */
  final case class Sample(op: String, proj: String,
                          lon0: Double = 0.0, lat0: Double = 0.0,
                          spreadLon: Double = 170.0, spreadLat: Double = 75.0,
                          zVal: Double = 0.0,
                          pts: Seq[(Double, Double)] = Nil)

  /** 6 x 4 deterministic probe grid (offsets keep points off cell/face
    * boundaries and integer-degree special cases). */
  def probePoints(s: Sample): Seq[(Double, Double)] =
    if (s.pts.nonEmpty) s.pts
    else for {
      fi <- Seq(-1.0, -0.6, -0.2, 0.2, 0.6, 1.0)
      fj <- Seq(-1.0, -1.0 / 3, 1.0 / 3, 1.0)
    } yield (s.lon0 + s.spreadLon * fi + 0.123, s.lat0 + s.spreadLat * fj + 0.071)

  /** The probe epoch for time-dependent operations (helmert 14-param,
    * defmodel, grid t_epoch interpolation). */
  val ProbeEpoch = 2018.5

  private val Mod = 2147483647.0

  /** Integer fold of one output value — floor+pmod arithmetic only, so
    * the spec can replay it exactly on JVM doubles. */
  def mix(v: Double): Double = {
    val f = math.floor(v * 1e3)
    ((f % Mod) + Mod) % Mod
  }

  /** Accept filter mirrored between the Spark query and the spec. */
  def acceptable(v: Double): Boolean = !v.isNaN && math.abs(v) < 1e12

  val samples: Seq[Sample] = Seq(
    // --- generated from the reference's builtins.gie (first instantiation
    // --- of each operation; see /root/reference/test/gie/builtins.gie)
    Sample("aea", "+proj=aea +ellps=GRS80 +lat_1=0 +lat_2=2"),
    Sample("aeqd", "+proj=aeqd +R=1 +lat_0=0"),
    Sample("airocean", "+proj=airocean +ellps=GRS80"),
    Sample("airy", "+proj=airy +a=6400000"),
    Sample("aitoff", "+proj=aitoff +R=6400000"),
    Sample("alsk", "+proj=alsk +ellps=clrk66", -152, 62, 8, 6),
    Sample("apian", "+proj=apian +a=6400000"),
    Sample("august", "+proj=august +a=6400000"),
    Sample("bacon", "+proj=bacon +a=6400000"),
    Sample("bipc", "+proj=bipc +ellps=GRS80"),
    Sample("boggs", "+proj=boggs +a=6400000"),
    Sample("bonne", "+proj=bonne +ellps=GRS80 +lat_1=0.5"),
    Sample("calcofi", "+proj=calcofi +ellps=GRS80", -125, 32, 10, 6),
    Sample("cass", "+proj=cass +ellps=GRS80", 0, 0, 60, 60),
    Sample("cc", "+proj=cc +a=6400000"),
    Sample("cea", "+proj=cea +ellps=GRS80"),
    Sample("chamb", "+proj=chamb +R=6400000 +lat_1=0.5 +lat_2=2"),
    Sample("col_urban", "+proj=col_urban +lat_0=4.68048611111111 +lon_0=-74.1465916666667 +x_0=92334.879 +y_0=109320.965 +h_0=2550 +ellps=GRS80", -74.15, 4.68, 0.4, 0.3),
    Sample("collg", "+proj=collg +a=6400000 +lat_1=0.5 +lat_2=2"),
    Sample("comill", "+proj=comill +a=6400000"),
    Sample("crast", "+proj=crast +a=6400000"),
    Sample("denoy", "+proj=denoy +a=6400000"),
    Sample("eck1", "+proj=eck1 +a=6400000"),
    Sample("eck2", "+proj=eck2 +a=6400000"),
    Sample("eck3", "+proj=eck3 +a=6400000"),
    Sample("eck4", "+proj=eck4 +a=6400000"),
    Sample("eck5", "+proj=eck5 +a=6400000"),
    Sample("eck6", "+proj=eck6 +a=6400000"),
    Sample("eqc", "+proj=eqc +a=6400000"),
    Sample("eqdc", "+proj=eqdc +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("etmerc", "+proj=etmerc +ellps=GRS80", 0, 0, 60, 75),
    Sample("euler", "+proj=euler +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("fahey", "+proj=fahey +a=6400000"),
    Sample("fouc", "+proj=fouc +ellps=GRS80"),
    Sample("fouc_s", "+proj=fouc_s +a=6400000"),
    Sample("gall", "+proj=gall +a=6400000"),
    Sample("geocent", "+proj=geocent +ellps=GRS80"),
    Sample("geos", "+proj=geos +ellps=GRS80 +h=35785831", 0, 0, 60, 60),
    Sample("gins8", "+proj=gins8 +a=6400000"),
    Sample("gn_sinu", "+proj=gn_sinu +a=6400000 +m=1 +n=2"),
    Sample("gnom", "+proj=gnom +R=1", 0, 0, 60, 60),
    Sample("goode", "+proj=goode +a=6400000"),
    Sample("gs48", "+proj=gs48 +R=6370997", -96, 39, 15, 8),
    Sample("gs50", "+proj=gs50 +ellps=clrk66", -110, 50, 25, 12),
    Sample("gstmerc", "+proj=gstmerc +R=6400000", 0, 0, 60, 60),
    Sample("hammer", "+proj=hammer +a=6400000"),
    Sample("hatano", "+proj=hatano +a=6400000"),
    Sample("healpix", "+proj=healpix +ellps=GRS80"),
    Sample("igh", "+proj=igh +a=6400000"),
    Sample("igh_o", "+proj=igh_o +a=6400000"),
    Sample("imoll", "+proj=imoll +a=6400000"),
    Sample("imoll_o", "+proj=imoll_o +a=6400000"),
    Sample("imw_p", "+proj=imw_p +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("isea", "+proj=isea +a=6400000"),
    Sample("kav5", "+proj=kav5 +ellps=GRS80"),
    Sample("kav7", "+proj=kav7 +a=6400000"),
    Sample("krovak", "+proj=krovak +ellps=GRS80", 16, 49, 6, 3),
    Sample("labrd", "+proj=labrd +ellps=GRS80 +lon_0=0.5 +lat_0=2", 0.5, 2, 10, 8),
    Sample("laea", "+proj=laea +ellps=GRS80"),
    Sample("lagrng", "+proj=lagrng +a=6400000 +W=2 +lat_1=0.5"),
    Sample("larr", "+proj=larr +a=6400000"),
    Sample("lask", "+proj=lask +a=6400000"),
    Sample("lcc", "+proj=lcc +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("lcca", "+proj=lcca +ellps=GRS80 +lat_0=1 +lat_1=0.5 +lat_2=2"),
    Sample("leac", "+proj=leac +ellps=GRS80 +lat_1=0 +lat_2=2"),
    Sample("lee_os", "+proj=lee_os +R=6400000", -165, -10, 30, 20),
    Sample("loxim", "+proj=loxim +a=6400000 +lat_1=0.5 +lat_2=2"),
    Sample("lsat", "+proj=lsat +ellps=GRS80 +lsat=1 +path=2"),
    Sample("mbt_fps", "+proj=mbt_fps +a=6400000"),
    Sample("mbt_s", "+proj=mbt_s +ellps=GRS80"),
    Sample("mbtfpp", "+proj=mbtfpp +a=6400000"),
    Sample("mbtfpq", "+proj=mbtfpq +a=6400000"),
    Sample("mbtfps", "+proj=mbtfps +a=6400000"),
    Sample("merc", "+proj=merc +ellps=GRS80"),
    Sample("mil_os", "+proj=mil_os +R=6400000", 20, 18, 30, 20),
    Sample("mill", "+proj=mill +a=6400000"),
    Sample("misrsom", "+proj=misrsom +ellps=GRS80 +path=1"),
    Sample("mod_krovak", "+proj=mod_krovak +lat_0=49.5 +lon_0=42.5 +k=0.9999 +x_0=5000000 +y_0=5000000 +ellps=bessel", 19, 48.8, 5, 3),
    Sample("moll", "+proj=moll +a=6400000"),
    Sample("murd1", "+proj=murd1 +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("murd2", "+proj=murd2 +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("murd3", "+proj=murd3 +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("natearth", "+proj=natearth +a=6400000"),
    Sample("natearth2", "+proj=natearth2 +a=6400000"),
    Sample("nell", "+proj=nell +a=6400000"),
    Sample("nell_h", "+proj=nell_h +a=6400000"),
    Sample("nicol", "+proj=nicol +a=6400000"),
    Sample("nsper", "+proj=nsper +a=6400000 +h=1000000", 0, 0, 12, 10),
    Sample("nzmg", "+proj=nzmg +ellps=GRS80", 173, -41, 4, 4),
    Sample("ob_tran", "+proj=ob_tran +R=6400000 +o_proj=latlon +o_lon_p=20 +o_lat_p=20 +lon_0=180"),
    Sample("ocea", "+proj=ocea +a=6400000 +lat_1=0.5 +lat_2=2"),
    Sample("oea", "+proj=oea +a=6400000 +n=1 +m=2 +theta=3"),
    Sample("omerc", "+proj=omerc +ellps=GRS80 +lat_1=0.5 +lat_2=2", 0, 0, 60, 60),
    Sample("ortel", "+proj=ortel +a=6400000"),
    Sample("ortho", "+proj=ortho +R=1 +lat_0=0 +lon_0=0", 0, 0, 60, 60),
    Sample("patterson", "+proj=patterson +a=6400000"),
    Sample("pconic", "+proj=pconic +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("poly", "+proj=poly +ellps=GRS80"),
    Sample("putp1", "+proj=putp1 +a=6400000"),
    Sample("putp2", "+proj=putp2 +a=6400000"),
    Sample("putp3", "+proj=putp3 +a=6400000"),
    Sample("putp3p", "+proj=putp3p +a=6400000"),
    Sample("putp4p", "+proj=putp4p +a=6400000"),
    Sample("putp5", "+proj=putp5 +a=6400000"),
    Sample("putp5p", "+proj=putp5p +a=6400000"),
    Sample("putp6", "+proj=putp6 +a=6400000"),
    Sample("putp6p", "+proj=putp6p +a=6400000"),
    Sample("qsc", "+proj=qsc +ellps=GRS80", 0, 0, 40, 40),
    Sample("qua_aut", "+proj=qua_aut +ellps=GRS80"),
    Sample("rhealpix", "+proj=rhealpix +ellps=GRS80"),
    Sample("robin", "+proj=robin +a=6400000"),
    Sample("rouss", "+proj=rouss +ellps=GRS80", 0, 0, 30, 20),
    Sample("rpoly", "+proj=rpoly +a=6400000", 0, 0, 60, 60),
    Sample("s2", "+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", 0, 0, 40, 40),
    Sample("sinu", "+proj=sinu +ellps=GRS80"),
    Sample("som", "+proj=som +ellps=GRS80 +inc_angle=1.7157253262878522r +ps_rev=0.06866666666666667 +asc_lon=2.2298420007209447r"),
    Sample("somerc", "+proj=somerc +ellps=GRS80", 0, 0, 60, 60),
    Sample("stere", "+proj=stere +ellps=GRS80"),
    Sample("sterea", "+proj=sterea +ellps=GRS80"),
    Sample("tcc", "+proj=tcc +a=6400000", 0, 0, 60, 75),
    Sample("tcea", "+proj=tcea +a=6400000"),
    Sample("times", "+proj=times +ellps=sphere"),
    Sample("tissot", "+proj=tissot +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("tmerc", "+proj=tmerc +ellps=GRS80", 0, 0, 60, 75),
    Sample("tobmerc", "+proj=tobmerc +ellps=sphere"),
    Sample("topocentric", "+proj=topocentric +ellps=WGS84 +X_0=3652755.3058 +Y_0=319574.6799 +Z_0=5201547.3536",
      zVal = 5201547.0,
      pts = Seq((3652755.0, 319574.0), (3653755.0, 320574.0),
        (3651755.0, 318574.0), (3650755.0, 321574.0))),
    Sample("tpeqd", "+proj=tpeqd +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("tpers", "+proj=tpers +a=6400000 +h=1000000 +azi=20", 0, 0, 12, 10),
    Sample("ups", "+proj=ups +ellps=GRS80", 0, 60, 170, 14),
    Sample("urm5", "+proj=urm5 +a=6400000 +n=0.5"),
    Sample("urmfps", "+proj=urmfps +a=6400000 +n=0.5"),
    Sample("utm", "+proj=utm +ellps=GRS80 +zone=30", -3, 0, 30, 70),
    Sample("vandg", "+proj=vandg +a=6400000"),
    Sample("vandg2", "+proj=vandg2 +a=6400000"),
    Sample("vandg3", "+proj=vandg3 +a=6400000"),
    Sample("vandg4", "+proj=vandg4 +R=6400000"),
    Sample("vitk1", "+proj=vitk1 +ellps=GRS80 +lat_1=0.5 +lat_2=2"),
    Sample("wag1", "+proj=wag1 +a=6400000"),
    Sample("wag2", "+proj=wag2 +a=6400000"),
    Sample("wag3", "+proj=wag3 +a=6400000"),
    Sample("wag4", "+proj=wag4 +a=6400000"),
    Sample("wag5", "+proj=wag5 +a=6400000"),
    Sample("wag6", "+proj=wag6 +a=6400000"),
    Sample("wag7", "+proj=wag7 +a=6400000"),
    Sample("weren", "+proj=weren +a=6400000"),
    Sample("wink1", "+proj=wink1 +a=6400000"),
    Sample("wink2", "+proj=wink2 +a=6400000 +lat_1=0.5"),
    Sample("wintri", "+proj=wintri +a=6400000 +lat_1=0"),
    // --- hand-completed: operations builtins.gie only exercises inside
    // --- pipelines, plus aliases, datum glue and grid/model transforms
    Sample("adams_hemi", "+proj=adams_hemi +R=6370997", 0, 0, 80, 75),
    Sample("adams_ws1", "+proj=adams_ws1 +R=6370997"),
    Sample("adams_ws2", "+proj=adams_ws2 +R=6370997"),
    Sample("affine", "+proj=affine +xoff=10 +yoff=20 +s11=1.1 +s12=0.1 +s21=-0.1 +s22=0.9"),
    Sample("axisswap", "+proj=axisswap +order=2,1"),
    Sample("bertin1953", "+proj=bertin1953 +R=6370997"),
    Sample("cart", "+proj=cart +ellps=GRS80"),
    Sample("ccon", "+proj=ccon +lat_1=52 +lat_0=52 +lon_0=19 +ellps=GRS80", 19, 52, 8, 5),
    Sample("defmodel", "+proj=defmodel +model=tests/simple_model_degree_horizontal.json"),
    Sample("deformation", "+proj=deformation +grids=tests/nkgrf03vel_realigned_extract.tif +ellps=GRS80 +dt=1",
      zVal = 5659660.0,
      pts = Seq((2701431.0, 1064095.0), (2691431.0, 1074095.0),
        (2711431.0, 1054095.0), (2701431.0, 1084095.0))),
    Sample("eqearth", "+proj=eqearth +ellps=WGS84"),
    Sample("geoc", "+proj=geoc +ellps=GRS80"),
    Sample("geogoffset", "+proj=geogoffset +dlon=3600 +dlat=1800 +dh=10"),
    Sample("gridshift", "+proj=gridshift +grids=tests/test_hgrid_with_subgrid.tif",
      pts = Seq((-115.5416667, 51.1666667), (-115.54, 51.2),
        (-80.5041667, 44.5458333), (-80.51, 44.54))),
    Sample("guyou", "+proj=guyou +R=6370997", 0, 0, 80, 75),
    Sample("helmert", "+proj=helmert +convention=coordinate_frame +x=0.67678 +y=0.65495 +z=-0.52827 +rx=-0.022742 +ry=0.012667 +rz=0.022704 +s=-0.01070"),
    Sample("hgridshift", "+proj=hgridshift +grids=ntf_r93.gsb", 2.5, 46.75, 5, 4),
    Sample("horner", "+proj=horner +ellps=intl +range=500000" +
      " +fwd_origin=877605.269066,6125810.306769" +
      " +inv_origin=877605.760036,6125811.281773 +deg=4" +
      " +fwd_v=6.1258112678e+06,9.9999971567e-01,1.5372750011e-10,5.9300860915e-15,2.2609497633e-19,4.3188227445e-05,2.8225130416e-10,7.8740007114e-16,-1.7453997279e-19,1.6877465415e-10,-1.1234649773e-14,-1.7042333358e-18,-7.9303467953e-15,-5.2906832535e-19,3.9984284847e-19" +
      " +fwd_u=8.7760574982e+05,9.9999752475e-01,2.8817299305e-10,5.5641310680e-15,-1.5544700949e-18,-4.1357045890e-05,4.2106213519e-11,2.8525551629e-14,-1.9107771273e-18,3.3615590093e-10,2.4380247154e-14,-2.0241230315e-18,1.2429019719e-15,5.3886155968e-19,-1.0167505000e-18" +
      " +inv_v=6.1258103208e+06,1.0000002826e+00,-1.5372762184e-10,-5.9304261011e-15,-2.2612705361e-19,-4.3188331419e-05,-2.8225549995e-10,-7.8529116371e-16,1.7476576773e-19,-1.6875687989e-10,1.1236475299e-14,1.7042518057e-18,7.9300735257e-15,5.2881862699e-19,-3.9990736798e-19" +
      " +inv_u=8.7760527928e+05,1.0000024735e+00,-2.8817540032e-10,-5.5627059451e-15,1.5543637570e-18,4.1357152105e-05,-4.2114813612e-11,-2.8523713454e-14,1.9109017837e-18,-3.3616407783e-10,-2.4382678126e-14,2.0245020199e-18,-1.2441377565e-15,-5.3885232238e-19,1.0167203661e-18",
      pts = Seq((877605.0, 6125810.0), (927605.0, 6175810.0),
        (827605.0, 6075810.0), (877605.0, 6225810.0))),
    Sample("latlon", "+proj=latlon +ellps=GRS80"),
    Sample("latlong", "+proj=latlong +ellps=GRS80"),
    Sample("longlat", "+proj=longlat +ellps=GRS80"),
    Sample("lonlat", "+proj=lonlat +ellps=GRS80"),
    Sample("molobadekas", "+proj=molobadekas +convention=coordinate_frame +x=-270.933 +y=115.599 +z=-360.226 +rx=-5.266 +ry=-1.238 +rz=2.381 +s=-5.109 +px=2464351.59 +py=-5783466.61 +pz=974809.81"),
    Sample("molodensky", "+proj=molodensky +a=6378160 +rf=298.25 +da=-23 +df=-8.120449e-8 +dx=-134 +dy=-48 +dz=149 +abridged"),
    Sample("noop", "+proj=noop"),
    Sample("peirce_q", "+proj=peirce_q +R=6370997 +shape=square", 0, 0, 80, 75),
    Sample("pipeline", "+proj=pipeline +step +proj=unitconvert +xy_in=deg +xy_out=rad +step +proj=utm +zone=32 +ellps=GRS80", 9, 45, 20, 40),
    Sample("push", "+proj=pipeline +step +proj=push +v_3 +step +proj=utm +zone=32 +ellps=GRS80 +step +proj=pop +v_3", 9, 45, 20, 40),
    Sample("pop", "+proj=pipeline +step +proj=push +v_1 +v_2 +step +proj=pop +v_1 +v_2", 9, 45, 20, 40),
    Sample("sch", "+proj=sch +plat_0=30.0 +plon_0=45.0 +phdg_0=-12.0 +ellps=WGS84", 45, 30, 6, 4),
    Sample("set", "+proj=set +v_1=10 +v_2=20 +v_3=30 +v_4=40"),
    Sample("spilhaus", "+proj=spilhaus +R=6370997", 0, 0, 80, 75),
    Sample("tinshift", "+proj=tinshift +file=tests/tinshift_simplified_kkj_etrs.json",
      pts = Seq((3210000.0, 6700000.0), (3230000.0, 6720000.0),
        (3190000.0, 6680000.0), (3210000.0, 6740000.0))),
    Sample("unitconvert", "+proj=unitconvert +xy_in=m +xy_out=dm +z_in=cm +z_out=mm"),
    Sample("vertoffset", "+proj=vertoffset +lat_0=46.9166666666666666 +lon_0=8.183333333333334 +dh=-0.245 +slope_lat=-0.210 +slope_lon=-0.032 +ellps=GRS80", 8.2, 46.9, 3, 2),
    Sample("vgridshift", "+proj=vgridshift +grids=tests/egm96_15_downsampled.gtx +ellps=GRS80"),
    Sample("webmerc", "+proj=webmerc +ellps=WGS84"),
    Sample("xyzgridshift", "+proj=xyzgridshift +grids=tests/subset_of_gr3df97a.tif +grid_ref=output_crs +ellps=GRS80",
      zVal = 4407777.0,
      pts = Seq((4577789.0, 400519.0), (4569789.0, 404519.0),
        (4585789.0, 396519.0), (4577789.0, 392519.0)))
  )

  /** The sweep query: one row per registry operation, executed entirely
    * through the DataFrame path (LocalRelation probe grid -> transform
    * expression -> filter -> partial aggregate).  The per-branch frames
    * are trivial; the value of the query is that all 186 kernels
    * serialize into physical plans and execute inside whole-stage
    * codegen. */
  def sweep(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val frames = samples.map { s =>
      val k = ProjString.parse(s.proj)
      probePoints(s).toDF("px", "py")
        .select(geo.transform(k, forward = true, outDims = 2,
          col("px"), col("py"), lit(s.zVal), lit(ProbeEpoch)).as("p"))
        .select(col("p").getField("x").as("x"), col("p").getField("y").as("y"))
        .where(!isnan(col("x")) && !isnan(col("y")) &&
          abs(col("x")) < 1e12 && abs(col("y")) < 1e12)
        .agg(count(lit(1)).as("n_ok"),
          coalesce(sum(pmod(floor(col("x") * 1e3), lit(Mod)) +
            pmod(floor(col("y") * 1e3), lit(Mod))), lit(0.0))
            .cast("long").as("checksum"))
        .select(lit(s.op).as("op"), col("n_ok"), col("checksum"))
    }
    frames.reduce(_ unionByName _)
  }

  /** JVM-direct expectation for one sample — the same arithmetic as
    * [[sweep]] but through a direct [[graft.geo.expr.PointEvaluator]]
    * call, no Spark plan.  Used by RegistrySweepSpec for bit-for-bit
    * comparison. */
  def expected(s: Sample): (Long, Long) = {
    val k = ProjString.parse(s.proj)
    val ev = new graft.geo.expr.PointEvaluator(k, forward = true, outDims = 2)
    var n = 0L
    var sum = 0.0
    for ((px, py) <- probePoints(s)) {
      val row = ev.eval(px, py, s.zVal, ProbeEpoch)
      if (row != null) {
        val x = row.getDouble(0); val y = row.getDouble(1)
        if (acceptable(x) && acceptable(y)) {
          n += 1
          sum += mix(x) + mix(y)
        }
      }
    }
    (n, sum.toLong)
  }
}
