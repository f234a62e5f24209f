package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** q104 stage-level profile (r20 optimization evidence): times each phase
  * of the one-shot triangle count in isolation — edge build, degree table,
  * orientation, wedge fan-out, closing probe — so the optimization targets
  * the phase that actually dominates instead of the one that looks big.
  *
  * Usage: runMain graft.tools.TriDiag <sfDir>
  */
object TriDiag {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-tri-diag")
    s.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[tridiag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.count() // warm the scan
    val e = time("edge build + checkpoint") {
      li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("a"), col("pk2").as("b"))
        .distinct()
        .localCheckpoint()
    }
    val nEdges = time("e.count")(e.count())
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val nVerts = time("deg agg + count")(deg.count())
    System.err.println(s"[tridiag] nEdges $nEdges nVerts $nVerts")
    val withDeg = e
      .join(broadcast(deg.select(col("v").as("a"), col("deg").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("v").as("b"), col("deg").as("db"))), Seq("b"))
    val o = withDeg.select(
      when(col("da") < col("db") ||
           (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("s"), col("b").as("t"),
               col("da").as("ds"), col("db").as("dt")))
        .otherwise(
          struct(col("b").as("s"), col("a").as("t"),
                 col("db").as("ds"), col("da").as("dt"))).as("e"))
      .select(col("e.s"), col("e.t"), col("e.dt"))
    val oCk = time("orient + checkpoint")(o.localCheckpoint())
    val wedges = oCk.select(col("s"), col("t").as("b"), col("dt").as("deg_b"))
      .join(oCk.select(col("s"), col("t").as("c"), col("dt").as("deg_c")),
        Seq("s"))
      .filter(col("deg_b") < col("deg_c") ||
        (col("deg_b") === col("deg_c") && col("b") < col("c")))
    val nWedges = time("wedge fan-out count")(wedges.count())
    System.err.println(s"[tridiag] nWedges $nWedges")
    val oriented = oCk.select(col("s").as("b"), col("t").as("c"))
    val nTri = time("closing semi + count") {
      wedges.select(col("b"), col("c"))
        .join(broadcast(oriented), Seq("b", "c"), "left_semi")
        .count()
    }
    System.err.println(s"[tridiag] nTriangles $nTri")
    s.stop()
  }
}
// appended experiments live in a second object so the main profile stays clean
object TriDiagB {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-tri-diag-b")
    s.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[tridiagB] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.count()
    // variant B: per-order sorted pk array -> in-array pair fan-out -> distinct
    val eB = time("edge build B (arrays)") {
      li.groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x as a, y as b))))"
        )).as("p"))
        .select(col("p.a"), col("p.b"))
        .distinct()
        .localCheckpoint()
    }
    System.err.println(s"[tridiagB] nEdges B ${eB.count()}")
    // variant A again for same-session comparison
    val eA = time("edge build A (self-join)") {
      li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("a"), col("pk2").as("b"))
        .distinct()
        .localCheckpoint()
    }
    System.err.println(s"[tridiagB] nEdges A ${eA.count()}")
    // deg checkpoint effect: time 2 broadcast builds with and without
    val deg = eA.select(col("a").as("v")).unionByName(eA.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    time("deg count (no ckpt)")(deg.count())
    time("two broadcast builds (no ckpt)") {
      eA.join(broadcast(deg.select(col("v").as("a"), col("deg").as("da"))), Seq("a"))
        .join(broadcast(deg.select(col("v").as("b"), col("deg").as("db"))), Seq("b"))
        .count()
    }
    val degC = time("deg ckpt")(deg.localCheckpoint())
    time("two broadcast builds (ckpt)") {
      eA.join(broadcast(degC.select(col("v").as("a"), col("deg").as("da"))), Seq("a"))
        .join(broadcast(degC.select(col("v").as("b"), col("deg").as("db"))), Seq("b"))
        .count()
    }
    s.stop()
  }
}
object TriDiagC {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-tri-diag-c")
    s.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[tridiagC] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.count()
    val e = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
      .filter(col("pk") < col("pk2"))
      .select(col("pk").as("a"), col("pk2").as("b"))
      .distinct().localCheckpoint()
    val deg = e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val o = e
      .join(broadcast(deg.select(col("v").as("a"), col("deg").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("v").as("b"), col("deg").as("db"))), Seq("b"))
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("t"), col("da").as("ds"), col("db").as("dt")))
        .otherwise(struct(col("b").as("s"), col("a").as("t"), col("db").as("ds"), col("da").as("dt"))).as("e"))
      .select(col("e.s"), col("e.t"), col("e.dt"))
      .localCheckpoint()
    val wedges = o.select(col("s"), col("t").as("b"), col("dt").as("deg_b"))
      .join(o.select(col("s"), col("t").as("c"), col("dt").as("deg_c")), Seq("s"))
      .filter(col("deg_b") < col("deg_c") ||
        (col("deg_b") === col("deg_c") && col("b") < col("c")))
    val oriented = o.select(col("s").as("b"), col("t").as("c"))
    val n2 = time("closing semi 2-col key") {
      wedges.select(col("b"), col("c"))
        .join(broadcast(oriented), Seq("b", "c"), "left_semi").count()
    }
    val nPack = time("closing semi packed long") {
      wedges.select((col("b") * 2147483648L + col("c")).as("k"))
        .join(broadcast(oriented.select((col("b") * 2147483648L + col("c")).as("k"))),
          Seq("k"), "left_semi").count()
    }
    System.err.println(s"[tridiagC] n2 $n2 nPack $nPack")
    // and: bloom prefilter + exact, below the 8M gate
    val bloomAgg = udaf(new graft.functions.Bloom.Agg(
      graft.functions.Bloom.sizeWords(1196000L)))
    val bloom = o.coalesce(8)
      .agg(bloomAgg(xxhash64(col("s"), col("t"))).as("bf"))
    val nB = time("bloom prefilter + exact") {
      wedges.select(col("b"), col("c"))
        .crossJoin(broadcast(bloom))
        .filter(graft.functions.Bloom.mightContainCol(col("bf.bits"),
          xxhash64(col("b"), col("c"))))
        .select(col("b"), col("c"))
        .join(broadcast(oriented), Seq("b", "c"), "left_semi").count()
    }
    System.err.println(s"[tridiagC] nB $nB")
    s.stop()
  }
}
