package graft

import graft.util.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Z-order layout contracts: the Morton Column expression vs the local
  * bit-interleave, box-query exactness vs the raw filter, the partition
  * pruning receipt, and the refusal surface. */
class ZOrderSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val dx = ZOrder.Dim("x", 0, 1999)
  private val dy = ZOrder.Dim("y", 0, 99)

  private lazy val (layoutPath, fixture) = {
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(5000)(
        (rnd.nextInt(2000).toLong, rnd.nextInt(100).toLong, rnd.nextDouble()))
      .toDF("x", "y", "v")
    val p = Files.createTempDirectory("zorder").toString
    ZOrder.writeLayout(df, dx, dy, bits = 3, p, validate = true)
    (p, df)
  }

  test("zvalue Column matches the local bit-interleave on random cells") {
    val rnd = new scala.util.Random(7)
    val cells = Seq.fill(500)(
        (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("cx", "cy")
    cells.withColumn("z", ZOrder.zvalue(col("cx"), col("cy")))
      .collect().foreach { r =>
        assert(r.getLong(2) === ZOrder.zvalueLocal(r.getLong(0), r.getLong(1)))
      }
  }

  test("box query over a written layout equals the raw filter") {
    val layout = ZOrder.readLayout(spark, layoutPath)
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 8) {
      val x0 = rnd.nextInt(2000).toLong; val x1 = x0 + rnd.nextInt(500)
      val y0 = rnd.nextInt(100).toLong; val y1 = y0 + rnd.nextInt(30)
      val got = ZOrder.boxQuery(layout, dx, dy, 3, x0, x1, y0, y1)
        .agg(count(lit(1)), sum("v")).head()
      val want = fixture
        .where(col("x").between(x0, x1) && col("y").between(y0, y1))
        .agg(count(lit(1)), sum("v")).head()
      assert(got.getLong(0) === want.getLong(0), s"box [$x0,$x1]x[$y0,$y1]")
      if (want.getLong(0) > 0)
        assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6)
    }
    // a box that misses the domain entirely: zero buckets, zero rows
    assert(ZOrder.bucketsForBox(dx, dy, 3, 5000, 6000, 0, 10).isEmpty)
    assert(ZOrder.boxQuery(layout, dx, dy, 3, 5000, 6000, 0, 10).count() === 0)
  }

  test("box scan prunes z-bucket partitions — the layout's receipt") {
    val layout = ZOrder.readLayout(spark, layoutPath)
    // a 10% × 25% box covers 1×2 of the 8×8 cells
    val zbs = ZOrder.bucketsForBox(dx, dy, 3, 0, 199, 0, 24)
    assert(zbs === Seq(0L, 2L)) // cells (0,0) and (0,1) → z 0 and 2
    val q = ZOrder.boxQuery(layout, dx, dy, 3, 0, 199, 0, 24)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*__zb.*"),
      s"expected __zb partition pruning in:\n$plan")
  }

  test("layout advisor: break-even arithmetic, measured coverage, refusals") {
    // measured coverage of the receipt box: 2 of 64 buckets
    val cov = ZOrder.measureCoverage(dx, dy, 3, Seq((0L, 199L, 0L, 24L)))
    assert(cov === 2.0 / 64.0)
    // n=1000, coverage 2/64: layout 2000 units, saving 968/query →
    // break-even ceil(2000/968) = 3 queries
    val a = ZOrder.adviseLayout(1000, cov, expectedBoxQueries = 3)
    assert(a.layoutCostUnits === 2000L)
    assert(a.perQuerySavingUnits === 968L)
    assert(a.breakEvenQueries === 3L)
    assert(a.build)
    assert(!ZOrder.adviseLayout(1000, cov, expectedBoxQueries = 2).build)
    // domain-spanning boxes save nothing: never build, no div-by-zero
    val never = ZOrder.adviseLayout(1000, 1.0, expectedBoxQueries = 1000000)
    assert(!never.build && never.breakEvenQueries === Long.MaxValue)
    intercept[IllegalArgumentException](ZOrder.adviseLayout(0, 0.5, 1))
    intercept[IllegalArgumentException](ZOrder.adviseLayout(10, 1.5, 1))
    intercept[IllegalArgumentException](
      ZOrder.measureCoverage(dx, dy, 3, Seq.empty))
  }

  test("refusals: inverted dim, overflow-risk span, out-of-domain rows") {
    intercept[IllegalArgumentException](ZOrder.Dim("x", 5, 4))
    intercept[IllegalArgumentException](
      ZOrder.cell(ZOrder.Dim("x", 0, Long.MaxValue / 2), 16))
    val bad = Seq((5000L, 5L, 1.0)).toDF("x", "y", "v")
    val p = Files.createTempDirectory("zorderbad").toString
    intercept[IllegalArgumentException](
      ZOrder.writeLayout(bad, dx, dy, 3, p, validate = true))
  }
}
