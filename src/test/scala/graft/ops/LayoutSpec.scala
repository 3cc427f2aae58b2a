package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the JVM, independent of the Column
    * expression under test. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zOrderKey matches the reference interleave on the full 8-bit grid") {
    val pts = for (x <- 0L until 256L by 17L; y <- 0L until 256L by 13L)
      yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zOrderKey(col("x"), col("y"), 8).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 8),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order files bound both dimensions tighter than a 1-d sort") {
    // 4096 points on a 64×64 grid; 16 files via the top 4 z bits. Under
    // z-order every file must span at most a quarter of EACH dimension
    // (one quadrant of the recursion's second level in the worst case);
    // a 1-d sort would leave the other dimension at full range.
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val audit = Layout.zOrderAudit(pts.toDF("x", "y"),
        col("x"), col("y"), bits = 6, fileShift = 8)
      .collect()
    assert(audit.length == 16, s"expected 16 files, got ${audit.length}")
    audit.foreach { r =>
      val (fid, n) = (r.getLong(0), r.getLong(1))
      assert(n == 256L, s"file $fid has $n rows")
      assert(r.getLong(3) - r.getLong(2) <= 31, s"file $fid x-span wide")
      assert(r.getLong(5) - r.getLong(4) <= 31, s"file $fid y-span wide")
    }
  }

  test("zOrderKey rejects out-of-range bit widths") {
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(col("x"), col("y"), 17)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(col("x"), col("y"), 0)
    }
  }
}
