package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Reshape

/** Pins the pandas-quirk semantics of the tag pipeline (SURVEY.md §7.4):
  * videos without tags default to [""] and KEEP one row through the
  * unpivot (the golden CSV's 6 empty-tag rows); ordinals are 1-based;
  * the final sort is id desc, ordinal asc. */
class ReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val videos = Seq(
    ("v2", Some(Seq("a", "b", "c"))),
    ("v1", Some(Seq("x"))),
    ("v0", None) // no tags → P5 default [""]
  ).toDF("video_id", "tags")

  test("unpivot keeps defaulted empty-tag rows, 1-based ordinals") {
    val out = Reshape.unpivotWithOrdinal(videos, col("video_id"), col("tags"))
      .orderBy(col("id").desc, col("tag_number").asc)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(
      ("v2", 1L, "a"), ("v2", 2L, "b"), ("v2", 3L, "c"),
      ("v1", 1L, "x"),
      ("v0", 1L, "")))
  }

  test("nest-then-flatten round trip is the identity") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 1L, 5.0))
      .toDF("k", "seq", "v")
    val out = Reshape.nestThenFlatten(df, "k", Seq("seq", "v"))
      .orderBy("k", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 1L, 5.0)))
  }

  test("hierarchy flatten unions parents (flag 0) and replies (flag 1)") {
    val parents = Seq((10L, 0L)).toDF("thread_id", "reply_flag")
    val children = Seq((10L, 1L), (10L, 1L)).toDF("thread_id", "reply_flag")
    val out = Reshape.hierarchyFlatten(parents, children)
    assert(out.count() == 3)
    assert(out.filter(col("reply_flag") === 1).count() == 2)
  }
}
