package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank (operators.Graph) — topology properties the DuckDB oracle
  * can't isolate: hand-checked values on tiny graphs, dangling-node and
  * no-inbound behavior, and partitioning-independence of the integer
  * fixed-point recurrence. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is the fixpoint: every rank stays at initial mass") {
    // a↔b, outdeg 1 each: contrib = rank, new = 150000 + 85%·1e6 = 1e6
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star graph: hub accumulates leaf mass, leaves hold teleport base") {
    // leaves 2..5 each point at hub 1; hub points back at leaf 2.
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
    val r = ranks(edges, iters = 1)
    // hub: 150000 + 85·(4 × 1e6)/100 = 3550000
    assert(r(1L) == 3550000L)
    // leaf 2 gets the hub's whole rank: 150000 + 85·1e6/100 = 1000000
    assert(r(2L) == 1000000L)
    // leaves 3..5 have no inbound: teleport base only
    assert(Seq(3L, 4L, 5L).forall(r(_) == 150000L))
  }

  test("dangling node keeps its inbound rank; its mass is not redistributed") {
    // 1 → 2 and nothing out of 2: node 2 is dangling but must still
    // appear with base + damped contribution; node 1 settles at base.
    val r = ranks(Seq((1L, 2L)), iters = 2)
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == 150000L) // no inbound
    // iter1: r2 = 150000 + 85%·1e6 = 1000000; iter2: 150000 + 85%·150000
    assert(r(2L) == 150000L + 85L * 150000L / 100L)
  }

  test("integer recurrence is partitioning-independent (1 vs 32 shuffle partitions)") {
    val edges = (1L to 40L).flatMap(i => Seq((i, i % 40 + 1), (i % 40 + 1, i)))
    val base = ranks(edges)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(ranks(edges) == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("empty edge list yields an empty result with the contract schema") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = Graph.pageRank(empty, "src", "dst")
    assert(out.columns.toSeq == Seq("id", "rank_micro"))
    assert(out.isEmpty)
  }

  test("null endpoints are dropped, not propagated into the node set") {
    val edges = Seq((Option(1L), Option(2L)), (None, Option(3L)), (Option(4L), None))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L))
  }

  test("l26 edge layout is reused across runs and rebuilt when sources are newer") {
    // fixture sf dir with just the two tables l26 touches
    val dir = java.nio.file.Files.createTempDirectory("graft_l26_stale").toString
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 11L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 100L), (2L, 101L), (3L, 100L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def run(): Map[Long, Long] =
      SparkEntry.queries("l26_pagerank")(spark, dir)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val marker = new java.io.File(
      graft.queries.QShared.sink(dir, "l26_edges"), "_SUCCESS")
    val r1 = run()
    assert(marker.exists(), "first run must lay out the bucketed edge table")
    val m1 = marker.lastModified()
    val r2 = run()
    assert(marker.lastModified() == m1,
      "unchanged sources must NOT trigger a relayout")
    // advance a LEAF data file's mtime past the marker: next run must
    // rebuild. (r12: version tokens derive from leaf files, not the
    // directory inode — an in-place part-file rewrite that leaves the
    // directory mtime untouched must invalidate, and a bare directory
    // touch with unchanged contents must not.)
    val leaf = new java.io.File(s"$dir/lineitem.parquet").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).head
    assert(leaf.setLastModified(m1 + 10000))
    val r3 = run()
    assert(marker.lastModified() > m1,
      "a source newer than the layout must trigger a relayout")
    assert(r1 == r2 && r2 == r3, "ranks are identical across reuse/rebuild")
    assert(r1.keySet == Set(100L, 101L, 1000010L, 1000011L, 1000012L),
      s"node ids are custkeys and offset suppkeys: ${r1.keySet}")
  }
}
