package graft

import org.apache.spark.sql.functions._

/** Adversarial-text sweep: the documents-derived queries must survive
  * pathological text — token and whitespace shapes that break naive
  * tokenizers, regex engines (catastrophic backtracking), window logic
  * (single-gram docs), and length assumptions. Real crawl corpora
  * contain all of these. Only crash-freedom is asserted; per-operator
  * semantics on clean text are the oracle gate's job. */
class AdversarialTextSpec extends SparkSpec {

  test("documents-derived queries survive pathological text") {
    val dir = tmpDir("adversarial")
    val nasty = Seq(
      1L -> ("a " * 5000).trim,                  // 5k identical tokens
      2L -> "x" * 100000,                        // one 100k-char token
      3L -> " " * 10000,                         // whitespace only
      4L -> "",                                  // empty
      5L -> "é" * 2000,                    // combining-char storm
      6L -> "中文" * 3000,               // CJK run
      7L -> "\t\r\n \t\r\n",                     // mixed whitespace
      8L -> ("word" + "\u0000" + " embedded"), // NUL byte
      9L -> (1 to 2000).mkString(" "),           // all-distinct numerals
      10L -> "🙂🙃" * 1500)  // astral-plane emoji
    import spark.implicits._
    nasty.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("adv"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // only queries reading solely the documents table run here
    val docQueries = SparkEntry.all.filter(q =>
      (q.name.startsWith("l") || q.name.startsWith("f1")) &&
        !Set("l2_cosine_topk", "l2b_ann_lsh", "l2c_ann_ivf", "l2d_kmeans_cells",
          "l21_embedding_quantize", "l33_hard_negatives", "l4_binary_roundtrip",
          "l4b_multimodal_features",
          // read lineitem/orders (the interaction graph), not documents
          "l26_pagerank", "l30_triangle_count",
          // these also read the embeddings table, absent here
          "f1_flatten_multimap", "l1f_embedding_dedup",
          "l39_semdedup", "l39b_semdedup_ann").contains(q.name))
    val failures = docQueries.flatMap { q =>
      try {
        q.spark(spark, dir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on adversarial text:\n${failures.mkString("\n")}")
  }
}
