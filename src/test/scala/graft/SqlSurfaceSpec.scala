package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.operators.{Dedup, TextOps}

/** The SQL registration surface (§2.8): every graft function callable
  * from `spark.sql`, equal to its Column-API form.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.install(spark)

  private lazy val docs =
    spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")

  test("graft_cosine / graft_lsh_bucket from SQL == Column API") {
    spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .limit(20).createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, graft_cosine(embedding, embedding) AS c,
        | graft_lsh_bucket(embedding, 8) AS b,
        | graft_lsh_bucket(embedding, 8, 8) AS b2
        |FROM emb_sql""".stripMargin)
      .as[(Long, Double, Long, Long)].collect().toSeq
    val viaCol = spark.table("emb_sql").select($"vec_id",
        VectorExpressions.cosine($"embedding", $"embedding").as("c"),
        VectorExpressions.lshBucket($"embedding", 8).as("b"),
        VectorExpressions.lshBucket($"embedding", 8, 8).as("b2"))
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(viaSql == viaCol)
    // independent plane families actually differ somewhere
    assert(viaSql.exists(r => r._3 != r._4))
  }

  test("graft_pq_sq_dist from SQL == Column API, decimal-exact") {
    spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .limit(20).createOrReplaceTempView("emb_pq_sql")
    val viaSql = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        | CAST(graft_pq_sq_dist(a.embedding, b.embedding) AS STRING) AS d
        |FROM emb_pq_sql a JOIN emb_pq_sql b ON a.vec_id < b.vec_id""".stripMargin)
      .as[(Long, Long, String)].collect().toSet
    val e1 = spark.table("emb_pq_sql")
      .select($"vec_id".as("ida"), $"embedding".as("va"))
    val e2 = spark.table("emb_pq_sql")
      .select($"vec_id".as("idb"), $"embedding".as("vb"))
    val viaCol = e1.join(e2, $"ida" < $"idb")
      .select($"ida", $"idb",
        VectorExpressions.pqSqDist($"va", $"vb").cast("string").as("d"))
      .as[(Long, Long, String)].collect().toSet
    assert(viaSql == viaCol)
  }

  test("graft_pq_dot from SQL == Column API, decimal-exact") {
    spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .limit(20).createOrReplaceTempView("emb_dot_sql")
    val viaSql = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        | CAST(graft_pq_dot(a.embedding, b.embedding) AS STRING) AS d
        |FROM emb_dot_sql a JOIN emb_dot_sql b ON a.vec_id < b.vec_id""".stripMargin)
      .as[(Long, Long, String)].collect().toSet
    val e1 = spark.table("emb_dot_sql")
      .select($"vec_id".as("ida"), $"embedding".as("va"))
    val e2 = spark.table("emb_dot_sql")
      .select($"vec_id".as("idb"), $"embedding".as("vb"))
    val viaCol = e1.join(e2, $"ida" < $"idb")
      .select($"ida", $"idb",
        VectorExpressions.pqDot($"va", $"vb").cast("string").as("d"))
      .as[(Long, Long, String)].collect().toSet
    assert(viaSql == viaCol)
  }

  test("graft_nfc_normalize from SQL == Column API") {
    val decomposed = "caf" + "\u0065" + "\u0301"
    Seq((1L, decomposed)).toDF("id", "t").createOrReplaceTempView("nfc_sql")
    val viaSql = spark.sql(
      "SELECT graft_nfc_normalize(t) FROM nfc_sql").as[String].head()
    val viaCol = spark.table("nfc_sql")
      .select(TextOps.normalizeNfc($"t")).as[String].head()
    assert(viaSql == viaCol && viaSql == "caf" + "\u00e9")
  }

  test("graft_cdc_starts / graft_random_projection from SQL == Column API") {
    Seq((1L, "the quick brown fox jumps over the lazy dog repeatedly"))
      .toDF("id", "t").createOrReplaceTempView("cdc_sql")
    val viaSql = spark.sql(
      "SELECT graft_cdc_starts(t, 4, 4) FROM cdc_sql")
      .as[Seq[Int]].head()
    val viaCol = spark.table("cdc_sql")
      .select(graft.functions.TextExpressions.cdcStarts($"t", 4, 4))
      .as[Seq[Int]].head()
    assert(viaSql == viaCol && viaSql.head == 1)
    Seq((1L, Seq.fill(8)(0.5f))).toDF("id", "v")
      .createOrReplaceTempView("rp_sql")
    val pSql = spark.sql(
      "SELECT graft_random_projection(v, 8, 4) FROM rp_sql")
      .as[Seq[Float]].head()
    val pCol = spark.table("rp_sql")
      .select(graft.functions.VectorExpressions
        .randomProjection($"v", 8, 4)).as[Seq[Float]].head()
    assert(pSql == pCol && pSql.length == 4)
  }

  test("graft_shingles / graft_minhash / graft_simhash64 / text fns from SQL") {
    docs.limit(20).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id,
        | graft_minhash(graft_shingles(text, 5), 16) AS sig,
        | graft_simhash64(graft_shingles(text, 1)) AS sh,
        | graft_lang_id(text) AS lang,
        | graft_text_stats(text).n_tokens AS n_tokens
        |FROM docs_sql""".stripMargin)
      .as[(Long, Seq[Long], Long, String, Long)].collect().toSeq
    val viaCol = spark.table("docs_sql").select($"doc_id",
        Dedup.minhashSignature(TextOps.shingles($"text", 5), 16).as("sig"),
        graft.functions.TextExpressions
          .simhash64(TextOps.shingles($"text", 1)).as("sh"),
        TextOps.langId($"text").as("lang"),
        graft.functions.TextStatsExpression
          .textStats($"text", TextOps.langProfiles("en"))
          .getField("n_tokens").as("n_tokens"))
      .as[(Long, Seq[Long], Long, String, Long)].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("graft_freq_items from SQL == Column API (grouped aggregate)") {
    docs.limit(200)
      .select($"doc_id", pmod($"doc_id", lit(3)).as("g"),
        substring($"lang", 1, 2).as("v"))
      .createOrReplaceTempView("fi_sql")
    val viaSql = spark.sql(
      """SELECT g, graft_freq_items(v, 8) AS fi
        |FROM fi_sql GROUP BY g""".stripMargin)
      .selectExpr("g", "explode(fi) AS e")
      .selectExpr("g", "e.item", "e.cnt")
      .as[(Long, String, Long)].collect().toSet
    val viaCol = graft.operators.Profiling.freqItemsByKey(
        spark.table("fi_sql"), "g", "v", 8)
      .as[(Long, String, Long)].collect().toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("graft_phrase_merge from SQL == Column API") {
    Seq((1L, "new york city"), (2L, "old town"))
      .toDF("id", "text").createOrReplaceTempView("pm_sql")
    val viaSql = spark.sql(
      """SELECT id, array_join(graft_phrase_merge(
        |  graft_shingles(text, 1), 'new york,york city'), ' ') AS m
        |FROM pm_sql""".stripMargin)
      .as[(Long, String)].collect().toMap
    val viaCol = graft.operators.TextOps.mergePhrases(
        spark.table("pm_sql"), "id", "text",
        Seq(("new", "york"), ("york", "city")))
      .select($"id", $"text_merged")
      .as[(Long, String)].collect().toMap
    assert(viaSql == viaCol)
    assert(viaSql(1L) == "new_york city")
  }

  test("non-literal parameter fails at analysis, not execution") {
    docs.limit(5).createOrReplaceTempView("docs_sql2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, doc_id) FROM docs_sql2")
        .collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.contains("k must be"))
  }
}
