package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Lance connector coverage in the declared-query registry (rows-only —
  * the driver's DuckDB oracle has no Lance extension loaded, so these are
  * validated value-level by LanceSpec instead).
  */
object LanceOps {

  private lazy val workDir =
    java.nio.file.Files.createTempDirectory("graft-lance-q").toString

  val defs: Seq[QDef] = Seq(

    // golden-dataset scan through the DSv2 connector (reference R1-R4)
    QDef("l01_lance_scan_golden", (s, _) => {
      s.read.format("lance").load("/root/reference/test/test_data.lance")
        .filter(col("age") > 20).orderBy("id")
    }, None),

    // write fixtures to lance, read back, aggregate (R6-R8 + R1-R4)
    QDef("l02_lance_roundtrip_agg", (s, dir) => {
      val t = Tables.register(s, dir)
      val ds = s"$workDir/supplier.lance"
      t("supplier").write.format("lance").mode("overwrite").save(ds)
      s.read.format("lance").load(ds)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), Det.dsum(col("s_acctbal")).as("total_bal"))
        .orderBy("s_nationkey")
    }, None),

    // vector search directly over a lance dataset (lance's core use case)
    QDef("l03_lance_vector_search", (s, dir) => {
      val t = Tables.register(s, dir)
      val ds = s"$workDir/embeddings.lance"
      t("embeddings").write.format("lance").mode("overwrite").save(ds)
      val lanceEmb = s.read.format("lance").load(ds)
      val q = lanceEmb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
      graft.operators.Similarity.cosineTopK(
        lanceEmb.filter(col("vec_id") > 0), "vec_id", "embedding", q, 10)
    }, None),

    // multimodal-on-lance: binary payloads + struct metadata stored as a
    // lance dataset, decoded partition-wise on re-read (SURVEY §2.5
    // multimodal + the connector's struct/binary surface together)
    QDef("l04_lance_multimodal", (s, dir) => {
      val t = Tables.register(s, dir)
      val ds = s"$workDir/media.lance"
      t("documents")
        .select(col("doc_id"),
                col("text").cast("binary").as("payload"),
                struct(lit("text/plain").as("mime"),
                       length(col("text")).cast("long").as("n_chars")).as("meta"))
        .write.format("lance").mode("overwrite").save(ds)
      val media = s.read.format("lance").load(ds)
        .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      import s.implicits._
      graft.operators.Multimodal.decodeStub(media.as[graft.operators.Multimodal.MediaRow])
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
                round(col("entropy"), 6).as("entropy"))
        .orderBy("doc_id")
    }, None)
  )
}
