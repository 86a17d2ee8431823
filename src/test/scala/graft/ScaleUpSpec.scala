package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The sf1 scale gate's testdata builder, spec'd (round 13): the
  * replica-parity derivations in tools/replica_parity.py are only as
  * trustworthy as ScaleUp's construction invariants, so they are pinned
  * here instead of assumed — disjoint key universes per replica,
  * replica-0 rows VERBATIM (key identity, unsalted text, generator
  * n_chars untouched, unperturbed embeddings), referential consistency
  * of the remapped foreign keys, shared dims copied once, and the
  * partitioned write path producing the same rows as the single-file
  * path. */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val factor = 3

  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("scaleup_spec").toString
    ScaleUp.run(spark, TestSpark.sfDir, dir, factor)
    dir
  }

  private def in(t: String) = spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet")
  private def out(t: String) = spark.read.parquet(s"$outDir/$t.parquet")

  test("row counts: facts scale by factor, shared dims copied once") {
    Seq("customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        assert(out(t).count() == factor * in(t).count(), s"$t should scale x$factor")
      }
    Seq("region", "nation").foreach { t =>
      assert(out(t).count() == in(t).count(), s"$t is a shared dim, copied once")
    }
  }

  test("key universes are disjoint per replica and replica 0 is identity-mapped") {
    val k = in("documents").agg(max("doc_id")).head().getLong(0) + 1
    // every output key maps back to a base key in [0, k) and a replica in [0, factor)
    val bad = out("documents")
      .select((col("doc_id") % k).as("base"), (col("doc_id") / k).cast("long").as("r"))
      .where(col("r") < 0 || col("r") >= factor)
      .count()
    assert(bad == 0)
    // each replica holds exactly the base key set, shifted
    val perReplica = out("documents")
      .groupBy((col("doc_id") / k).cast("long").as("r"))
      .agg(countDistinct("doc_id").as("n"))
      .collect()
    assert(perReplica.length == factor && perReplica.forall(_.getLong(1) == in("documents").count()))
  }

  test("replica-0 slice is byte-verbatim: text unsalted, n_chars untouched, embeddings unperturbed") {
    val k = in("documents").agg(max("doc_id")).head().getLong(0) + 1
    val r0 = out("documents").where(col("doc_id") < k)
    assert(r0.exceptAll(in("documents")).count() == 0 && in("documents").exceptAll(r0).count() == 0)
    val kv = in("embeddings").agg(max("vec_id")).head().getLong(0) + 1
    val e0 = out("embeddings").where(col("vec_id") < kv)
    assert(e0.exceptAll(in("embeddings")).count() == 0 && in("embeddings").exceptAll(e0).count() == 0)
  }

  test("salted replicas: one appended token, n_chars self-consistent, embeddings perturbed but close") {
    val k = in("documents").agg(max("doc_id")).head().getLong(0) + 1
    val salted = out("documents").where(col("doc_id") >= k)
    assert(salted.where(!col("text").rlike(" zqrep[0-9]+$")).count() == 0)
    assert(salted.where(col("n_chars") =!= length(col("text"))).count() == 0)
    val kv = in("embeddings").agg(max("vec_id")).head().getLong(0) + 1
    // perturbation is tiny (1e-4 scale): every perturbed twin stays ~unit
    val pert = out("embeddings").where(col("vec_id") >= kv)
      .select((col("vec_id") % kv).as("base_id"), col("embedding"))
    val base = in("embeddings")
      .select(col("vec_id").as("base_id"), col("embedding").as("base_emb"))
    val drift = pert.join(base, "base_id")
      .select(aggregate(
        zip_with(col("embedding"), col("base_emb"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("d2"))
      .agg(max("d2")).head().getDouble(0)
    assert(drift > 0.0 && drift < 1e-3, s"perturbation out of band: $drift")
  }

  test("referential consistency survives the remap (no dangling foreign keys)") {
    val orphans = out("lineitem").join(out("orders"), col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 0, "every lineitem must join an order in its own replica")
    val custOrphans = out("orders").join(out("customer"), col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(custOrphans == 0)
  }

  test("partitioned write path yields the same rows as the single-file path") {
    val dir = java.nio.file.Files.createTempDirectory("scaleup_part").toString
    ScaleUp.run(spark, TestSpark.sfDir, dir, factor, partitioned = true)
    assert(new java.io.File(s"$dir/documents.parquet").isDirectory)
    val a = spark.read.parquet(s"$dir/documents.parquet")
    val b = out("documents")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("empty input fails with a clear stride message, not an NPE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleup_empty").toString
    // minimal table set with an EMPTY documents table
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings")
      .foreach(t => in(t).write.mode("overwrite").parquet(s"$dir/in/$t.parquet"))
    in("documents").limit(0).write.mode("overwrite").parquet(s"$dir/in/documents.parquet")
    val ex = intercept[IllegalArgumentException] {
      ScaleUp.run(spark, s"$dir/in", s"$dir/out", 2)
    }
    assert(ex.getMessage.contains("documents.doc_id") && ex.getMessage.contains("stride"))
  }
}
