package graft

import org.apache.spark.sql.functions._
import graft.functions._

class FunctionsSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  test("wordShingles is empty below n tokens and sliding above") {
    val df = Seq("a b", "a b c d").toDF("text")
      .select(wordShingles(wsTokens(col("text")), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, List("a b c", "b c d")))
  }

  test("minhashSignature is deterministic and element-wise minimal") {
    val df = Seq("x y z w").toDF("text")
      .select(minhashSignature(wordShingles(wsTokens(col("text")), 3), 4).as("sig"))
    val a = df.collect().head.getSeq[String](0)
    val b = df.collect().head.getSeq[String](0)
    assert(a == b && a.length == 4 && a.forall(_.length == 32))
  }

  test("simhash16 stays within 16 bits and is stable") {
    val df = Seq("spark sql engine", "spark sql engine").toDF("text")
      .select(simhash16(wsTokens(col("text"))).as("h"))
    val vals = df.collect().map(_.getInt(0)).toList
    assert(vals.distinct.size == 1 && vals.head >= 0 && vals.head < 65536)
  }

  test("cosineSim of a vector with itself is 1") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    assert(math.abs(df.collect().head.getDouble(0) - 1.0) < 1e-12)
  }

  test("native codegen cosine is bit-identical to the HOF reference on real data") {
    val e = graft.sources.Tables.load(spark, sf, "embeddings").limit(50)
    val both = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        cosineSim(col("a.embedding"), col("b.embedding")).as("native"),
        cosineSimHof(col("a.embedding"), col("b.embedding")).as("hof"))
    val diff = both.filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"$diff pairs differ between native and HOF cosine")
  }

  test("native shingles/minhash are identical to the declarative formulation on real docs") {
    val d = graft.sources.Tables.load(spark, sf, "documents")
    val cmp = d.select(
      ShingleExpressions.shingles(col("text"), 3).as("native_sh"),
      wordShingles(wsTokens(col("text")), 3).as("hof_sh"),
      ShingleExpressions.minhashSig(col("text"), 8, 3).as("native_mh"),
      minhashSignature(wordShingles(wsTokens(col("text")), 3), 8).as("hof_mh"))
    val shDiff = cmp.filter(col("native_sh") =!= col("hof_sh")).count()
    assert(shDiff == 0, s"$shDiff docs differ in shingles")
    // HOF minhash of an empty shingle array is an array of nulls; native is
    // empty — compare only docs with shingles (the pipeline filters those).
    val mhDiff = cmp.filter(size(col("hof_sh")) > 0)
      .filter(col("native_mh") =!= col("hof_mh")).count()
    assert(mhDiff == 0, s"$mhDiff docs differ in minhash signatures")
  }

  test("graft_cosine is callable from SQL") {
    graft.functions.VectorExpressions.register(spark)
    val r = spark.sql("SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c")
      .collect().head.getDouble(0)
    assert(r == 0.0)
  }
}
