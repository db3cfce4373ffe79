package graft

import org.apache.spark.sql.functions._

/** The facade must expose working entry points that agree with the
  * underlying operators. */
class GraftFacadeSpec extends SparkSpec {

  test("enable + kernel columns + asofJoin + saltedJoin round-trip") {
    import spark.implicits._
    Graft.enable(spark)
    assert(spark.sql("SELECT cosine_sim(array(2.0f), array(2.0f))").head()
      .getDouble(0) == 1.0)

    val docs = Graft.tables.documents(spark, sf0001).limit(50)
    val fp = docs.select(Graft.simHash(col("text")).as("sh"))
    assert(fp.filter(col("sh") >= 0 && col("sh") < (1L << 60)).count() == 50)

    val l = Seq((1L, 10L, "x")).toDF("k", "t", "p")
    val r = Seq((1L, 5L, 7L)).toDF("rk", "rt", "rid")
    val aj = Graft.asofJoin(l, r, "k", "rk", "t", "rt", Some("rid"))
    assert(aj.head().getAs[Long]("rid") == 7L)

    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    assert(Graft.saltedJoin(li, o, "o_orderkey").count() ==
      li.join(o, "o_orderkey").count())

    val ctr = Graft.centroidUdaf(64)
    val c = Tables.embeddings(spark, sf0001)
      .agg(ctr(col("embedding")).as("c")).head().getSeq[Double](0)
    assert(c.length == 64)
  }
}
