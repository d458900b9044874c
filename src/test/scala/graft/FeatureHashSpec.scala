package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Md5Long60Expr
import graft.operators.FeatureHash

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private def h60(s: String): Long = Md5Long60Expr.hash(UTF8String.fromString(s))

  private def refHashed(text: String, dim: Int, signed: Boolean): Map[Long, Long] = {
    val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim match {
      case "" => Seq.empty[String]
      case t => t.split(" ").toSeq
    }
    toks.foldLeft(Map.empty[Long, Long]) { (m, tok) =>
      val j = java.lang.Math.floorMod(h60(tok), dim.toLong)
      val c = if (!signed) 1L else if (java.lang.Math.floorMod(h60("sign:" + tok), 2L) == 0L) 1L else -1L
      m.updated(j, m.getOrElse(j, 0L) + c)
    }.filter(_._2 != 0L)
  }

  test("hashed TF matches the reference formula, signed and unsigned") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "theta")
    val docs = (0L until 60L).map { i =>
      (i, (1 to (2 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (signed <- Seq(true, false)) {
      val got = FeatureHash.hashedTf(df, "text", "doc_id", dim = 16, signed = signed)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
      docs.foreach { case (i, text) =>
        val want = refHashed(text, 16, signed)
        assert(got.getOrElse(i, Map.empty) === want, s"doc $i signed=$signed")
      }
    }
  }

  test("collisions accumulate within a bucket; dim bounds indexes") {
    val df = Seq((1L, "tok tok tok")).toDF("doc_id", "text")
    val out = FeatureHash.hashedTf(df, "text", "doc_id", dim = 4, signed = false)
      .as[(Long, Long, Long)].collect()
    assert(out.length === 1)
    assert(out.head._3 === 3L)
    assert(out.head._2 >= 0L && out.head._2 < 4L)
  }

  test("empty and null text produce no rows") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "word"))
      .toDF("doc_id", "text")
    val out = FeatureHash.hashedTf(df, "text", "doc_id", dim = 8)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(3L))
  }

  test("toDense round-trips the sparse form") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("doc_id", "text")
    val sparse = FeatureHash.hashedTf(df, "text", "doc_id", dim = 8, signed = true)
    val dense = FeatureHash.toDense(sparse, "doc_id", dim = 8)
      .as[(Long, Seq[Double])].collect().toMap
    val sp = sparse.as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    for ((id, vec) <- dense) {
      assert(vec.length === 8)
      vec.zipWithIndex.foreach { case (v, j) =>
        assert(v === sp(id).getOrElse(j.toLong, 0L).toDouble, s"id $id j $j")
      }
    }
  }
}
