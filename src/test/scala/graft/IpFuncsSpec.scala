package graft

import org.apache.spark.sql.functions._
import graft.functions.IpFuncs._

/** A7: IP expression edge cases, through the full (codegen) path. */
class IpFuncsSpec extends SparkSpecBase {

  test("aton/ntoa round-trip and malformed → null") {
    import spark.implicits._
    val df = Seq("0.0.0.0", "255.255.255.255", "10.1.2.3",
      "256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "1..2.3")
      .toDF("ip")
      .select($"ip", ip4_aton($"ip").as("n"), ip4_ntoa(ip4_aton($"ip")).as("rt"))
    val byIp = df.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)), Option(r.getString(2)))).toMap
    assert(byIp("0.0.0.0")._1.contains(0L))
    assert(byIp("255.255.255.255")._1.contains(4294967295L))
    assert(byIp("10.1.2.3")._1.contains(167838211L))
    assert(byIp("10.1.2.3")._2.contains("10.1.2.3"))
    for (bad <- Seq("256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "1..2.3"))
      assert(byIp(bad)._1.isEmpty, s"$bad should parse to null")
  }

  test("cidr containment incl /0 and /32 edges") {
    import spark.implicits._
    val cases = Seq(
      ("10.1.2.3", "10.0.0.0/8", true),
      ("11.1.2.3", "10.0.0.0/8", false),
      ("10.32.0.1", "10.32.0.0/11", true),
      ("10.64.0.1", "10.32.0.0/11", false),
      ("1.2.3.4", "0.0.0.0/0", true),
      ("1.2.3.4", "1.2.3.4/32", true),
      ("1.2.3.5", "1.2.3.4/32", false),
      ("1.2.3.4", "not-a-cidr", false),
      ("1.2.3.4", "1.2.3.4/33", false))
    val df = cases.toDF("ip", "cidr", "expected")
      .withColumn("got", ip4_in_cidr($"ip", $"cidr"))
    assert(df.where($"got" =!= $"expected").count() === 0)
  }

  test("private-range detection") {
    import spark.implicits._
    val df = Seq(
      ("10.0.0.1", true), ("172.16.0.1", true), ("172.31.255.255", true),
      ("172.32.0.0", false), ("192.168.5.5", true), ("8.8.8.8", false))
      .toDF("ip", "expected")
      .withColumn("got", ip4_is_private($"ip"))
    assert(df.where($"got" =!= $"expected").count() === 0)
  }
}
