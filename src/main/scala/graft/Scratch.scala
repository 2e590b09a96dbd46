package graft

// temporary dev harness — not part of the engine
object Scratch {
  def main(args: Array[String]): Unit = {
    // LSH plane integer pre-images (12 planes x 64 dims)
    val pi = graft.functions.LshPlanes.planeInts(12, 64)
    println("PLANES " + pi.map(_.mkString(",")).mkString(";"))
    // portable simhash test vectors
    val cases = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("héllo", "中文", "a1_b"),
      Seq(),
      Seq("zzz"))
    cases.foreach { toks =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      println("SIMHASH " + toks.mkString("|") + " = " + graft.functions.PortableSimHash.simhash(arr))
    }
    println("ACOEF " + (0 until 64).map(graft.functions.PortableSimHash.aCoef).mkString(","))
    println("CCOEF " + (0 until 64).map(graft.functions.PortableSimHash.cCoef).mkString(","))
  }
}
