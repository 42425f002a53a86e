package graft

/** Test-scope helper main: writes the boundary-relation PBF fixture used
  * by the spark-submit CLI smoke (`--osm-pbf`). Usage:
  *   sbt "Test/runMain graft.MakePbfFixture /tmp/graftpbf/boundary.pbf"
  */
object MakePbfFixture {
  val boundaryXml: String =
    """<?xml version='1.0' encoding='UTF-8'?>
      |<osm version="0.6">
      |  <node id="1" lat="0.001" lon="0.001"/>
      |  <node id="2" lat="10.001" lon="0.001"/>
      |  <node id="3" lat="10.001" lon="10.001"/>
      |  <node id="4" lat="0.001" lon="10.001"/>
      |  <node id="5" lat="4.001" lon="4.001"/>
      |  <node id="6" lat="6.001" lon="4.001"/>
      |  <node id="7" lat="6.001" lon="6.001"/>
      |  <node id="8" lat="4.001" lon="6.001"/>
      |  <way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/></way>
      |  <way id="101"><nd ref="1"/><nd ref="4"/><nd ref="3"/></way>
      |  <way id="102"><nd ref="5"/><nd ref="6"/><nd ref="7"/><nd ref="8"/><nd ref="5"/></way>
      |  <relation id="200">
      |    <member type="way" ref="100" role="outer"/>
      |    <member type="way" ref="101" role="outer"/>
      |    <member type="way" ref="102" role="inner"/>
      |    <tag k="type" v="boundary"/>
      |  </relation>
      |</osm>""".stripMargin

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graftpbf/boundary.pbf")
    new java.io.File(out).getParentFile.mkdirs()
    PbfTestWriter.write(out,
      graft.sources.OsmXml.parseDocument(boundaryXml).toSeq, perBlob = 4)
    println(s"wrote $out")
  }
}
