package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.model.{SfField, SfSchema}

class SfSchemaSpec extends AnyFunSuite {

  /** Raw-ScalaCheck bridge (the scalatestplus bridge artifact is not in the
    * offline cache): run a Prop and assert it passed. */
  private def checkProp(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val fields = ParityQueries.leadDescribe

  test("compound parent is dropped, components kept (P2)") {
    val cols = SfSchema.fetchSfColumns(fields)
    val names = cols.map(_.sfName)
    assert(!names.contains("Address"))
    assert(names.contains("Street") && names.contains("City"))
  }

  test("soapType namespace is stripped via split(':').last") {
    val cols = SfSchema.fetchSfColumns(Seq(SfField("Id", "tns:ID", 18)))
    assert(cols.head.soapType === "ID")
  }

  test("rs_name is lowercased sf name") {
    val cols = SfSchema.fetchSfColumns(Seq(SfField("FirstName", "xsd:string", 40)))
    assert(cols.head.rsName === "firstname")
  }

  test("varchar(MAX) threshold is exactly >65535") {
    assert(SfSchema.dtConv("string", 65535, 0) === Some("varchar(65535)"))
    assert(SfSchema.dtConv("string", 65536, 0) === Some("varchar(MAX)"))
    assert(SfSchema.dtConv("textarea", 131072, 0) === Some("varchar(MAX)"))
  }

  test("dt_conv fixed-width mappings match the reference table") {
    assert(SfSchema.dtConv("email", 0, 0) === Some("varchar(80)"))
    assert(SfSchema.dtConv("ID", 0, 0) === Some("varchar(100)"))
    assert(SfSchema.dtConv("phone", 0, 0) === Some("varchar(40)"))
    assert(SfSchema.dtConv("url", 0, 0) === Some("varchar(256)"))
    assert(SfSchema.dtConv("dateTime", 0, 0) === Some("TIMESTAMP"))
    assert(SfSchema.dtConv("double", 0, 0) === Some("float8"))
    assert(SfSchema.dtConv("unknowntype", 0, 0) === None)
  }

  test("reconcile: empty destination → CREATE; partial → ALTERs; full → no-op (D3)") {
    val cols = SfSchema.fetchSfColumns(fields)
    val create = SfSchema.reconcile("s", "t", cols, Nil)
    assert(create.size === 1 && create.head.startsWith("CREATE TABLE IF NOT EXISTS s.t ("))
    val partial = SfSchema.reconcile("s", "t", cols, cols.map(_.rsName).drop(2))
    assert(partial.size === 2 && partial.forall(_.startsWith("ALTER TABLE s.t ADD COLUMN ")))
    assert(SfSchema.reconcile("s", "t", cols, cols.map(_.rsName)) === Nil)
  }

  test("column matching is case-insensitive (P4/P8)") {
    val cols = SfSchema.fetchSfColumns(Seq(SfField("FirstName", "xsd:string", 40)))
    assert(SfSchema.missingColumns(cols, Seq("FIRSTNAME")) === Nil)
  }

  test("copyColumnFilter preserves destination order (P9)") {
    val cols = SfSchema.fetchSfColumns(Seq(
      SfField("B", "xsd:string", 1), SfField("A", "xsd:string", 1)))
    assert(SfSchema.copyColumnFilter(Seq("a", "z", "b"), cols) === Seq("a", "b"))
  }

  test("jsonpaths are ordered by destination ordinal (N2)") {
    val cols = SfSchema.fetchSfColumns(fields)
    val out = SfSchema.jsonPathsFile(Seq("email", "id"), cols)
    assert(out === """{"jsonpaths": ["$['Email']", "$['Id']"]}""")
  }

  test("renderPath supports multi-level keys and array indices") {
    assert(SfSchema.renderPath(Seq(Left("a"), Left("b"), Right(0))) === "$['a']['b'][0]")
  }

  test("renderPath does not corrupt comma-bearing keys (reference bug not reproduced)") {
    assert(SfSchema.renderPath(Seq(Left("a,b"))) === "$['a,b']")
  }

  test("copyCommand golden string matches the reference template (K3)") {
    // ref: salesforce_schema_to_redshift_operator.py:271-294 — JSON +
    // jsonpaths load, REGION, epoch-millis timestamps, TRUNCATECOLUMNS,
    // stats updates off, double-braced credential placeholders untouched
    val got = SfSchema.copyCommand("sf_schema", "lead", Seq("id", "email"),
      "my-bucket", "lead/2024/01/01.json", "lead/jsonpaths.json")
    assert(got ===
      """COPY sf_schema.lead (id, email)
        |FROM 's3://my-bucket/lead/2024/01/01.json'
        |CREDENTIALS 'aws_access_key_id={{ access_key }};aws_secret_access_key={{ secret_key }}'
        |JSON 's3://my-bucket/lead/jsonpaths.json'
        |REGION as 'us-east-1'
        |TIMEFORMAT 'epochmillisecs'
        |TRUNCATECOLUMNS
        |COMPUPDATE OFF
        |STATUPDATE OFF""".stripMargin)
  }

  test("property: reconcile is idempotent — applying missing columns leaves nothing missing") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))
    val fieldGen = nameGen.map(n => SfField(n, "xsd:string", 10))
    checkProp(Prop.forAll(Gen.listOfN(8, fieldGen)) { fs =>
      val cols = SfSchema.fetchSfColumns(fs.distinctBy(_.name.toLowerCase))
      val missing = SfSchema.missingColumns(cols, cols.map(_.rsName).take(3))
      val afterApply = cols.map(_.rsName).take(3) ++ missing.map(_.rsName)
      SfSchema.missingColumns(cols, afterApply).isEmpty
    })
  }

  test("property: missing ∪ existing covers all source columns") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))
    checkProp(Prop.forAll(Gen.listOf(nameGen), Gen.listOf(nameGen)) { (src, dst) =>
      val cols = SfSchema.fetchSfColumns(
        src.distinctBy(_.toLowerCase).map(n => SfField(n, "xsd:string", 5)))
      val miss = SfSchema.missingColumns(cols, dst).map(_.rsName).toSet
      val existing = dst.map(_.toLowerCase).toSet
      cols.map(_.rsName).forall(c => miss.contains(c) || existing.contains(c))
    })
  }
}
