package graft.lake

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: render → parse is the identity over the metadata shapes
  * the lake actually persists (nested tables, scalars, arrays, inline
  * tables inside arrays). Pure JVM — no Spark session. */
object TomlProps extends Properties("graft-toml") {

  private val mapper = TimeFly.mapper

  private val key: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const('_')), (1, Gen.const('-'))))
  } yield (h :: t).mkString

  // printable strings incl. escapes; "None" excluded (the rtoml
  // replacer convention deliberately maps it to null)
  private val strVal: Gen[String] = Gen
    .listOf(Gen.frequency(
      (20, Gen.choose(32.toChar, 126.toChar)),
      (1, Gen.oneOf('\n', '\t', '"', '\\'))))
    .map(_.mkString)
    .suchThat(_ != "None")

  private val scalar: Gen[JsonNode] = Gen.oneOf(
    strVal.map(mapper.getNodeFactory.textNode),
    Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      .map(mapper.getNodeFactory.numberNode(_): JsonNode),
    Gen.choose(-1e12, 1e12).map(mapper.getNodeFactory.numberNode(_): JsonNode),
    Gen.oneOf(true, false).map(mapper.getNodeFactory.booleanNode),
    Gen.const(mapper.nullNode(): JsonNode),
    // bare date-time flavor (round-trips unquoted)
    Gen.choose(1, 28).map(d =>
      mapper.getNodeFactory.textNode(f"2024-03-$d%02dT10:00:00+01:00"))
  )

  private val arrayVal: Gen[JsonNode] =
    Gen.listOfN(3, scalar).map { vs =>
      val a = mapper.createArrayNode()
      vs.foreach(a.add)
      a: JsonNode
    }

  private def tableOf(depth: Int): Gen[ObjectNode] =
    Gen.listOfN(4, key).flatMap { ks =>
      Gen.sequence[List[JsonNode], JsonNode](
        ks.distinct.map(_ =>
          if (depth <= 0) Gen.oneOf(scalar, arrayVal)
          else Gen.frequency(
            (4, Gen.oneOf(scalar, arrayVal)),
            (1, tableOf(depth - 1).map(t => t: JsonNode))))
      ).map { vs =>
        val o = mapper.createObjectNode()
        ks.distinct.zip(vs).foreach { case (k, v) =>
          o.set[JsonNode](k, v)
        }
        o
      }
    }

  property("render -> parse is identity") = forAll(tableOf(2)) { node =>
    Toml.parse(Toml.render(node)) == node
  }

  property("parse maps \"None\" strings to null, render maps back") =
    forAll(key) { k =>
      val parsed = Toml.parse(s"""$k = "None"""")
      parsed.get(k).isNull &&
        Toml.parse(Toml.render(parsed)) == parsed
    }
}
