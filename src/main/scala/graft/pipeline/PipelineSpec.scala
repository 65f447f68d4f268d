package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Declarative pipeline specs: a JSON document compiled to a [[Pipeline]]
  * through the [[StandardOps]] registry — the engine's equivalent of the
  * reference's morphline config file (HOCON is a JSON superset, so a
  * morphline block converts mechanically to this shape):
  *
  * {{{
  * { "id": "readjson",
  *   "commands": [
  *     { "command": "readJson", "field": "value",
  *       "schema": "firstName STRING, age INT" },
  *     { "command": "extractJsonPaths", "paths": "first_name:firstName" } ] }
  * }}}
  *
  * Compilation happens once on the driver (MorphlineTransform.java:166-195
  * analogue); the result is a single composed Catalyst plan.
  */
object PipelineSpec {

  private val mapper = new ObjectMapper()

  def fromJson(json: String, registry: OpRegistry = StandardOps.registry): Pipeline = {
    val root = mapper.readTree(json)
    val id = Option(root.get("id")).map(_.asText).getOrElse("pipeline")
    val commands = Option(root.get("commands")).getOrElse(
      throw new IllegalArgumentException("pipeline spec needs a 'commands' array"))
    require(commands.isArray, "'commands' must be an array")
    val spec = commands.elements.asScala.toSeq.map { node =>
      val name = Option(node.get("command")).map(_.asText).getOrElse(
        throw new IllegalArgumentException(s"command entry missing 'command': $node"))
      val cfg = node.properties.asScala
        .filter(_.getKey != "command")
        .map(e => e.getKey -> e.getValue.asText)
        .toMap
      name -> cfg
    }
    StandardOps.compile(id, spec, registry)
  }
}
