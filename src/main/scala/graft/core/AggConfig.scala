package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Aggregation configuration — the Spark-native analog of the reference's
  * Config (reference: /root/reference/ncagg/config.py:27-382): ordered
  * dimension, variable, and global-attribute specs, serializable to/from
  * the same JSON template shape the reference CLI consumes (`-t`).
  *
  * Mapping to the relational model: a dimension with `size == None` (the
  * unlimited dimension) is the row axis; a variable is a column; fixed-size
  * dimensions beyond the row axis are array columns; global attributes are
  * computed per aggregation run with the strategies in
  * [[AttributeStrategies]].
  */
object AggConfig {

  /** reference config.py:209-259 (DimensionConfig schema). */
  final case class DimSpec(
      name: String,
      size: Option[Long],
      indexBy: Option[String] = None,
      min: Option[Long] = None, // epoch micros (or index-var units)
      max: Option[Long] = None,
      /** Expected cadence per dimension of the index variable, keyed by
        * dimension name (reference config.py:232, cli.py:200-202): a
        * multidim index variable gets one cadence per dimension — e.g.
        * time(record, sample) with 1 Hz reports of 10 Hz samples. */
      expectedCadence: Map[String, Double] = Map.empty,
      flatten: Boolean = false,
      otherDimInds: Map[String, Int] = Map.empty) {
    def isUnlimited: Boolean = size.isEmpty
    /** Cadence along this dimension itself (the single-cadence case). */
    def cadenceHz: Option[Double] = expectedCadence.get(name)
  }

  /** reference config.py:262-303 (VariableConfig schema). */
  final case class VarSpec(
      name: String,
      dimensions: Seq[String],
      datatype: String,
      attributes: Map[String, String] = Map.empty,
      chunksizes: Option[Seq[Int]] = None,
      copyFromAlt: Seq[String] = Nil,
      mapTo: Option[String] = None)

  /** reference config.py:355-371 (GlobalAttributeConfig schema). */
  final case class AttrSpec(
      name: String,
      strategy: String = "first",
      value: Option[String] = None)

  final case class Config(
      dims: Seq[DimSpec],
      vars: Seq[VarSpec],
      attrs: Seq[AttrSpec],
      /** reference README "Specify Dimension Indecies to Extract and
        * Flatten" (`take_dim_indicies`) — declared but NOT IMPLEMENTED in
        * the reference; implemented here: extract index i of a fixed inner
        * dimension from every variable that carries it. */
      takeDimInds: Map[String, Int] = Map.empty) {

    def dim(name: String): Option[DimSpec] = dims.find(_.name == name)

    /** Primary unlimited indexed dimension (reference aggregator.py:87-91:
      * first is_primary, else first index_by dim). */
    def primaryUdim: Option[DimSpec] =
      dims.find(d => d.isUnlimited && d.indexBy.isDefined && !d.flatten)

    /** Per-field + inter-validation (reference config.py:10-25 cerberus
      * schemas and 160-186 ConfigDict.__setitem__): every variable
      * dimension must be configured, every index_by variable must exist,
      * sizes must be positive (or the -1 "unknown inner size" marker),
      * chunksizes must align with dimensions, and a dimension without
      * index_by is normalized to carry no bounds/cadence/other-dim-inds
      * (the reference silently clears them the same way). */
    def validate(): Config = {
      dims.foreach { d =>
        require(d.name.nonEmpty, "dimension with empty name")
        d.size.foreach(sz => require(sz >= 1 || sz == -1L,
          s"dimension ${d.name}: size must be >= 1 (or -1 for unknown), " +
            s"got $sz"))
        d.expectedCadence.foreach { case (k, hz) =>
          require(hz > 0, s"dimension ${d.name}: expected_cadence[$k] " +
            s"must be positive, got $hz")
        }
        d.otherDimInds.foreach { case (k, i) =>
          require(i >= 0, s"dimension ${d.name}: other_dim_indicies[$k] " +
            s"must be >= 0, got $i")
        }
      }
      val dimNames = dims.map(_.name).toSet
      vars.foreach { v =>
        require(v.name.nonEmpty, "variable with empty name")
        val bad = v.dimensions.filterNot(dimNames)
        require(bad.isEmpty,
          s"variable ${v.name} depends on unconfigured dimension: $bad")
        v.chunksizes.foreach(cs => require(cs.length == v.dimensions.length,
          s"variable ${v.name}: required len(dims) == len(chunksizes), " +
            s"got ${v.dimensions.length} != ${cs.length}"))
      }
      val varNames = vars.map(v => v.mapTo.getOrElse(v.name)).toSet ++
        vars.map(_.name)
      val badIdx = dims.flatMap(_.indexBy).filterNot(varNames)
      require(badIdx.isEmpty, s"index_by variable not found: $badIdx")
      val okStrategies = AttributeStrategies.names
      attrs.foreach { a =>
        require(a.name.nonEmpty, "attribute with empty name")
        require(okStrategies(a.strategy),
          s"attribute ${a.name}: unknown strategy ${a.strategy}")
      }
      // normalization: no index_by -> no bounds/cadence/other-dim-inds
      // (reference DimensionConfig.__setitem__, config.py:241-247)
      val normDims = dims.map { d =>
        if (d.indexBy.isEmpty)
          d.copy(min = None, max = None,
            expectedCadence = Map.empty, otherDimInds = Map.empty)
        else d
      }
      copy(dims = normDims)
    }
  }

  /** Parse the reference's JSON template shape (lists of objects to
    * preserve ordering; reference config.py:95-121). */
  def fromJson(json: String): Config = {
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)

    def str(v: JValue): Option[String] = v match {
      case JString(s) => Some(s)
      case JInt(i) => Some(i.toString)
      case JDouble(d) => Some(d.toString)
      case JBool(b) => Some(b.toString)
      case _ => None
    }

    val dims = (root \ "dimensions") match {
      case JArray(ds) => ds.map { d =>
        DimSpec(
          name = (d \ "name").extract[String],
          size = (d \ "size").extractOpt[Long],
          indexBy = (d \ "index_by").extractOpt[String],
          min = (d \ "min").extractOpt[Long],
          max = (d \ "max").extractOpt[Long],
          expectedCadence = (d \ "expected_cadence") match {
            case JObject(fields) =>
              fields.collect {
                case (k, JDouble(hz)) => k -> hz
                case (k, JInt(hz)) => k -> hz.toDouble
              }.toMap
            case _ => Map.empty[String, Double]
          },
          flatten = (d \ "flatten").extractOpt[Boolean].getOrElse(false),
          otherDimInds = (d \ "other_dim_indicies") match {
            case JObject(fields) =>
              fields.collect { case (k, JInt(v)) => k -> v.toInt }.toMap
            case _ => Map.empty[String, Int]
          })
      }
      case _ => Nil
    }

    val vars = (root \ "variables") match {
      case JArray(vs) => vs.map { v =>
        VarSpec(
          name = (v \ "name").extract[String],
          dimensions = (v \ "dimensions").extractOpt[Seq[String]]
            .getOrElse(Nil),
          datatype = (v \ "datatype").extractOpt[String].getOrElse("double"),
          attributes = (v \ "attributes") match {
            case JObject(fields) =>
              fields.flatMap { case (k, jv) => str(jv).map(k -> _) }.toMap
            case _ => Map.empty[String, String]
          },
          // json4s extracts a MISSING field as Some(empty seq) for
          // collection types — normalize to None so absent == absent
          chunksizes = (v \ "chunksizes").extractOpt[Seq[Int]]
            .filter(_.nonEmpty),
          copyFromAlt = (v \ "copy_from_alt").extractOpt[Seq[String]]
            .getOrElse(Nil),
          mapTo = (v \ "map_to").extractOpt[String])
      }
      case _ => Nil
    }

    val attrs = (root \ "attributes") match {
      case JArray(as) => as.map { a =>
        AttrSpec(
          name = (a \ "name").extract[String],
          strategy = (a \ "strategy").extractOpt[String].getOrElse("first"),
          value = str(a \ "value"))
      }
      case _ => Nil
    }

    val takeDimInds = (root \ "take_dim_indicies") match {
      case JObject(fields) =>
        fields.collect { case (k, JInt(v)) => k -> v.toInt }.toMap
      case _ => Map.empty[String, Int]
    }

    Config(dims, vars, attrs, takeDimInds).validate()
  }

  /** Serialize a config to the same template JSON [[fromJson]] parses —
    * the reference `Config.to_dict` + `--generate_template` path
    * (cli.py:103-117): `fromJson(toJson(c))` round-trips. */
  def toJson(c: Config): String = {
    import org.json4s.JsonDSL._
    val dims = c.dims.map { d =>
      ("name" -> d.name) ~
        ("size" -> d.size) ~
        ("index_by" -> d.indexBy) ~
        ("min" -> d.min) ~
        ("max" -> d.max) ~
        ("expected_cadence" ->
          (if (d.expectedCadence.isEmpty) None
           else Some(JObject(d.expectedCadence.toList.sortBy(_._1).map {
             case (k, hz) => k -> (JDouble(hz): JValue)
           })))) ~
        ("flatten" -> d.flatten) ~
        ("other_dim_indicies" ->
          (if (d.otherDimInds.isEmpty) None
           else Some(d.otherDimInds.view.mapValues(v => v: BigInt).toMap)))
    }
    val vars = c.vars.map { v =>
      ("name" -> v.name) ~
        ("dimensions" -> v.dimensions) ~
        ("datatype" -> v.datatype) ~
        ("attributes" -> v.attributes) ~
        ("chunksizes" -> v.chunksizes) ~
        ("copy_from_alt" ->
          (if (v.copyFromAlt.isEmpty) None else Some(v.copyFromAlt))) ~
        ("map_to" -> v.mapTo)
    }
    val attrs = c.attrs.map { a =>
      ("name" -> a.name) ~ ("strategy" -> a.strategy) ~ ("value" -> a.value)
    }
    val root =
      ("dimensions" -> dims) ~ ("variables" -> vars) ~
        ("attributes" -> attrs) ~
        ("take_dim_indicies" ->
          (if (c.takeDimInds.isEmpty) None
           else Some(c.takeDimInds.view.mapValues(v => v: BigInt).toMap)))
    JsonMethods.pretty(JsonMethods.render(root))
  }

  /** Default config from a sample granule (reference Config.from_nc,
    * config.py:123-138): the row axis becomes the unlimited dimension,
    * every column a variable, array columns get a fixed inner dim. */
  def fromGranule(df: org.apache.spark.sql.DataFrame,
      udimName: String = "record", indexBy: Option[String] = None): Config = {
    import org.apache.spark.sql.types._
    val innerDims = scala.collection.mutable.ArrayBuffer[DimSpec]()
    val vars = df.schema.fields.map { f =>
      f.dataType match {
        case ArrayType(_, _) =>
          val dn = s"${f.name}_dim"
          innerDims += DimSpec(dn, size = Some(-1L))
          VarSpec(f.name, Seq(udimName, dn), f.dataType.simpleString)
        case _ => VarSpec(f.name, Seq(udimName), f.dataType.simpleString)
      }
    }
    Config(
      DimSpec(udimName, size = None, indexBy = indexBy) +: innerDims.toSeq,
      vars.toIndexedSeq, Nil)
  }
}
