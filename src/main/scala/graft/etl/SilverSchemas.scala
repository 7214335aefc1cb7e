package graft.etl

import org.apache.spark.sql.types._

/** Typed Silver schemas — Spark mapping of `model.sql:14-354`
  * (SURVEY §1.2 type table). SERIAL -> Int, TEXT -> String,
  * NUMERIC -> Double (reference feeds JS floats), DATE -> Date,
  * audit TIMESTAMPTZ -> Timestamp (session pinned UTC). */
object SilverSchemas {
  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)
  private val audit = Seq(
    f("date_created", TimestampType), f("date_updated", TimestampType))

  /** `model.sql:27-37` */
  val empresa: StructType = StructType(Seq(
    f("carrier_id", IntegerType, nullable = false),
    f("carrier_name", StringType),
    f("carrier_rut", StringType),
    f("carrier_bp", StringType),
    f("carrier_type_id", IntegerType)) ++ audit)

  /** `model.sql:238-251` */
  val conductor: StructType = StructType(Seq(
    f("conductor_id", IntegerType, nullable = false),
    f("carrier_id", IntegerType),
    f("conductor_rol_id", IntegerType),
    f("conductor_nombre", StringType),
    f("conductor_rut", StringType),
    f("conductor_fecha_nacimiento", DateType),
    f("conductor_telefono", StringType),
    f("conductor_email", StringType)) ++ audit)

  /** `model.sql:106-132` */
  val vehiculo: StructType = StructType(Seq(
    f("vehicle_id", IntegerType, nullable = false),
    f("registration_plate", StringType),
    f("carrier_id", IntegerType),
    f("year_of_manufacture", IntegerType),
    f("gps", BooleanType),
    f("engine_number", StringType),
    f("chassis_number", StringType),
    f("vin", StringType),
    f("odometer_km", IntegerType),
    f("cortina", StringType),
    f("instalacion_cortina", DateType),
    f("parrilla", BooleanType),
    f("peso", DoubleType),
    f("largo", DoubleType),
    f("ancho", DoubleType),
    f("alto", DoubleType),
    f("mop_clasification", StringType),
    f("nominal_pallet", IntegerType),
    f("vehicle_type_id", IntegerType),
    f("vehicle_designation_id", IntegerType),
    f("vehicle_model_id", IntegerType)) ++ audit)

  /** `model.sql:259-270` */
  val hojaVida: StructType = StructType(Seq(
    f("hoja_vida_id", IntegerType, nullable = false),
    f("conductor_id", IntegerType),
    f("folio", StringType),
    f("codigo_verificacion", StringType),
    f("fecha_emision", DateType),
    f("comuna", StringType),
    f("domicilio", StringType)) ++ audit)

  /** `model.sql:277-285` */
  val hojaVidaRestriccion: StructType = StructType(Seq(
    f("hoja_vida_restriccion_id", IntegerType, nullable = false),
    f("hoja_vida_id", IntegerType),
    f("fecha_anotacion", DateType),
    f("restriccion", StringType)) ++ audit)

  /** `model.sql:292-303` */
  val hojaVidaInfraccion: StructType = StructType(Seq(
    f("hoja_vida_infraccion_id", IntegerType, nullable = false),
    f("hoja_vida_id", IntegerType),
    f("proceso", StringType),
    f("tribunal", StringType),
    f("fecha_denuncia", DateType),
    f("infraccion", StringType),
    f("resolucion", StringType)) ++ audit)

  /** `model.sql:324-334` */
  val licencia: StructType = StructType(Seq(
    f("licencia_id", IntegerType, nullable = false),
    f("conductor_id", IntegerType),
    f("municipalidad", StringType),
    f("fecha_de_control", DateType),
    f("fecha_ultimo_control", DateType),
    f("codigo", StringType)) ++ audit)

  /** `model.sql:341-348` */
  val licenciaClase: StructType = StructType(Seq(
    f("licencia_clase_id", IntegerType, nullable = false),
    f("licencia_id", IntegerType),
    f("clase_licencia_id", IntegerType)) ++ audit)

  /** `model.sql:194-214` */
  val revisionTecnica: StructType = StructType(Seq(
    f("revision_tecnica_id", IntegerType, nullable = false),
    f("vehicle_id", IntegerType),
    f("fecha_revision_tecnica", DateType),
    f("fecha_vencimiento_revision_tecnica", DateType)) ++
    Seq("emissions_crt_status", "identification_status", "visual_status",
      "lights_status", "alignment_status", "brakes_status",
      "clearances_status", "emissions_status", "opacity_status",
      "steering_angle_status", "noise_status", "suspension_status")
      .map(f(_, BooleanType)) ++ audit)

  /** `model.sql:178-187` */
  val permisoCirculacion: StructType = StructType(Seq(
    f("permiso_circulacion_id", IntegerType, nullable = false),
    f("vehicle_id", IntegerType),
    f("municipalidad", StringType),
    f("fecha_emision", DateType),
    f("fecha_vencimiento", DateType)) ++ audit)

  /** `model.sql:162-171` */
  val soap: StructType = StructType(Seq(
    f("soap_id", IntegerType, nullable = false),
    f("vehicle_id", IntegerType),
    f("numero_poliza", LongType),
    f("institucion_aseguradora", StringType),
    f("fecha_vencimiento_poliza", DateType)) ++ audit)

  /** `model.sql:142-155` */
  val cav: StructType = StructType(Seq(
    f("certificado_anotaciones_vigentes_id", IntegerType, nullable = false),
    f("vehicle_id", IntegerType),
    f("folio", StringType),
    f("codigo_verificacion", StringType),
    f("fecha_emision", DateType),
    f("limitaciones_al_dominio", StringType),
    f("nombre_propietario", StringType),
    f("rut_propietario", StringType),
    f("fecha_adquisicion", DateType)) ++ audit)

  /** `model.sql:91-99` — composite-key dim (brand FK + model name). */
  val vehiculoModelo: StructType = StructType(Seq(
    f("vehicle_model_id", IntegerType, nullable = false),
    f("vehicle_model", StringType),
    f("vehicle_brand_id", IntegerType)) ++ audit)

  /** Quarantine for rejected rows (H6/H7): original bronze columns are
    * kept by the pipeline; this suffix is appended. */
  val rejectSuffix: Seq[StructField] = Seq(
    f("error_reason", StringType), f("_source_file", StringType))
}
