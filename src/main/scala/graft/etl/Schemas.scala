package graft.etl

import org.apache.spark.sql.types._

/** Bronze contracts: every column is a string (the reference's catalog
  * types all Bronze columns `Text`; SURVEY §1.1). Headers per
  * `README.md:47,71,96` and the Bronce sheet. */
object BronzeSchemas {
  private def allString(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  /** `*empresa*.csv` (`README.md:47`). */
  val empresa: StructType = allString(
    "carrier_bp", "carrier_name", "carrier_tin", "carrier_type")

  /** `*conductor*.csv` (`README.md:71`). */
  val conductor: StructType = allString(
    "driver_name", "national_id", "birth_date", "phone_number", "email",
    "carrier_bp", "driver_role",
    "hoja_de_vida_data", "licencia_frontal_data", "licencia_reverso_data")

  /** `*vehiculo*.csv` (Bronce sheet + `services/vehiculo.ts:178-318`). */
  val vehiculo: StructType = allString(
    "registration_plate", "carrier_bp", "year_of_manufacture", "gps",
    "engine_number", "chassis_number", "vin", "odometer_km", "cortina",
    "instalacion_cortina", "vehicle_type", "vehicle_designation", "parrilla",
    "peso", "largo", "ancho", "alto", "mop_clasification", "nominal_pallet",
    "vehicle_make", "vehicle_model",
    "fecha_revision_tecnica", "fecha_vencimiento_revision_tecnica",
    "emissions_crt_status", "identification_status", "visual_status",
    "lights_status", "alignment_status", "brakes_status", "clearances_status",
    "emissions_status", "opacity_status", "steering_angle_status",
    "noise_status", "suspension_status",
    "permiso_circulacion_data", "certificado_anotaciones_vigentes_data",
    "soap_data")
}

/** Schemas for the six escaped-JSON Bronze columns (OCR payloads) —
  * shapes from `etl-gcs-cloudsql/src/types/conductor.ts:1-50` and
  * `types/vehiculo.ts:1-23`. All fields optional (schema-on-read with
  * optional chaining in the reference). */
object PayloadSchemas {
  private def s(n: String) = StructField(n, StringType, nullable = true)

  val restriccion: StructType =
    StructType(Seq(s("fechaAnotacion"), s("bloqueRestriccionLicencia")))
  val duracion: StructType =
    StructType(Seq(s("fechaAnotacion"), s("bloqueDuracionRestringida")))
  val infraccion: StructType = StructType(Seq(
    s("procesoNumero"), s("tribunal"), s("fechaDenuncia"),
    s("infraccion"), s("resolucion")))

  /** `hoja_de_vida_data` (`types/conductor.ts:1-30`). */
  val hojaVida: StructType = StructType(Seq(
    StructField("certificado", StructType(Seq(
      s("folio"), s("fechaEmision"), s("codigoVerificacion"))), nullable = true),
    StructField("persona", StructType(Seq(
      s("comuna"), s("domicilio"),
      StructField("restriccionesLicencia", ArrayType(restriccion), nullable = true),
      StructField("duracionesRestringidas", ArrayType(duracion), nullable = true),
      StructField("infraccionesRegistradas", ArrayType(infraccion), nullable = true)
    )), nullable = true)))

  /** `licencia_frontal_data` (`types/conductor.ts:33-44`). */
  val licenciaFrontal: StructType = StructType(Seq(
    StructField("clase", ArrayType(StringType), nullable = true),
    s("municipalidad"), s("fecha_de_control"), s("fecha_ultimo_control")))

  /** `licencia_reverso_data` (`types/conductor.ts:46-50`). */
  val licenciaReverso: StructType = StructType(Seq(s("codigo")))

  /** `permiso_circulacion_data` (`types/vehiculo.ts:1-6`). */
  val permisoCirculacion: StructType = StructType(Seq(
    s("municipalidad"), s("fecha_emision"), s("fecha_vencimiento")))

  /** `soap_data` (`types/vehiculo.ts:8-12`): numero_poliza is a JSON
    * number -> BIGINT (`model.sql:166`). */
  val soap: StructType = StructType(Seq(
    StructField("numero_poliza", LongType, nullable = true),
    s("institucion_aseguradora"), s("fecha_vencimiento_poliza")))

  /** `certificado_anotaciones_vigentes_data` (`types/vehiculo.ts:14-23`). */
  val cav: StructType = StructType(Seq(
    s("folio"), s("codigo_verificacion"), s("fecha_emision"),
    s("limitaciones_al_dominio"),
    StructField("datos_propietario_actual", StructType(Seq(
      s("nombre"), s("rut"), s("fecha_adquisicion"))), nullable = true)))
}
