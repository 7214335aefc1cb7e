package graft.etl

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Dataset

/** Typed public API over the Silver layer (SURVEY §1.4: `Dataset[T]`
  * case classes for the entity tables; `DataFrame` remains the surface
  * for dynamic/child tables). Field names match the parquet columns,
  * so `as[T]` is a checked, zero-copy view — encoders catch schema
  * drift at analysis time rather than on first access.
  */
object SilverApi {

  /** `model.sql:27-37` */
  case class Empresa(carrier_id: Int, carrier_name: Option[String],
                     carrier_rut: Option[String], carrier_bp: Option[String],
                     carrier_type_id: Option[Int],
                     date_created: Option[Timestamp],
                     date_updated: Option[Timestamp])

  /** `model.sql:238-251` */
  case class Conductor(conductor_id: Int, carrier_id: Option[Int],
                       conductor_rol_id: Option[Int],
                       conductor_nombre: Option[String],
                       conductor_rut: Option[String],
                       conductor_fecha_nacimiento: Option[Date],
                       conductor_telefono: Option[String],
                       conductor_email: Option[String],
                       date_created: Option[Timestamp],
                       date_updated: Option[Timestamp])

  /** `model.sql:106-132` (scalar subset used by the typed surface) */
  case class Vehiculo(vehicle_id: Int, registration_plate: Option[String],
                      carrier_id: Option[Int],
                      year_of_manufacture: Option[Int], gps: Option[Boolean],
                      engine_number: Option[String],
                      chassis_number: Option[String], vin: Option[String],
                      odometer_km: Option[Int], cortina: Option[String],
                      instalacion_cortina: Option[Date],
                      parrilla: Option[Boolean], peso: Option[Double],
                      largo: Option[Double], ancho: Option[Double],
                      alto: Option[Double], mop_clasification: Option[String],
                      nominal_pallet: Option[Int], vehicle_type_id: Option[Int],
                      vehicle_designation_id: Option[Int],
                      vehicle_model_id: Option[Int],
                      date_created: Option[Timestamp],
                      date_updated: Option[Timestamp])

  def empresas(store: SilverStore): Dataset[Empresa] = {
    val spark = store.spark
    import spark.implicits._
    store.read("empresa", SilverSchemas.empresa).as[Empresa]
  }

  def conductores(store: SilverStore): Dataset[Conductor] = {
    val spark = store.spark
    import spark.implicits._
    store.read("conductor", SilverSchemas.conductor).as[Conductor]
  }

  def vehiculos(store: SilverStore): Dataset[Vehiculo] = {
    val spark = store.spark
    import spark.implicits._
    store.read("vehiculo", SilverSchemas.vehiculo).as[Vehiculo]
  }
}
