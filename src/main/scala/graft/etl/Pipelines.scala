package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => F}

/** Result counters per processed file batch — the Spark equivalent of
  * the reference's per-file `rowCount/processedCount/errorCount` logs
  * (SURVEY §2 D3, e.g. `services/empresa.ts:119-121`), plus the
  * quarantine DataFrame (H6/H7: per-row transactions + error capture
  * become validate-and-split). */
final case class EtlResult(rowCount: Long, processed: Long, errors: Long,
                           rejects: DataFrame)

private[etl] object PipelineUtil {
  /** Assign append surrogate ids: `maxExisting + row_number` ordered by
    * `orderCols` — deterministic replacement for SERIAL + RETURNING.
    * The window is global but runs on the batch delta only. */
  def withSurrogateId(df: DataFrame, idCol: String, maxId: Int,
                      orderCols: Seq[Column]): DataFrame =
    df.withColumn(idCol,
      (row_number().over(Window.orderBy(orderCols: _*)) + lit(maxId))
        .cast("int"))

  def maxIdOf(store: SilverStore, table: String,
              schema: org.apache.spark.sql.types.StructType,
              idCol: String): Int =
    store.read(table, schema).agg(coalesce(max(col(idCol)), lit(0)))
      .collect()(0).getInt(0)

  /** Conform to a Silver schema: select columns in order, cast, stamp
    * audit timestamps. */
  def conformTo(df: DataFrame,
                schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val now = current_timestamp()
    df.select(schema.fields.map { f =>
      f.name match {
        case "date_created" => now.as("date_created")
        case "date_updated" => now.as("date_updated")
        case n => col(n).cast(f.dataType).as(n)
      }
    }.toIndexedSeq: _*)
  }

  /** D3 run counters in ONE aggregation job over the flagged frame
    * (count(col) counts non-nulls) — separate `bronze.count()` +
    * `rejects.count()` would re-execute the scan+validate subtree
    * twice. */
  def counts(flagged: DataFrame): (Long, Long, Long) = {
    val row = flagged.agg(count(lit(1)), count(col("error_reason"))).head
    val total = row.getLong(0)
    val errs = row.getLong(1)
    (total, total - errs, errs)
  }

  /** H6/H7: persist rejects to an append-only quarantine table (the
    * Spark-native generalization of the reference's per-row error log,
    * `services/empresa.ts:110-116`) — all Bronze columns as landed,
    * plus `error_reason` and the file/row provenance. Partitioned by
    * `_load_date` so "show me yesterday's rejects" prunes to one
    * partition directory. */
  def quarantine(store: SilverStore, entity: String, rejects: DataFrame): Unit =
    store.appendPartitioned(s"quarantine_$entity", rejects, Seq("_load_date"))
}

/** Companies ETL (`services/empresa.ts:1-131`, SURVEY §2 B1/B4/D1/H1).
  *
  * bronze -> cleanse (F1/F2) -> validate-split -> tipo_empresa
  * get-or-create -> last-wins dedup -> MERGE into empresa on carrier_bp.
  */
object EmpresaPipeline {
  import PipelineUtil._

  def run(store: SilverStore, bronze: DataFrame): EtlResult = {
    // B1 cleanse + rename (`empresa.ts:55-58`)
    val conformed = bronze
      .withColumn("carrier_type_c", F.clean_text(col("carrier_type")))
      .withColumn("carrier_name_c", F.clean_text(col("carrier_name")))
      .withColumn("carrier_bp_c", F.clean_text(col("carrier_bp")))
      .withColumn("carrier_rut", F.rut_format(col("carrier_tin")))

    // B4 required-field predicate (`empresa.ts:63-69`)
    val reason = when(col("_corrupt").isNotNull, "fila corrupta")
      .when(col("carrier_type_c").isNull, "carrier_type vacío")
      .when(col("carrier_name_c").isNull, "carrier_name vacío")
      .when(col("carrier_rut").isNull,
        concat(lit("RUT inválido: '"), coalesce(col("carrier_tin"), lit("")), lit("'")))
      .when(col("carrier_bp_c").isNull, "carrier_bp vacío")
    val flagged = conformed.withColumn("error_reason", reason)
      // one materialization feeds counts, quarantine, and the merge
      // source instead of three scan+validate re-executions
      .persist()
    val rejects = flagged.filter(col("error_reason").isNotNull)
      .select((bronze.columns.map(col) :+ col("error_reason")).toIndexedSeq: _*)
    val accepted = flagged.filter(col("error_reason").isNull)

    // D1 get-or-create tipo_empresa (`empresa.ts:73-90`)
    val tipoDim = DimOps.sync(store, "tipo_empresa", "carrier_type_id",
      Seq("carrier_type"),
      accepted.select(col("carrier_type_c").as("carrier_type")))

    // D4 last-wins + H1 merge (`empresa.ts:92-106`)
    val source = MergeOps.lastWins(accepted, Seq("carrier_bp_c"))
      .join(broadcast(tipoDim.select(col("carrier_type_id"),
          col("carrier_type").as("_dim_ct"))),
        col("carrier_type_c") === col("_dim_ct"), "left")
      .select(
        col("carrier_bp_c").as("carrier_bp"),
        col("carrier_name_c").as("carrier_name"),
        col("carrier_rut"),
        col("carrier_type_id"))

    // bucketed MERGE: scans + rewrites only buckets with source keys,
    // not the whole table (MergeOps.mergeBucketed)
    MergeOps.mergeBucketed(store, "empresa", SilverSchemas.empresa, source,
      Seq("carrier_bp"), "carrier_id",
      Seq("carrier_name", "carrier_rut", "carrier_type_id"))

    val (total, processed, errors) = counts(flagged)
    if (errors > 0) quarantine(store, "empresa", rejects)
    flagged.unpersist()
    EtlResult(total, processed, errors, rejects)
  }
}

/** Drivers ETL (`services/conductor.ts:1-282`, SURVEY §2 B2/B5/C1/D1/
  * G1-G4/H2/H4). Requires empresa to be loaded first (FK dependency,
  * §7 build order). */
object ConductorPipeline {
  import PipelineUtil._

  def run(store: SilverStore, bronze: DataFrame): EtlResult = {
    val empresa = store.read("empresa", SilverSchemas.empresa)
      .select(col("carrier_id"), col("carrier_bp").as("_emp_bp"))

    val conformed = bronze
      .withColumn("conductor_rut", F.rut_format(col("national_id")))
      .withColumn("carrier_bp_c", F.clean_text(col("carrier_bp")))
      .withColumn("driver_role_c", F.clean_text(col("driver_role")))
      // C1 carrier lookup — dims broadcast (cache preload, SURVEY §4)
      .join(broadcast(empresa), col("carrier_bp_c") === col("_emp_bp"), "left")

    // B5 validation order mirrors `conductor.ts:85-106`
    val reason = when(col("_corrupt").isNotNull, "fila corrupta")
      .when(col("conductor_rut").isNull,
        concat(lit("RUT inválido: '"), coalesce(col("national_id"), lit("")), lit("'")))
      .when(col("carrier_id").isNull,
        concat(lit("Empresa con carrier_bp '"), coalesce(col("carrier_bp_c"), lit("")),
          lit("' no encontrada.")))
      .when(col("driver_role_c").isNull, "'driver_role' está vacío.")
    val flagged = conformed.withColumn("error_reason", reason)
      // one materialization feeds counts, quarantine, and the merge
      // source instead of three scan+validate re-executions
      .persist()
    val rejects = flagged.filter(col("error_reason").isNotNull)
      .select((bronze.columns.map(col) :+ col("error_reason")).toIndexedSeq: _*)
    val accepted = flagged.filter(col("error_reason").isNull)
      .withColumn("conductor_nombre", F.clean_text(col("driver_name")))
      .withColumn("conductor_fecha_nacimiento", F.safe_to_date(col("birth_date")))
      .withColumn("conductor_telefono", F.clean_text(col("phone_number")))
      .withColumn("conductor_email", F.clean_text(col("email")))

    // D1 conductor_rol (`conductor.ts:108-115`)
    val rolDim = DimOps.sync(store, "conductor_rol", "conductor_rol_id",
      Seq("conductor_rol"),
      accepted.select(col("driver_role_c").as("conductor_rol")))

    // H2 merge on conductor_rut (`conductor.ts:117-143`)
    val source = MergeOps.lastWins(accepted, Seq("conductor_rut"))
      .join(broadcast(rolDim.select(col("conductor_rol_id"),
          col("conductor_rol").as("_dim_rol"))),
        col("driver_role_c") === col("_dim_rol"), "left")
      .select(col("conductor_rut"), col("carrier_id"), col("conductor_rol_id"),
        col("conductor_nombre"), col("conductor_fecha_nacimiento"),
        col("conductor_telefono"), col("conductor_email"))

    MergeOps.mergeBucketed(store, "conductor", SilverSchemas.conductor, source,
      Seq("conductor_rut"), "conductor_id",
      Seq("carrier_id", "conductor_rol_id", "conductor_nombre",
        "conductor_fecha_nacimiento", "conductor_telefono", "conductor_email"))

    // RETURNING conductor_id -> join-back on natural key (SURVEY §7)
    val conductorIds = store.read("conductor", SilverSchemas.conductor)
      .select(col("conductor_id"), col("conductor_rut").as("_ck"))
    val withId = accepted
      .join(broadcast(conductorIds), col("conductor_rut") === col("_ck"))
      .drop("_ck")

    appendHojaVida(store, withId)
    appendLicencia(store, withId)

    val (total, processed, errors) = counts(flagged)
    if (errors > 0) quarantine(store, "conductor", rejects)
    flagged.unpersist()
    EtlResult(total, processed, errors, rejects)
  }

  /** H4 historized hoja_vida + G1-G3 children. Reference appends one
    * hoja_vida per accepted row whose payload has `certificado`
    * (`conductor.ts:146-165`) — duplicates on replay are faithful. */
  private def appendHojaVida(store: SilverStore, withId: DataFrame): Unit = {
    val parsed = withId
      .filter(col("hoja_de_vida_data").isNotNull)
      .withColumn("_hv", from_json(col("hoja_de_vida_data"), PayloadSchemas.hojaVida))
      .filter(col("_hv.certificado").isNotNull)

    if (parsed.isEmpty) return

    val maxHv = maxIdOf(store, "hoja_vida", SilverSchemas.hojaVida, "hoja_vida_id")
    val hv = withSurrogateId(parsed, "hoja_vida_id", maxHv,
      Seq(col("conductor_rut"), col("_row_id")))
      .withColumn("folio", F.clean_json_text(col("_hv.certificado.folio")))
      .withColumn("codigo_verificacion", F.clean_json_text(col("_hv.certificado.codigoVerificacion")))
      .withColumn("fecha_emision", F.safe_to_date(col("_hv.certificado.fechaEmision")))
      .withColumn("comuna", F.clean_json_text(col("_hv.persona.comuna")))
      .withColumn("domicilio", F.clean_json_text(col("_hv.persona.domicilio")))
    store.append("hoja_vida", conformTo(hv, SilverSchemas.hojaVida))

    // G1+G2: both arrays land in hoja_vida_restriccion, restricciones
    // first (`conductor.ts:168-189`)
    val childCols = Seq(col("hoja_vida_id"), col("_src"), col("_pos"),
      col("fecha_anotacion"), col("restriccion"))
    val rest = hv.select(col("hoja_vida_id"), lit(0).as("_src"),
        posexplode(col("_hv.persona.restriccionesLicencia")).as(Seq("_pos", "_e")))
      .withColumn("fecha_anotacion", F.safe_to_date(col("_e.fechaAnotacion")))
      .withColumn("restriccion", F.clean_json_text(col("_e.bloqueRestriccionLicencia")))
      .select(childCols: _*)
    val dur = hv.select(col("hoja_vida_id"), lit(1).as("_src"),
        posexplode(col("_hv.persona.duracionesRestringidas")).as(Seq("_pos", "_e")))
      .withColumn("fecha_anotacion", F.safe_to_date(col("_e.fechaAnotacion")))
      .withColumn("restriccion", F.clean_json_text(col("_e.bloqueDuracionRestringida")))
      .select(childCols: _*)
    val restAll = rest.unionByName(dur)
    if (!restAll.isEmpty) {
      val maxR = maxIdOf(store, "hoja_vida_restriccion",
        SilverSchemas.hojaVidaRestriccion, "hoja_vida_restriccion_id")
      val out = withSurrogateId(restAll, "hoja_vida_restriccion_id", maxR,
        Seq(col("hoja_vida_id"), col("_src"), col("_pos")))
      store.append("hoja_vida_restriccion",
        conformTo(out, SilverSchemas.hojaVidaRestriccion))
    }

    // G3: infracciones (`conductor.ts:192-208`)
    val infr = hv.select(col("hoja_vida_id"),
        posexplode(col("_hv.persona.infraccionesRegistradas")).as(Seq("_pos", "_e")))
      .withColumn("proceso", F.clean_json_text(col("_e.procesoNumero")))
      .withColumn("tribunal", F.clean_json_text(col("_e.tribunal")))
      .withColumn("fecha_denuncia", F.safe_to_date(col("_e.fechaDenuncia")))
      .withColumn("infraccion", F.clean_json_text(col("_e.infraccion")))
      .withColumn("resolucion", F.clean_json_text(col("_e.resolucion")))
    if (!infr.isEmpty) {
      val maxI = maxIdOf(store, "hoja_vida_infraccion",
        SilverSchemas.hojaVidaInfraccion, "hoja_vida_infraccion_id")
      val out = withSurrogateId(infr, "hoja_vida_infraccion_id", maxI,
        Seq(col("hoja_vida_id"), col("_pos")))
      store.append("hoja_vida_infraccion",
        conformTo(out, SilverSchemas.hojaVidaInfraccion))
    }
  }

  /** H4 licencia + G4 clase bridge (`conductor.ts:213-256`): only when
    * BOTH frontal and reverso payloads are present. */
  private def appendLicencia(store: SilverStore, withId: DataFrame): Unit = {
    val parsed = withId
      .filter(col("licencia_frontal_data").isNotNull &&
        col("licencia_reverso_data").isNotNull)
      .withColumn("_lf", from_json(col("licencia_frontal_data"), PayloadSchemas.licenciaFrontal))
      .withColumn("_lr", from_json(col("licencia_reverso_data"), PayloadSchemas.licenciaReverso))

    if (parsed.isEmpty) return

    val maxL = maxIdOf(store, "licencia", SilverSchemas.licencia, "licencia_id")
    val lic = withSurrogateId(parsed, "licencia_id", maxL,
      Seq(col("conductor_rut"), col("_row_id")))
      .withColumn("municipalidad", F.clean_json_text(col("_lf.municipalidad")))
      .withColumn("fecha_de_control", F.safe_to_date(col("_lf.fecha_de_control")))
      .withColumn("fecha_ultimo_control", F.safe_to_date(col("_lf.fecha_ultimo_control")))
      .withColumn("codigo", F.clean_json_text(col("_lr.codigo")))
    store.append("licencia", conformTo(lic, SilverSchemas.licencia))

    // G4: explode clase -> get-or-create clase_licencia -> bridge
    val clase = lic.select(col("licencia_id"),
      posexplode(col("_lf.clase")).as(Seq("_pos", "clase_licencia")))
    if (!clase.isEmpty) {
      val claseDim = DimOps.sync(store, "clase_licencia", "clase_licencia_id",
        Seq("clase_licencia"), clase.select("clase_licencia"))
      val maxB = maxIdOf(store, "licencia_clase", SilverSchemas.licenciaClase,
        "licencia_clase_id")
      val bridge = withSurrogateId(
        clase.join(broadcast(claseDim.select("clase_licencia_id", "clase_licencia")),
          Seq("clase_licencia"), "left"),
        "licencia_clase_id", maxB, Seq(col("licencia_id"), col("_pos")))
      store.append("licencia_clase", conformTo(bridge, SilverSchemas.licenciaClase))
    }
  }
}
