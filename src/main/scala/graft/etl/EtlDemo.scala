package graft.etl

import graft.GraftSession
import java.nio.file.{Files, Paths}

/** Self-contained runnable demo of the ETL surface: writes the
  * FIXTURES.md sample CSVs to a temp landing dir, routes them through
  * the three pipelines, prints per-file counters and Silver table
  * counts. `sbt "runMain graft.etl.EtlDemo [landingDir silverDir]"` */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val (landing, silver) =
      if (args.length >= 2) (args(0), args(1))
      else (Files.createTempDirectory("graft-landing").toString,
            Files.createTempDirectory("graft-silver").toString)

    if (args.length < 2) {
      def q(j: String) = "\"" + j.replace("\"", "\"\"") + "\""
      val hv = q("""{"certificado":{"folio":"F123","fechaEmision":"24-06-2025, 09:21","codigoVerificacion":"CV9"},"persona":{"comuna":"SANTIAGO","domicilio":"CALLE 1 #23","restriccionesLicencia":[{"fechaAnotacion":"01-02-2020","bloqueRestriccionLicencia":"LENTES"}],"duracionesRestringidas":[],"infraccionesRegistradas":[{"procesoNumero":"P-1","tribunal":"JPL STGO","fechaDenuncia":"2019-05-06","infraccion":"EXCESO VELOCIDAD","resolucion":"MULTA"}]}}""")
      val lf = q("""{"clase":["A2","B"],"municipalidad":"PROVIDENCIA","fecha_de_control":"10-01-2024","fecha_ultimo_control":"10-01-2030"}""")
      val lr = q("""{"codigo":"XYZ-77"}""")
      Files.writeString(Paths.get(landing, "empresas_20251001.csv"),
        """carrier_bp;carrier_name;carrier_tin;carrier_type
          |1111111;EMPRESA  UNO   SPA;"11.111.111-1";Spot
          |2222222;EMPRESA 2;"22222222-2";Licitada
          |3333333;EMPRESA 3;"22222222-9";Spot
          |1111111;EMPRESA UNO RENOMBRADA;"11111111-1";Spot
          |""".stripMargin)
      Files.writeString(Paths.get(landing, "conductores_20251001.csv"),
        s"""driver_name;national_id;birth_date;phone_number;email;carrier_bp;driver_role;hoja_de_vida_data;licencia_frontal_data;licencia_reverso_data
           |JUAN  PEREZ;12345678-5;24-06-1990;+569111;j@x.cl;1111111;Titular;$hv;$lf;$lr
           |MAL RUT;12345678-9;01-01-1990;;;1111111;Titular;;;
           |""".stripMargin)
    }

    val store = new SilverStore(spark, silver)
    val results = EtlRunner.processDirectory(store, landing)
    results.foreach { case (f, r) =>
      println(s"[etl] $f: rows=${r.rowCount} processed=${r.processed} errors=${r.errors}")
      r.rejects.select("error_reason").collect()
        .foreach(x => println(s"[etl]   reject: ${x.getString(0)}"))
    }
    val fs = new org.apache.hadoop.fs.Path(silver)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(silver))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).sorted
      .foreach(t => println(s"[etl] silver.$t: ${store.read(t).count()} rows"))
    spark.stop()
  }
}
