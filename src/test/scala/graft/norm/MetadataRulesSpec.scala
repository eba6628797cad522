package graft.norm

import org.scalatest.funsuite.AnyFunSuite

/** N5 metadata rules (rules/MetadataNormalizationRules.java:46-175). */
class MetadataRulesSpec extends AnyFunSuite {

  test("dataset suffix stripping") {
    assert(Normalizer.normalize("sales_data_v2", Some(Normalizer.DATASET)) == "sales data")
    assert(Normalizer.normalize("report_final", Some(Normalizer.DATASET)) == "report")
    assert(Normalizer.normalize("events_2024_01_15", Some(Normalizer.TABLE)) == "events")
    assert(Normalizer.normalize("metrics_2023", Some(Normalizer.TABLE)) == "metrics")
    assert(Normalizer.normalize("users_prod", Some(Normalizer.DATASET)) == "users")
  }

  test("schema prefixes") {
    assert(Normalizer.normalize("dbo.customers", Some(Normalizer.SCHEMA)) == "customers")
    assert(Normalizer.normalize("public.orders", Some(Normalizer.SCHEMA)) == "orders")
  }

  test("service env suffixes") {
    assert(Normalizer.normalize("billing-api-prod", Some(Normalizer.SERVICE)) == "billing api")
    assert(Normalizer.normalize("auth_service_uat", Some(Normalizer.API)) == "auth service")
  }

  test("separators to spaces") {
    assert(Normalizer.normalize("my_big-table", Some(Normalizer.TABLE)) == "my big table")
  }

  test("metadata rules do not fire for COMPANY") {
    assert(Normalizer.normalize("acme_v2", Some(Normalizer.COMPANY)) == "acme v2")
  }
}
