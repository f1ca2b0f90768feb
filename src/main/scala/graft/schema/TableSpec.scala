package graft.schema

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source database dialect for a table (reference: gluejob.py:244-262). */
sealed trait SourceDb { def jdbcScheme: String; def timeProbeSql: String }
case object Postgres extends SourceDb {
  val jdbcScheme = "jdbc:postgresql"
  val timeProbeSql = "SELECT NOW()"
}
case object SqlServer extends SourceDb {
  val jdbcScheme = "jdbc:sqlserver"
  val timeProbeSql = "SELECT GETDATE()"
}

/** Per-table registry entry for the stringly-typed bronze layer.
  *
  * Centralizes the reference's per-table special cases: declared columns
  * (gluejob.py:359-519), id/date column switch (gluejob.py:174,191),
  * boolean columns (gluejob.py:30-42), CSV separator (gluejob.py:235) and
  * database routing (gluejob.py:227,267).
  */
final case class TableSpec(
    name: String,
    columns: Seq[String],
    idCol: String,
    dateCol: String,
    /** incremental watermark / recency column (gluejob.py:526-598;
      * DT_UpdatedAt for checkout_orders). */
    updatedCol: String = "updated_at",
    boolCols: Seq[String] = Nil,
    source: SourceDb = Postgres,
    csvSep: String = ";",
    /** FK edges child.fkCol -> parent table (parent key is its idCol);
      * ordered child-to-root (gluejob.py:530-600 join chains). */
    fkChain: Seq[(String, String)] = Nil,
    enabled: Boolean = true) {

  /** All-string bronze schema (every column 'string[python]',
    * gluejob.py:359-519). */
  def schema: StructType =
    StructType(columns.map(StructField(_, StringType, nullable = true)))
}

/** The closed 9-table registry of the reference (gluejob.py:344-357). */
object Tables {

  val retailOrders = TableSpec(
    name = "retail_orders",
    columns = Seq("id", "customer_id", "agreement", "status",
      "checkout_order_id", "charge_id", "number", "checkout_order_xml",
      "created_at", "updated_at", "generic_attributes", "antifraud_id"),
    idCol = "id", dateCol = "created_at")

  val retailSubscriptions = TableSpec(
    name = "retail_subscriptions",
    columns = Seq("id", "status", "number", "checkout_order_id",
      "priced_at", "feature", "periodicity", "price_list_id",
      "retail_order_id", "created_at", "updated_at", "period",
      "billing_started_at", "closing_days", "issue_company",
      "billing_info_id", "billing_date", "customer_id",
      "readjustment_index_type", "readjustment_index_date"),
    idCol = "id", dateCol = "created_at")

  val retailPlans = TableSpec(
    name = "retail_plans",
    columns = Seq("id", "plan_version_id", "status",
      "retail_subscription_id", "created_at", "updated_at", "discount",
      "price_list_id", "readjustment_at", "priced_at"),
    idCol = "id", dateCol = "created_at",
    fkChain = Seq("retail_subscription_id" -> "retail_subscriptions"))

  val retailItems = TableSpec(
    name = "retail_items",
    columns = Seq("id", "number", "parent", "quantity", "service_id",
      "discount", "retail_plan_id", "created_at", "updated_at", "prefix",
      "service_key", "price_list_id", "readjustment_at", "priced_at"),
    idCol = "id", dateCol = "created_at",
    fkChain = Seq("retail_plan_id" -> "retail_plans",
      "retail_subscription_id" -> "retail_subscriptions"))

  val retailProvisionings = TableSpec(
    name = "retail_provisionings",
    columns = Seq("id", "parent", "status_code", "retail_item_id",
      "installed_at", "deactivated_at", "reactivated_at", "cancelled_at",
      "created_at", "updated_at", "status"),
    idCol = "id", dateCol = "created_at",
    fkChain = Seq("retail_item_id" -> "retail_items",
      "retail_plan_id" -> "retail_plans",
      "retail_subscription_id" -> "retail_subscriptions"))

  val retailOrderMigrations = TableSpec(
    name = "retail_order_migrations",
    columns = Seq("id", "retail_subscription_id",
      "new_retail_subscription_id", "customer_id", "prefix",
      "published_at", "status", "created_at", "updated_at", "external_id",
      "pre_paid", "main"),
    idCol = "id", dateCol = "created_at",
    boolCols = Seq("pre_paid", "main"),
    fkChain = Seq("retail_subscription_id" -> "retail_subscriptions"))

  val retailMigrations = TableSpec(
    name = "retail_migrations",
    columns = Seq("id", "retail_order_migration_id", "retail_item_id",
      "retail_provisioning_id", "service_key", "quantity", "number",
      "parent", "status", "type", "created_at", "updated_at",
      "retail_migration_id", "provisioning_status",
      "parent_provisioning_id", "old_quantity"),
    idCol = "id", dateCol = "created_at",
    fkChain = Seq("retail_order_migration_id" -> "retail_order_migrations",
      "retail_subscription_id" -> "retail_subscriptions"))

  val retailSubscriptionReadjustments = TableSpec(
    name = "retail_subscription_readjustments",
    columns = Seq("id", "index_type_id", "index_name",
      "monthly_percentage", "annually_percentage", "month_year",
      "applied_at", "retail_subscription_id", "created_at", "updated_at",
      "suspended"),
    idCol = "id", dateCol = "created_at",
    boolCols = Seq("suspended"),
    fkChain = Seq("retail_subscription_id" -> "retail_subscriptions"))

  /** Disabled in the reference's table loop (gluejob.py:315-316). */
  val checkoutOrders = TableSpec(
    name = "checkout_orders",
    columns = Seq("ID_Order", "NM_Indicated_Login", "DS_Order",
      "DT_CreatedAt", "DT_UpdatedAt", "dt_finalization", "status",
      "total_amount", "use_anti_fraude", "Login", "customerEmail"),
    idCol = "ID_Order", dateCol = "DT_CreatedAt",
    updatedCol = "DT_UpdatedAt",
    source = SqlServer, csvSep = ",", enabled = false)

  val all: Seq[TableSpec] = Seq(retailOrders, retailSubscriptions,
    retailPlans, retailItems, retailProvisionings, retailOrderMigrations,
    retailMigrations, retailSubscriptionReadjustments, checkoutOrders)

  val registry: Map[String, TableSpec] = all.map(t => t.name -> t).toMap

  /** Tables processed by a Scheduled/allTables run (gluejob.py:306-327). */
  def active: Seq[TableSpec] = all.filter(_.enabled)
}
