"""Wide World Importers star-schema fixtures (FIXTURES.md family A).

The reference ships 15 WWI table DDLs (samples/databases/wide-world-importers/
tables/*.sql); this module re-declares them through the engine's catalog API
with the same physical layouts, normalized to snake_case (SURVEY §1.1):

* fact tables  — HASH-distributed on their WWI id, CCI, monthly RANGE RIGHT
  partitions on the date key (fact.sale.sql:27-48)
* dimensions   — ROUND_ROBIN + clustered index on the surrogate key
  (dimension.city.sql:17-24); replicated variant for the load pattern
  (data-load/README.md:7)

Types follow the SURVEY §1.2 map (DECIMAL for money, TimestampType for
datetime2, StringType for nvarchar).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..catalog import Catalog, TableLayout, hash_layout, round_robin_layout

# (table, spark-ddl schema, layout)
WWI_TABLES: list[tuple[str, str, TableLayout]] = [
    (
        "dimension.city",
        "city_key int, wwi_city_id int, city string, state_province string,"
        " country string, continent string, sales_territory string, region string,"
        " subregion string, latest_recorded_population long,"
        " valid_from timestamp, valid_to timestamp, lineage_key int",
        round_robin_layout(sort=["city_key"]),
    ),
    (
        "dimension.customer",
        "customer_key int, wwi_customer_id int, customer string,"
        " bill_to_customer string, category string, buying_group string,"
        " primary_contact string, postal_code string, valid_from timestamp,"
        " valid_to timestamp, lineage_key int",
        round_robin_layout(sort=["customer_key"]),
    ),
    (
        "dimension.date",
        "date date, day_number int, day string, month string, short_month string,"
        " calendar_month_number int, calendar_month_label string, calendar_year int,"
        " calendar_year_label string, fiscal_month_number int, fiscal_month_label string,"
        " fiscal_year int, fiscal_year_label string, iso_week_number int",
        round_robin_layout(sort=["date"]),
    ),
    (
        "dimension.employee",
        "employee_key int, wwi_employee_id int, employee string, preferred_name string,"
        " is_salesperson boolean, photo binary, valid_from timestamp,"
        " valid_to timestamp, lineage_key int",
        round_robin_layout(sort=["employee_key"]),
    ),
    (
        "dimension.payment_method",
        "payment_method_key int, wwi_payment_method_id int, payment_method string,"
        " valid_from timestamp, valid_to timestamp, lineage_key int",
        round_robin_layout(sort=["payment_method_key"]),
    ),
    (
        "dimension.stock_item",
        "stock_item_key int, wwi_stock_item_id int, stock_item string, color string,"
        " selling_package string, buying_package string, brand string, size string,"
        " lead_time_days int, quantity_per_outer int, is_chiller_stock boolean,"
        " barcode string, tax_rate decimal(18,3), unit_price decimal(18,2),"
        " recommended_retail_price decimal(18,2), typical_weight_per_unit decimal(18,3),"
        " valid_from timestamp, valid_to timestamp, lineage_key int",
        round_robin_layout(sort=["stock_item_key"]),
    ),
    (
        "dimension.supplier",
        "supplier_key int, wwi_supplier_id int, supplier string, category string,"
        " primary_contact string, supplier_reference string, payment_days int,"
        " postal_code string, valid_from timestamp, valid_to timestamp, lineage_key int",
        round_robin_layout(sort=["supplier_key"]),
    ),
    (
        "dimension.transaction_type",
        "transaction_type_key int, wwi_transaction_type_id int, transaction_type string,"
        " valid_from timestamp, valid_to timestamp, lineage_key int",
        round_robin_layout(sort=["transaction_type_key"]),
    ),
    (
        "fact.sale",
        "sale_key long, city_key int, customer_key int, bill_to_customer_key int,"
        " stock_item_key int, invoice_date_key date, delivery_date_key date,"
        " salesperson_key int, wwi_invoice_id int, description string, package string,"
        " quantity int, unit_price decimal(18,2), tax_rate decimal(18,3),"
        " total_excluding_tax decimal(18,2), tax_amount decimal(18,2),"
        " profit decimal(18,2), total_including_tax decimal(18,2),"
        " total_dry_items int, total_chiller_items int, lineage_key int",
        # fact.sale.sql:27-48 — HASH(wwi_invoice_id) + monthly RANGE RIGHT on
        # invoice_date_key → derived month partition column
        hash_layout(
            "wwi_invoice_id",
            partition_column="invoice_month",
            partition_expr="date_format(invoice_date_key, 'yyyy-MM')",
        ),
    ),
    (
        "fact.order",
        "order_key long, city_key int, customer_key int, stock_item_key int,"
        " order_date_key date, picked_date_key date, salesperson_key int,"
        " picker_key int, wwi_order_id int, wwi_backorder_id int, description string,"
        " package string, quantity int, unit_price decimal(18,2), tax_rate decimal(18,3),"
        " total_excluding_tax decimal(18,2), tax_amount decimal(18,2),"
        " total_including_tax decimal(18,2), lineage_key int",
        hash_layout("wwi_order_id"),
    ),
    (
        "fact.movement",
        "movement_key long, date_key date, stock_item_key int, customer_key int,"
        " supplier_key int, transaction_type_key int, wwi_stock_item_transaction_id int,"
        " wwi_invoice_id int, wwi_purchase_order_id int, quantity int, lineage_key int",
        hash_layout("wwi_stock_item_transaction_id"),
    ),
    (
        "fact.purchase",
        "purchase_key long, date_key date, supplier_key int, stock_item_key int,"
        " wwi_purchase_order_id int, ordered_outers int, ordered_quantity int,"
        " received_outers int, package string, is_order_finalized boolean, lineage_key int",
        hash_layout("wwi_purchase_order_id"),
    ),
    (
        "fact.stock_holding",
        "stock_holding_key long, stock_item_key int, quantity_on_hand int,"
        " bin_location string, last_stocktake_quantity int, last_cost_price decimal(18,2),"
        " reorder_level int, target_stock_level int, lineage_key int",
        hash_layout("stock_item_key"),
    ),
    (
        "fact.transaction",
        "transaction_key long, date_key date, customer_key int,"
        " bill_to_customer_key int, supplier_key int, transaction_type_key int,"
        " payment_method_key int, wwi_customer_transaction_id int,"
        " wwi_supplier_transaction_id int, wwi_invoice_id int,"
        " wwi_purchase_order_id int, supplier_invoice_number string,"
        " total_excluding_tax decimal(18,2), tax_amount decimal(18,2),"
        " total_including_tax decimal(18,2), outstanding_balance decimal(18,2),"
        " is_finalized boolean, lineage_key int",
        hash_layout("wwi_customer_transaction_id"),
    ),
]


def create_wwi_schema(spark: SparkSession, catalog: Catalog | None = None) -> None:
    """CREATE SCHEMA dimension/fact + all 14 empty WWI tables with their
    declared layouts (D1/D2 parity)."""
    catalog = catalog or Catalog(spark)
    catalog.create_schema("dimension")
    catalog.create_schema("fact")
    for table, schema, layout in WWI_TABLES:
        df = spark.createDataFrame([], schema)
        catalog.create_table_as(table, df, layout, mode="overwrite")


def drop_wwi_schema(spark: SparkSession, catalog: Catalog | None = None) -> None:
    catalog = catalog or Catalog(spark)
    catalog.drop_schema("dimension", cascade=True)
    catalog.drop_schema("fact", cascade=True)
