from modular_etl_data_platform_spark.schema.registry import SchemaRegistry, TableConfig

__all__ = ["SchemaRegistry", "TableConfig"]
