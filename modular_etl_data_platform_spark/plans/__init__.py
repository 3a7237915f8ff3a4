from modular_etl_data_platform_spark.plans.inspect import (  # noqa: F401
    assert_distributed,
    explain_formatted,
    plan_summary,
)
