from movex_cdc_spark.lake.table import LakeTable  # noqa: F401
