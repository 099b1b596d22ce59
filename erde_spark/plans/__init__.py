from erde_spark.plans.inspect import (count_python_udf_passes,  # noqa: F401
                                      count_shuffles, formatted_plan,
                                      has_broadcast_join, physical_plan,
                                      pushed_filters, read_schemas)
