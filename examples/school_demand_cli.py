"""The school-demand flow as a one-decorator CLI app.

Reference: /root/reference/examples/3_larger_cli_script/school_demand_cli.py
— ``@autocli`` turns the annotated function into a command: DataFrame
params open from path arguments, the returned DataFrame writes to the
trailing output path, scalars become typed ``--options``.

Run:  python examples/school_demand_cli.py houses.csv schools.csv out.csv \
          --radius 1500 --min-apartments 5
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import erde_spark as es
from erde_spark.cli import autocli


@autocli
def main(houses: DataFrame, schools: DataFrame, radius: float = 1000.0,
         min_apartments: int = 0) -> DataFrame:
    """Sum apartment demand per school within a metric buffer."""
    if min_apartments:
        houses = houses.filter(F.col('apartments') >= min_apartments)
    reach = es.buffer(schools, radius)
    demand = es.sagg(reach, houses, {'apartments': 'sum', 'hid': 'count'})
    return demand.withColumn(
        'apts_per_school',
        (F.col('apartments') / F.greatest(F.col('hid'), F.lit(1))).cast('double'))


if __name__ == '__main__':
    es.get_spark()          # one session for the whole command
    main.cli()
