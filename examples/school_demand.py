"""The reference's flagship example (school demand), Spark-first.

Reference: /root/reference/examples/1_simple_script/school_demand.py —
read houses + schools CSVs (WKT points), buffer schools by 1 km, count
house apartments per buffer, derive demand, write CSV.

Run:  python examples/school_demand.py houses.csv schools.csv out.csv
"""

import sys

import erde_spark as es
from pyspark.sql import functions as F


def main(houses_path: str, schools_path: str, out_path: str) -> None:
    spark = es.get_spark()
    houses = es.read_df(houses_path, spark)
    schools = es.read_df(schools_path, spark)

    # 1 km metric buffer around each school, then aggregate the houses
    # that fall inside: sum of apartments + house count per school
    reach = es.buffer(schools, 1000)
    demand = es.sagg(reach, houses, {'apartments': 'sum', 'hid': 'count'})
    demand = demand.withColumn(
        'apts_per_school',
        (F.col('apartments') / F.greatest(F.col('hid'), F.lit(1))).cast('double'))

    es.write_df(demand, out_path)


if __name__ == '__main__':
    main(*sys.argv[1:4])
