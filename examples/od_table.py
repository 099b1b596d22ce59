"""N x M travel-time matrix through OSRM, Spark-first.

Reference: /root/reference/examples/6_table_routing — OD matrices via
``erde table`` (driver-side process pool). Here the cross product is
blocked into OSRM-sized requests as DATA (one task row = one HTTP
request), so a 1M x 1M matrix fans out across the whole cluster with the
same code.

Run:  python examples/od_table.py houses.csv shops.csv http://localhost:5000 out.csv

(Any OSRM-compatible backend works; `tests/osrm_mock.py` provides an
offline straight-line one for demos.)
"""

import sys

import erde_spark as es
from erde_spark.routing.table import od_table


def main(sources_path: str, destinations_path: str, router: str,
         out_path: str) -> None:
    spark = es.get_spark()
    sources = es.read_df(sources_path, spark)
    destinations = es.read_df(destinations_path, spark)
    od = od_table(sources, destinations, router, max_table_size=2000)
    es.write_df(od, out_path)


if __name__ == '__main__':
    main(*sys.argv[1:5])
