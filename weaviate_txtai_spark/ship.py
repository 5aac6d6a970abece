"""Ship this package to Spark Python workers via ``addPyFile``.

Pandas-UDF / mapInPandas closures are pickled by *module reference*
(cloudpickle serializes module-level classes and functions by name), so
executor Python workers must be able to import ``weaviate_txtai_spark``
too. When the package is pip-installed on every node this is automatic;
when it's used straight from a checkout (tests, the driver harness,
notebooks), the workers' ``sys.path`` doesn't include the checkout.

``ensure_shipped(spark)`` zips the package once per SparkContext and
registers it with ``addPyFile`` — idempotent and cheap (<50 ms). Every
public API that crosses the Python boundary calls it on construction.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"weaviate_txtai_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)
