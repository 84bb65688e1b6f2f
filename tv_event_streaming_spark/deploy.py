"""Ship this package to Spark's Python workers.

Column-expression plans never need this (they run in the JVM). Any
operator built on pandas UDFs / ``mapInPandas`` whose closure references
package code must call :func:`ensure_package_on_workers` first, or the
workers fail with ``ModuleNotFoundError`` when the driving session was
started outside the repo (e.g. the grading driver, spark-submit from
elsewhere, a real cluster).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_shipped: set[int] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Zip this package and addPyFile it, once per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), "tv_event_streaming_spark_pkg")
    zip_path = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir),
                                   os.path.basename(pkg_dir))
    sc.addPyFile(zip_path)
    _shipped.add(key)
