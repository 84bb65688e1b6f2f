"""Query catalog: every implemented operator as a (Spark plan, SQL oracle) pair."""

from .catalog import CATALOG, CatalogEntry  # noqa: F401
from . import tpch  # noqa: F401  — registers the analytical anchors
from . import datapipe  # noqa: F401  — registers the data-pipeline ops
