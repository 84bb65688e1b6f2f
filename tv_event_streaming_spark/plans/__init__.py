"""Query catalog: every implemented operator as a (Spark plan, SQL oracle) pair."""

from .catalog import CATALOG, CatalogEntry  # noqa: F401
