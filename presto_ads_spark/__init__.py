"""presto_ads_spark — a PySpark-native analytics engine with the query
capabilities of Presto 0.216 (reference: pigxuyu/presto-ads) plus
LLM-data-pipeline operators. See SURVEY.md for the blueprint.
"""

from .engine import Engine  # noqa: F401
from .session import get_spark  # noqa: F401

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
