"""ddf_flink_spark — a PySpark-native engine with the query and
data-processing capabilities of ddf-project/ddf-flink (reference at
/root/reference, studied not ported: see SURVEY.md).

Public surface:
    DDFManager  — session owner + name→DDF catalog + SQL entry
    DDF         — named distributed table with handler facades
    get_spark   — tuned SparkSession factory
"""

from .ddf import DDF
from .manager import DDFManager
from .session import get_spark

__all__ = ["DDF", "DDFManager", "get_spark"]
__version__ = "0.1.0"
