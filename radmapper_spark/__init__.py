"""radmapper_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the RADmapper/JSONata data-mapping language.

Public API:
    run(src, bindings=None, data=None, spark=None) -> Python value
    parse(src) -> AST
    get_spark() / load_tables()
"""

from .lang.interp import Interp, run
from .lang.parser import parse
from .session import get_spark, load_tables

__all__ = ["Interp", "run", "parse", "get_spark", "load_tables"]
