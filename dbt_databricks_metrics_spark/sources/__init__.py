from .fixtures import TABLES, load_table, register_tables  # noqa: F401
from .readers import read_source, write_sink  # noqa: F401
